"""Sub-pixel keypoint refinement head (Keypt2Subpx equivalent, Flax).

TPU-native replacement for the reference's Keypt2Subpx TensorRT engine
(`/root/reference/src/core/keypt2subpx.cpp`, `include/core/keypt2subpx.h:
14-89`): the reference scatters per-match scores into dense HxW maps, feeds
them with the image pair to the engine, and reads back refined keypoint
coordinates (`keypt2subpx.cpp:170-245,283-340`). The scatter->dense->conv
round trip exists because TensorRT wants dense inputs; on TPU the natural
formulation is a direct GATHER of local patches around each matched keypoint
(fixed M x P x P tensors) through a small MLP head that predicts a bounded
offset — same capability, no dense intermediate (SURVEY.md C7).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def gather_patches_naive(img: jnp.ndarray, kpts: jnp.ndarray,
                         patch: int) -> jnp.ndarray:
    """Reference implementation: direct 2D element gather (kept for tests
    and tiny shapes). (N,P,P) scalar gathers lower to ~N*P*P independent
    loads on TPU — measured 1.23 ms/frame at N=2048, P=7 on v5e
    (scripts/ablate_gather.py)."""
    H, W = img.shape
    r = patch // 2
    off = jnp.arange(patch) - r
    xs = jnp.clip(kpts[:, 0:1].astype(jnp.int32) + off[None, :], 0, W - 1)
    ys = jnp.clip(kpts[:, 1:2].astype(jnp.int32) + off[None, :], 0, H - 1)
    return img[ys[:, :, None], xs[:, None, :]]


def gather_patches(img: jnp.ndarray, kpts: jnp.ndarray,
                   patch: int) -> jnp.ndarray:
    """Gather (P,P) windows centred at integer keypoints.

    img: (H,W); kpts: (N,2) xy pixels. Out-of-bounds clamped. -> (N,P,P).

    TPU shape: element gathers are scalar-granularity on TPU, so the window
    is first packed along x — `imx[y, x, i] = img[y, clip(x - r + i)]`, an
    edge-replicated shift stack (P shifted copies, pure VPU) — turning the
    patch read into N*P ROW gathers of P contiguous lanes from (H*W, P).
    Identical output to the naive clamped gather (x-clamping == edge
    replication; y-clamping via clipped row index). ~4x faster than the
    element gather at flagship shapes."""
    H, W = img.shape
    r = patch // 2
    if H * W <= 16384:      # tiny test shapes: packing overhead dominates
        return gather_patches_naive(img, kpts, patch)
    # (H, W + 2r) edge-replicated in x, then P x-shifted views -> (H, W, P)
    imp = jnp.pad(img, ((0, 0), (r, r)), mode='edge')
    imx = jnp.stack([jax.lax.dynamic_slice_in_dim(imp, i, W, axis=1)
                     for i in range(patch)], axis=-1)
    xs = jnp.clip(kpts[:, 0].astype(jnp.int32), 0, W - 1)       # (N,)
    off = jnp.arange(patch) - r
    ys = jnp.clip(kpts[:, 1:2].astype(jnp.int32) + off[None, :], 0, H - 1)
    rows = (ys * W + xs[:, None]).reshape(-1)                   # (N*P,)
    out = jnp.take(imx.reshape(H * W, patch), rows, axis=0)
    return out.reshape(kpts.shape[0], patch, patch)


class SubpixHead(nn.Module):
    """MLP on (image/heat patch, descriptor) -> offset in (-range,range)^2 px.

    `offset_range` > 0.5 lets the head also recover from off-by-one integer
    detections (the true blob center can sit beyond the half-pixel boundary
    of the NMS argmax)."""
    hidden: int = 128
    patch: int = 5
    offset_range: float = 1.5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, patches, desc):
        x = jnp.concatenate(
            [patches.reshape(patches.shape[0], -1), desc], axis=-1)
        x = x.astype(self.dtype)
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.gelu(x)
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.gelu(x)
        off = nn.Dense(2, dtype=jnp.float32)(x.astype(jnp.float32))
        return self.offset_range * jnp.tanh(off)


class PairSubpixHead(nn.Module):
    """Pair-conditioned sub-pixel refinement (full Keypt2Subpx parity).

    The reference's Keypt2Subpx consumes BOTH images of a matched pair plus
    dense score maps scattered from match scores
    (`/root/reference/src/core/keypt2subpx.cpp:283-340`) and refines the
    matched keypoints jointly; the single-view `SubpixHead` above only sees
    one frame. This head closes that capability gap the TPU way: per match,
    gather the (P,P) image patch around each endpoint (no dense HxW scatter
    — the reference's scatter->dense->conv round trip exists because
    TensorRT wants dense inputs), concatenate both patches, both sampled
    descriptors and the match score, and regress a bounded offset for the
    CURRENT-frame keypoint. The previous-frame keypoint is not re-refined:
    it was refined by this same head when its frame was current, and its
    coordinates are already baked into the map's observation table.
    """
    hidden: int = 128
    patch: int = 7
    offset_range: float = 1.5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, patches0, patches1, desc0, desc1, mscore):
        """patches0/1: (M,P,P) prev/cur image patches at the matched
        integer keypoints; desc0/1: (M,D); mscore: (M,) match confidence in
        [0,1]. Returns (M,2) pixel offsets for the CURRENT keypoints."""
        M = patches1.shape[0]
        x = jnp.concatenate(
            [patches0.reshape(M, -1), patches1.reshape(M, -1),
             desc0, desc1, mscore[:, None]], axis=-1)
        x = x.astype(self.dtype)
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.gelu(x)
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.gelu(x)
        off = nn.Dense(2, dtype=jnp.float32)(x.astype(jnp.float32))
        return self.offset_range * jnp.tanh(off)


def pair_refine_scatter(head: PairSubpixHead, params, img_patches0,
                        img_patches1, desc0, desc1, kpts1,
                        matches0, mscores0, pair_mask):
    """Refine the current frame's matched keypoints with the pair head.

    matches0: (N,) prev-row -> cur-row index (-1 = none); pair_mask: (N,)
    rows that passed the score filter. For each masked prev row i with
    partner j = matches0[i], the head sees (patch_i, patch_j, desc_i,
    desc_j, score_i) and its offset is scattered onto cur row j; unmatched
    current keypoints keep their input coordinates. Anchoring: offsets are
    relative to round(kpts1) — the pixel the patch is centred on — so the
    head is agnostic to any earlier fractional refinement of kpts1."""
    N = matches0.shape[0]
    j = jnp.clip(matches0, 0, N - 1)
    p1 = img_patches1[j]
    d1 = desc1[j]
    off = head.apply(params, img_patches0, p1, desc0, d1, mscores0)
    rows = jnp.where(pair_mask & (matches0 >= 0), j, N)
    anchor = jnp.round(kpts1)
    refined = anchor[j] + off
    out = kpts1.at[rows].set(refined, mode='drop')
    return out


class SubpixRefiner:
    """Jitted refiner with the reference's surface: matched keypoints in two
    frames + their descriptors + score heatmaps -> refined coordinates
    (`Keypt2SubpxTRT::run_Direct_Inference`)."""

    def __init__(self, patch: int = 5, desc_dim: int = 256, seed: int = 0):
        self.patch = patch
        self.head = SubpixHead(patch=patch)
        d = jnp.zeros((4, desc_dim), jnp.float32)
        p = jnp.zeros((4, patch, patch), jnp.float32)
        self.params = self.head.init(jax.random.PRNGKey(seed), p, d)
        self._fn = jax.jit(self._refine)

    def _refine(self, params, heat, kpts, desc):
        patches = gather_patches(heat, kpts, self.patch)
        off = self.head.apply(params, patches, desc)
        return kpts + off

    def __call__(self, heat, kpts, desc):
        """heat: (H,W) detector heatmap; kpts: (N,2); desc: (N,D).
        Returns refined (N,2) float32 keypoints."""
        return self._fn(self.params, heat, kpts, desc)


def centroid_refine_naive(heat: jnp.ndarray, kpts: jnp.ndarray,
                          patch: int = 5) -> jnp.ndarray:
    """Reference implementation via the element-gathered patches (kept for
    tests; ~1.26 ms/frame at flagship shapes, scripts/ablate_gather.py)."""
    r = patch // 2
    patches = gather_patches_naive(heat, kpts, patch)     # (N,P,P)
    off = jnp.arange(patch, dtype=jnp.float32) - r
    w = jnp.maximum(patches, 0.0)
    tot = jnp.maximum(jnp.sum(w, axis=(1, 2)), 1e-9)
    dx = jnp.sum(w * off[None, None, :], axis=(1, 2)) / tot
    dy = jnp.sum(w * off[None, :, None], axis=(1, 2)) / tot
    return kpts + jnp.stack([dx, dy], axis=-1)


def centroid_refine(heat: jnp.ndarray, kpts: jnp.ndarray,
                    patch: int = 5) -> jnp.ndarray:
    """Training-free sub-pixel refinement: score-weighted centroid of the
    local heatmap window. Used as the default refiner until learned weights
    exist — same interface, deterministic, and differentiable.

    TPU shape: instead of gathering (N,P,P) element windows (scalar-
    granularity TPU gathers, ~1.26 ms/frame), the three window sums
    (S, S*dx, S*dy) are computed DENSELY as separable shift-adds with
    edge-replicated borders (edge replication == the naive version's
    clamped indexing, so results are identical up to summation order) and
    the per-pixel offset map is row-gathered at the N keypoints — ~10x
    less device time at flagship shapes."""
    H, W = heat.shape
    if H * W <= 16384:      # tiny test shapes
        return centroid_refine_naive(heat, kpts, patch)
    r = patch // 2
    w = jnp.maximum(heat, 0.0)
    off = jnp.arange(patch, dtype=w.dtype) - r

    def shifted(a, axis):
        ap = jnp.pad(a, [(r, r) if ax == axis else (0, 0)
                         for ax in range(2)], mode='edge')
        n = a.shape[axis]
        return [jax.lax.dynamic_slice_in_dim(ap, i, n, axis=axis)
                for i in range(patch)]

    xs = shifted(w, 1)
    a = sum(xs)                                   # x window sum
    b = sum(s * off[i] for i, s in enumerate(xs))  # x weighted sum
    s_tot = sum(shifted(a, 0))
    sx = sum(shifted(b, 0))
    sy = sum(s * off[i] for i, s in enumerate(shifted(a, 0)))
    dxy = jnp.stack([sx, sy], axis=-1) \
        / jnp.maximum(s_tot, 1e-9)[..., None]     # (H,W,2)
    xi = jnp.clip(kpts[:, 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(kpts[:, 1].astype(jnp.int32), 0, H - 1)
    return kpts + jnp.take(dxy.reshape(H * W, 2), yi * W + xi, axis=0)
