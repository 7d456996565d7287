"""SuperPoint-style keypoint detector + descriptor network (Flax).

TPU-native replacement for the reference's SuperPoint TensorRT engine
(`/root/reference/src/core/superpoint.cpp`, `include/core/superpoint.h:11-82`:
grayscale [0,1] input at 376x1241, up to 2048 keypoints with scores and 256-d
descriptors, score threshold 0.1). Instead of an ONNX->TensorRT compile step,
the network is a Flax module jitted by XLA; instead of per-call cudaMalloc
(`superpoint.cpp:115-146`), buffers are donated device arrays.

Architecture (classic SuperPoint shape, bf16 compute):
  VGG encoder -> H/8 x W/8 x 128
  detector head -> 65-channel cell softmax -> full-res heatmap
  descriptor head -> D-dim coarse grid, bilinearly sampled at keypoints
Detection = fused NMS + threshold + top-K (ops/nms.py) — fixed K output with
a validity mask, matching the framework's fixed-shape contract.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import nms as nms_ops


class _VGGBlock(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        return nn.relu(x)


class SuperPointNet(nn.Module):
    """Encoder + detector/descriptor heads. Input (B,H,W,1) in [0,1].

    `stem_stride` > 1 applies an information-preserving space-to-depth
    reshape before the first conv ((B,H,W,1) -> (B,H/s,W/s,s*s)) and drops
    log2(s) max-pools so the total stride stays 8. TPU rationale: the
    classic full-resolution 64->64 3x3 conv is ~34 GFLOP at KITTI size and
    its 1-channel predecessor is layout-bound on the MXU; at s=2 the same
    architecture costs ~24 GFLOP total instead of ~80 with no loss of input
    information (weights are trained from scratch either way — there is no
    upstream checkpoint to stay compatible with)."""
    descriptor_dim: int = 256
    channels: Tuple[int, ...] = (64, 64, 64, 64, 128, 128, 128, 128)
    dtype: Any = jnp.bfloat16
    stem_stride: int = 2

    @nn.compact
    def __call__(self, img, return_logits: bool = False):
        """img (B,H,W,1) in [0,1] -> (heat (B,H,W), desc grid (B,H/8,W/8,D));
        with return_logits also the raw 65-way cell logits (for the training
        cross-entropy, train/frontend_train.py)."""
        x = img.astype(self.dtype)
        s = self.stem_stride
        assert s in (1, 2, 4) and 8 % s == 0
        if s > 1:
            B, H, W, C = x.shape
            x = x.reshape(B, H // s, s, W // s, s, C)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // s, W // s,
                                                      s * s * C)
        # Keep the EARLY pools (they shrink the expensive early blocks) and
        # drop the later ones: total stride = stem * 2^n_pools = 8.
        n_pools = {1: 3, 2: 2, 4: 1}[s]
        c = self.channels
        x = _VGGBlock(c[0], self.dtype)(x)
        x = _VGGBlock(c[1], self.dtype)(x)
        if n_pools >= 1:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _VGGBlock(c[2], self.dtype)(x)
        x = _VGGBlock(c[3], self.dtype)(x)
        if n_pools >= 2:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _VGGBlock(c[4], self.dtype)(x)
        x = _VGGBlock(c[5], self.dtype)(x)
        if n_pools >= 3:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _VGGBlock(c[6], self.dtype)(x)
        feat = _VGGBlock(c[7], self.dtype)(x)          # (B,H/8,W/8,128)

        # Detector head: 65 = 8x8 cell pixels + dustbin
        d = _VGGBlock(256, self.dtype)(feat)
        logits = nn.Conv(65, (1, 1), dtype=self.dtype)(d)
        prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., :64]
        B, Hc, Wc, _ = prob.shape
        heat = prob.reshape(B, Hc, Wc, 8, 8).transpose(0, 1, 3, 2, 4)
        heat = heat.reshape(B, Hc * 8, Wc * 8)          # (B,H,W)

        # Descriptor head: coarse D-dim grid, normalized
        e = _VGGBlock(256, self.dtype)(feat)
        desc = nn.Conv(self.descriptor_dim, (1, 1), dtype=self.dtype)(e)
        desc = desc.astype(jnp.float32)
        # rsqrt(sumsq+eps), not max(norm,eps): black image regions yield
        # exactly-zero descriptor vectors and norm() has a NaN gradient at 0.
        desc = desc * jax.lax.rsqrt(
            jnp.sum(desc * desc, axis=-1, keepdims=True) + 1e-12)
        if return_logits:
            return heat, desc, logits
        return heat, desc


def sample_descriptors(desc_grid: jnp.ndarray, kpts: jnp.ndarray,
                       cell: int = 8) -> jnp.ndarray:
    """Bilinearly sample the coarse descriptor grid at pixel keypoints.

    desc_grid: (Hc,Wc,D); kpts: (N,2) pixel xy. Returns (N,D) unit-norm.
    """
    Hc, Wc, D = desc_grid.shape
    x = kpts[:, 0] / cell - 0.5
    y = kpts[:, 1] / cell - 0.5
    x0 = jnp.clip(jnp.floor(x), 0, Wc - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, Hc - 2).astype(jnp.int32)
    fx = jnp.clip(x - x0, 0.0, 1.0)[:, None]
    fy = jnp.clip(y - y0, 0.0, 1.0)[:, None]
    d00 = desc_grid[y0, x0]
    d01 = desc_grid[y0, x0 + 1]
    d10 = desc_grid[y0 + 1, x0]
    d11 = desc_grid[y0 + 1, x0 + 1]
    d = (d00 * (1 - fx) * (1 - fy) + d01 * fx * (1 - fy)
         + d10 * (1 - fx) * fy + d11 * fx * fy)
    return d * jax.lax.rsqrt(jnp.sum(d * d, axis=-1, keepdims=True) + 1e-12)


class SuperPointExtractor:
    """Jitted batched extractor with the fixed-K output contract.

    Equivalent surface to `SuperPointTRT::runInference`
    (`superpoint.cpp:97-157`): image -> (keypoints, scores, descriptors,
    valid) with at most `max_keypoints` detections above `score_threshold`
    (the reference counts scores > 0.1 and stops at the first below,
    `superpoint.cpp:150-155` — here it is a top-K + mask, same effect on a
    sorted score list).
    """

    def __init__(self, height: int, width: int, max_keypoints: int = 2048,
                 score_threshold: float = 0.1, nms_radius: int = 4,
                 descriptor_dim: int = 256, seed: int = 0,
                 use_pallas: bool = None):
        self.height = height
        self.width = width
        # Pad to a multiple of 8 for the 3 pooling stages
        self.pad_h = (-height) % 8
        self.pad_w = (-width) % 8
        self.max_keypoints = max_keypoints
        self.score_threshold = score_threshold
        self.nms_radius = nms_radius
        self.net = SuperPointNet(descriptor_dim=descriptor_dim)
        dummy = jnp.zeros((1, height + self.pad_h, width + self.pad_w, 1),
                          jnp.float32)
        self.params = self.net.init(jax.random.PRNGKey(seed), dummy)
        self.use_pallas = use_pallas
        self._fn = jax.jit(self._extract)

    def _extract(self, params, images):
        """images: (B,H,W) float in [0,1] -> fixed-K detection pytree."""
        B = images.shape[0]
        x = jnp.pad(images, ((0, 0), (0, self.pad_h), (0, self.pad_w)))
        heat, desc_grid = self.net.apply(params, x[..., None])
        # Mask padding so detections never land outside the true image
        heat = heat[:, :self.height + self.pad_h, :self.width + self.pad_w]
        row_ok = jnp.arange(heat.shape[1]) < self.height
        col_ok = jnp.arange(heat.shape[2]) < self.width
        heat = heat * row_ok[None, :, None] * col_ok[None, None, :]

        kpts, scores, valid = nms_ops.detect_keypoints(
            heat, self.max_keypoints, self.score_threshold, self.nms_radius,
            use_pallas=self.use_pallas)
        desc = jax.vmap(sample_descriptors)(desc_grid,
                                            kpts.astype(jnp.float32))
        return kpts.astype(jnp.float32), scores, desc, valid

    def __call__(self, images):
        """images: (B,H,W) in [0,1]. Returns (kpts (B,K,2), scores (B,K),
        desc (B,K,D), valid (B,K))."""
        return self._fn(self.params, images)
