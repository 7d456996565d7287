"""Fused keypoint NMS + threshold + top-K detection.

TPU-native replacement for the post-processing the reference gets from inside
its SuperPoint ONNX graph (TensorRT fuses it opaquely; the C++ side then
counts scores above 0.1 and truncates, `src/core/superpoint.cpp:150-155`).

Two implementations of the NMS pass:
  * a Pallas kernel (`_nms_pallas`) that keeps the whole heatmap resident in
    VMEM and computes the (2r+1)^2 neighbourhood max with unrolled shifted
    maxima in one pass — one HBM read, one HBM write, no intermediate
    materialization;
  * an XLA `reduce_window` fallback used on CPU (tests) and as a numerics
    reference.
Selection of the fixed-K keypoint budget is a single `lax.top_k` over the
suppressed score map (fixed output shapes: coordinates, scores, validity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_IDX_MIN = jnp.iinfo(jnp.int32).min


def _suppress_with_tiebreak(heat: jnp.ndarray, pooled: jnp.ndarray,
                            radius: int) -> jnp.ndarray:
    """Zero non-maxima given the window max, breaking ties lexicographically.

    Ties (score plateaus, e.g. saturated/quantized heatmaps) are broken by
    linear pixel index: among equal-score pixels in a window only the
    smallest index survives, so the (radius+1)-spacing bound on per-row
    survivor count is exact — a plateau can never overflow the two-stage
    top-K's per-row budget (detect_keypoints). Shared by the Pallas and XLA
    paths so they agree bit-for-bit."""
    k = 2 * radius + 1
    win = ((1, k, k), (1, 1, 1), ((0, 0), (radius, radius),
                                  (radius, radius)))
    is_max = heat >= pooled
    B, H, W = heat.shape
    lin = (jnp.arange(H, dtype=jnp.int32)[:, None] * W
           + jnp.arange(W, dtype=jnp.int32)[None, :])
    neg_idx = jnp.where(is_max, -lin[None], _IDX_MIN)
    pooled_idx = jax.lax.reduce_window(neg_idx, _IDX_MIN, jax.lax.max, *win)
    survivor = is_max & (neg_idx == pooled_idx)
    return jnp.where(survivor, heat, 0.0)


def _nms_xla(heat: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(B,H,W) -> scores suppressed to local maxima via reduce_window."""
    k = 2 * radius + 1
    win = ((1, k, k), (1, 1, 1), ((0, 0), (radius, radius),
                                  (radius, radius)))
    pooled = jax.lax.reduce_window(heat, -jnp.inf, jax.lax.max, *win)
    return _suppress_with_tiebreak(heat, pooled, radius)


def _window_max(x, radius, pad_val):
    """Separable (2r+1)^2 neighbourhood max via unrolled shifted maxima —
    no (2r+1)^2 window tensor materialized."""
    m = x
    for dy in range(1, radius + 1):
        up = jnp.pad(x, ((dy, 0), (0, 0)), constant_values=pad_val)[:-dy, :]
        dn = jnp.pad(x, ((0, dy), (0, 0)), constant_values=pad_val)[dy:, :]
        m = jnp.maximum(m, jnp.maximum(up, dn))
    mc = m
    for dx in range(1, radius + 1):
        lf = jnp.pad(m, ((0, 0), (dx, 0)), constant_values=pad_val)[:, :-dx]
        rt = jnp.pad(m, ((0, 0), (0, dx)), constant_values=pad_val)[:, dx:]
        mc = jnp.maximum(mc, jnp.maximum(lf, rt))
    return mc


def _nms_kernel(radius: int, heat_ref, out_ref):
    # Window max only — the tie-break runs in XLA afterwards so the kernel's
    # VMEM stack stays within budget at full KITTI resolution (an in-kernel
    # int32 second pass overflowed the 16 MB scoped-vmem limit).
    out_ref[:] = _window_max(heat_ref[:], radius, 0.0)


def _nms_pallas(heat: jnp.ndarray, radius: int,
                interpret: bool = False) -> jnp.ndarray:
    """Pallas fused NMS. heat: (B,H,W) float32, whole image per program."""
    B, H, W = heat.shape
    kernel = functools.partial(_nms_kernel, radius)
    pooled = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((None, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), heat.dtype),
        interpret=interpret,
    )(heat)
    return _suppress_with_tiebreak(heat, pooled, radius)


def nms(heat: jnp.ndarray, radius: int,
        use_pallas: bool | None = None) -> jnp.ndarray:
    """Suppress non-maxima.

    Default is the XLA reduce_window path: measured on v5e at KITTI
    resolution it is slightly FASTER than the Pallas kernel (XLA fuses the
    window max with the surrounding elementwise ops and keeps the batched
    heatmap in HBM, while the whole-image Pallas block stops scaling past
    batch ~8 — its output gets scope-allocated in VMEM). The Pallas kernel
    remains available (use_pallas=True) and is numerics-tested against XLA.
    """
    if use_pallas:
        return _nms_pallas(heat, radius)
    return _nms_xla(heat, radius)


def detect_keypoints(heat: jnp.ndarray, max_keypoints: int,
                     score_threshold: float, radius: int,
                     use_pallas: bool | None = None):
    """(B,H,W) heatmap -> fixed-K (kpts xy int32 (B,K,2), scores (B,K),
    valid (B,K)).

    Top-K runs in two stages when the map is much larger than K: a cheap
    per-row top-R (NMS of radius r allows at most ceil(W/(r+1)) survivors
    per row, far fewer in practice) followed by a global top-K over the
    surviving candidates — a ~8x smaller sort than the naive full-map top-K.
    """
    B, H, W = heat.shape
    supp = nms(heat, radius, use_pallas)

    per_row = min(max(W // (radius + 1) + 1, 8), W)
    if H * W > 4 * max_keypoints and per_row * H >= max_keypoints:
        # Stage 1: top-R within each row (exact: a row holds <= per_row
        # NMS survivors by construction)
        s_row, x_row = jax.lax.top_k(supp, per_row)          # (B,H,R)
        rows = jnp.broadcast_to(
            jnp.arange(H, dtype=jnp.int32)[None, :, None], s_row.shape)
        cand_scores = s_row.reshape(B, H * per_row)
        cand_x = x_row.reshape(B, H * per_row).astype(jnp.int32)
        cand_y = rows.reshape(B, H * per_row)
        # Stage 2: global top-K over candidates
        scores, sel = jax.lax.top_k(cand_scores, max_keypoints)
        xs = jnp.take_along_axis(cand_x, sel, axis=1)
        ys = jnp.take_along_axis(cand_y, sel, axis=1)
    else:
        flat = supp.reshape(B, H * W)
        scores, idx = jax.lax.top_k(flat, max_keypoints)
        ys = (idx // W).astype(jnp.int32)
        xs = (idx % W).astype(jnp.int32)
    kpts = jnp.stack([xs, ys], axis=-1)
    valid = scores > score_threshold
    return kpts, jnp.where(valid, scores, 0.0), valid
