"""Pinhole projection and reprojection residuals — batched, masked.

Equivalent of the reference's projection plumbing: K[R|t] projection matrices
(`src/core/slam_core.cpp:181-188`), reprojection checks (`:218-247`), the
Ceres `ReprojectionError` functor (`src/core/slam_core.cpp:695-742`) and the
map-point projection used by re-observation/covisibility retrieval
(`src/core/slam_core.cpp:466-487,1300-1324`).

All shapes static; invalid entries are handled by boolean masks.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.precision import f32 as _f32


@_f32
def project(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
            pts_w: jnp.ndarray):
    """Project (N,3) world points into a camera.

    Returns (uv (N,2), depth (N,), in_front (N,) bool).

    Matmul precision: forced full-f32 (ops/precision.py) — the bf16 TPU
    default puts ~0.1-1 px of noise on projections of O(10-100) world
    coordinates, which poisoned every reprojection gate downstream.
    """
    pc = pts_w @ R.T + t
    z = pc[:, 2]
    in_front = z > 1e-6
    zs = jnp.where(in_front, z, 1.0)
    x = pc[:, 0] / zs
    y = pc[:, 1] / zs
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    uv = jnp.stack([fx * x + cx, fy * y + cy], axis=-1)
    return uv, z, in_front


@_f32
def reprojection_error(K, R, t, pts_w, uv_obs):
    """Per-point reprojection error in pixels (N,). Behind-camera -> +inf."""
    uv, _, in_front = project(K, R, t, pts_w)
    err = jnp.linalg.norm(uv - uv_obs, axis=-1)
    return jnp.where(in_front, err, jnp.inf)


def in_image(uv: jnp.ndarray, height: int, width: int, margin: float = 0.0):
    """Mask of projections inside the image bounds."""
    return ((uv[:, 0] >= margin) & (uv[:, 0] < width - margin)
            & (uv[:, 1] >= margin) & (uv[:, 1] < height - margin))


def normalize_points(K: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords -> normalized camera coords using K^{-1}."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    x = (uv[:, 0] - cx) / fx
    y = (uv[:, 1] - cy) / fy
    return jnp.stack([x, y], axis=-1)


def cauchy_weight(r2: jnp.ndarray, scale: float) -> jnp.ndarray:
    """IRLS weight for the Cauchy robust loss rho(s)=c^2 log(1+s/c^2).

    Matches Ceres CauchyLoss(scale) used at `src/core/slam_core.cpp:814,1115`
    (weight = rho'(s) with s = squared residual norm).
    """
    c2 = scale * scale
    return 1.0 / (1.0 + r2 / c2)


# Full-f32 matmul precision (ops/precision.py) on every projection entry
# point: `pts @ R.T` is a WORLD-SCALE matmul — at the bf16 TPU default it
# carries |X| * ~4e-3 of coordinate noise, which 40 m from the world origin
# is measured at MEDIAN 6 px / p95 240 px of reprojection error (round-4
# probe). Round 3 wrapped the solvers but left these raw projections — so
# the association reprojection gate (frontend step 5b), the re-observation
# candidate projections and loop detection all ran on bf16 world algebra.
from ..ops.precision import f32 as _precision_f32  # noqa: E402

for _name in ("project", "reprojection_error", "normalize_points",
              "in_image", "cauchy_weight",):
    globals()[_name] = _precision_f32(globals()[_name])
del _name
