"""Batched two-view triangulation + cheirality/depth/reprojection filters.

TPU-native replacement for `triangulate_and_filter_3d_points`
(`/root/reference/src/core/slam_core.cpp:173-256`): the reference loops over
matches calling cv::triangulatePoints (DLT) then filters by cheirality in both
cameras, depth < 100 m, and reprojection error in both cameras. Here the DLT
solve is a closed-form 4x4 symmetric eigenproblem batched over all N matches
at once (one vmapped `eigh` — MXU-friendly, no per-point host loop), and the
filters are a single fused mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import smallmat
from . import projection


class TriangulationResult(NamedTuple):
    points: jnp.ndarray   # (N,3) world points (garbage where ~valid)
    valid: jnp.ndarray    # (N,) bool — passed all filters
    errors: jnp.ndarray   # (N,) max reprojection error over the two views


def _dlt_batched(P0: jnp.ndarray, P1: jnp.ndarray, uv0: jnp.ndarray,
                 uv1: jnp.ndarray) -> jnp.ndarray:
    """Classic 4x4 DLT triangulation (kept as a reference implementation).

    NOT used by `triangulate`: in f32 the Gram matrix's two smallest
    eigenvalues nearly coincide for low-parallax points (depth is a
    near-null direction), so the eigensolver mixes the depth-uncertain
    direction into the solution and the recovered point moves LATERALLY off
    the observation rays. Those lateral errors pass the two-view
    reprojection gate, deform the map, and were measured to rotate the
    whole trajectory ~3.6 deg within 4 frames on a ZERO-NOISE synthetic
    corridor (the reference gets away with DLT because OpenCV/Ceres run it
    in f64, slam_core.cpp:173-256). See _ray_depth_batched."""
    # Rows of A, batched: (N,4,4)
    A = jnp.stack([
        uv0[:, 0:1] * P0[2] - P0[0],
        uv0[:, 1:2] * P0[2] - P0[1],
        uv1[:, 0:1] * P1[2] - P1[0],
        uv1[:, 1:2] * P1[2] - P1[1],
    ], axis=1)
    # Row-normalize for conditioning
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=2, keepdims=True), 1e-12)
    M = jnp.einsum('nij,nik->njk', A, A)
    X = smallmat.smallest_eigvec(M)
    w = X[:, 3]
    w = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    return X[:, :3] / w[:, None]


def _ray_depth_batched(K, R0, t0, R1, t1, uv0, uv1,
                       newton_iters: int = 2):
    """f32-robust two-view triangulation: point constrained to ray 0.

    X(s) = s*ray0 in CAMERA-0 coordinates, s solved in closed form by
    minimizing the view-1 ALGEBRAIC reprojection residual, which is linear
    in s: r(s) = r0 + s*r1 -> s* = -<r0,r1>/<r1,r1>; then `newton_iters`
    Gauss-Newton steps on the TRUE view-1 pixel residual polish s. The
    bearing is exact by construction, so numerical error lives purely ALONG
    the ray (honest depth uncertainty that windowed BA later refines), never
    laterally off the rays — the failure mode that made f32 DLT deform the
    map (see _dlt_batched).

    Conditioning note (round-3 fix): the solve MUST run in the camera-0
    RELATIVE frame. The previous formulation built the same algebraic
    residual from world-frame homogeneous rows, whose magnitude grows with
    the camera-center norm (O(f*|c0|) ~ 4e4 a few dozen frames into a KITTI
    run); the residual is a cancellation of such terms, so f32 left ~4e-3
    absolute noise in r0 and the recovered depth carried metre-level error
    EVEN ON EXACT CORRESPONDENCES (~0.7 px median view-1 residual, measured)
    — which silently poisoned every downstream gate and the whole flagship
    map. In the relative frame every row is O(f*baseline) and the same
    algebra is exact to ~1e-4."""
    x0 = projection.normalize_points(K, uv0)               # (N,2)
    ray0 = jnp.concatenate([x0, jnp.ones_like(x0[:, :1])], axis=1)  # (N,3)
    # Relative pose: x_cam1 = R_rel x_cam0 + t_rel
    R_rel = R1 @ R0.T
    t_rel = t1 - R_rel @ t0
    h_c = K @ t_rel                                        # (3,)
    h_d = K @ (R_rel @ ray0.T)                             # (3,N)
    r0 = jnp.stack([uv1[:, 0] * h_c[2] - h_c[0],
                    uv1[:, 1] * h_c[2] - h_c[1]], axis=1)  # (N,2)
    r1 = jnp.stack([uv1[:, 0] * h_d[2] - h_d[0],
                    uv1[:, 1] * h_d[2] - h_d[1]], axis=1)
    denom = jnp.sum(r1 * r1, axis=1)
    s = -jnp.sum(r0 * r1, axis=1) / jnp.maximum(denom, 1e-20)
    # Gauss-Newton on the true view-1 pixel residual (scalar unknown):
    # p(s) = h_d*s + h_c; e = (p_xy/p_z - uv1); de/ds via quotient rule.
    for _ in range(newton_iters):
        p = h_d * s[None, :] + h_c[:, None]                # (3,N)
        z = jnp.where(jnp.abs(p[2]) < 1e-12, 1e-12, p[2])
        ex = p[0] / z - uv1[:, 0]
        ey = p[1] / z - uv1[:, 1]
        gx = (h_d[0] * z - p[0] * h_d[2]) / (z * z)
        gy = (h_d[1] * z - p[1] * h_d[2]) / (z * z)
        g2 = gx * gx + gy * gy
        step = -(ex * gx + ey * gy) / jnp.maximum(g2, 1e-20)
        s = s + step
    X_cam0 = s[:, None] * ray0
    return (X_cam0 - t0[None, :]) @ R0                     # R0^T(X - t0)


def triangulate(K: jnp.ndarray,
                R0: jnp.ndarray, t0: jnp.ndarray,
                R1: jnp.ndarray, t1: jnp.ndarray,
                uv0: jnp.ndarray, uv1: jnp.ndarray,
                mask: jnp.ndarray | None = None,
                max_depth: float = 100.0,
                max_reproj_px: float = 0.5,
                min_parallax_deg: float = 0.0) -> TriangulationResult:
    """Triangulate (N,) correspondences between two cameras and filter.

    Filters mirror the reference (`slam_core.cpp:218-247`): positive depth in
    BOTH cameras, depth (camera-0 frame) < max_depth, reprojection error
    <= max_reproj_px in BOTH cameras.

    Gate-semantics note: the ray-0-constrained solution makes the view-0
    reprojection error ~0 by construction, so `max(e0, e1) <= thr` is in
    practice a ONE-view (view-1) gate — roughly 2x stricter than the
    reference's symmetric f64-DLT gate at the same numeric threshold.
    `max_reproj_px` values are therefore NOT interchangeable with the
    reference's; the config defaults were re-tuned for this solver.

    `min_parallax_deg` > 0 additionally rejects points whose observation
    rays subtend less than this angle: their depth is noise-dominated
    (sigma_z/z ~ sigma_px/(f*parallax)), and admitting them random-walks the
    monocular scale through the map. The reference has no such gate (its
    f64 DLT + 0.1 px gate rarely passes them anyway); 0 disables (parity).
    """
    pts = _ray_depth_batched(K, R0, t0, R1, t1, uv0, uv1)

    _, z0, front0 = projection.project(K, R0, t0, pts)
    _, z1, front1 = projection.project(K, R1, t1, pts)
    e0 = projection.reprojection_error(K, R0, t0, pts, uv0)
    e1 = projection.reprojection_error(K, R1, t1, pts, uv1)
    err = jnp.maximum(e0, e1)

    valid = front0 & front1 & (z0 < max_depth) & (err <= max_reproj_px)
    if min_parallax_deg > 0.0:
        c0 = -t0 @ R0
        c1 = -t1 @ R1
        r0 = pts - c0
        r1 = pts - c1
        cosang = jnp.sum(r0 * r1, axis=1) / jnp.maximum(
            jnp.linalg.norm(r0, axis=1) * jnp.linalg.norm(r1, axis=1), 1e-12)
        valid = valid & (cosang < jnp.cos(jnp.deg2rad(min_parallax_deg)))
    if mask is not None:
        valid = valid & mask
    valid = valid & jnp.all(jnp.isfinite(pts), axis=-1)
    return TriangulationResult(points=pts, valid=valid, errors=err)


def triangulate_midpoint(K, R0, t0, R1, t1, uv0, uv1):
    """Closed-form midpoint triangulation (no eigensolve) — cheap variant
    used inside RANSAC cheirality voting where full DLT accuracy is not
    needed. Returns (N,3) points in world frame."""
    # Rays in world frame
    x0 = projection.normalize_points(K, uv0)
    x1 = projection.normalize_points(K, uv1)
    d0 = jnp.concatenate([x0, jnp.ones_like(x0[:, :1])], axis=1) @ R0  # R0^T @ ray
    d1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=1) @ R1
    c0 = -t0 @ R0  # camera centers: -R^T t
    c1 = -t1 @ R1
    # Solve for s,t minimizing |c0 + s d0 - (c1 + t d1)|
    a = jnp.sum(d0 * d0, axis=1)
    b = jnp.sum(d0 * d1, axis=1)
    c = jnp.sum(d1 * d1, axis=1)
    w = c1 - c0
    d = jnp.sum(d0 * w, axis=1)
    e = jnp.sum(d1 * w, axis=1)
    denom = a * c - b * b
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    s = (c * d - b * e) / denom
    tt = (b * d - a * e) / denom
    p0 = c0 + s[:, None] * d0
    p1 = c1 + tt[:, None] * d1
    return 0.5 * (p0 + p1)


# Full-f32 matmul precision (ops/precision.py): the bf16 TPU matmul default
# is unit-scale-model-path-only; on pixel/metre-scale geometry it injects
# ~4e-3 relative noise, measured as a ~0.7 px floor on exact-input
# triangulation before the round-3 fix.
from ..ops.precision import f32 as _precision_f32  # noqa: E402

for _name in ("triangulate", "triangulate_midpoint",):
    globals()[_name] = _precision_f32(globals()[_name])
del _name
