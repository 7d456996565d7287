"""PnP RANSAC — batched DLT hypotheses + Gauss-Newton polish, TPU-native.

Replaces the reference's cv::solvePnPRansac call (USAC_MAGSAC, 1000 iters,
1.8 px, conf 0.999 — `/root/reference/src/core/slam_core.cpp:635-638`, used by
the alternate tracking entry `run_pnp` `:543-691`). Same structure as
`essential.py`: a fixed bank of vmapped minimal hypotheses (6-point DLT),
truncated-quadratic scoring, then iterative refit on inliers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import smallmat
from . import projection, se3


class PnPResult(NamedTuple):
    R: jnp.ndarray           # (3,3) world->camera
    t: jnp.ndarray           # (3,)
    inliers: jnp.ndarray     # (N,) bool
    num_inliers: jnp.ndarray
    ok: jnp.ndarray


def _dlt_pnp(pts: jnp.ndarray, x: jnp.ndarray, w: jnp.ndarray):
    """Weighted DLT PnP in normalized coords.

    pts: (M,3) world points, x: (M,2) normalized image coords, w: (M,)
    weights. Solves for P=[R|t] up to scale from x ~ P [X;1], then projects
    the 3x3 part to SO(3) and rescales t accordingly.

    HARTLEY NORMALIZATION (round-5 fix): the raw DLT Gram mixes world
    coordinates O(10-100 m) with normalized image coords O(0.5), giving a
    ~1e5-1e8 condition number that the f32 inverse iteration
    (smallmat.smallest_eigvec) only sometimes survives — measured on the
    re-traversal circle as RANSAC succeeding for some PRNG keys and
    collapsing to ~0 inliers for others with 55% inlier fraction
    (scripts/diag_loop_dbiter.py vmap_pnp_bisect: [2, 37] inliers for two
    split keys on identical data). Centering both point sets and scaling
    to RMS sqrt(3)/sqrt(2) is the standard conditioning cure.
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    c3 = jnp.sum(pts * w[:, None], axis=0) / wsum
    d3 = jnp.sqrt(jnp.sum(w * jnp.sum((pts - c3) ** 2, axis=1)) / wsum)
    s3 = jnp.sqrt(3.0) / jnp.maximum(d3, 1e-9)
    c2 = jnp.sum(x * w[:, None], axis=0) / wsum
    d2 = jnp.sqrt(jnp.sum(w * jnp.sum((x - c2) ** 2, axis=1)) / wsum)
    s2 = jnp.sqrt(2.0) / jnp.maximum(d2, 1e-9)
    pn = (pts - c3) * s3
    xn = (x - c2) * s2

    X, Y, Z = pn[:, 0], pn[:, 1], pn[:, 2]
    u, v = xn[:, 0], xn[:, 1]
    one = jnp.ones_like(X)
    zero = jnp.zeros_like(X)
    # Two rows per point of the standard DLT system A p = 0, p = vec(P) (12,)
    r1 = jnp.stack([X, Y, Z, one, zero, zero, zero, zero,
                    -u * X, -u * Y, -u * Z, -u], axis=1)
    r2 = jnp.stack([zero, zero, zero, zero, X, Y, Z, one,
                    -v * X, -v * Y, -v * Z, -v], axis=1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)  # (2M,12)
    M = A.T @ A
    p = smallmat.smallest_eigvec(M)
    Pn = p.reshape(3, 4)
    # Denormalize: x ~ T2^-1 Pn T3 [X;1], T3 = [s3*I | -s3*c3; 0 1],
    # T2^-1 = [I/s2 | c2; 0 1] acting on homogeneous 2D.
    T2inv = jnp.array([[1.0, 0.0, 0.0],
                       [0.0, 1.0, 0.0],
                       [0.0, 0.0, 0.0]], pts.dtype) / s2
    T2inv = T2inv.at[0, 2].add(c2[0])
    T2inv = T2inv.at[1, 2].add(c2[1])
    T2inv = T2inv.at[2, 2].add(1.0)
    T3 = jnp.concatenate(
        [jnp.concatenate([s3 * jnp.eye(3, dtype=pts.dtype),
                          (-s3 * c3)[:, None]], axis=1),
         jnp.array([[0.0, 0.0, 0.0, 1.0]], pts.dtype)], axis=0)
    P = T2inv @ Pn @ T3
    Rraw = P[:, :3]
    # Scale: rotation rows must have unit norm; sign: cheirality on centroid
    scale = jnp.cbrt(jnp.abs(smallmat.det3x3(Rraw)) + 1e-20)
    P = P / jnp.where(scale < 1e-10, 1e-10, scale)
    centroid = jnp.sum(pts * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1e-9)
    z = P[2, :3] @ centroid + P[2, 3]
    P = P * jnp.where(z < 0, -1.0, 1.0)
    R = se3.project_to_so3(P[:, :3])
    t = P[:, 3]
    return R, t


def _gn_polish(pts, x, w, R, t, iters: int = 8):
    """Gauss-Newton on weighted reprojection error in normalized coords,
    parameterized by a left-multiplied se(3) increment."""

    def step(carry, _):
        R, t = carry
        pc = pts @ R.T + t                       # (N,3)
        z = jnp.maximum(pc[:, 2], 1e-6)
        pred = pc[:, :2] / z[:, None]            # (N,2)
        r = (pred - x)                            # residuals
        # d(pred)/d(pc): (N,2,3)
        inv_z = 1.0 / z
        J_pc = jnp.stack([
            jnp.stack([inv_z, jnp.zeros_like(z), -pc[:, 0] * inv_z ** 2], axis=1),
            jnp.stack([jnp.zeros_like(z), inv_z, -pc[:, 1] * inv_z ** 2], axis=1),
        ], axis=1)
        # d(pc)/d(xi) for xi=(w,v) left increment: [-[pc]_x | I]  (N,3,6)
        hat_pc = jax.vmap(se3.hat)(pc)
        J_xi = jnp.concatenate([-hat_pc, jnp.broadcast_to(
            jnp.eye(3, dtype=pts.dtype), hat_pc.shape)], axis=2)
        J = J_pc @ J_xi                           # (N,2,6)
        Jw = J * w[:, None, None]
        H = jnp.einsum('nij,nik->jk', Jw, J) + 1e-8 * jnp.eye(6, dtype=pts.dtype)
        g = jnp.einsum('nij,ni->j', Jw, r)
        dx = -smallmat.cholesky_solve(H, g)
        dR = se3.exp_so3(dx[:3])
        R_new = dR @ R
        t_new = dR @ t + dx[3:]
        return (R_new, t_new), None

    (R, t), _ = jax.lax.scan(step, (R, t), None, length=iters)
    return R, t


def solve_pnp_ransac(K: jnp.ndarray,
                     pts_w: jnp.ndarray, uv: jnp.ndarray,
                     mask: jnp.ndarray, key: jax.Array,
                     threshold_px: float = 1.8,
                     num_hypotheses: int = 512,
                     min_inliers: int = 10,
                     polish_iters: int = 8,
                     scores: jnp.ndarray | None = None,
                     score_weight: float = 4.0) -> PnPResult:
    """RANSAC PnP over (N,) padded 3D-2D correspondences.

    `scores` (optional, (N,) in [0,1]): match-confidence prior for
    hypothesis sampling — Gumbel-max with logits `score_weight *
    log(score)` draws each 6-point sample ∝ score^score_weight. At the
    loop-detection operating point (25-40% inlier fraction, where uniform
    6-point sampling at 512 hypotheses fails outright) true matches score
    systematically higher than aliased ones (median 0.5-0.7 vs 0.3,
    scripts/diag_loop_dbprobe.py), so score-weighted sampling restores a
    usable clean-sample rate. Scoring/refit still use all masked points —
    the prior only shapes the minimal samples."""
    dtype = jnp.float32
    pts_w = pts_w.astype(dtype)
    x = projection.normalize_points(K, uv.astype(dtype))
    N = pts_w.shape[0]
    f = 0.5 * (K[0, 0] + K[1, 1])
    thr = threshold_px / f
    thr2 = thr * thr
    maskf = mask.astype(dtype)

    g = jax.random.gumbel(key, (num_hypotheses, N), dtype)
    if scores is not None:
        g = g + score_weight * jnp.log(
            jnp.clip(scores.astype(dtype), 1e-6, 1.0))[None, :]
    g = jnp.where(mask[None, :], g, -jnp.inf)
    _, sample_idx = jax.lax.top_k(g, 6)                    # (H,6)

    spts = pts_w[sample_idx]
    sx = x[sample_idx]
    ones6 = jnp.ones((num_hypotheses, 6), dtype)
    Rs, ts = jax.vmap(_dlt_pnp)(spts, sx, ones6)           # (H,3,3),(H,3)

    def score_one(R, t):
        pc = pts_w @ R.T + t
        z = pc[:, 2]
        front = z > 1e-6
        pred = pc[:, :2] / jnp.maximum(z, 1e-6)[:, None]
        e2 = jnp.sum((pred - x) ** 2, axis=1)
        e2 = jnp.where(front, e2, thr2)
        e2 = jnp.where(mask, e2, thr2)
        return jnp.sum(jnp.minimum(e2, thr2)), e2
    scores, _ = jax.vmap(score_one)(Rs, ts)
    best = jnp.argmin(scores)
    R, t = Rs[best], ts[best]

    # Iterative refit: GN polish on inlier set, recompute inliers
    def refit(carry, _):
        R, t = carry
        _, e2 = score_one(R, t)
        w = maskf * (e2 < thr2).astype(dtype)
        w = jnp.where(jnp.sum(w) >= 6, w, maskf)
        R, t = _gn_polish(pts_w, x, w, R, t, iters=2)
        return (R, t), None
    (R, t), _ = jax.lax.scan(refit, (R, t), None, length=polish_iters)

    _, e2 = score_one(R, t)
    inliers = mask & (e2 < thr2)
    num_inliers = jnp.sum(inliers.astype(jnp.int32))
    return PnPResult(R=R, t=t, inliers=inliers, num_inliers=num_inliers,
                     ok=num_inliers >= min_inliers)


# Full-f32 matmul precision (ops/precision.py): the bf16 TPU matmul default
# is unit-scale-model-path-only; on pixel/metre-scale geometry it injects
# ~4e-3 relative noise, measured as a ~0.7 px floor on exact-input
# triangulation before the round-3 fix.
from ..ops.precision import f32 as _precision_f32  # noqa: E402

for _name in ("solve_pnp_ransac",):
    globals()[_name] = _precision_f32(globals()[_name])
del _name
