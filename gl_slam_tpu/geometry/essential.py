"""Essential-matrix estimation + pose recovery, fully batched for TPU.

TPU-native replacement for the reference's `pose_estimator`
(`/root/reference/src/core/slam_core.cpp:135-150`): cv::findEssentialMat
(USAC_MAGSAC, prob 0.9999, thr 0.5 px) + cv::recoverPose, and its inlier-mask
filter (`pose_estimator_mask_filter` `:152-163`).

Design (SURVEY.md §7 step 1): RANSAC becomes a FIXED number of vmapped
hypotheses scored in parallel — on TPU, scoring 512 hypotheses x 2048
correspondences is one fused batched matmul-shaped op, far faster than a
sequential adaptive loop. Per hypothesis the 8-point algorithm gives E via a
9x9 symmetric eigensolve; scoring is MAGSAC-style truncated Sampson error;
the winner is polished by iteratively re-fitting on its inliers (the role of
OpenCV's local optimization step). Pose recovery decomposes E into the 4
(R,t) candidates and resolves cheirality by a batched midpoint-triangulation
vote over inliers — no data-dependent control flow anywhere.

Convention: returned (R, t) maps camera-0 coords to camera-1 coords,
x1 = R @ x0 + t, with |t| = 1 (same as cv::recoverPose).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import smallmat
from . import projection, triangulation


class EssentialResult(NamedTuple):
    R: jnp.ndarray         # (3,3)
    t: jnp.ndarray         # (3,) unit norm
    E: jnp.ndarray         # (3,3)
    inliers: jnp.ndarray   # (N,) bool
    num_inliers: jnp.ndarray  # scalar int32
    ok: jnp.ndarray        # scalar bool — enough inliers to trust the pose


def _fit_eight_point_raw(x0: jnp.ndarray, x1: jnp.ndarray,
                         w: jnp.ndarray) -> jnp.ndarray:
    """Weighted 8-point fit in normalized coords, WITHOUT the essential-
    manifold projection (see _project_essential). x0, x1: (M,2); w: (M,)."""
    u0, v0 = x0[:, 0], x0[:, 1]
    u1, v1 = x1[:, 0], x1[:, 1]
    ones = jnp.ones_like(u0)
    # Epipolar constraint rows: [u1u0, u1v0, u1, v1u0, v1v0, v1, u0, v0, 1]
    A = jnp.stack([u1 * u0, u1 * v0, u1, v1 * u0, v1 * v0, v1, u0, v0, ones],
                  axis=1)
    Aw = A * w[:, None]
    M = Aw.T @ A  # (9,9) weighted normal matrix
    e = smallmat.smallest_eigvec(M)
    return e.reshape(3, 3)


def _project_essential(E: jnp.ndarray) -> jnp.ndarray:
    """Project onto the essential manifold: singular values -> (1,1,0)."""
    U, _, Vt = smallmat.svd3(E)
    return U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], E.dtype)) @ Vt


def _fit_eight_point(x0: jnp.ndarray, x1: jnp.ndarray,
                     w: jnp.ndarray) -> jnp.ndarray:
    """Weighted 8-point fit with the (1,1,0) constraint enforced."""
    return _project_essential(_fit_eight_point_raw(x0, x1, w))


def _sampson_error_sq(E: jnp.ndarray, x0: jnp.ndarray,
                      x1: jnp.ndarray) -> jnp.ndarray:
    """Squared Sampson distance (normalized coords) for (N,) correspondences."""
    ones = jnp.ones_like(x0[:, :1])
    p0 = jnp.concatenate([x0, ones], axis=1)  # (N,3)
    p1 = jnp.concatenate([x1, ones], axis=1)
    Ep0 = p0 @ E.T     # (N,3) = E @ p0
    Etp1 = p1 @ E      # (N,3) = E^T @ p1
    num = jnp.sum(p1 * Ep0, axis=1) ** 2
    den = Ep0[:, 0] ** 2 + Ep0[:, 1] ** 2 + Etp1[:, 0] ** 2 + Etp1[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def _sampson_signed(E: jnp.ndarray, x0: jnp.ndarray,
                    x1: jnp.ndarray) -> jnp.ndarray:
    """Signed first-order geometric (Sampson) distance — GN residual."""
    ones = jnp.ones_like(x0[:, :1])
    p0 = jnp.concatenate([x0, ones], axis=1)
    p1 = jnp.concatenate([x1, ones], axis=1)
    Ep0 = p0 @ E.T
    Etp1 = p1 @ E
    num = jnp.sum(p1 * Ep0, axis=1)
    den = Ep0[:, 0] ** 2 + Ep0[:, 1] ** 2 + Etp1[:, 0] ** 2 + Etp1[:, 1] ** 2
    return num * jax.lax.rsqrt(jnp.maximum(den, 1e-12))


def _tangent_basis(t: jnp.ndarray) -> jnp.ndarray:
    """(3,2) orthonormal basis of the plane perpendicular to unit t."""
    a = jnp.where(jnp.abs(t[0]) < 0.9,
                  jnp.array([1.0, 0.0, 0.0], t.dtype),
                  jnp.array([0.0, 1.0, 0.0], t.dtype))
    b1 = jnp.cross(t, a)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-12)
    b2 = jnp.cross(t, b1)
    return jnp.stack([b1, b2], axis=1)


def refine_pose_sampson(x0: jnp.ndarray, x1: jnp.ndarray, maskf: jnp.ndarray,
                        R: jnp.ndarray, t: jnp.ndarray, thr2: float,
                        iters: int):
    """LO-RANSAC-style polish: Gauss-Newton on the truncated Sampson cost
    directly over the 5-DoF pose (so3 delta on R, 2-DoF tangent delta on the
    unit translation).

    Why not IRLS eigensolve refits: the weighted 8-point fit extracts the
    smallest eigenvector of a 9x9 normal matrix, and on forward-motion /
    distant-point geometry the t-direction barely changes the algebraic
    cost, so in f32 the near-null directions MIX — measured up to ~16 deg
    translation-direction error on ZERO-NOISE data (key-dependent). The
    geometric GN never extracts a tiny eigenpair: the 5x5 normal system is
    well scaled, and the near points that actually carry the t-direction
    information dominate its gradient. This plays the role of USAC's local
    optimization (`pose_estimator`, slam_core.cpp:146: USAC_MAGSAC).
    """
    from ..ops import smallmat as sm

    def body(carry, _):
        R, t, prev_cost = carry
        B = _tangent_basis(t)

        def r_of(w):
            dR = _exp_so3_local(w[:3])
            Rn = dR @ R
            tn = t + B @ w[3:]
            tn = tn / jnp.maximum(jnp.linalg.norm(tn), 1e-12)
            E = _hat(tn) @ Rn
            return _sampson_signed(E, x0, x1)

        z5 = jnp.zeros((5,), x0.dtype)
        r0 = r_of(z5)
        J = jax.jacfwd(r_of)(z5)                       # (N,5)
        w_rob = maskf * (r0 * r0 < thr2).astype(x0.dtype)
        Jw = J * w_rob[:, None]
        A = Jw.T @ J + 1e-10 * jnp.eye(5, dtype=x0.dtype)
        g = Jw.T @ r0
        dw = -sm.cholesky_solve(A, g)
        dR = _exp_so3_local(dw[:3])
        R_new = dR @ R
        t_new = t + B @ dw[3:]
        t_new = t_new / jnp.maximum(jnp.linalg.norm(t_new), 1e-12)
        E_new = _hat(t_new) @ R_new
        r_new = _sampson_signed(E_new, x0, x1)
        cost = jnp.sum(jnp.minimum(r_new * r_new, thr2) * maskf)
        accept = cost < prev_cost
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        return (R, t, jnp.where(accept, cost, prev_cost)), None

    r_init = _sampson_signed(_hat(t) @ R, x0, x1)
    cost0 = jnp.sum(jnp.minimum(r_init * r_init, thr2) * maskf)
    (R, t, _), _ = jax.lax.scan(body, (R, t, cost0), None, length=iters)
    return R, t


def _hat(t: jnp.ndarray) -> jnp.ndarray:
    z = jnp.zeros((), t.dtype)
    return jnp.array([[z, -t[2], t[1]],
                      [t[2], z, -t[0]],
                      [-t[1], t[0], z]])


def _exp_so3_local(w: jnp.ndarray) -> jnp.ndarray:
    th2 = jnp.dot(w, w)
    th = jnp.sqrt(th2 + 1e-20)
    W = _hat(w)
    a = jnp.where(th2 < 1e-10, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    b = jnp.where(th2 < 1e-10, 0.5 - th2 / 24.0,
                  (1.0 - jnp.cos(th)) / jnp.maximum(th2, 1e-20))
    return jnp.eye(3, dtype=w.dtype) + a * W + b * (W @ W)


def decompose_essential(E: jnp.ndarray):
    """E -> 4 candidate (R, t): (R1,t), (R1,-t), (R2,t), (R2,-t)."""
    U, _, Vt = smallmat.svd3(E)
    # Make proper rotations
    U = U * jnp.sign(smallmat.det3x3(U))
    Vt = Vt * jnp.sign(smallmat.det3x3(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _cheirality_votes(K, Rs, ts, uv0, uv1, weights):
    """Weighted count of points in front of both cameras for 4 candidates."""
    def count_one(R, t):
        pts = triangulation.triangulate_midpoint(
            K, jnp.eye(3, dtype=R.dtype), jnp.zeros(3, R.dtype), R, t, uv0, uv1)
        z0 = pts[:, 2]
        pc1 = pts @ R.T + t
        z1 = pc1[:, 2]
        return jnp.sum(weights * (z0 > 0) * (z1 > 0))
    return jax.vmap(count_one)(Rs, ts)


def estimate_essential(K: jnp.ndarray,
                       uv0: jnp.ndarray, uv1: jnp.ndarray,
                       mask: jnp.ndarray,
                       key: jax.Array,
                       threshold_px: float = 0.5,
                       num_hypotheses: int = 512,
                       refine_iters: int = 10,
                       min_inliers: int = 15) -> EssentialResult:
    """MAGSAC-style essential RANSAC over fixed-shape padded correspondences.

    uv0/uv1: (N,2) pixel coords (padded); mask: (N,) valid flags.
    """
    dtype = jnp.float32
    uv0 = uv0.astype(dtype)
    uv1 = uv1.astype(dtype)
    N = uv0.shape[0]
    x0 = projection.normalize_points(K, uv0)
    x1 = projection.normalize_points(K, uv1)
    f = 0.5 * (K[0, 0] + K[1, 1])
    thr = threshold_px / f          # pixel threshold in normalized units
    thr2 = thr * thr
    maskf = mask.astype(dtype)

    # --- Hypothesis sampling: inverse-CDF over the valid prefix-sum ---------
    # Each of the H*8 draws is uniform over the VALID correspondences:
    # u ~ U[0, num_valid), idx = first position whose running valid-count
    # exceeds u. Binary search over the monotone cumsum (searchsorted) costs
    # ~log2(N) gathers — measured ~8x cheaper in-program than the previous
    # Gumbel-top-8 over an (H, N) perturbation matrix. Draws within one
    # hypothesis are independent, so a hypothesis can repeat a row
    # (probability ~8^2/2/num_valid); a degenerate sample just wastes one of
    # the H hypotheses, which MAGSAC-style scoring absorbs. Precondition:
    # num_valid >= 8 — with fewer valid rows EVERY hypothesis is rank-
    # deficient and only the min_inliers check rejects the result (callers
    # gate on match counts / `ok` before trusting the pose).
    csum = jnp.cumsum(mask.astype(jnp.int32))
    num_valid = csum[-1]
    u = jax.random.uniform(key, (num_hypotheses, 8), dtype)
    targets = (u * num_valid.astype(dtype)).astype(jnp.int32)
    sample_idx = jnp.searchsorted(csum, targets + 1, side='left')
    sample_idx = jnp.clip(sample_idx, 0, N - 1)    # (H, 8)

    sx0 = x0[sample_idx]                           # (H, 8, 2)
    sx1 = x1[sample_idx]
    ones8 = jnp.ones((num_hypotheses, 8), dtype)

    Es = jax.vmap(_fit_eight_point)(sx0, sx1, ones8)   # (H,3,3)

    # --- Scoring: truncated squared Sampson error (MSAC/MAGSAC-style) -------
    errs = jax.vmap(_sampson_error_sq, in_axes=(0, None, None))(Es, x0, x1)
    errs = jnp.where(mask[None, :], errs, thr2)    # padded entries contribute cap
    scores = jnp.sum(jnp.minimum(errs, thr2), axis=1)

    # --- Multi-start local optimization ------------------------------------
    # The truncated-Sampson HYPOTHESIS score cannot reliably separate the
    # true pose from a degenerate basin on forward-motion / distant-point
    # geometry (a wrong-t solution keeps most far points under threshold;
    # the epipolar constraint is necessary, not sufficient), so the single
    # best-scoring hypothesis is sometimes the wrong basin even on
    # zero-noise data. Recovery:
    #   * polish the TOP-S hypotheses in parallel (decompose + cheirality
    #     vote + geometric GN each, all vmapped — same serial latency as
    #     one start), plus one forward-motion prior start (R=I, t=+z: the
    #     dominant automotive basin; harmless elsewhere because selection
    #     rejects it when wrong);
    #   * select by truncated cost PLUS a cheirality penalty — an epipolar
    #     inlier whose midpoint triangulation lands behind either camera
    #     counts as a full outlier. This separates the twisted-pair /
    #     rotated solutions that tie on pure epipolar inlier count.
    S = 6
    _, top_i = jax.lax.top_k(-scores, S)
    E_cands = Es[top_i]                                     # (S,3,3)

    def init_one(E):
        e2b = _sampson_error_sq(E, x0, x1)
        w = maskf * (e2b < thr2).astype(dtype)
        Rs, ts = decompose_essential(E)
        votes = _cheirality_votes(K, Rs, ts, uv0, uv1, w)
        pick = jnp.argmax(votes)
        return Rs[pick], ts[pick]

    R0s, t0s = jax.vmap(init_one)(E_cands)
    R0s = jnp.concatenate([R0s, jnp.eye(3, dtype=dtype)[None]])
    t0s = jnp.concatenate([t0s, jnp.array([[0.0, 0.0, 1.0]], dtype)])

    def recover_one(R, t):
        R, t = refine_pose_sampson(x0, x1, maskf, R, t, thr2, refine_iters)
        e2 = _sampson_error_sq(_hat(t) @ R, x0, x1)
        inl_w = maskf * (e2 < thr2).astype(dtype)
        cheir = _cheirality_votes(K, R[None], t[None], uv0, uv1, inl_w)[0]
        cost = jnp.sum(jnp.minimum(jnp.where(mask, e2, thr2), thr2)) \
            + thr2 * (jnp.sum(inl_w) - cheir)
        return R, t, cost

    R_s, t_s, cost_s = jax.vmap(recover_one)(R0s, t0s)
    best = jnp.argmin(cost_s)
    R, t = R_s[best], t_s[best]
    E = _hat(t) @ R

    e2 = _sampson_error_sq(E, x0, x1)
    inliers = mask & (e2 < thr2)
    num_inliers = jnp.sum(inliers.astype(jnp.int32))
    # Re-vote the t sign at the polished pose (the sign is free in E).
    votes2 = _cheirality_votes(K, jnp.stack([R, R]), jnp.stack([t, -t]),
                               uv0, uv1, inliers.astype(dtype))
    t = jnp.where(votes2[1] > votes2[0], -t, t)
    ok = num_inliers >= min_inliers
    return EssentialResult(R=R, t=t, E=E, inliers=inliers,
                           num_inliers=num_inliers, ok=ok)


def mask_filter(uv0, uv1, pair_mask, inliers):
    """`pose_estimator_mask_filter` equivalent (`slam_core.cpp:152-163`):
    keep only RANSAC-inlier correspondences. Fixed shape: returns the combined
    boolean mask instead of compacting."""
    return pair_mask & inliers


def adjust_translation_magnitude(t: jnp.ndarray, gt_t_prev: jnp.ndarray,
                                 gt_t_cur: jnp.ndarray) -> jnp.ndarray:
    """Monocular scale from GT translation norm.

    Reference `adjust_translation_magnitude` (`slam_core.cpp:165-171`), called
    at bootstrap (`thread_pool.cpp:39`) — flag-gated GT leak kept for parity.
    """
    scale = jnp.linalg.norm(gt_t_cur - gt_t_prev)
    return t * scale / jnp.maximum(jnp.linalg.norm(t), 1e-12)


# Full-f32 matmul precision (ops/precision.py): the bf16 TPU matmul default
# is unit-scale-model-path-only; on pixel/metre-scale geometry it injects
# ~4e-3 relative noise, measured as a ~0.7 px floor on exact-input
# triangulation before the round-3 fix.
from ..ops.precision import f32 as _precision_f32  # noqa: E402

for _name in ("estimate_essential", "refine_pose_sampson", "decompose_essential", "mask_filter", "adjust_translation_magnitude",):
    globals()[_name] = _precision_f32(globals()[_name])
del _name
