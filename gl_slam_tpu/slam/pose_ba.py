"""Pose-only bundle adjustment: 6-DoF Levenberg-Marquardt, fully in-register.

Replaces the reference's Ceres pose-only BA (`PoseOnlyReprojectionError` +
`pose_only_ba`, `/root/reference/src/core/slam_core.cpp:1043-1140`:
DENSE_SCHUR with CUDA dense algebra, <=30 iters, Cauchy(1.0), points held
fixed). On TPU the whole solve is a tiny fixed-iteration LM loop over a 6x6
normal-equation system — it lives INSIDE the jitted tracking step, no
separate solver library, no host round-trip (SURVEY.md C12).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import projection, se3
from ..ops import smallmat


class PoseBAResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    final_cost: jnp.ndarray
    num_used: jnp.ndarray


def _residuals_jacobian(K, R, t, pts, uv):
    """Pixel-space residuals (N,2) and Jacobian wrt left se(3) incr (N,2,6)."""
    fx, fy = K[0, 0], K[1, 1]
    pc = pts @ R.T + t
    z = jnp.maximum(pc[:, 2], 1e-6)
    inv_z = 1.0 / z
    u = fx * pc[:, 0] * inv_z + K[0, 2]
    v = fy * pc[:, 1] * inv_z + K[1, 2]
    r = jnp.stack([u, v], axis=1) - uv                     # (N,2)
    # d(uv)/d(pc)
    J_pc = jnp.stack([
        jnp.stack([fx * inv_z, jnp.zeros_like(z),
                   -fx * pc[:, 0] * inv_z ** 2], axis=1),
        jnp.stack([jnp.zeros_like(z), fy * inv_z,
                   -fy * pc[:, 1] * inv_z ** 2], axis=1),
    ], axis=1)                                             # (N,2,3)
    hat_pc = jax.vmap(se3.hat)(pc)
    J_xi = jnp.concatenate(
        [-hat_pc, jnp.broadcast_to(jnp.eye(3, dtype=pts.dtype), hat_pc.shape)],
        axis=2)                                            # (N,3,6)
    J = J_pc @ J_xi                                        # (N,2,6)
    behind = (pc[:, 2] <= 1e-6)
    return r, J, behind


def pose_only_ba(K: jnp.ndarray, R0: jnp.ndarray, t0: jnp.ndarray,
                 pts_w: jnp.ndarray, uv: jnp.ndarray, mask: jnp.ndarray,
                 iters: int = 30, cauchy_scale: float = 1.0,
                 lm_lambda_init: float = 1e-4,
                 coarse_iters: int = 0,
                 coarse_scale_mult: float = 8.0,
                 point_weights: jnp.ndarray | None = None) -> PoseBAResult:
    """Refine (R0,t0) against fixed 3D points by robust LM.

    pts_w: (N,3) world points; uv: (N,2) pixel observations; mask: (N,) valid.
    Fixed `iters` LM steps with accept/reject damping — compiles to a single
    unrolled/scanned program, no data-dependent trip count.

    `point_weights`: optional (N,) per-point confidence multiplied into the
    robust weights AND the reported cost. Used to down-weight map points
    whose depths have not yet been BA-refined (slam/frontend.py step 5): at
    every-frame keyframing a chunk's fresh points otherwise dominate the
    solve, closing a positive feedback loop (LM step sets fresh depths,
    fresh depths set the next LM step) that compounds scale drift between
    BA passes.

    `coarse_iters` > 0 prepends a robust-scale ANNEALING stage: that many LM
    iterations at `cauchy_scale * coarse_scale_mult` before the fine stage.
    At Cauchy(1.0) a ~3-5 deg pose error puts most residuals deep in the
    saturated tail (rho' ~ c^2/r^2 -> near-zero gradients) and LM stalls at
    the bad init; the widened first stage keeps those residuals inside the
    quadratic region so the pose is pulled back, then the fine stage
    restores the reference's Cauchy(1.0) outlier rejection
    (`slam_core.cpp:1115`). `final_cost` is always evaluated at the FINE
    scale, so multi-start selection stays comparable."""
    dtype = jnp.float32
    pts_w = pts_w.astype(dtype)
    uv = uv.astype(dtype)
    maskf = mask.astype(dtype)
    if point_weights is not None:
        maskf = maskf * point_weights.astype(dtype)

    if coarse_iters > 0:
        coarse = pose_only_ba(K, R0, t0, pts_w, uv, mask,
                              iters=coarse_iters,
                              cauchy_scale=cauchy_scale * coarse_scale_mult,
                              lm_lambda_init=lm_lambda_init,
                              point_weights=point_weights)
        R0, t0 = coarse.R, coarse.t

    def cost_of(R, t):
        r, _, behind = _residuals_jacobian(K, R, t, pts_w, uv)
        r2 = jnp.sum(r * r, axis=1)
        c2 = cauchy_scale * cauchy_scale
        rho = c2 * jnp.log1p(r2 / c2)
        rho = jnp.where(behind, c2 * 10.0, rho)
        return jnp.sum(maskf * rho)

    def inner(carry):
        R, t, lam, cost, stall = carry
        r, J, behind = _residuals_jacobian(K, R, t, pts_w, uv)
        r2 = jnp.sum(r * r, axis=1)
        w = projection.cauchy_weight(r2, cauchy_scale) * maskf
        w = jnp.where(behind, 0.0, w)
        Jw = J * w[:, None, None]
        H = jnp.einsum('nij,nik->jk', Jw, J)
        g = jnp.einsum('nij,ni->j', Jw, r)
        H_damped = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6, dtype=dtype)
        dx = -smallmat.cholesky_solve(H_damped, g)
        dR = se3.exp_so3(dx[:3])
        R_new = dR @ R
        t_new = dR @ t + dx[3:]
        new_cost = cost_of(R_new, t_new)
        accept = new_cost < cost
        improved = accept & (cost - new_cost > 1e-5 * cost)
        stall = jnp.where(improved, 0, stall + 1)
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, lam * 0.1, lam * 10.0)
        lam = jnp.clip(lam, 1e-9, 1e6)
        return (R, t, lam, cost, stall)

    def step(carry, _):
        # Early convergence (Ceres-style function tolerance): converged
        # iterations skip the residual/Jacobian work via lax.cond — the
        # reference's <=30 is a cap, Ceres stops early too. (Under vmap the
        # cond lowers to select and simply runs the full budget.)
        done = carry[4] >= 2
        return jax.lax.cond(done, lambda c: c, inner, carry), None

    R0 = R0.astype(dtype)
    t0 = t0.astype(dtype)
    init_cost = cost_of(R0, t0)
    (R, t, _, cost, _), _ = jax.lax.scan(
        step, (R0, t0, jnp.asarray(lm_lambda_init, dtype), init_cost,
               jnp.zeros((), jnp.int32)),
        None, length=iters)
    return PoseBAResult(R=R, t=t, final_cost=cost,
                        num_used=jnp.sum(mask.astype(jnp.int32)))


def pose_only_ba_multi(K: jnp.ndarray, R0s: jnp.ndarray, t0s: jnp.ndarray,
                       pts_w: jnp.ndarray, uv: jnp.ndarray,
                       mask: jnp.ndarray,
                       iters: int = 30, cauchy_scale: float = 1.0,
                       lm_lambda_init: float = 1e-4,
                       coarse_iters: int = 0,
                       coarse_scale_mult: float = 8.0,
                       point_weights: jnp.ndarray | None = None
                       ) -> PoseBAResult:
    """B-start pose LM with a SHARED early-exit while_loop.

    Bit-identical to `jax.vmap(pose_only_ba)` over the start axis — under
    vmap the per-iteration `lax.cond` early stop lowers to select, so a
    converged/stalled start is FROZEN (identity) yet every remaining
    iteration still executes its residual/Jacobian work for all starts.
    Here the same frozen-lane select runs inside one `lax.while_loop` whose
    condition is "any start still active", so once EVERY start has converged
    the
    remaining LM budget is skipped on-device entirely. On smooth motion the
    3-start frontend solve typically freezes in ~8-12 of its 30 iterations
    (scripts/profile_stages.py), and the tracking scan's serial latency is
    exactly what the round-2 roofline charges for it (BASELINE.md: the
    ~4.9 ms latency-bound geometry chain).

    R0s: (B,3,3); t0s: (B,3). Returns batched PoseBAResult (leading dim B).
    """
    dtype = jnp.float32
    pts_w = pts_w.astype(dtype)
    uv = uv.astype(dtype)
    maskf = mask.astype(dtype)
    if point_weights is not None:
        maskf = maskf * point_weights.astype(dtype)

    if coarse_iters > 0:
        coarse = pose_only_ba_multi(
            K, R0s, t0s, pts_w, uv, mask, iters=coarse_iters,
            cauchy_scale=cauchy_scale * coarse_scale_mult,
            lm_lambda_init=lm_lambda_init, point_weights=point_weights)
        R0s, t0s = coarse.R, coarse.t

    c2 = cauchy_scale * cauchy_scale

    def cost_of(R, t):
        r, _, behind = _residuals_jacobian(K, R, t, pts_w, uv)
        r2 = jnp.sum(r * r, axis=1)
        rho = c2 * jnp.log1p(r2 / c2)
        rho = jnp.where(behind, c2 * 10.0, rho)
        return jnp.sum(maskf * rho)

    def inner(R, t, lam, cost, stall):
        r, J, behind = _residuals_jacobian(K, R, t, pts_w, uv)
        r2 = jnp.sum(r * r, axis=1)
        w = projection.cauchy_weight(r2, cauchy_scale) * maskf
        w = jnp.where(behind, 0.0, w)
        Jw = J * w[:, None, None]
        H = jnp.einsum('nij,nik->jk', Jw, J)
        g = jnp.einsum('nij,ni->j', Jw, r)
        H_damped = (H + lam * jnp.diag(jnp.diag(H))
                    + 1e-9 * jnp.eye(6, dtype=dtype))
        dx = -smallmat.cholesky_solve(H_damped, g)
        dR = se3.exp_so3(dx[:3])
        R_new = dR @ R
        t_new = dR @ t + dx[3:]
        new_cost = cost_of(R_new, t_new)
        accept = new_cost < cost
        improved = accept & (cost - new_cost > 1e-5 * cost)
        stall = jnp.where(improved, 0, stall + 1)
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, lam * 0.1, lam * 10.0)
        lam = jnp.clip(lam, 1e-9, 1e6)
        return R, t, lam, cost, stall

    def lane(R, t, lam, cost, stall):
        # Frozen-lane select — the exact lowering vmap gives the scan+cond
        # version, preserving bit-identical per-lane trajectories.
        done = stall >= 2
        R_n, t_n, lam_n, cost_n, stall_n = inner(R, t, lam, cost, stall)
        pick = lambda a, b: jnp.where(done, a, b)
        return (pick(R, R_n), pick(t, t_n), pick(lam, lam_n),
                pick(cost, cost_n), pick(stall, stall_n))

    def cond(carry):
        it, _, _, _, _, stall = carry
        return (it < iters) & jnp.any(stall < 2)

    def body(carry):
        it, R, t, lam, cost, stall = carry
        R, t, lam, cost, stall = jax.vmap(lane)(R, t, lam, cost, stall)
        return (it + 1, R, t, lam, cost, stall)

    B = R0s.shape[0]
    R0s = R0s.astype(dtype)
    t0s = t0s.astype(dtype)
    init_cost = jax.vmap(cost_of)(R0s, t0s)
    carry = (jnp.zeros((), jnp.int32), R0s, t0s,
             jnp.full((B,), lm_lambda_init, dtype), init_cost,
             jnp.zeros((B,), jnp.int32))
    _, R, t, _, cost, _ = jax.lax.while_loop(cond, body, carry)
    n_used = jnp.sum(mask.astype(jnp.int32))
    return PoseBAResult(R=R, t=t, final_cost=cost,
                        num_used=jnp.broadcast_to(n_used, (B,)))


# Full-f32 matmul precision (ops/precision.py): the bf16 TPU matmul default
# is unit-scale-model-path-only; on pixel/metre-scale geometry it injects
# ~4e-3 relative noise, measured as a ~0.7 px floor on exact-input
# triangulation before the round-3 fix.
from ..ops.precision import f32 as _precision_f32  # noqa: E402

for _name in ("pose_only_ba", "pose_only_ba_multi"):
    globals()[_name] = _precision_f32(globals()[_name])
del _name
