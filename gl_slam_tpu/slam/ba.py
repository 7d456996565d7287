"""Sliding-window bundle adjustment: Schur-complement Levenberg-Marquardt.

TPU-native replacement for the reference's Ceres full BA
(`/root/reference/src/core/slam_core.cpp:744-883`: SPARSE_SCHUR +
CLUSTER_JACOBI, <=30 iters, Cauchy(1.0), window = last `run_window` keyframes
plus 3 overlap frames, first two cameras gauge-fixed `:829-838`, observations
outside the window skipped `:808`), its post-BA rigid-delta consistency pass
(`post_ba_map_update_for_new_keyframes` `:916-973`) and map-point culling
(`post_ba_map_point_culling` `:977-1038`).

TPU design: the window is tiny (<=16 cameras) so the reduced camera system is
a dense (6C x 6C) matrix — the right call is explicit Schur elimination with
BATCHED dense algebra, not a sparse solver port:

  * the observation table is the fixed (C x N) grid of window keypoint slots
    (every keypoint row of every window keyframe), so extraction needs NO
    compaction — invalid slots carry zero weight;
  * per-point 3x3 Hessian blocks invert in a single vmapped closed form;
  * the camera-point coupling W is accumulated by one segment-sum keyed on
    (point, camera), and S = Hcc - W Hpp^-1 W^T is one einsum;
  * the LM loop is a fixed-length `lax.scan` with accept/reject damping —
    30 iterations compile to one XLA program, zero host round-trips.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SLAMConfig
from ..geometry import projection, se3
from ..ops import select as select_ops
from ..ops import smallmat
from .state import MapState


class WindowProblem(NamedTuple):
    cam_ids: jnp.ndarray    # (C,) global keyframe ids (-1 pad)
    cam_mask: jnp.ndarray   # (C,) in-window
    cam_free: jnp.ndarray   # (C,) optimized (gauge: first two fixed)
    pt_ids: jnp.ndarray     # (P,) global map-point ids (-1 pad)
    pt_mask: jnp.ndarray    # (P,)
    # (P,) optimized: points created inside or shortly before the window
    # (pts_first_kf >= first_kf - ba.point_freeze_margin). Older points
    # participate as FIXED anchors — their residuals still constrain the
    # window cameras, but their positions do not move. Re-optimizing an old
    # point from only its few in-window observations (its full multi-view
    # support lies outside the window, slam_core.cpp:808 semantics) drags
    # the long-lived anchors onto the newest pose epoch each BA pass, which
    # ERASES the map's memory of the older consistent geometry — measured
    # on the zero-noise closed circle as BA making end-to-end drift ~7x
    # WORSE than no BA at all (scripts/diag_circle.py, round 4). The margin
    # keeps each point refinable across a couple of overlapping windows
    # (depth polish) before it locks as an anchor.
    pt_free: jnp.ndarray
    obs_cam: jnp.ndarray    # (M,) local camera index (M = C*N grid)
    obs_pt: jnp.ndarray     # (M,) local point index
    obs_uv: jnp.ndarray     # (M,2)
    obs_mask: jnp.ndarray   # (M,)
    # Gather-side view of the same observations, from the map's per-point
    # observation table: lets the LM iteration build point Hessians and the
    # camera-point coupling with GATHERS + dense one-hot einsums instead of
    # segment-sum scatters (TPU scatters measured ~10 ms/iter at window
    # shapes; the gather formulation is ~an order of magnitude cheaper).
    pt_obs_flat: jnp.ndarray  # (P,O) index into the (M,) obs rows, 0 if pad
    pt_obs_cam: jnp.ndarray   # (P,O) local camera id, -1 pad
    pt_obs_mask: jnp.ndarray  # (P,O)


def extract_window(cfg: SLAMConfig, mstate: MapState,
                   first_kf: jnp.ndarray,
                   window: jnp.ndarray) -> WindowProblem:
    """Gather the fixed-shape window problem from the map state."""
    C = cfg.ba.max_window_cameras
    P = cfg.ba.max_window_points
    N = mstate.kf_kpts.shape[1]
    Pmax = mstate.capacity_pts
    i32 = jnp.int32

    local = jnp.arange(C, dtype=i32)
    cam_ids = first_kf + local
    cam_mask = (local < window) & (cam_ids < mstate.num_kf)
    cam_ids_c = jnp.where(cam_mask, cam_ids, 0)
    # Gauge: hold the first two window cameras constant (slam_core.cpp:829-838)
    cam_free = cam_mask & (local >= cfg.ba.gauge_fixed_cameras)

    # Window points: every map point referenced by a window keyframe slot.
    rows_mp = mstate.kf_kp2mp[cam_ids_c]                       # (C,N)
    rows_mp = jnp.where(cam_mask[:, None], rows_mp, -1)
    member = jnp.zeros((Pmax,), bool).at[
        jnp.where(rows_mp >= 0, rows_mp, Pmax).reshape(-1)].set(
        True, mode='drop')
    member = member & mstate.pts_valid & ~mstate.pts_bad
    # Deterministic selection, smallest ids first — index-priority top_k
    # (ops/select.py; measured faster in-scan than the cumsum variants)
    pt_ids, pt_mask = select_ops.select_lowest_ids(member, P)
    g2l = jnp.full((Pmax + 1,), -1, i32).at[
        jnp.where(pt_mask, pt_ids, Pmax)].set(
        jnp.where(pt_mask, jnp.arange(P, dtype=i32), -1),
        mode='promise_in_bounds')

    # Observation grid: (C, N) keypoint slots flattened.
    obs_cam = jnp.repeat(jnp.arange(C, dtype=i32), N)
    mp = rows_mp.reshape(-1)
    lp = g2l[jnp.where(mp >= 0, mp, Pmax)]
    obs_uv = mstate.kf_kpts[cam_ids_c].reshape(-1, 2)
    obs_mask = (mp >= 0) & (lp >= 0) & cam_mask[obs_cam] \
        & mstate.kf_kp_valid[cam_ids_c].reshape(-1)

    # Per-point observation lists from the map's obs table (gather view).
    # Observations outside the window are masked, matching the reference's
    # window-scoped residual set (slam_core.cpp:808).
    O = mstate.pts_obs_kf.shape[1]
    ids_c = jnp.clip(pt_ids, 0, Pmax - 1)
    po_kf = mstate.pts_obs_kf[ids_c]                            # (P,O) global
    po_kp = mstate.pts_obs_kp[ids_c]                            # (P,O)
    po_local = po_kf - first_kf
    po_ok = pt_mask[:, None] & (po_kf >= 0) \
        & (po_local >= 0) & (po_local < C) & (po_local < window)
    po_local_c = jnp.clip(po_local, 0, C - 1)
    po_kp_c = jnp.clip(po_kp, 0, N - 1)
    pt_obs_flat = po_local_c * N + po_kp_c                      # index into M
    # Require agreement with the grid view (kp2mp may have been overwritten)
    po_ok = po_ok & (jnp.take(lp, pt_obs_flat)
                     == jnp.arange(P, dtype=i32)[:, None]) \
        & jnp.take(obs_mask, pt_obs_flat)
    # Enforce exact agreement in the other direction too: the grid may carry
    # an observation the table dropped (O-capacity overflow); the normal
    # equations need the two views identical. One scatter, once per ba_step.
    in_table = jnp.zeros((C * N,), bool).at[
        jnp.where(po_ok, pt_obs_flat, C * N).reshape(-1)].set(
        True, mode='drop')
    obs_mask = obs_mask & in_table
    pt_free = pt_mask & (mstate.pts_first_kf[
        jnp.clip(pt_ids, 0, Pmax - 1)]
        >= first_kf - cfg.ba.point_freeze_margin)
    return WindowProblem(cam_ids=jnp.where(cam_mask, cam_ids, -1),
                         cam_mask=cam_mask, cam_free=cam_free,
                         pt_ids=jnp.where(pt_mask, pt_ids, -1),
                         pt_mask=pt_mask, pt_free=pt_free,
                         obs_cam=obs_cam, obs_pt=jnp.clip(lp, 0, P - 1),
                         obs_uv=obs_uv, obs_mask=obs_mask,
                         pt_obs_flat=jnp.where(po_ok, pt_obs_flat, 0),
                         pt_obs_cam=jnp.where(po_ok, po_local_c, -1),
                         pt_obs_mask=po_ok)


def _residual_jacobians(K, R_all, t_all, X_all, prob: WindowProblem):
    """Residuals + camera/point Jacobians for every observation slot.

    Returns r (M,2), Jc (M,2,6), Jp (M,2,3), behind (M,)."""
    fx, fy = K[0, 0], K[1, 1]
    Ro = R_all[prob.obs_cam]                 # (M,3,3)
    to = t_all[prob.obs_cam]
    Xo = X_all[prob.obs_pt]
    pc = jnp.einsum('mij,mj->mi', Ro, Xo) + to
    z = jnp.maximum(pc[:, 2], 1e-6)
    inv_z = 1.0 / z
    u = fx * pc[:, 0] * inv_z + K[0, 2]
    v = fy * pc[:, 1] * inv_z + K[1, 2]
    r = jnp.stack([u, v], axis=1) - prob.obs_uv
    J_pc = jnp.stack([
        jnp.stack([fx * inv_z, jnp.zeros_like(z),
                   -fx * pc[:, 0] * inv_z ** 2], axis=1),
        jnp.stack([jnp.zeros_like(z), fy * inv_z,
                   -fy * pc[:, 1] * inv_z ** 2], axis=1),
    ], axis=1)                               # (M,2,3)
    hat_pc = jax.vmap(se3.hat)(pc)
    J_xi = jnp.concatenate([-hat_pc, jnp.broadcast_to(
        jnp.eye(3, dtype=pc.dtype), hat_pc.shape)], axis=2)  # (M,3,6)
    Jc = J_pc @ J_xi                          # (M,2,6)
    Jp = J_pc @ Ro                            # (M,2,3)
    behind = pc[:, 2] <= 1e-6
    return r, Jc, Jp, behind


def _robust_cost(r, behind, mask, cauchy_scale):
    r2 = jnp.sum(r * r, axis=1)
    c2 = cauchy_scale * cauchy_scale
    rho = c2 * jnp.log1p(r2 / c2)
    rho = jnp.where(behind, c2 * 10.0, rho)
    return jnp.sum(mask * rho)


def solve_window(cfg: SLAMConfig, K: jnp.ndarray,
                 R0: jnp.ndarray, t0: jnp.ndarray, X0: jnp.ndarray,
                 prob: WindowProblem):
    """LM with dense Schur elimination over the window problem.

    R0/t0: (C,3,3)/(C,3) initial window poses; X0: (P,3) initial points.
    Returns optimized (R, t, X, final_cost)."""
    C = R0.shape[0]
    P = X0.shape[0]
    dtype = jnp.float32
    cauchy = cfg.ba.full_ba_cauchy_scale
    maskf = prob.obs_mask.astype(dtype)
    free_cam = prob.cam_free.astype(dtype)
    pt_maskf = prob.pt_mask.astype(dtype)
    # Pre-window points are FIXED anchors (see WindowProblem.pt_free): their
    # point-side Jacobians are zeroed so they contribute residuals to the
    # camera system but never move themselves.
    pt_freef = (prob.pt_mask & prob.pt_free).astype(dtype)
    I6 = jnp.eye(6, dtype=dtype)
    I3 = jnp.eye(3, dtype=dtype)

    N = prob.obs_mask.shape[0] // C
    onehot_cam = (prob.pt_obs_cam[..., None]
                  == jnp.arange(C, dtype=jnp.int32)).astype(dtype)  # (P,O,C)

    def lm_inner(carry):
        R, t, X, lam, cost, stall = carry
        r, Jc, Jp, behind = _residual_jacobians(K, R, t, X, prob)
        r2 = jnp.sum(r * r, axis=1)
        w = projection.cauchy_weight(r2, cauchy) * maskf
        w = jnp.where(behind, 0.0, w)
        # Zero out fixed cameras' pose Jacobians (they stay constant)
        Jc = Jc * free_cam[prob.obs_cam][:, None, None]
        Jc_w = Jc * w[:, None, None]

        # Camera-side reductions: the obs set is the fixed (C,N) keypoint
        # grid, so "segment sum over camera" is a plain reshape + axis sum —
        # no scatter (TPU scatters were ~10 ms/iter at window shapes).
        Hcc = jnp.einsum('mij,mik->mjk', Jc_w, Jc).reshape(
            C, N, 6, 6).sum(axis=1)                                 # (C,6,6)
        gc = jnp.einsum('mij,mi->mj', Jc_w, r).reshape(
            C, N, 6).sum(axis=1)                                    # (C,6)

        # Point-side reductions: gather each point's <=O observations from
        # the flat grid (pt_obs_flat) and reduce densely over O; the
        # camera-point coupling W folds in a one-hot over the C axis.
        fo = prob.pt_obs_flat                                       # (P,O)
        w_o = jnp.take(w, fo) * prob.pt_obs_mask                    # (P,O)
        Jp_o = Jp[fo] * pt_freef[:, None, None, None]               # (P,O,2,3)
        Jc_o = Jc[fo]                                               # (P,O,2,6)
        r_o = r[fo]                                                 # (P,O,2)
        Jp_ow = Jp_o * w_o[..., None, None]
        Hpp = jnp.einsum('poij,poik->pjk', Jp_ow, Jp_o)             # (P,3,3)
        gp = jnp.einsum('poij,poi->pj', Jp_ow, r_o)                 # (P,3)
        W = jnp.einsum('poij,poik,poc->pcjk', Jc_o * w_o[..., None, None],
                       Jp_o, onehot_cam)                            # (P,C,6,3)

        # Damping
        Hcc_d = Hcc + lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hcc)) \
            + 1e-8 * I6
        # Fixed/padded cameras get identity blocks to keep S well posed
        fixed = (1.0 - free_cam)[:, None, None]
        Hcc_d = Hcc_d * (1.0 - fixed) + fixed * I6
        Hpp_d = Hpp + lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hpp)) \
            + 1e-8 * I3
        padp = (1.0 - pt_freef)[:, None, None]   # padded OR fixed -> I
        Hpp_d = Hpp_d * (1.0 - padp) + padp * I3
        Hpp_inv = smallmat.inv3x3(Hpp_d)                             # (P,3,3)

        # Schur complement S = Hcc - sum_p W_p Hpp^-1 W_p^T
        WHinv = jnp.einsum('pcij,pjk->pcik', W, Hpp_inv)             # (P,C,6,3)
        S_off = jnp.einsum('pcik,pdlk->cdil', WHinv, W)              # (C,C,6,6)
        S = -S_off
        S = S.at[jnp.arange(C), jnp.arange(C)].add(Hcc_d)
        S = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
        rhs = gc - jnp.einsum('pcik,pk->ci', WHinv, gp)              # (C,6)
        # Jacobi-scaled direct dense solve: plain f32 CG diverged on this
        # system (measured relative residuals > 1 — the Schur matrix mixes
        # rotation/translation scales by ~(depth)^2), and block-Jacobi PCG
        # at fixed iteration count loses accuracy that measurably hurts
        # downstream ATE. The C*6<=~200 LU costs ~1 ms — small next to the
        # Jacobian products.
        dxc = -smallmat.scaled_solve(S, rhs.reshape(C * 6)).reshape(C, 6)
        dxc = dxc * free_cam[:, None]
        # Back-substitute points
        rhs_p = gp + jnp.einsum('pcki,ck->pi', W, dxc)
        dxp = -jnp.einsum('pij,pj->pi', Hpp_inv, rhs_p) * pt_freef[:, None]

        dR = se3.exp_so3_batched(dxc[:, :3])
        R_new = dR @ R
        t_new = jnp.einsum('cij,cj->ci', dR, t) + dxc[:, 3:]
        X_new = X + dxp
        r_new, _, _, behind_new = _residual_jacobians(K, R_new, t_new, X_new,
                                                      prob)
        new_cost = _robust_cost(r_new, behind_new, maskf, cauchy)
        accept = new_cost < cost
        # Stall counter for early convergence: two consecutive iterations
        # with < 0.01% relative improvement end the solve (Ceres-style
        # function_tolerance; the reference's <=30 is a CAP, Ceres stops
        # early too).
        improved = accept & (cost - new_cost > cfg.ba.lm_rel_tol * cost)
        stall = jnp.where(improved, 0, stall + 1)
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        X = jnp.where(accept, X_new, X)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * cfg.ba.lm_lambda_down,
                                 lam * cfg.ba.lm_lambda_up), 1e-9, 1e8)
        return (R, t, X, lam, cost, stall)

    # Early stop via lax.while_loop: ONLY the taken iterations execute.
    # (The previous scan-over-cond layout still paid the cond's carry
    # select overhead on every skipped iteration — at a (P,3) point block
    # plus window poses that was ~0.3-0.6 ms x ~20 skipped iterations per
    # dispatch, i.e. the majority of ba_step's device time.)
    r0, _, _, behind0 = _residual_jacobians(K, R0, t0, X0, prob)
    cost0 = _robust_cost(r0, behind0, maskf, cauchy)
    init = (R0.astype(dtype), t0.astype(dtype), X0.astype(dtype),
            jnp.asarray(cfg.ba.lm_lambda_init, dtype), cost0,
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))

    def lm_cond(carry):
        it = carry[6]
        stall = carry[5]
        return (it < cfg.ba.full_ba_iters) & (stall < 2)

    def lm_body(carry):
        out = lm_inner(carry[:6])
        return out + (carry[6] + 1,)

    R, t, X, _, cost, _, _ = jax.lax.while_loop(lm_cond, lm_body, init)
    # Final residuals for the caller (culling reuses them instead of
    # re-gathering per-observation poses/keypoints from the map tables)
    r_fin, _, _, behind_fin = _residual_jacobians(K, R, t, X, prob)
    return R, t, X, cost, r_fin, behind_fin


def cull_points(cfg: SLAMConfig, mstate: MapState, first_kf: jnp.ndarray,
                prob: WindowProblem, r: jnp.ndarray,
                behind: jnp.ndarray) -> jnp.ndarray:
    """Post-BA map-point culling (`post_ba_map_point_culling`,
    slam_core.cpp:977-1038): for points FIRST seen in the window, mark bad if
    behind any observing camera, observed fewer than 3 times, or mean
    reprojection error exceeds 1.0 px. Returns updated pts_bad.

    Reuses the solver's final per-observation residuals (`r`, `behind` over
    the (C,N) window grid) via the problem's per-point observation gather —
    a point first seen in the window has all its observations inside the
    window, so no re-projection against the map tables is needed (that
    re-gather of (P,O) poses/keypoints was ~2 ms per ba_step)."""
    Pmax = mstate.capacity_pts
    ids = jnp.clip(prob.pt_ids, 0, Pmax - 1)
    in_window = prob.pt_mask & (mstate.pts_first_kf[ids] >= first_kf)

    fo = prob.pt_obs_flat                                    # (P,O)
    ok = prob.pt_obs_mask
    err = jnp.sqrt(jnp.sum(r ** 2, axis=1))[fo]              # (P,O)
    behind_any = jnp.any(ok & behind[fo], axis=1)
    n_obs = jnp.sum(ok.astype(jnp.int32), axis=1)
    mean_err = jnp.sum(jnp.where(ok, err, 0.0), axis=1) \
        / jnp.maximum(n_obs, 1)
    # obs<3 rule uses the TRUE observation count (the table is a ring over
    # the most recent O observations; pts_obs_cnt keeps the total)
    true_obs = mstate.pts_obs_cnt[ids]

    bad = in_window & (behind_any
                       | (true_obs < cfg.map.cull_min_obs)
                       | (mean_err > cfg.map.cull_max_reproj_px))
    tgt = jnp.where(prob.pt_mask, ids, Pmax)
    return mstate.pts_bad.at[tgt].max(bad, mode='drop')


def apply_rigid_delta(mstate: MapState, dR: jnp.ndarray, dt: jnp.ndarray,
                      kf_from: jnp.ndarray) -> MapState:
    """Post-BA consistency (`post_ba_map_update_for_new_keyframes`,
    slam_core.cpp:916-973): apply the SO3-projected rigid delta of the anchor
    keyframe to every keyframe id >= kf_from and every map point CREATED by
    one of those keyframes (pts_first_kf >= kf_from — creation keyframe, not
    slot id, because slot recycling reuses low ids for new points)."""
    Kmax = mstate.capacity_kf
    kf_sel = (jnp.arange(Kmax) >= kf_from) & (jnp.arange(Kmax) < mstate.num_kf)
    # Pose delta acts on world->camera poses as T_new = T_old o dT^{-1}:
    # the world frame of the new entities is realigned by dT.
    dRi, dti = se3.inverse(dR, dt)
    R_new = jnp.einsum('kij,jl->kil', mstate.kf_R, dRi)
    t_new = jnp.einsum('kij,j->ki', mstate.kf_R, dti) + mstate.kf_t
    kf_R = jnp.where(kf_sel[:, None, None], R_new, mstate.kf_R)
    kf_t = jnp.where(kf_sel[:, None], t_new, mstate.kf_t)

    pt_sel = (mstate.pts_first_kf >= kf_from) & mstate.pts_valid
    X_new = mstate.pts_xyz @ dR.T + dt
    pts_xyz = jnp.where(pt_sel[:, None], X_new, mstate.pts_xyz)
    return mstate._replace(kf_R=kf_R, kf_t=kf_t, pts_xyz=pts_xyz)


@jax.jit
def reconcile_async_ba(live: MapState, ba: MapState,
                       kf_from: jnp.ndarray,
                       pt_from: jnp.ndarray) -> MapState:
    """Merge an asynchronously-computed BA result into the live map.

    The reference's mapping thread optimizes a snapshot while tracking keeps
    inserting keyframes, then corrects the entities created mid-flight with
    the anchor keyframe's rigid delta (`post_ba_map_update_for_new_keyframes`
    slam_core.cpp:916-973 + correction lists thread_pool.cpp:328-331). Here:

      * entities that existed at snapshot time take the BA-optimized values;
      * entities created while BA was in flight keep their live values,
        realigned by the SO3-projected delta of the anchor (last snapshot)
        keyframe via apply_rigid_delta;
      * culling flags merge by OR — except on slots the live map recycled
        mid-flight (created_live), whose BA-side flags describe the DEAD
        previous occupant.

    "Created mid-flight" is detected by creation keyframe
    (pts_first_kf >= kf_from), not slot id: slot recycling can hand a
    mid-flight point a slot id < pt_from.

    kf_from/pt_from: the snapshot's num_kf / num_pts.
    """
    Kmax = live.capacity_kf
    anchor = jnp.clip(kf_from - 1, 0, Kmax - 1)
    dR, dt = se3.delta_pose(live.kf_R[anchor], live.kf_t[anchor],
                            ba.kf_R[anchor], ba.kf_t[anchor])
    kf_old = (jnp.arange(Kmax) < kf_from)
    created_live = live.pts_first_kf >= kf_from
    pt_old = (jnp.arange(live.capacity_pts) < pt_from) & ~created_live
    merged = live._replace(
        kf_R=jnp.where(kf_old[:, None, None], ba.kf_R, live.kf_R),
        kf_t=jnp.where(kf_old[:, None], ba.kf_t, live.kf_t),
        pts_xyz=jnp.where(pt_old[:, None], ba.pts_xyz, live.pts_xyz),
        pts_bad=jnp.where(created_live, live.pts_bad,
                          live.pts_bad | ba.pts_bad),
    )
    return apply_rigid_delta(merged, dR, dt, kf_from)


@partial(jax.jit, static_argnames=("cfg",))
def ba_step(cfg: SLAMConfig, K: jnp.ndarray, mstate: MapState,
            first_kf: jnp.ndarray, window: jnp.ndarray) -> MapState:
    """One full sliding-window BA pass: extract -> solve -> write back ->
    cull. The write-back under both locks in the reference
    (`slam_core.cpp:856-871`) is here just a functional state update."""
    prob = extract_window(cfg, mstate, first_kf, window)
    Kmax = mstate.capacity_kf
    Pmax = mstate.capacity_pts

    cam_idx = jnp.clip(prob.cam_ids, 0, Kmax - 1)
    R0 = mstate.kf_R[cam_idx]
    t0 = mstate.kf_t[cam_idx]
    X0 = mstate.pts_xyz[jnp.clip(prob.pt_ids, 0, Pmax - 1)]
    R, t, X, _, r_fin, behind_fin = solve_window(cfg, K, R0, t0, X0, prob)

    # Re-orthonormalize before write-back: the solved poses are chains of
    # f32 exp-map products; writing a deformed R into the map would seed
    # the per-frame product chains downstream (frontend step 5d).
    R = jax.vmap(se3.project_to_so3)(R)
    kf_tgt = jnp.where(prob.cam_mask & prob.cam_free, prob.cam_ids, Kmax)
    kf_R = mstate.kf_R.at[kf_tgt].set(R, mode='drop')
    kf_t = mstate.kf_t.at[kf_tgt].set(t, mode='drop')
    pt_tgt = jnp.where(prob.pt_mask, prob.pt_ids, Pmax)
    pts_xyz = mstate.pts_xyz.at[pt_tgt].set(X, mode='drop')
    mstate = mstate._replace(kf_R=kf_R, kf_t=kf_t, pts_xyz=pts_xyz)

    if cfg.map.cull_enabled:
        pts_bad = cull_points(cfg, mstate, first_kf, prob, r_fin,
                              behind_fin)
        mstate = mstate._replace(pts_bad=pts_bad)
    return mstate


# Full-f32 matmul precision (ops/precision.py): BA Jacobian/Hessian algebra
# and pose-graph/SE3 corrections run on metre/pixel-scale data; the bf16 TPU
# matmul default degrades the normal equations and every rigid correction.
from ..ops.precision import f32 as _precision_f32  # noqa: E402

for _name in ("extract_window", "solve_window", "cull_points", "apply_rigid_delta", "reconcile_async_ba", "ba_step",):
    globals()[_name] = _precision_f32(globals()[_name])
del _name
