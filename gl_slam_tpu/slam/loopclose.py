"""Loop closing: detection + pose-graph optimization + map correction.

The reference declares this stage but never built it —
`/root/reference/include/core/loop_closing.h` is an empty placeholder (C21),
and its g2o snapshot (`Old/mult_img_recoverpose_single_ba:251-326`) shows the
intended pose-graph shape; BASELINE configs[4] names "pose-graph/global BA
refinement" explicitly. TPU-native design:

  * detection: descriptor matching of the current frame against a strided
    subsample of OLD map points (one MXU matmul) -> observer-keyframe vote ->
    PnP RANSAC against the old points for a verified absolute pose;
  * pose-graph: sequential odometry edges + the loop edge, optimized by
    matrix-free Gauss-Newton/CG (ops/optim.py) over left se(3) increments —
    fixed iterations, no data-dependent control flow;
  * correction: each map point moves rigidly with the keyframe that created
    it (pts_first_kf), the standard pose-graph map update.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SLAMConfig
from ..geometry import pnp, se3
from ..ops import match as match_ops
from ..ops import optim
from .state import MapState


class LoopDetection(NamedTuple):
    ok: jnp.ndarray          # () bool
    loop_kf: jnp.ndarray     # () int32 — the revisited keyframe
    R: jnp.ndarray           # absolute pose of the current frame vs old map
    t: jnp.ndarray
    num_inliers: jnp.ndarray
    # Keyframe count at detection time: lagged consumers (the chunked
    # driver reads `ok` one check interval later) attach the loop edge to
    # the keyframe that was current WHEN the detection ran, not to
    # whatever is newest at application time.
    cur_kf: jnp.ndarray = jnp.zeros((), jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "min_gap", "max_candidates"))
def detect_loop(cfg: SLAMConfig, K: jnp.ndarray, mstate: MapState,
                f, key: jnp.ndarray, min_gap: int = 50,
                max_candidates: int = 8192,
                min_inliers: int = 30) -> LoopDetection:
    """Match the current frame against old map points; verify the candidate
    with covisibility consistency, then with PnP.

    Covisibility-consistency verification (the check ORB-SLAM-style systems
    run on detection candidates; the reference's K1/K2 covisibility
    machinery is the graph being consulted, `slam_core.cpp:1149-1232`):
    descriptor hits vote for the keyframe that last observed each hit
    point; a TRUE revisit concentrates its votes on one keyframe plus its
    covisibility neighbourhood (and temporal neighbours), while aliased
    matches against repetitive structure scatter votes across unrelated
    keyframes. The candidate is rejected unless its neighbourhood holds a
    `loop_consistency_frac` share of all votes, and only
    neighbourhood-consistent hits feed the PnP verification — so a few
    aliased 3D points cannot steer the pose even when the vote passes."""
    Pmax = mstate.capacity_pts
    Kmax = mstate.capacity_kf
    i32 = jnp.int32
    cur_kf = mstate.num_kf

    old = (mstate.pts_valid & ~mstate.pts_bad
           & (mstate.pts_last_kf < cur_kf - min_gap)
           & (mstate.pts_last_kf >= 0))
    # Strided subsample to a fixed candidate budget (loops share hundreds of
    # points; a 1/stride sample keeps plenty of hits)
    stride = max(Pmax // max_candidates, 1)
    cand = jnp.arange(0, Pmax, stride, dtype=i32)[:max_candidates]
    cmask = old[cand]

    desc = mstate.pts_desc[cand].astype(f.desc.dtype)
    m = match_ops.mutual_nn_match(desc, cmask, f.desc, f.valid,
                                  min_score=cfg.frontend.map_match_threshold)
    hit = m.matches0 >= 0

    # Vote for the revisited keyframe (last observer of each hit point)
    votes_kf = jnp.where(hit, mstate.pts_last_kf[cand], Kmax)
    hist = jnp.zeros((Kmax,), i32).at[votes_kf].add(1, mode='drop')
    loop_kf = jnp.argmax(hist).astype(i32)

    # Covisibility neighbourhood of the candidate: itself + its top-C covis
    # neighbours + immediate temporal neighbours (the frames around the
    # revisited one share its scene even when covis edges are sparse).
    nbrs = mstate.covis_nbr[jnp.clip(loop_kf, 0, Kmax - 1)]       # (C,)
    nb = jnp.zeros((Kmax,), bool)
    nb = nb.at[jnp.where(nbrs >= 0, nbrs, Kmax)].set(True, mode='drop')
    temporal = loop_kf + jnp.arange(-2, 3, dtype=i32)
    nb = nb.at[jnp.where((temporal >= 0) & (temporal < cur_kf),
                         temporal, Kmax)].set(True, mode='drop')
    consistent = hit & nb[jnp.clip(votes_kf, 0, Kmax - 1)]
    n_hits = jnp.sum(hit.astype(i32))
    n_cons = jnp.sum(consistent.astype(i32))
    rt = cfg.runtime
    vote_ok = ((n_hits >= rt.loop_min_votes)
               & (n_cons.astype(jnp.float32)
                  >= rt.loop_consistency_frac * n_hits.astype(jnp.float32)))

    # PnP against the neighbourhood-consistent old points only
    pts = mstate.pts_xyz[cand]
    uv = f.kpts[jnp.clip(m.matches0, 0, f.kpts.shape[0] - 1)]
    res = pnp.solve_pnp_ransac(K, pts, uv, consistent, key,
                               threshold_px=cfg.geometry.pnp_threshold_px,
                               num_hypotheses=cfg.geometry.pnp_hypotheses,
                               min_inliers=min_inliers)
    return LoopDetection(ok=res.ok & vote_ok, loop_kf=loop_kf, R=res.R,
                         t=res.t, num_inliers=res.num_inliers,
                         cur_kf=cur_kf)


def _edge_residual(Rs, ts, i, j, Zr, Zt, w):
    """Residual of edge Z_ij ~ T_j o T_i^{-1} (6-dim, weighted)."""
    Ri, ti = Rs[i], ts[i]
    Rj, tj = Rs[j], ts[j]
    Rp = Zr @ Ri
    tp = Zr @ ti + Zt
    r_rot = se3.log_so3(Rj @ Rp.T)
    r_t = tj - tp
    return w * jnp.concatenate([r_rot, r_t])


@partial(jax.jit, static_argnames=("gn_iters", "cg_iters"))
def optimize_pose_graph(kf_R: jnp.ndarray, kf_t: jnp.ndarray,
                        edge_i: jnp.ndarray, edge_j: jnp.ndarray,
                        edge_Zr: jnp.ndarray, edge_Zt: jnp.ndarray,
                        edge_w: jnp.ndarray,
                        fixed_mask: jnp.ndarray,
                        gn_iters: int = 8, cg_iters: int = 64):
    """Optimize keyframe poses over relative-pose edges.

    kf_R/kf_t: (C,3,3)/(C,3); edges: (E,) endpoint indices + measured
    relative transforms Z (x_j = Zr x_i + Zt) + weights (0 masks an edge);
    fixed_mask: (C,) poses held constant (gauge). Returns (R, t, cost)."""
    C = kf_R.shape[0]
    free = 1.0 - fixed_mask.astype(jnp.float32)

    def apply_increment(params):
        w, dt = params
        w = w * free[:, None]
        dt = dt * free[:, None]
        dR = se3.exp_so3_batched(w)
        R = dR @ kf_R
        t = jnp.einsum('cij,cj->ci', dR, kf_t) + dt
        return R, t

    def residuals(params):
        R, t = apply_increment(params)
        return jax.vmap(_edge_residual,
                        in_axes=(None, None, 0, 0, 0, 0, 0))(
            R, t, edge_i, edge_j, edge_Zr, edge_Zt, edge_w).reshape(-1)

    params0 = (jnp.zeros((C, 3), jnp.float32), jnp.zeros((C, 3), jnp.float32))
    params, cost = optim.gauss_newton_cg(residuals, params0,
                                         gn_iters=gn_iters,
                                         cg_iters=cg_iters)
    R, t = apply_increment(params)
    return R, t, cost


@partial(jax.jit, static_argnames=())
def apply_pose_graph_correction(mstate: MapState, new_R: jnp.ndarray,
                                new_t: jnp.ndarray) -> MapState:
    """Write corrected poses and move each map point rigidly with the
    keyframe that created it (pts_first_kf anchor)."""
    Kmax = mstate.capacity_kf
    kf_sel = jnp.arange(Kmax) < mstate.num_kf
    old_R = mstate.kf_R
    old_t = mstate.kf_t
    kf_R = jnp.where(kf_sel[:, None, None], new_R, old_R)
    kf_t = jnp.where(kf_sel[:, None], new_t, old_t)

    # Per-keyframe rigid delta dT = T_new^{-1} ... point correction:
    # X' = R_new^T (R_old X + t_old - t_new) for the anchor keyframe —
    # i.e. keep each point's coordinates in its anchor camera frame.
    anchor = jnp.clip(mstate.pts_first_kf, 0, Kmax - 1)
    Ra_old = old_R[anchor]
    ta_old = old_t[anchor]
    Ra_new = kf_R[anchor]
    ta_new = kf_t[anchor]
    pc = jnp.einsum('pij,pj->pi', Ra_old, mstate.pts_xyz) + ta_old
    Xn = jnp.einsum('pji,pj->pi', Ra_new, pc - ta_new)
    pt_sel = mstate.pts_valid & (mstate.pts_first_kf >= 0)
    pts_xyz = jnp.where(pt_sel[:, None], Xn, mstate.pts_xyz)
    return mstate._replace(kf_R=kf_R, kf_t=kf_t, pts_xyz=pts_xyz)


def close_loop(cfg: SLAMConfig, K, state, det: LoopDetection,
               max_graph_kf: int, target_kf: int | None = None):
    """Host-orchestrated loop closure: build the edge list (sequential
    odometry edges from the current trajectory + the verified loop edge),
    run the pose-graph solve over the last `max_graph_kf` keyframes, and
    apply the correction. Returns the updated TrackState.

    `target_kf`: global index of the keyframe the absolute loop
    measurement belongs to — the frame detect_loop matched (det.cur_kf-1
    when consumed with a lag, slam/chunk_driver.py). None = the newest
    keyframe (immediate, per-frame pipeline)."""
    import numpy as np

    mstate = state.map
    num_kf = int(mstate.num_kf)
    C = min(num_kf, max_graph_kf)
    first = num_kf - C
    R = jnp.asarray(np.asarray(mstate.kf_R[first:first + C]))
    t = jnp.asarray(np.asarray(mstate.kf_t[first:first + C]))

    # Sequential odometry edges from current estimates
    ei = jnp.arange(C - 1, dtype=jnp.int32)
    ej = ei + 1
    Zr = jnp.einsum('eij,ekj->eik', R[1:], R[:-1])          # R_j R_i^T
    Zt = t[1:] - jnp.einsum('eij,ej->ei', Zr, t[:-1])
    # Loop edge: absolute pose measurement on the LAST keyframe expressed as
    # an edge from the revisited keyframe. If the revisited keyframe is OLDER
    # than the graph window, the edge re-anchors to node 0 instead: node 0 is
    # gauge-FIXED (like every pre-window keyframe, which the optimization
    # leaves untouched), and because the measurement below is recomputed
    # from the anchor's current pose (Z = T_meas o T_anchor^{-1}), an edge
    # from ANY fixed node enforces the same absolute target pose on the last
    # keyframe — the constraint is preserved, not mis-attached
    # (tests/test_loopclose.py::test_loop_closure_out_of_window).
    lk = int(det.loop_kf) - first
    if lk < 0:
        lk = 0
    tgt = C - 1 if target_kf is None else \
        min(max(int(target_kf) - first, 0), C - 1)
    Zr_loop = (det.R @ R[lk].T)[None]
    Zt_loop = (det.t - jnp.einsum('ij,j->i', det.R @ R[lk].T, t[lk]))[None]
    edge_i = jnp.concatenate([ei, jnp.asarray([lk], jnp.int32)])
    edge_j = jnp.concatenate([ej, jnp.asarray([tgt], jnp.int32)])
    edge_Zr = jnp.concatenate([Zr, Zr_loop])
    edge_Zt = jnp.concatenate([Zt, Zt_loop])
    # Loop edge weighted strongly; odometry edges 1.0
    edge_w = jnp.concatenate([jnp.ones((C - 1,)), jnp.asarray([4.0])])
    fixed = jnp.zeros((C,), bool).at[0].set(True)

    Rn, tn, cost = optimize_pose_graph(R, t, edge_i, edge_j, edge_Zr,
                                       edge_Zt, edge_w, fixed)
    full_R = mstate.kf_R.at[first:first + C].set(Rn)
    full_t = mstate.kf_t.at[first:first + C].set(tn)
    new_map = apply_pose_graph_correction(mstate, full_R, full_t)
    last = new_map.num_kf - 1
    return state._replace(
        map=new_map,
        R_cur=new_map.kf_R[jnp.clip(last, 0, new_map.capacity_kf - 1)],
        t_cur=new_map.kf_t[jnp.clip(last, 0, new_map.capacity_kf - 1)])


# Full-f32 matmul precision (ops/precision.py): BA Jacobian/Hessian algebra
# and pose-graph/SE3 corrections run on metre/pixel-scale data; the bf16 TPU
# matmul default degrades the normal equations and every rigid correction.
from ..ops.precision import f32 as _precision_f32  # noqa: E402

for _name in ("detect_loop", "close_loop", "optimize_pose_graph", "apply_pose_graph_correction",):
    globals()[_name] = _precision_f32(globals()[_name])
del _name
