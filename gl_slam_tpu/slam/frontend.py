"""The jitted tracking step — bootstrap + steady-state frontend.

TPU-native replacement for the reference's tracking thread
(`/root/reference/src/threading/thread_pool.cpp:12-340`): the per-frame
pipeline of match -> essential/recoverPose -> pose chaining -> 3D-2D
association -> pose-only BA -> triangulation of leftovers -> keyframe +
map-point insertion, compiled as ONE fixed-shape XLA program (`track_step`)
plus one for two-view initialization (`bootstrap_step`, mirroring
`thread_pool.cpp:12-46`). No data-dependent shapes: matches are index arrays
with -1 sentinels, inlier sets are boolean masks, and map updates are
fixed-capacity scatters (state.py).

The front-end model (feature extraction) is deliberately OUTSIDE this step:
any extractor producing (keypoints, descriptors, valid) plugs in — learned
(models/superpoint.py), classical (models/classical.py) or oracle
(io/synthetic.py), exactly like the reference's interchangeable
SuperPoint-result structs (`src/core/slam_core.cpp:514-525`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SLAMConfig
from ..geometry import essential, pnp, projection, triangulation
from ..ops import match as match_ops
from . import pose_ba, reobserve
from .state import MapState, init_map_state, insert_keyframe


class FrameFeatures(NamedTuple):
    """Fixed-shape extractor output for one frame."""
    kpts: jnp.ndarray    # (N,2) float32 pixels
    desc: jnp.ndarray    # (N,D) unit-norm
    valid: jnp.ndarray   # (N,) bool
    frame_idx: jnp.ndarray  # () int32


class TrackState(NamedTuple):
    map: MapState
    prev_kpts: jnp.ndarray
    prev_desc: jnp.ndarray
    prev_valid: jnp.ndarray
    R_cur: jnp.ndarray   # pose of the latest keyframe (world->cam)
    t_cur: jnp.ndarray
    t_rel_norm: jnp.ndarray  # latest inter-frame translation magnitude
    key: jnp.ndarray
    # (N,P,P) image patches around the previous keyframe's keypoints —
    # carried only when pair-conditioned sub-pixel refinement is active
    # (models/subpix.PairSubpixHead); None otherwise (an empty pytree leaf,
    # so all existing carries/donations are unaffected).
    prev_patches: jnp.ndarray | None = None
    # Previous relative motion (post-LM), for the constant-velocity pose
    # start: on rotation-heavy motion the essential estimate can land in
    # the forward-motion rotation/translation ambiguity valley (~3 deg off
    # with a perfect t direction) where the Cauchy pose-LM saturates; the
    # constant-velocity start is within the convergence basin whenever the
    # motion is smooth. None (manual construction) disables the start.
    R_rel: jnp.ndarray | None = None
    t_rel: jnp.ndarray | None = None


class TrackOutputs(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    num_matches: jnp.ndarray
    num_inliers: jnp.ndarray
    num_map_matches: jnp.ndarray
    num_new_points: jnp.ndarray
    pose_cost: jnp.ndarray
    frame_ok: jnp.ndarray  # () bool — frame accepted as keyframe
    # Triangulation-gate observability (§5.5): how many new-point candidates
    # entered (rest pairs) and how many survived cheirality+depth and the
    # reprojection gate — localizes map starvation without a re-run.
    num_rest: jnp.ndarray = jnp.zeros((), jnp.int32)
    num_tri_cheir: jnp.ndarray = jnp.zeros((), jnp.int32)
    num_tri_reproj: jnp.ndarray = jnp.zeros((), jnp.int32)
    # Association-source observability: accepted 3D-2D associations from the
    # prev-frame index (a), the map-window synthetic pass (b), the
    # covisibility synthetic pass (c), and how many the post-solve
    # reprojection gate then dropped — localizes re-association starvation
    # (the round-3 flagship failure mode) without a re-run.
    num_assoc_prev: jnp.ndarray = jnp.zeros((), jnp.int32)
    num_assoc_window: jnp.ndarray = jnp.zeros((), jnp.int32)
    num_assoc_covis: jnp.ndarray = jnp.zeros((), jnp.int32)
    num_assoc_gated: jnp.ndarray = jnp.zeros((), jnp.int32)
    # Scale-chain observability: the LM-step magnitude and the map-depth
    # median-ratio scale used for new-point triangulation (frontend step 6)
    dbg_s_lm: jnp.ndarray = jnp.zeros((), jnp.float32)
    dbg_s_med: jnp.ndarray = jnp.zeros((), jnp.float32)
    # Pre-gate association reprojection split by point age (old = BA-aged,
    # age >= pose_young_age): localizes WHICH generation disagrees with the
    # solved pose when the map turns inconsistent
    dbg_err_old: jnp.ndarray = jnp.zeros((), jnp.float32)
    dbg_err_young: jnp.ndarray = jnp.zeros((), jnp.float32)
    dbg_n_old: jnp.ndarray = jnp.zeros((), jnp.int32)
    # Soft-trust decision (step 5c): False = the LM pose was replaced by
    # the odometry fallback
    dbg_soft_ok: jnp.ndarray = jnp.asarray(True)
    dbg_step_ratio: jnp.ndarray = jnp.zeros((), jnp.float32)


def init_track_state(cfg: SLAMConfig, key: jnp.ndarray,
                     patch: int | None = None) -> TrackState:
    """`patch`: side of the carried prev-frame patches — set to the
    PairSubpixHead patch size when pair-conditioned refinement is active."""
    N = cfg.frontend.max_keypoints
    D = cfg.frontend.descriptor_dim
    m = init_map_state(cfg.map.max_keyframes, cfg.map.max_points, N, D,
                       cfg.map.max_obs_per_point,
                       desc_dtype=jnp.dtype(cfg.map.desc_dtype),
                       loop_db=min(cfg.map.loop_db_keypoints, N))
    f32 = jnp.float32
    return TrackState(
        map=m,
        prev_kpts=jnp.zeros((N, 2), f32),
        prev_desc=jnp.zeros((N, D), f32),
        prev_valid=jnp.zeros((N,), bool),
        R_cur=jnp.eye(3, dtype=f32),
        t_cur=jnp.zeros((3,), f32),
        t_rel_norm=jnp.ones((), f32),
        key=key,
        prev_patches=None if patch is None
        else jnp.zeros((N, patch, patch), f32),
        R_rel=jnp.eye(3, dtype=f32),
        t_rel=jnp.zeros((3,), f32),
    )


@partial(jax.jit, static_argnames=("cfg",))
def bootstrap_step(cfg: SLAMConfig, K: jnp.ndarray, state: TrackState,
                   f0: FrameFeatures, f1: FrameFeatures,
                   gt_scale: jnp.ndarray,
                   matches: match_ops.MatchResult | None = None,
                   patches1: jnp.ndarray | None = None,
                   ) -> tuple[TrackState, TrackOutputs]:
    """Two-view initialization (`thread_pool.cpp:12-46`): match, essential +
    recoverPose, GT-scale injection (parity flag), triangulate at the 0.5 px
    bootstrap threshold, insert keyframes 0 and 1. `matches`: optional
    precomputed f0<->f1 match result (the reference bootstraps with LightGlue
    too, thread_pool.cpp:27); None = mutual-NN."""
    g = cfg.geometry
    key, k_ess = jax.random.split(state.key)

    if matches is None:
        m = match_ops.mutual_nn_match(f0.desc, f0.valid, f1.desc, f1.valid)
    else:
        m = matches
    pair = match_ops.score_filter(m.matches0, m.mscores0,
                                  cfg.frontend.match_threshold)
    uv0, uv1, pair = match_ops.gather_matched(f0.kpts, f1.kpts, m.matches0,
                                              pair)
    ess = essential.estimate_essential(
        K, uv0, uv1, pair, k_ess,
        threshold_px=g.essential_threshold_px,
        num_hypotheses=g.essential_hypotheses,
        refine_iters=g.essential_refine_iters)
    t_scaled = ess.t * gt_scale  # |t|=1 from recoverPose; scale injected

    R0 = jnp.eye(3, dtype=jnp.float32)
    t0 = jnp.zeros((3,), jnp.float32)
    inl = pair & ess.inliers
    tri = triangulation.triangulate(
        K, R0, t0, ess.R, t_scaled, uv0, uv1, mask=inl,
        max_depth=g.max_depth,
        max_reproj_px=g.triangulation_reproj_bootstrap_px,
        min_parallax_deg=g.min_parallax_deg)

    N = f0.kpts.shape[0]
    no_reobs = jnp.full((N,), -1, jnp.int32)
    no_new = jnp.zeros((N, 3), jnp.float32)
    no_valid = jnp.zeros((N,), bool)
    mstate = insert_keyframe(
        state.map, R0, t0, f0.frame_idx, f0.kpts, f0.desc, f0.valid,
        no_reobs, no_new, no_valid, jnp.full((N,), -1, jnp.int32),
        jnp.full((N,), -1, jnp.int32), jnp.asarray(-1, jnp.int32),
        covis_threshold=cfg.map.covis_edge_threshold)
    mstate = insert_keyframe(
        mstate, ess.R, t_scaled, f1.frame_idx, f1.kpts, f1.desc, f1.valid,
        no_reobs, tri.points, tri.valid, m.matches0,
        jnp.arange(N, dtype=jnp.int32), jnp.asarray(0, jnp.int32),
        covis_threshold=cfg.map.covis_edge_threshold)

    new_state = TrackState(
        map=mstate, prev_kpts=f1.kpts, prev_desc=f1.desc,
        prev_valid=f1.valid, R_cur=ess.R, t_cur=t_scaled,
        t_rel_norm=jnp.linalg.norm(t_scaled), key=key,
        prev_patches=state.prev_patches if patches1 is None else patches1,
        R_rel=None if state.R_rel is None else ess.R,
        t_rel=None if state.t_rel is None else t_scaled)
    out = TrackOutputs(
        R=ess.R, t=t_scaled,
        num_matches=jnp.sum(pair.astype(jnp.int32)),
        num_inliers=ess.num_inliers,
        num_map_matches=jnp.zeros((), jnp.int32),
        num_new_points=jnp.sum(tri.valid.astype(jnp.int32)),
        pose_cost=jnp.zeros((), jnp.float32),
        frame_ok=jnp.asarray(True))
    return new_state, out


def track_step_impl(cfg: SLAMConfig, K: jnp.ndarray, state: TrackState,
                    f: FrameFeatures,
                    matches: match_ops.MatchResult | None = None,
                    matcher=None,
                    ess_result: essential.EssentialResult | None = None,
                    accept_gate: jnp.ndarray | None = None,
                    patches: jnp.ndarray | None = None,
                    ) -> tuple[TrackState, TrackOutputs]:
    """Steady-state per-frame tracking (`thread_pool.cpp:72-340`).

    `matches`: optional precomputed prev<->cur match result (e.g. from the
    learned LightGlue matcher); when None the built-in mutual-NN matcher
    runs on the descriptors.

    `ess_result`: optional precomputed essential/recoverPose result for the
    prev<->cur pair (slam/fused.py batches pass-1 matching AND the essential
    RANSAC across the whole chunk — both depend only on consecutive-frame
    features, so hoisting them out of the sequential scan turns T serial
    matcher+RANSAC programs into one batched one). Must correspond to
    `matches`; ignored in PnP mode.

    `accept_gate`: optional () bool ANDed into the frame acceptance gate —
    the caller can invalidate a frame whose precomputed pass-1 inputs turned
    out stale (slam/fused.py's recovery-free prologue mode).

    `matcher`: optional learned matcher closure used for the 2nd and 3rd
    matching passes (map-window re-observation and covisibility retrieval) —
    the reference runs LightGlue on BOTH synthetic keypoint sets
    (`thread_pool.cpp:110,140`; `slam_core.cpp:527`). None = mutual-NN.

    Un-jitted entry: call this from inside an enclosing jit (slam/fused.py);
    `track_step` below is the jitted standalone version.
    """
    g = cfg.geometry
    N = f.kpts.shape[0]
    i32 = jnp.int32
    key, k_ess, k_pnp = jax.random.split(state.key, 3)
    mstate = state.map
    prev_kf = mstate.num_kf - 1
    use_pnp = cfg.runtime.tracker == "pnp"

    # --- 1. match prev keyframe <-> current frame ------------------------
    if matches is None:
        m = match_ops.mutual_nn_match(state.prev_desc, state.prev_valid,
                                      f.desc, f.valid)
    else:
        m = matches
    pair = match_ops.score_filter(m.matches0, m.mscores0,
                                  cfg.frontend.match_threshold)
    uv0, uv1, pair = match_ops.gather_matched(state.prev_kpts, f.kpts,
                                              m.matches0, pair)

    # --- 2. map re-observation via the last-W-keyframes window -----------
    # (`get_matches_from_previous_frames`, slam_core.cpp:428-541).
    # In merged mode this pass is folded into ONE unified synthetic pass
    # with the covisibility retrieval (after the pose prediction exists).
    merged_reobs = cfg.map.reobs_mode == "merged"
    batched_reobs = cfg.map.reobs_mode == "batched"
    if not merged_reobs and not batched_reobs:
        reob = reobserve.match_map_window(cfg, K, mstate, state.R_cur,
                                          state.t_cur, f, m.matches0, pair,
                                          matcher=matcher)

    # --- 3. essential + pose chaining -------------------------------------
    if use_pnp:
        # PnP mode (`run_pnp`) predicts from the previous pose; no two-view
        # geometry needed for the pose itself.
        R_pred, t_pred = state.R_cur, state.t_cur
        geom_inliers = pair
        geom_num_inliers = jnp.sum(pair.astype(i32))
        geom_ok = jnp.asarray(True)
        R_chain = jnp.eye(3, dtype=jnp.float32)
    else:
        ess = ess_result if ess_result is not None else \
            essential.estimate_essential(
                K, uv0, uv1, pair, k_ess,
                threshold_px=g.essential_threshold_px,
                num_hypotheses=g.essential_hypotheses,
                refine_iters=g.essential_refine_iters)
        # Chain: T_cur = T_rel o T_prev, translation initialized with
        # constant-velocity magnitude (pose-only BA below resolves the true
        # scale against the map, as in the reference where recoverPose's
        # unit t is corrected by Ceres pose BA, thread_pool.cpp:124-195).
        # se3.chain_relative (not inline @): pose algebra must run at full
        # f32 matmul precision (ops/precision.py) — bf16 3x3 matvecs on
        # O(10-100) translations add decimetre noise per frame.
        from ..geometry import se3 as se3_mod
        t_rel = ess.t * state.t_rel_norm
        R_pred, t_pred = se3_mod.chain_relative(state.R_cur, state.t_cur,
                                                ess.R, t_rel)
        geom_inliers = ess.inliers
        geom_num_inliers = ess.num_inliers
        geom_ok = ess.ok
        R_chain = ess.R

    # --- 4. 3D-2D association --------------------------------------------
    # Source (a): matched prev keypoints that already carry a map point.
    prev_kp2mp = mstate.kf_kp2mp[jnp.clip(prev_kf, 0, mstate.capacity_kf - 1)]
    inl_pair = pair & geom_inliers
    mp_prev = jnp.where(inl_pair, prev_kp2mp, -1)              # (N,) by prev row
    mp_bad = mstate.pts_bad[jnp.clip(mp_prev, 0, mstate.capacity_pts - 1)]
    mp_prev = jnp.where((mp_prev >= 0) & ~mp_bad, mp_prev, -1)
    # Scatter onto current-frame keypoint rows
    cur_rows = jnp.where(mp_prev >= 0, m.matches0, N)
    reobs_mpid = jnp.full((N,), -1, i32).at[cur_rows].set(mp_prev,
                                                          mode='drop')
    n_assoc_a = jnp.sum((reobs_mpid >= 0).astype(i32))
    if merged_reobs:
        # Sources (b)+(c) merged: one unified synthetic pass over the
        # window ∪ covisibility candidate pool at the predicted pose
        # (cfg.map.reobs_mode — saves a full matcher pass per frame)
        uni = reobserve.match_unified(cfg, K, mstate, R_pred, t_pred, f,
                                      seed_mpid=reobs_mpid,
                                      matcher=matcher)
        reobs_mpid = jnp.where(reobs_mpid >= 0, reobs_mpid, uni.reobs_mpid)
        n_assoc_b = jnp.sum((reobs_mpid >= 0).astype(i32)) - n_assoc_a
        n_assoc_c = jnp.zeros((), i32)
    elif batched_reobs:
        # Sources (b)+(c) as ONE batch-2 matcher call over both synthetic
        # sets (reobserve.match_batched): both passes keep their own
        # candidate pools and projection poses, but run as a single
        # vmapped attention program — half the serial matcher chains per
        # frame vs "separate" (the covis pool no longer excludes window
        # hits; the merge keeps window priority).
        both = reobserve.match_batched(cfg, K, mstate, state.R_cur,
                                       state.t_cur, R_pred, t_pred, f,
                                       seed_mpid=reobs_mpid,
                                       matcher=matcher)
        reobs_mpid = jnp.where(reobs_mpid >= 0, reobs_mpid,
                               both.reobs_mpid)
        n_assoc_b = jnp.sum((reobs_mpid >= 0).astype(i32)) - n_assoc_a
        n_assoc_c = jnp.zeros((), i32)
    else:
        # Source (b): map-window re-observations (where no source-(a) hit)
        reobs_mpid = jnp.where(reobs_mpid >= 0, reobs_mpid, reob.reobs_mpid)
        n_assoc_b = jnp.sum((reobs_mpid >= 0).astype(i32)) - n_assoc_a

        # Source (c): covisibility retrieval at the predicted pose
        # (`get_covisible_keyframes` + `project_mpids_to_current` + third
        # LightGlue pass, thread_pool.cpp:135-147)
        if cfg.map.use_covis_retrieval:
            cov = reobserve.match_covisible(cfg, K, mstate, R_pred, t_pred,
                                            f, seed_mpid=reobs_mpid,
                                            already_mpid=reobs_mpid,
                                            matcher=matcher)
            reobs_mpid = jnp.where(reobs_mpid >= 0, reobs_mpid,
                                   cov.reobs_mpid)
        n_assoc_c = (jnp.sum((reobs_mpid >= 0).astype(i32))
                     - n_assoc_a - n_assoc_b)

    # --- 5. pose solve -------------------------------------------------------
    has3d = reobs_mpid >= 0
    p3d = mstate.pts_xyz[jnp.clip(reobs_mpid, 0, mstate.capacity_pts - 1)]
    run_pose_ba = cfg.runtime.run_pose_ba
    # Age-based confidence (cfg.ba.pose_young_age/weight): points created
    # within the last BA period carry unrefined depths — see BAConfig.
    if cfg.ba.pose_young_weight < 1.0:
        first_seen = mstate.pts_first_kf[
            jnp.clip(reobs_mpid, 0, mstate.capacity_pts - 1)]
        age = mstate.num_kf - first_seen
        pt_w = jnp.where(age >= cfg.ba.pose_young_age, 1.0,
                         cfg.ba.pose_young_weight)
    else:
        pt_w = None
    if use_pnp:
        # Alternate tracking entry (C20, `run_pnp` slam_core.cpp:543-691):
        # absolute pose from PnP RANSAC on the 3D-2D set, inlier-filtered,
        # then the pose-only LM polish (C12).
        pr = pnp.solve_pnp_ransac(
            K, p3d, f.kpts, has3d, k_pnp,
            threshold_px=g.pnp_threshold_px,
            num_hypotheses=g.pnp_hypotheses)
        reobs_mpid = jnp.where(pr.inliers, reobs_mpid, -1)
        has3d = reobs_mpid >= 0
        R_init, t_init = pr.R, pr.t
    else:
        R_init, t_init = R_pred, t_pred
    if run_pose_ba:
        # run_pose_ba flag parity (`slam_types.cpp:14` gating the per-frame
        # Ceres pose-only BA): off -> the predicted/PnP pose is used as-is.
        # THREE vmapped starts: the essential-chained prediction, the
        # previous pose (constant-position), and the constant-velocity
        # extrapolation. A bad essential basin (the two-view ambiguity on
        # forward/distant geometry) puts the prediction ~3-5 deg off, where
        # the Cauchy loss saturates (~18 px residuals -> near-zero
        # gradients) and LM stalls at the bad init; the previous-pose start
        # recovers low-motion frames and the constant-velocity start
        # recovers smooth rotation-heavy frames (a circular path turns
        # ~4.5 deg/frame — constant-position is then itself outside the
        # basin). Lowest final robust cost wins; the extra starts ride the
        # same vmap (width, not latency).
        if state.R_rel is not None:
            from ..geometry import se3 as se3_cv
            R_cv, t_cv = se3_cv.chain_relative(state.R_cur, state.t_cur,
                                               state.R_rel, state.t_rel)
            starts_R = jnp.stack([R_init, state.R_cur, R_cv])
            starts_t = jnp.stack([t_init, state.t_cur, t_cv])
        else:
            starts_R = jnp.stack([R_init, state.R_cur])
            starts_t = jnp.stack([t_init, state.t_cur])
        # Shared while_loop over the starts (pose_ba.pose_only_ba_multi):
        # bit-identical to vmap(pose_only_ba) but the LM budget tail after
        # ALL starts have converged/stalled is skipped on-device — the
        # scan's serial latency chain loses ~2/3 of its pose-solve cost on
        # smooth motion.
        pb = pose_ba.pose_only_ba_multi(
            K, starts_R, starts_t, p3d, f.kpts, has3d,
            iters=cfg.ba.pose_only_iters,
            cauchy_scale=cfg.ba.pose_only_cauchy_scale,
            coarse_iters=cfg.ba.pose_only_coarse_iters,
            coarse_scale_mult=cfg.ba.pose_only_coarse_mult,
            point_weights=pt_w)
        best = jnp.argmin(pb.final_cost)
        R_cur, t_cur = pb.R[best], pb.t[best]
        pose_cost = pb.final_cost[best]
    else:
        R_cur, t_cur = R_init, t_init
        pose_cost = jnp.zeros((), jnp.float32)

    # --- 5b. association reprojection gate + pose re-polish -----------------
    # (cfg.geometry.reobs_max_reproj_px) Wrong-landmark matches — the
    # matcher's precision floor, ~5-12% of score-passing matches at flagship
    # shapes (scripts/diag_frontend_accuracy.py) — reproject tens of px off
    # at the solved pose while true re-observations sit well under the
    # threshold. Dropping them HERE keeps them out of the observation ring
    # (they would otherwise bias the window BA until post-BA culling, and a
    # re-observed wrong id also refreshes pts_last_kf, keeping the bad
    # association alive in the re-obs window). The pose is then re-polished
    # on the surviving inlier set from the already-solved pose (cheap: one
    # non-vmapped short LM).
    n_assoc_pre_gate = jnp.sum(has3d.astype(i32))
    dbg_err_old = jnp.zeros((), jnp.float32)
    dbg_err_young = jnp.zeros((), jnp.float32)
    dbg_n_old = jnp.zeros((), i32)
    if cfg.geometry.reobs_max_reproj_px > 0:
        uv_p, _, front_p = projection.project(K, R_cur, t_cur, p3d)
        err2 = jnp.sum((uv_p - f.kpts) ** 2, axis=-1)
        # Age-split mean reprojection error (debug observability only)
        age_d = mstate.num_kf - mstate.pts_first_kf[
            jnp.clip(reobs_mpid, 0, mstate.capacity_pts - 1)]
        old_m = has3d & (age_d >= cfg.ba.pose_young_age)
        young_m = has3d & (age_d < cfg.ba.pose_young_age)
        err_d = jnp.sqrt(err2)
        dbg_n_old = jnp.sum(old_m.astype(i32))
        dbg_err_old = (jnp.sum(jnp.where(old_m, err_d, 0.0))
                       / jnp.maximum(dbg_n_old, 1))
        dbg_err_young = (jnp.sum(jnp.where(young_m, err_d, 0.0))
                         / jnp.maximum(jnp.sum(young_m.astype(i32)), 1))
        thr2 = cfg.geometry.reobs_max_reproj_px ** 2
        assoc_ok = has3d & front_p & (err2 < thr2)
        reobs_mpid = jnp.where(assoc_ok, reobs_mpid, -1)
        has3d = reobs_mpid >= 0
        if run_pose_ba and cfg.geometry.gate_refine_iters > 0:
            pb2 = pose_ba.pose_only_ba(
                K, R_cur, t_cur, p3d, f.kpts, has3d,
                iters=cfg.geometry.gate_refine_iters,
                cauchy_scale=cfg.ba.pose_only_cauchy_scale,
                point_weights=pt_w)
            R_cur, t_cur, pose_cost = pb2.R, pb2.t, pb2.final_cost

    # --- 5c. soft trust decision + odometry fallback -----------------------
    # (cfg.runtime.soft_reject_fallback) Decide whether the map-anchored LM
    # pose is trustworthy; if not, fall back to the essential-chained
    # odometry prediction so the frame can still be inserted (the reference
    # inserts EVERY frame regardless of pose quality, thread_pool.cpp:237 —
    # freezing instead leaves the state unable to ever rebuild the map).
    n_3d = jnp.sum(has3d.astype(i32))
    soft_ok = n_3d >= 6
    if run_pose_ba:
        # Pose-quality gate (cfg.runtime.pose_accept_mean_cost): LM stalled
        # / wrong associations — Cauchy rho saturates ~ log(1+r^2), so a
        # threshold ~3 flags >4 px mean misfit. inf = off.
        mean_rho = pose_cost / jnp.maximum(n_3d.astype(jnp.float32), 1.0)
        soft_ok = soft_ok & (mean_rho < cfg.runtime.pose_accept_mean_cost)
    # Constant-velocity step sanity: a solved step wildly off the carried
    # magnitude is an excursion (two-view scale is unobservable; the only
    # anchor is the map, which just failed to hold it).
    dbg_ratio = jnp.zeros((), jnp.float32)
    if not use_pnp and cfg.runtime.pose_step_max_ratio > 1.0:
        rr = cfg.runtime.pose_step_max_ratio
        with jax.default_matmul_precision("float32"):
            step_lm = jnp.linalg.norm(
                t_cur - (R_cur @ state.R_cur.T) @ state.t_cur)
        ratio = step_lm / jnp.maximum(state.t_rel_norm, 1e-3)
        dbg_ratio = ratio
        soft_ok = soft_ok & (ratio < rr) & (ratio > 1.0 / rr)
    if not use_pnp and cfg.runtime.soft_reject_fallback:
        R_cur = jnp.where(soft_ok, R_cur, R_pred)
        t_cur = jnp.where(soft_ok, t_cur, t_pred)

    # --- 5d. SO(3) re-orthonormalization (round-4 stability fix) ----------
    # The pose reaching here is a product chain of f32 rotations (essential
    # chain, multi-start LM, carried R_rel). The constant-velocity start is
    # R_rel @ R_cur with R_rel = R_cur R_prev^T — THREE factors carrying the
    # current deformation — so whenever that start wins (smooth sustained
    # rotation: nearly every frame on a circle) the departure from SO(3)
    # TRIPLES per frame: measured 1e-6 -> 2.7e-3 within 40 frames on the
    # zero-noise circle. A 2.7e-3-deformed R breaks the R^{-1}=R^T identity
    # by |t| * 2.7e-3 — at 55 m from the origin that is a phantom 0.15 m in
    # every step-magnitude measurement, which poisoned the triangulation
    # scale chain (s_lm) and ran the map into the association gate. One
    # 3x3 SVD projection per frame resets the deformation to roundoff. The
    # reference orthonormalizes too (ProjectToSO3, slam_core.cpp:885-897).
    from ..geometry import se3 as se3_proj
    R_cur = se3_proj.project_to_so3(R_cur)

    # --- 6. triangulate leftover inlier pairs ------------------------------
    # (restPairs: essential inliers whose prev keypoint has no map point and
    #  whose cur keypoint got no re-observation)
    cur_idx = jnp.clip(m.matches0, 0, N - 1)
    is_rest = inl_pair & (prev_kp2mp < 0) & (reobs_mpid[cur_idx] < 0)
    R_prev = mstate.kf_R[jnp.clip(prev_kf, 0, mstate.capacity_kf - 1)]
    t_prev = mstate.kf_t[jnp.clip(prev_kf, 0, mstate.capacity_kf - 1)]
    if use_pnp:
        tri = triangulation.triangulate(
            K, R_prev, t_prev, R_cur, t_cur, uv0, uv1, mask=is_rest,
            max_depth=g.max_depth, max_reproj_px=g.triangulation_reproj_px,
            min_parallax_deg=g.min_parallax_deg)
        tri_pts = tri.points
        _, z0d, f0d = projection.project(K, R_prev, t_prev, tri_pts)
        _, _, f1d = projection.project(K, R_cur, t_cur, tri_pts)
        tri_cheir = is_rest & f0d & f1d & (z0d < g.max_depth)
    else:
        # PAIR-FRAME triangulation (round-3 stability fix): triangulating
        # between the two MAP-CHAIN poses couples new-point creation to
        # their relative-pose consistency — under near-forward motion the
        # map-fitted LM pose wiggles ~0.1-0.3 deg relative to the true
        # epipolar geometry (invisible to the map cost, fatal to a px-level
        # two-view gate: 0.1 deg ~ 1.3 px at f=720), which starved the map
        # on every pose excursion and never let it rebuild. Instead the
        # pair is triangulated in its OWN frame — camera-prev at the
        # origin, camera-cur at the essential-estimated relative pose
        # (epipolar-consistent with these exact matches by construction) —
        # so the gate measures MATCH quality, not pose-chain consistency.
        # The accepted points are then anchored to the SOLVED current pose.
        eye3 = jnp.eye(3, dtype=jnp.float32)
        zero3 = jnp.zeros((3,), jnp.float32)
        with jax.default_matmul_precision("float32"):
            R_rel_lm = R_cur @ R_prev.T
            s_lm = jnp.linalg.norm(t_cur - R_rel_lm @ t_prev)
        s_step = s_lm
        t_rel_e = ess.t * s_step
        tri = triangulation.triangulate(
            K, eye3, zero3, ess.R, t_rel_e, uv0, uv1, mask=is_rest,
            max_depth=g.max_depth, max_reproj_px=g.triangulation_reproj_px,
            min_parallax_deg=g.min_parallax_deg)
        # Pair frame -> world via the solved current pose:
        # X_camcur = R_e X_pair + t_e ; X_w = R_cur^T (X_camcur - t_cur)
        with jax.default_matmul_precision("float32"):
            x_cc = tri.points @ ess.R.T + t_rel_e
            tri_pts = (x_cc - t_cur) @ R_cur
        tri = tri._replace(points=tri_pts)
        _, z0d, f0d = projection.project(K, R_prev, t_prev, tri_pts)
        _, _, f1d = projection.project(K, R_cur, t_cur, tri_pts)
        tri_cheir = is_rest & f0d & f1d & (z0d < g.max_depth)
    # Gate survival counts (cheap scalars; see TrackOutputs docstring)
    tri_reproj = tri_cheir & (tri.errors <= g.triangulation_reproj_px)

    # --- 7. frame acceptance gate ------------------------------------------
    # HARD gate only: degenerate two-view geometry (essential failed) or
    # stale prologue inputs mean the frame carries no usable information —
    # the reference's cerr+continue paths (slam_core.cpp:558-562,
    # thread_pool.cpp:103-106). Soft pose-quality failures were handled in
    # step 5c (odometry fallback) when soft_reject_fallback is on; with it
    # off they reject here (the pre-round-3 behavior). Computed BEFORE
    # insertion so the map update is gated at the scatter level
    # (insert_keyframe(enabled=...)) instead of a whole-map old-vs-new
    # `jnp.where` — at flagship shapes that select read+wrote ~90 MB of HBM
    # per frame and broke XLA's in-place aliasing of the map buffers.
    frame_ok = geom_ok
    if use_pnp or not cfg.runtime.soft_reject_fallback:
        frame_ok = frame_ok & soft_ok
    if accept_gate is not None:
        frame_ok = frame_ok & accept_gate
    if use_pnp:
        frame_ok = frame_ok & pr.ok
    if not cfg.runtime.every_frame_keyframe:
        # Keyframe motion filter (`thread_pool.cpp:205-209`): the reference
        # computes it, then overrides `skip=false` (:237) so every frame is a
        # keyframe; with the override disabled, low-motion frames are skipped.
        from ..geometry import se3 as se3_mod
        with jax.default_matmul_precision("float32"):
            t_rel_mag = jnp.linalg.norm(t_cur - R_chain @ state.t_cur)
        rot_deg = se3_mod.rotation_angle_deg(R_chain)
        frame_ok = frame_ok & ((t_rel_mag > cfg.runtime.gt_mag_filter)
                               | (rot_deg > cfg.runtime.gt_rot_filter))

    # --- 8. keyframe + map insertion (gated) ---------------------------------
    # (`skip=false` override, thread_pool.cpp:237 — every frame is a keyframe)
    mstate = insert_keyframe(
        mstate, R_cur, t_cur, f.frame_idx, f.kpts, f.desc, f.valid,
        reobs_mpid, tri.points, tri.valid, m.matches0,
        jnp.arange(N, dtype=i32), prev_kf,
        covis_threshold=cfg.map.covis_edge_threshold,
        enabled=frame_ok)

    with jax.default_matmul_precision("float32"):
        t_rel_post = t_cur - R_chain @ state.t_cur
        # Post-LM relative motion for the next frame's const-velocity start
        R_rel_post = R_cur @ state.R_cur.T
        t_rel_cv = t_cur - R_rel_post @ state.t_cur
    sel = lambda new, old: jnp.where(frame_ok, new, old)
    new_state = TrackState(
        map=mstate,
        prev_kpts=sel(f.kpts, state.prev_kpts),
        prev_desc=sel(f.desc, state.prev_desc),
        prev_valid=sel(f.valid, state.prev_valid),
        R_cur=sel(R_cur, state.R_cur),
        t_cur=sel(t_cur, state.t_cur),
        t_rel_norm=sel(jnp.clip(jnp.linalg.norm(t_rel_post), 1e-3, 10.0),
                       state.t_rel_norm),
        key=key,
        prev_patches=None if patches is None or state.prev_patches is None
        else sel(patches, state.prev_patches),
        R_rel=None if state.R_rel is None else sel(R_rel_post, state.R_rel),
        t_rel=None if state.t_rel is None else sel(t_rel_cv, state.t_rel))

    out = TrackOutputs(
        R=new_state.R_cur, t=new_state.t_cur,
        num_matches=jnp.sum(pair.astype(i32)),
        num_inliers=geom_num_inliers,
        num_map_matches=n_3d,
        num_new_points=jnp.where(
            frame_ok, jnp.sum(tri.valid.astype(i32)), 0),
        pose_cost=pose_cost,
        frame_ok=frame_ok,
        num_rest=jnp.sum(is_rest.astype(i32)),
        num_tri_cheir=jnp.sum(tri_cheir.astype(i32)),
        num_tri_reproj=jnp.sum(tri_reproj.astype(i32)),
        num_assoc_prev=n_assoc_a,
        num_assoc_window=n_assoc_b,
        num_assoc_covis=n_assoc_c,
        num_assoc_gated=n_assoc_pre_gate - n_3d,
        dbg_s_lm=jnp.zeros(()) if use_pnp else s_lm,
        dbg_s_med=jnp.zeros(()) if use_pnp else s_step,
        dbg_err_old=dbg_err_old, dbg_err_young=dbg_err_young,
        dbg_n_old=dbg_n_old, dbg_soft_ok=soft_ok, dbg_step_ratio=dbg_ratio)
    return new_state, out


track_step = partial(jax.jit, static_argnames=("cfg", "matcher"))(
    track_step_impl)
