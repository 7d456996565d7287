"""Map re-observation: synthetic-keypoint matching against the map.

TPU-native equivalent of `get_matches_from_previous_frames`
(`/root/reference/src/core/slam_core.cpp:428-541`): the reference projects
map points of the last 20 keyframes that are not yet observed in the previous
frame into the previous frame's pose, builds a *synthetic* SuperPoint result
carrying each point's latest descriptor, and runs LightGlue against the
current frame. Here the candidate gather is a masked top-k over the point
table (recency-prioritized), the projection is one batched op, and the match
is the same fixed-shape matcher used everywhere else — the "synthetic
keypoint set" trick maps 1:1 onto padded fixed-shape tensors.

Also hosts the covisibility-retrieval matcher (`get_covisible_keyframes` /
`project_mpids_to_current`, `slam_core.cpp:1149-1340`): seed points -> top-K1
observer keyframes -> covisibility neighbours -> candidate point set projected
into the *predicted current* pose, with the map-point id carried in an
explicit channel (the reference smuggles it through the scores field,
`slam_core.cpp:1331`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SLAMConfig
from ..geometry import projection
from ..ops import match as match_ops
from ..ops import select as select_ops
from .state import MapState


class ReobserveResult(NamedTuple):
    reobs_mpid: jnp.ndarray   # (N,) map-point id per CURRENT keypoint, -1
    num_candidates: jnp.ndarray


def _candidate_points(cfg: SLAMConfig, mstate: MapState,
                      min_last_kf: jnp.ndarray, max_last_kf: jnp.ndarray,
                      max_candidates: int):
    """Select up to `max_candidates` map points last observed in
    [min_last_kf, max_last_kf], newest-created first. Returns (ids, mask).

    Selection among the recency-window-eligible points is by creation
    order (point id), not by exact last-observation order: that makes it
    an index-priority top_k (ops/select.py; measured faster in-scan than
    cumsum+scatter), and on overflow it drops the oldest-created points —
    the same points the reference's backwards walk over recent keyframes
    reaches last (slam_core.cpp:437-541)."""
    eligible = (mstate.pts_valid & ~mstate.pts_bad
                & (mstate.pts_last_kf >= min_last_kf)
                & (mstate.pts_last_kf <= max_last_kf))
    return select_ops.select_newest_ids(eligible, max_candidates)


def match_map_window(cfg: SLAMConfig, K: jnp.ndarray, mstate: MapState,
                     R_prev: jnp.ndarray, t_prev: jnp.ndarray,
                     f, matches0_prev: jnp.ndarray,
                     pair_prev: jnp.ndarray,
                     matcher=None) -> ReobserveResult:
    """Match unseen window map points (projected into the previous frame)
    against the current frame's descriptors.

    `matcher`: optional learned matcher closure (kpts0, desc0, valid0,
    kpts1, desc1, valid1) -> MatchResult — the reference runs LightGlue on
    the synthetic keypoint set (`slam_core.cpp:527`); None = mutual-NN on
    raw descriptors."""
    M = cfg.map.covis_max_points
    prev_kf = mstate.num_kf - 1
    lo = jnp.maximum(prev_kf - cfg.map.map_match_window, 0)
    # Exclude points already observed in the previous keyframe — those are
    # reachable through the direct prev<->cur match (source (a)).
    ids, mask = _candidate_points(cfg, mstate, lo, prev_kf - 1, M)

    pts = mstate.pts_xyz[ids]
    uv, _, front = projection.project(K, R_prev, t_prev, pts)
    vis = mask & front & projection.in_image(
        uv, cfg.frontend.image_height, cfg.frontend.image_width)

    desc = mstate.pts_desc[ids].astype(f.desc.dtype)
    if matcher is None:
        m = match_ops.mutual_nn_match(desc, vis, f.desc, f.valid)
    else:
        m = matcher(uv, desc, vis, f.kpts, f.desc, f.valid)
    good = match_ops.score_filter(m.matches0, m.mscores0,
                                  cfg.frontend.map_match_threshold)

    N = f.kpts.shape[0]
    cur_rows = jnp.where(good, m.matches0, N)
    reobs = jnp.full((N,), -1, jnp.int32).at[cur_rows].set(
        jnp.where(good, ids, -1), mode='drop')
    return ReobserveResult(reobs_mpid=reobs,
                           num_candidates=jnp.sum(vis.astype(jnp.int32)))


class CovisResult(NamedTuple):
    reobs_mpid: jnp.ndarray   # (N,) per current keypoint, -1
    num_candidates: jnp.ndarray


def _covis_member(cfg: SLAMConfig, mstate: MapState,
                  seed_mpid: jnp.ndarray) -> jnp.ndarray:
    """(Pmax,) membership mask of the covisibility expansion: seed points ->
    top-K1 observer keyframes -> top-5 covis neighbours each -> global
    top-K2 -> union of those keyframes' map points (the K1/K2 machinery of
    `get_covisible_keyframes`, slam_core.cpp:1149-1247)."""
    Kmax = mstate.capacity_kf
    Pmax = mstate.capacity_pts
    i32 = jnp.int32
    sp = jnp.clip(seed_mpid, 0, Pmax - 1)
    obs_kf = mstate.pts_obs_kf[sp]                       # (N,O)
    ok = (seed_mpid >= 0)[:, None] & (obs_kf >= 0)
    ids = jnp.where(ok, obs_kf, Kmax).reshape(-1)
    hist = jnp.zeros((Kmax,), i32).at[ids].add(1, mode='drop')
    w1, k1 = jax.lax.top_k(hist, cfg.map.covis_k1)       # (K1,)
    k1 = jnp.where(w1 > 0, k1, -1)
    nbr = mstate.covis_nbr[jnp.clip(k1, 0, Kmax - 1)]    # (K1,C)
    nbr_w = mstate.covis_w[jnp.clip(k1, 0, Kmax - 1)]
    nbr_w = jnp.where((k1[:, None] >= 0) & (nbr >= 0), nbr_w, -1)
    top_w, top_i = jax.lax.top_k(nbr_w, cfg.map.covis_top_neighbors)
    cand_kf = jnp.take_along_axis(nbr, top_i, axis=1).reshape(-1)
    cand_w = top_w.reshape(-1)
    k2_w, k2_i = jax.lax.top_k(cand_w, cfg.map.covis_k2)
    k2 = jnp.where(k2_w > 0, cand_kf[k2_i], -1)
    kf_union = jnp.concatenate([k1, k2])                 # (K1+K2,)
    rows = mstate.kf_kp2mp[jnp.clip(kf_union, 0, Kmax - 1)]   # (U,N)
    rows = jnp.where((kf_union >= 0)[:, None], rows, -1)
    flat = rows.reshape(-1)
    return jnp.zeros((Pmax,), bool).at[
        jnp.where(flat >= 0, flat, Pmax)].set(True, mode='drop')


def match_unified(cfg: SLAMConfig, K: jnp.ndarray, mstate: MapState,
                  R_pred: jnp.ndarray, t_pred: jnp.ndarray,
                  f, seed_mpid: jnp.ndarray,
                  matcher=None) -> CovisResult:
    """Merged re-observation (cfg.map.reobs_mode == "merged"): ONE synthetic
    pass over the union of the two reference candidate pools — the last-W-
    keyframes recency window (match_map_window) and the covisibility
    expansion of the currently-matched points (match_covisible) — projected
    at the PREDICTED current pose and matched once. Halves the synthetic
    matcher passes per frame (LightGlue 3x -> 2x) while reaching the same
    candidate points; `seed_mpid` (source-(a) direct-match associations)
    seeds the expansion and is excluded from the candidates."""
    Pmax = mstate.capacity_pts
    N = f.kpts.shape[0]
    i32 = jnp.int32
    prev_kf = mstate.num_kf - 1
    lo = jnp.maximum(prev_kf - cfg.map.map_match_window, 0)
    window_elig = ((mstate.pts_last_kf >= lo)
                   & (mstate.pts_last_kf <= prev_kf - 1))
    member = window_elig | _covis_member(cfg, mstate, seed_mpid)
    member = member.at[jnp.where(seed_mpid >= 0, seed_mpid, Pmax)].set(
        False, mode='drop')
    eligible = member & mstate.pts_valid & ~mstate.pts_bad
    cand, cmask = select_ops.select_newest_ids(eligible,
                                               cfg.map.covis_max_points)
    pts = mstate.pts_xyz[cand]
    uv, _, front = projection.project(K, R_pred, t_pred, pts)
    vis = cmask & front & projection.in_image(
        uv, cfg.frontend.image_height, cfg.frontend.image_width)
    desc = mstate.pts_desc[cand].astype(f.desc.dtype)
    if matcher is None:
        m = match_ops.mutual_nn_match(desc, vis, f.desc, f.valid)
    else:
        m = matcher(uv, desc, vis, f.kpts, f.desc, f.valid)
    good = match_ops.score_filter(m.matches0, m.mscores0,
                                  cfg.frontend.map_match_threshold)
    cur_rows = jnp.where(good, m.matches0, N)
    reobs = jnp.full((N,), -1, i32).at[cur_rows].set(
        jnp.where(good, cand.astype(i32), -1), mode='drop')
    return CovisResult(reobs_mpid=reobs,
                       num_candidates=jnp.sum(vis.astype(i32)))


def match_batched(cfg: SLAMConfig, K: jnp.ndarray, mstate: MapState,
                  R_prev: jnp.ndarray, t_prev: jnp.ndarray,
                  R_pred: jnp.ndarray, t_pred: jnp.ndarray,
                  f, seed_mpid: jnp.ndarray,
                  matcher=None) -> CovisResult:
    """Both synthetic re-observation passes as ONE batch-2 matcher call
    (cfg.map.reobs_mode == "batched").

    The separate mode runs the map-window pass and the covisibility pass as
    two SERIAL matcher programs inside the tracking scan (the reference's
    2nd and 3rd LightGlue calls, `thread_pool.cpp:110,140`); their only
    data dependency is that the covis candidate selection excludes the
    window pass's hits. Dropping that exclusion (the final merge still
    prioritizes window hits, so associations stay consistent — at worst
    some covis candidate-budget rows duplicate window candidates) makes the
    two passes independent, so both synthetic sets stack on a leading axis
    and ONE vmapped matcher call serves them: half the serial attention
    chains per frame. The window set projects at the PREVIOUS pose (as
    match_map_window), the covis set at the PREDICTED pose (as
    match_covisible); `seed_mpid` carries the source-(a) direct-match
    associations, which seed the covis expansion and are excluded from both
    candidate pools."""
    Pmax = mstate.capacity_pts
    N = f.kpts.shape[0]
    i32 = jnp.int32
    M = cfg.map.covis_max_points
    prev_kf = mstate.num_kf - 1
    lo = jnp.maximum(prev_kf - cfg.map.map_match_window, 0)
    ids_w, mask_w = _candidate_points(cfg, mstate, lo, prev_kf - 1, M)

    member = _covis_member(cfg, mstate, seed_mpid)
    member = member.at[jnp.where(seed_mpid >= 0, seed_mpid, Pmax)].set(
        False, mode='drop')
    eligible = member & mstate.pts_valid & ~mstate.pts_bad
    ids_c, mask_c = select_ops.select_newest_ids(eligible, M)

    ids2 = jnp.stack([ids_w, jnp.asarray(ids_c, ids_w.dtype)])   # (2,M)
    Rs = jnp.stack([R_prev, R_pred])
    ts = jnp.stack([t_prev, t_pred])
    pts2 = mstate.pts_xyz[ids2]
    uv2, _, front2 = jax.vmap(
        lambda R, t, p: projection.project(K, R, t, p))(Rs, ts, pts2)
    vis2 = (jnp.stack([mask_w, mask_c]) & front2
            & jax.vmap(lambda uv: projection.in_image(
                uv, cfg.frontend.image_height,
                cfg.frontend.image_width))(uv2))
    desc2 = mstate.pts_desc[ids2].astype(f.desc.dtype)
    kb = jnp.broadcast_to(f.kpts, (2,) + f.kpts.shape)
    db = jnp.broadcast_to(f.desc, (2,) + f.desc.shape)
    vb = jnp.broadcast_to(f.valid, (2,) + f.valid.shape)
    if matcher is None:
        m = jax.vmap(lambda d0, v0, d1, v1: match_ops.mutual_nn_match(
            d0, v0, d1, v1))(desc2, vis2, db, vb)
    else:
        m = jax.vmap(matcher)(uv2, desc2, vis2, kb, db, vb)
    good2 = jax.vmap(lambda m0, s0: match_ops.score_filter(
        m0, s0, cfg.frontend.map_match_threshold))(m.matches0, m.mscores0)

    # Merge with window priority: covis hits scatter first, window hits
    # second — the later scatter overwrites on collision.
    reobs = jnp.full((N,), -1, i32)
    cur_c = jnp.where(good2[1], m.matches0[1], N)
    reobs = reobs.at[cur_c].set(
        jnp.where(good2[1], ids2[1].astype(i32), -1), mode='drop')
    cur_w = jnp.where(good2[0], m.matches0[0], N)
    reobs = reobs.at[cur_w].set(
        jnp.where(good2[0], ids2[0].astype(i32), -1), mode='drop')
    return CovisResult(reobs_mpid=reobs,
                       num_candidates=jnp.sum(vis2.astype(i32)))


def match_covisible(cfg: SLAMConfig, K: jnp.ndarray, mstate: MapState,
                    R_pred: jnp.ndarray, t_pred: jnp.ndarray,
                    f, seed_mpid: jnp.ndarray,
                    already_mpid: jnp.ndarray,
                    matcher=None) -> CovisResult:
    """Covisibility retrieval (C16): from the seed (currently matched) map
    points, find their top-K1 observer keyframes, expand via each keyframe's
    covisibility neighbours, pool those keyframes' map points, and match the
    unseen ones (projected into the predicted current pose) against the
    current frame.

    seed_mpid: (N,) map-point ids currently associated (-1 none).
    already_mpid: (N,) ids to exclude (already matched this frame).
    """
    Pmax = mstate.capacity_pts
    N = f.kpts.shape[0]
    i32 = jnp.int32

    # Seed mpids -> K1/K2 keyframe expansion -> candidate point membership
    member = _covis_member(cfg, mstate, seed_mpid)
    # Exclude already-matched points
    member = member.at[jnp.where(already_mpid >= 0, already_mpid,
                                 Pmax)].set(False, mode='drop')
    eligible = member & mstate.pts_valid & ~mstate.pts_bad
    # Newest-created first, index-priority top_k (_candidate_points)
    cand, cmask = select_ops.select_newest_ids(eligible,
                                               cfg.map.covis_max_points)

    # --- project into predicted pose & match -------------------------------
    pts = mstate.pts_xyz[cand]
    uv, _, front = projection.project(K, R_pred, t_pred, pts)
    vis = cmask & front & projection.in_image(
        uv, cfg.frontend.image_height, cfg.frontend.image_width)
    desc = mstate.pts_desc[cand].astype(f.desc.dtype)
    if matcher is None:
        m = match_ops.mutual_nn_match(desc, vis, f.desc, f.valid)
    else:
        m = matcher(uv, desc, vis, f.kpts, f.desc, f.valid)
    good = match_ops.score_filter(m.matches0, m.mscores0,
                                  cfg.frontend.map_match_threshold)
    cur_rows = jnp.where(good, m.matches0, N)
    reobs = jnp.full((N,), -1, i32).at[cur_rows].set(
        jnp.where(good, cand.astype(i32), -1), mode='drop')
    return CovisResult(reobs_mpid=reobs,
                       num_candidates=jnp.sum(vis.astype(i32)))
