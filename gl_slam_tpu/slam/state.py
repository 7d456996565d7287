"""Fixed-capacity functional map state (SoA) + keyframe insertion kernel.

TPU-native replacement for the reference's mutex-guarded global map
(`/root/reference/include/core/slam_types.h:8-127`: `Map{unordered_map<int,
MapPoint>, unordered_map<int,Frame>}` + 3 mutexes) and its bookkeeping pass
`update_map_and_keyframe_data` (`src/core/slam_core.cpp:287-426`) +
`update_covisibility` (`:260-283`).

Design (SURVEY.md §7): explicit fixed-capacity structure-of-arrays threaded
through jitted steps. Hash maps become preallocated dense arrays indexed by
integer ids; "N valid" becomes a count + mask; ragged observation lists become
a (Pmax, O) fixed-width table with per-point counts; the covisibility graph
becomes a top-C adjacency (neighbour ids + shared-observation weights). All
updates are scatters with `mode='drop'` so out-of-capacity writes are silently
skipped rather than trapping — capacity is a config knob (MapConfig).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MapState(NamedTuple):
    # Keyframes ----------------------------------------------------------
    num_kf: jnp.ndarray        # () int32
    kf_R: jnp.ndarray          # (Kmax,3,3) world->camera
    kf_t: jnp.ndarray          # (Kmax,3)
    kf_kpts: jnp.ndarray       # (Kmax,N,2) refined pixel keypoints
    kf_kp2mp: jnp.ndarray      # (Kmax,N) int32 map-point id per keypoint, -1
    kf_kp_valid: jnp.ndarray   # (Kmax,N) bool
    kf_frame_idx: jnp.ndarray  # (Kmax,) int32 source frame index
    # Map points ---------------------------------------------------------
    num_pts: jnp.ndarray       # () int32
    pts_xyz: jnp.ndarray       # (Pmax,3)
    pts_desc: jnp.ndarray      # (Pmax,D) latest observed descriptor
    pts_valid: jnp.ndarray     # (Pmax,) bool allocated
    pts_bad: jnp.ndarray       # (Pmax,) bool culled
    pts_obs_kf: jnp.ndarray    # (Pmax,O) int32 observing keyframe ids, -1 pad
    pts_obs_kp: jnp.ndarray    # (Pmax,O) int32 keypoint index in that kf
    pts_obs_cnt: jnp.ndarray   # (Pmax,) int32
    pts_first_kf: jnp.ndarray  # (Pmax,) int32 keyframe that created the point
    pts_last_kf: jnp.ndarray   # (Pmax,) int32 latest observing keyframe
    # Covisibility top-C adjacency ----------------------------------------
    covis_nbr: jnp.ndarray     # (Kmax,C) int32 neighbour kf ids, -1 empty
    covis_w: jnp.ndarray       # (Kmax,C) int32 shared-observation weights
    # Keyframe feature database (loop-closure detection) -------------------
    # Top-Kdb keypoints-with-3D per keyframe, snapshotted at insertion:
    # detection matches the current frame against a retrieved old
    # keyframe's stored features — frame-pair matching, the regime the
    # learned matcher is trained for — and PnP-verifies on the 3D
    # snapshots (slam/loopclose.py detect_loop_db). The 3D is a SNAPSHOT
    # (not a live pts_xyz lookup) so slot recycling can never silently
    # retarget a db row at a different landmark.
    kf_db_idx: jnp.ndarray     # (Kmax,Kdb) int32 keypoint row in kf, -1 pad
    kf_db_desc: jnp.ndarray    # (Kmax,Kdb,D) stored descriptor
    kf_db_xyz: jnp.ndarray     # (Kmax,Kdb,3) f32 3D at insertion
    kf_db_valid: jnp.ndarray   # (Kmax,Kdb) bool
    # Slot recycling (free-list) -------------------------------------------
    # The reference's map grows unboundedly in RAM (slam_types.h:8-127);
    # fixed-capacity device tables must RECYCLE instead: culled points'
    # slots are pushed here (recycle_free_slots) and popped by
    # insert_keyframe before fresh slots are allocated, so reference-length
    # sequences (KITTI 00 = 4,541 frames) never starve the point table.
    free_stack: jnp.ndarray    # (Pmax,) int32 freed slot ids (top = count-1)
    free_count: jnp.ndarray    # () int32 slots currently on the stack
    pts_freed: jnp.ndarray     # (Pmax,) bool slot is on the stack

    @property
    def capacity_kf(self) -> int:
        return self.kf_R.shape[0]

    @property
    def capacity_pts(self) -> int:
        return self.pts_xyz.shape[0]


def init_map_state(max_keyframes: int, max_points: int, max_kpts: int,
                   desc_dim: int, max_obs: int = 16,
                   max_covis: int = 32,
                   desc_dtype=jnp.bfloat16,
                   loop_db: int = 256) -> MapState:
    """`desc_dtype` controls the map-point descriptor store (`pts_desc`) —
    the single biggest map array (Pmax x D). bf16 halves its HBM traffic on
    every re-observation matmul/gather; matching matmuls accumulate in f32
    (`preferred_element_type`), and unit-norm 256-d descriptors lose ~0.03%
    relative dot-product accuracy in bf16 — far below the 0.7-threshold
    margin."""
    i32 = jnp.int32
    f32 = jnp.float32
    return MapState(
        num_kf=jnp.zeros((), i32),
        kf_R=jnp.tile(jnp.eye(3, dtype=f32), (max_keyframes, 1, 1)),
        kf_t=jnp.zeros((max_keyframes, 3), f32),
        kf_kpts=jnp.zeros((max_keyframes, max_kpts, 2), f32),
        kf_kp2mp=jnp.full((max_keyframes, max_kpts), -1, i32),
        kf_kp_valid=jnp.zeros((max_keyframes, max_kpts), bool),
        kf_frame_idx=jnp.full((max_keyframes,), -1, i32),
        num_pts=jnp.zeros((), i32),
        pts_xyz=jnp.zeros((max_points, 3), f32),
        pts_desc=jnp.zeros((max_points, desc_dim), desc_dtype),
        pts_valid=jnp.zeros((max_points,), bool),
        pts_bad=jnp.zeros((max_points,), bool),
        pts_obs_kf=jnp.full((max_points, max_obs), -1, i32),
        pts_obs_kp=jnp.full((max_points, max_obs), -1, i32),
        pts_obs_cnt=jnp.zeros((max_points,), i32),
        pts_first_kf=jnp.full((max_points,), -1, i32),
        pts_last_kf=jnp.full((max_points,), -1, i32),
        covis_nbr=jnp.full((max_keyframes, max_covis), -1, i32),
        covis_w=jnp.zeros((max_keyframes, max_covis), i32),
        kf_db_idx=jnp.full((max_keyframes, loop_db), -1, i32),
        kf_db_desc=jnp.zeros((max_keyframes, loop_db, desc_dim),
                             desc_dtype),
        kf_db_xyz=jnp.zeros((max_keyframes, loop_db, 3), f32),
        kf_db_valid=jnp.zeros((max_keyframes, loop_db), bool),
        free_stack=jnp.full((max_points,), -1, i32),
        free_count=jnp.zeros((), i32),
        pts_freed=jnp.zeros((max_points,), bool),
    )


def insert_keyframe(state: MapState,
                    R: jnp.ndarray, t: jnp.ndarray,
                    frame_idx: jnp.ndarray,
                    kpts: jnp.ndarray, desc: jnp.ndarray,
                    kp_valid: jnp.ndarray,
                    reobs_mpid: jnp.ndarray,
                    new_xyz: jnp.ndarray, new_valid: jnp.ndarray,
                    new_kp_cur: jnp.ndarray, new_kp_prev: jnp.ndarray,
                    prev_kf: jnp.ndarray,
                    covis_threshold: int = 50,
                    enabled: jnp.ndarray | None = None) -> MapState:
    """Insert a keyframe + its map updates — one fused jitted kernel.

    Mirrors `update_map_and_keyframe_data` (`slam_core.cpp:287-426`):
    (1) register the keyframe, (2) create MapPoints with two observations
    (prev kf + this kf) from triangulated leftovers, (3) append
    re-observations of existing points and refresh their latest descriptor,
    (4) update the covisibility graph edges of the new keyframe.

    Args (all fixed shape, N = keypoint budget):
      reobs_mpid: (N,) existing map-point id re-observed by keypoint n, -1.
      new_xyz/new_valid: (N,3)/(N,) triangulated candidate points, row j is a
        new point observed at keypoint `new_kp_cur[j]` here and
        `new_kp_prev[j]` in keyframe `prev_kf`.
      enabled: optional () bool — when False the insert is a no-op: every
        scatter is redirected to a dropped out-of-range index and the counters
        do not advance. This is how the frame-acceptance gate rejects a frame
        WITHOUT materializing an old-vs-new copy of the whole map (a
        `jnp.where` over ~90 MB of map arrays per frame; the gated scatters
        keep all map updates aliasable/in-place under XLA buffer donation).
    """
    i32 = jnp.int32
    k = state.num_kf
    N = kpts.shape[0]
    Pmax = state.capacity_pts
    O = state.pts_obs_kf.shape[1]
    Kmax = state.capacity_kf
    C = state.covis_nbr.shape[1]

    en = jnp.asarray(True) if enabled is None else enabled
    # Keyframe-table capacity guard: when the table is full the insert must
    # become a TRUE no-op — previously only the scatters were dropped while
    # num_kf kept counting, so every consumer of num_kf (BA windows,
    # re-observation recency, covisibility, ATE export) silently indexed
    # rows that were never written.
    en = en & (k < Kmax)
    k_w = jnp.where(en, k, Kmax)   # Kmax -> dropped by mode='drop'

    # --- (1) keyframe registration --------------------------------------
    kf_R = state.kf_R.at[k_w].set(R, mode='drop')
    kf_t = state.kf_t.at[k_w].set(t, mode='drop')
    kf_kpts = state.kf_kpts.at[k_w].set(kpts, mode='drop')
    kf_kp_valid = state.kf_kp_valid.at[k_w].set(kp_valid, mode='drop')
    kf_frame_idx = state.kf_frame_idx.at[k_w].set(frame_idx.astype(i32),
                                                  mode='drop')

    # --- (2) new map points ----------------------------------------------
    # Slot allocation pops the recycle free-stack first (LIFO), then fresh
    # monotonic slots — so culled points' slots are reused and long
    # sequences never exhaust the fixed table (recycle_free_slots).
    nv = new_valid & (new_kp_cur >= 0) & en
    offsets = jnp.cumsum(nv.astype(i32)) - 1
    avail = state.free_count
    use_free = nv & (offsets < avail)
    free_idx = jnp.clip(avail - 1 - offsets, 0, Pmax - 1)
    pid = jnp.where(use_free, state.free_stack[free_idx],
                    jnp.clip(state.num_pts + offsets - avail, 0, Pmax))
    pid_w = jnp.where(nv & (pid < Pmax), pid, Pmax)  # Pmax -> dropped
    n_new = jnp.sum(nv.astype(i32))
    n_from_free = jnp.minimum(n_new, avail)

    # Re-observation targets are needed up front so every point-table
    # update below is ONE fused scatter over the concatenated (new + reobs)
    # index set — random scatters into the 65k-row tables carry a fixed
    # per-scatter cost in-program (scripts/ablate_scan_pieces.py), so 10
    # small scatters were ~2x the price of these 6 merged ones.
    # The (Pmax, O) observation table is a RING over the most recent O
    # observations per point (slot = count % O): long-lived points keep
    # their latest observations — which is what the windowed BA consumes —
    # while pts_obs_cnt keeps the true total for the obs<3 culling rule.
    # (The reference stores unbounded obs vectors; a fixed-shape ring is
    # the TPU-native equivalent.)
    has_reobs = (reobs_mpid >= 0) & kp_valid & en
    rp = jnp.where(has_reobs, reobs_mpid, Pmax)
    col = state.pts_obs_cnt[jnp.clip(rp, 0, Pmax - 1)]
    slot = col % O

    desc_new = desc[jnp.clip(new_kp_cur, 0, N - 1)]
    pts_xyz = state.pts_xyz.at[pid_w].set(new_xyz, mode='drop')
    pts_valid = state.pts_valid.at[pid_w].set(True, mode='drop')
    pts_bad = state.pts_bad.at[pid_w].set(False, mode='drop')
    pts_freed = state.pts_freed.at[pid_w].set(False, mode='drop')
    pts_first_kf = state.pts_first_kf.at[pid_w].set(k, mode='drop')
    # Latest descriptor: new points + re-observed points, one scatter
    # (index sets are disjoint: reobs ids are valid non-freed points while
    # new pids are fresh slots or popped freed slots)
    pts_desc = state.pts_desc.at[
        jnp.concatenate([pid_w, jnp.clip(rp, 0, Pmax)])].set(
        jnp.concatenate([desc_new, desc]).astype(state.pts_desc.dtype),
        mode='drop')
    pts_last_kf = state.pts_last_kf.at[
        jnp.concatenate([pid_w, rp])].set(k, mode='drop')
    # Observation ring: new points write slots 0 (prev kf) and 1 (this kf),
    # re-observations write their ring slot — one flat scatter per table
    obs_idx = jnp.concatenate([pid_w * O, pid_w * O + 1, rp * O + slot])
    pts_obs_kf = state.pts_obs_kf.reshape(-1).at[obs_idx].set(
        jnp.concatenate([jnp.broadcast_to(prev_kf.astype(i32), (N,)),
                         jnp.broadcast_to(k, (2 * N,))]),
        mode='drop').reshape(Pmax, O)
    pts_obs_kp = state.pts_obs_kp.reshape(-1).at[obs_idx].set(
        jnp.concatenate([new_kp_prev, new_kp_cur,
                         jnp.arange(N, dtype=i32)]),
        mode='drop').reshape(Pmax, O)
    pts_obs_cnt = state.pts_obs_cnt.at[pid_w].set(2, mode='drop')
    pts_obs_cnt = pts_obs_cnt.at[rp].add(1, mode='drop')

    # --- kp -> mpid index for the new keyframe ---------------------------
    kp2mp_row = jnp.where(has_reobs, reobs_mpid, -1)
    new_kp_w = jnp.where(nv & (pid < Pmax), new_kp_cur, N)
    kp2mp_row = kp2mp_row.at[new_kp_w].set(
        jnp.where(nv, pid, -1), mode='drop')
    kf_kp2mp = state.kf_kp2mp.at[k_w].set(kp2mp_row, mode='drop')
    # Also mark the prev-keyframe keypoints that spawned the new points
    prev_row = state.kf_kp2mp[jnp.clip(prev_kf, 0, Kmax - 1)]
    new_kp_prev_w = jnp.where(nv & (pid < Pmax), new_kp_prev, N)
    prev_row = prev_row.at[new_kp_prev_w].set(
        jnp.where(nv, pid, -1), mode='drop')
    kf_kp2mp = kf_kp2mp.at[jnp.clip(prev_kf, 0, Kmax - 1)].set(prev_row)

    # --- keyframe feature database (loop detection) -----------------------
    # Store the first Kdb keypoints WITH 3D (keypoint rows are in detector
    # score order, so "first" = strongest): descriptor + a 3D snapshot of
    # the associated map point (re-observed -> BA-refined pts_xyz; newly
    # triangulated -> its fresh xyz, both already merged into the updated
    # pts_xyz above). Every stored row yields a PnP constraint at
    # detection time (slam/loopclose.py detect_loop_db). The bootstrap's
    # FIRST keyframe is inserted before any 3D points exist (its kp2mp is
    # backfilled by the second insert), so its db stays empty — keyframe 1,
    # one frame away, covers the sequence start for retrieval.
    Kdb = state.kf_db_idx.shape[1]
    has3d = (kp2mp_row >= 0) & kp_valid
    prio_db = jnp.where(has3d, N - jnp.arange(N, dtype=i32), -1)
    top_db, _ = jax.lax.top_k(prio_db, Kdb)
    db_idx = jnp.where(top_db >= 0, N - top_db, -1).astype(i32)
    db_ok = db_idx >= 0
    db_rows = jnp.clip(db_idx, 0, N - 1)
    db_mp = jnp.clip(kp2mp_row[db_rows], 0, Pmax - 1)
    kf_db_idx = state.kf_db_idx.at[k_w].set(db_idx, mode='drop')
    kf_db_desc = state.kf_db_desc.at[k_w].set(
        desc[db_rows].astype(state.kf_db_desc.dtype), mode='drop')
    kf_db_xyz = state.kf_db_xyz.at[k_w].set(pts_xyz[db_mp], mode='drop')
    kf_db_valid = state.kf_db_valid.at[k_w].set(db_ok, mode='drop')

    # --- (4) covisibility -------------------------------------------------
    # Shared-observation counts between the new kf and every other kf:
    # every matched point contributes 1 to each of its observing keyframes.
    matched_p = jnp.where(has_reobs, reobs_mpid, Pmax - 1)
    obs_rows_kf = pts_obs_kf[jnp.clip(matched_p, 0, Pmax - 1)]   # (N,O)
    obs_valid = (obs_rows_kf >= 0) & (obs_rows_kf != k) & has_reobs[:, None]
    ids = jnp.where(obs_valid, obs_rows_kf, Kmax).reshape(-1)
    counts = jnp.zeros((Kmax,), i32).at[ids].add(1, mode='drop')
    w_top, nbr_top = jax.lax.top_k(counts, C)
    edge_ok = (w_top >= covis_threshold) & en
    nbr_row = jnp.where(edge_ok, nbr_top.astype(i32), -1)
    w_row = jnp.where(edge_ok, w_top, 0)
    covis_nbr = state.covis_nbr.at[k_w].set(nbr_row, mode='drop')
    covis_w = state.covis_w.at[k_w].set(w_row, mode='drop')
    # Reverse edges: insert (k, w) into each selected neighbour's row at its
    # weakest slot (only if stronger or slot empty).
    nbr_rows_w = covis_w[jnp.clip(nbr_row, 0, Kmax - 1)]         # (C,C)
    nbr_rows_n = covis_nbr[jnp.clip(nbr_row, 0, Kmax - 1)]
    slot_w = jnp.where(nbr_rows_n >= 0, nbr_rows_w, -1)
    weakest = jnp.argmin(slot_w, axis=1)                         # (C,)
    can = edge_ok & (w_row > jnp.min(slot_w, axis=1))
    tgt = jnp.where(can, nbr_row, Kmax)
    covis_w = covis_w.reshape(-1).at[tgt * C + weakest].set(
        w_row, mode='drop').reshape(Kmax, C)
    covis_nbr = covis_nbr.reshape(-1).at[tgt * C + weakest].set(
        jnp.broadcast_to(k, (C,)), mode='drop').reshape(Kmax, C)

    return state._replace(
        num_kf=k + en.astype(i32),
        kf_R=kf_R, kf_t=kf_t, kf_kpts=kf_kpts, kf_kp2mp=kf_kp2mp,
        kf_kp_valid=kf_kp_valid, kf_frame_idx=kf_frame_idx,
        num_pts=jnp.minimum(state.num_pts + n_new - n_from_free, Pmax),
        pts_xyz=pts_xyz, pts_desc=pts_desc, pts_valid=pts_valid,
        pts_bad=pts_bad, pts_obs_kf=pts_obs_kf, pts_obs_kp=pts_obs_kp,
        pts_obs_cnt=pts_obs_cnt, pts_first_kf=pts_first_kf,
        pts_last_kf=pts_last_kf,
        covis_nbr=covis_nbr, covis_w=covis_w,
        kf_db_idx=kf_db_idx, kf_db_desc=kf_db_desc,
        kf_db_xyz=kf_db_xyz, kf_db_valid=kf_db_valid,
        free_count=avail - n_from_free, pts_freed=pts_freed)


from functools import partial


@partial(jax.jit, static_argnames=("min_age", "budget", "stale_age"))
def recycle_free_slots(state: MapState, min_age: int,
                       budget: int, stale_age: int = 0) -> MapState:
    """Push up to `budget` culled point slots onto the free stack.

    The reference never frees map points (its `Map` grows unboundedly in
    RAM, `slam_types.h:8-127`); a fixed-capacity device table must recycle
    or starve on reference-length sequences (KITTI 00 = 4,541 frames,
    `slam_types.cpp:12`). Eligible slots are culled (`pts_bad`) points not
    observed for `min_age` keyframes — old enough that no window BA
    (window+overlap), map-window re-observation pass, or in-flight async BA
    snapshot can still reference them. Freed slots are invalidated
    (`pts_valid=False`) and their observation rows cleared, so every read
    path (matching, covisibility, BA extraction, loop detection) skips them;
    stale `kf_kp2mp` references in old keyframes are harmless — each
    consumer re-validates against `pts_valid`/the obs table.

    `stale_age` > 0 additionally enables LRU EVICTION UNDER PRESSURE:
    when fewer than 2 x budget slots are available (fresh + stack), healthy
    points not observed for `stale_age` keyframes become eligible too.
    Culling alone cannot keep a fixed table afloat — it only marks points
    first seen in each BA window (reference semantics,
    slam_core.cpp:977-1038), so healthy points that simply left the field
    of view occupy slots forever; the round-3 soak's table filled at
    ~frame 330 and every later insert was silently dropped (map death with
    perfectly healthy matching). Pressure-gating keeps long-lived points
    available to loop-closure detection for as long as capacity allows.

    Runs at BA cadence (host pipeline / chunk drivers), OFF the per-frame
    hot path. Pure function of the live map state; keep it OUT of ba_step so
    the async-BA snapshot and the live map never both mutate the free stack.
    """
    i32 = jnp.int32
    Pmax = state.capacity_pts
    budget = min(budget, Pmax)
    age = state.num_kf - state.pts_last_kf
    old = age > min_age
    bad_cand = state.pts_valid & state.pts_bad & ~state.pts_freed & old
    cand = bad_cand
    low_obs = state.pts_obs_cnt < 3
    if stale_age > 0:
        available = (Pmax - state.num_pts) + state.free_count
        pressure = available < 2 * budget
        stale = state.pts_valid & ~state.pts_freed & (age > stale_age)
        # ARCHIVE QUOTA: well-observed (obs >= 3) healthy landmarks are the
        # revisit archive loop-closure detection matches against; they
        # become evictable only when the archive itself exceeds half the
        # table (otherwise one pressure wave deletes every old anchor right
        # before the revisit — observed on the circle fixture, round 4).
        n_archive = jnp.sum((state.pts_valid & ~state.pts_bad
                             & ~low_obs).astype(i32))
        archive_over = n_archive > Pmax // 2
        cand = cand | (stale & pressure & (low_obs | archive_over))
    # Eviction priority ordering: (1) bad-culled slots free FIRST (they
    # hold no information); (2) healthy-stale slots that were never
    # corroborated (obs_cnt < 3 — one-shot triangulations that no later
    # frame re-associated, the bulk of table churn), least-recently-
    # observed first; (3) well-observed healthy-stale landmarks LAST,
    # ranked FEWEST-OBSERVATIONS-FIRST (age tie-break) — these are the
    # revisit ARCHIVE that loop-closure detection matches against, and any
    # purely age-based rule (LRU included) evicts exactly the oldest
    # revisit anchors first (observed on the circle fixture: the start
    # region died one eviction wave before its revisit,
    # scripts/diag_loopdetect.py round 4). Corroboration count is the one
    # signal that separates a heavily-seen landmark worth archiving from a
    # marginal one, independent of when it was last seen.
    obs_rank = 64 - jnp.clip(state.pts_obs_cnt, 0, 64)     # fewest -> high
    prio = jnp.where(
        cand,
        jnp.where(bad_cand, (1 << 24) + jnp.clip(age, 0, 1 << 18),
                  jnp.where(low_obs,
                            (1 << 20) + jnp.clip(age, 0, 1 << 18),
                            obs_rank * (1 << 12)
                            + jnp.clip(age, 0, (1 << 12) - 1))), -1)
    _, ids = jax.lax.top_k(prio, budget)
    ids = ids.astype(i32)
    ok = cand[jnp.clip(ids, 0, Pmax - 1)]
    # Stack-capacity guard (invariant: each slot appears at most once, so
    # free_count + n <= Pmax always; the mask keeps that explicit)
    ok = ok & (state.free_count + jnp.arange(budget, dtype=i32) < Pmax)
    n = jnp.sum(ok.astype(i32))
    tgt = jnp.where(ok, ids, Pmax)
    pos = jnp.where(ok, state.free_count + jnp.arange(budget, dtype=i32),
                    Pmax)
    return state._replace(
        pts_valid=state.pts_valid.at[tgt].set(False, mode='drop'),
        pts_freed=state.pts_freed.at[tgt].set(True, mode='drop'),
        pts_obs_kf=state.pts_obs_kf.at[tgt].set(-1, mode='drop'),
        pts_obs_kp=state.pts_obs_kp.at[tgt].set(-1, mode='drop'),
        pts_obs_cnt=state.pts_obs_cnt.at[tgt].set(0, mode='drop'),
        pts_first_kf=state.pts_first_kf.at[tgt].set(-1, mode='drop'),
        pts_last_kf=state.pts_last_kf.at[tgt].set(-1, mode='drop'),
        free_stack=state.free_stack.at[pos].set(ids, mode='drop'),
        free_count=state.free_count + n,
    )
