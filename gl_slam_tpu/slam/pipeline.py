"""Host-side SLAM pipeline: double-buffered frame feed + async jitted steps.

Replaces the reference's three-OS-thread orchestration (`src/main.cpp:126-140`
+ `src/threading/thread_pool.cpp`): JAX's async dispatch queue plays the role
of the tracking/mapping thread split — `track_step` and `ba_step` are enqueued
on the device stream without host synchronization, the host only blocks when
it actually reads a value (SURVEY.md §2.3 TPU-equivalents (a), (d)). The
condvar BA handoff (`thread_pool.cpp:334-349`) becomes: every
`ba_trigger_keyframes` new keyframes, enqueue one jitted sliding-window BA
step that consumes and returns the same functional map state.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SLAMConfig
from . import ba as ba_mod
from . import frontend
from .frontend import FrameFeatures, TrackState


@jax.jit
def _ba_step_norm(m):
    """BA-anchored constant-velocity step magnitude: the distance between
    the last two BA-refined camera centres. Re-anchoring `t_rel_norm` here
    (as the chunked driver does, chunk_driver._build_ba_fn) stops the
    multiplicative carry from compounding through the pose_step_max_ratio
    sanity bound — and unlocks the odometry-fallback latch after genuine
    stop-and-go motion (a rejected solve otherwise perpetuates the stale
    magnitude indefinitely on the per-frame path)."""
    last = jnp.maximum(m.num_kf - 1, 0)
    prev = jnp.maximum(m.num_kf - 2, 0)
    with jax.default_matmul_precision("float32"):
        c_last = -(m.kf_R[last].T @ m.kf_t[last])
        c_prev = -(m.kf_R[prev].T @ m.kf_t[prev])
    return jnp.clip(jnp.linalg.norm(c_last - c_prev), 1e-3, 10.0)


class TrackingPipeline:
    """Feeds per-frame features through the jitted tracking/BA steps."""

    def __init__(self, cfg: SLAMConfig, K: np.ndarray,
                 seed: Optional[int] = None, enable_ba: bool = True,
                 matcher=None):
        """`matcher`: optional learned matcher closure (kpts0, desc0, valid0,
        kpts1, desc1, valid1) -> MatchResult, used for the prev<->cur pass
        AND the two re-observation passes (3x-LightGlue reference parity);
        None = mutual-NN everywhere. Must be a stable callable (it is a
        static jit argument)."""
        self.cfg = cfg
        self.matcher = matcher
        self.K = jnp.asarray(K, jnp.float32)
        key = jax.random.PRNGKey(cfg.runtime.seed if seed is None else seed)
        self.state: TrackState = frontend.init_track_state(cfg, key)
        self.outputs: List[Any] = []
        # `run_full_ba` gates the sliding-window backend BA; `run_pose_ba`
        # (the reference's flag, slam_types.cpp:14) gates the per-frame
        # pose-only LM inside track_step instead — see frontend.track_step.
        self.enable_ba = enable_ba and cfg.runtime.run_full_ba
        self._kf_at_last_ba = 2
        self._ba_count = 0
        self._steps_since_check = 0
        # Async BA (C4): (ba_result_map, snapshot_num_kf, snapshot_num_pts)
        # while a BA dispatched on a map snapshot is "in flight" — tracking
        # keeps updating the live state and the result is reconciled at the
        # next trigger with the anchor rigid delta (ba.reconcile_async_ba).
        self._inflight_ba = None
        # Failure detection / recovery (SURVEY §5.3): the reference only
        # cerr+continues on failure; here the pipeline health-checks the
        # pose at each BA-trigger sync point and rolls back to the last
        # known-good state snapshot if it went non-finite.
        self._last_good = None
        self.num_recoveries = 0

    # -- feature plumbing --------------------------------------------------
    def _features(self, kpts, desc, scores_or_valid, frame_idx) -> FrameFeatures:
        valid = scores_or_valid
        if valid.dtype != bool:
            valid = valid > 0
        return FrameFeatures(
            kpts=jnp.asarray(kpts, jnp.float32),
            desc=jnp.asarray(desc, jnp.float32),
            valid=jnp.asarray(valid),
            frame_idx=jnp.asarray(frame_idx, jnp.int32))

    # -- lifecycle ----------------------------------------------------------
    def bootstrap(self, f0, f1, gt_scale: float = 1.0):
        """Two-view init (frames 0,1). f*: (kpts, desc, valid, frame_idx)."""
        feats0 = self._features(*f0)
        feats1 = self._features(*f1)
        m = None
        if self.matcher is not None:
            m = self.matcher(feats0.kpts, feats0.desc, feats0.valid,
                             feats1.kpts, feats1.desc, feats1.valid)
        self.state, out = frontend.bootstrap_step(
            self.cfg, self.K, self.state, feats0, feats1,
            jnp.asarray(gt_scale, jnp.float32), matches=m)
        self.outputs.append(out)
        return out

    def step(self, kpts, desc, valid, frame_idx):
        """Track one frame. Non-blocking: returns device handles."""
        # Fold an in-flight async BA first (one-frame lag): the reconcile is
        # itself an async device dispatch, so the host never blocks — this
        # mirrors the reference's mapping thread finishing within ~a frame
        # and applying its correction lists (slam_core.cpp:916-973).
        self._reconcile_ba()
        feats = self._features(kpts, desc, valid, frame_idx)
        m = None
        if self.matcher is not None:
            m = self.matcher(self.state.prev_kpts, self.state.prev_desc,
                             self.state.prev_valid, feats.kpts, feats.desc,
                             feats.valid)
        self.state, out = frontend.track_step(self.cfg, self.K, self.state,
                                              feats, matches=m,
                                              matcher=self.matcher)
        self.outputs.append(out)
        self._maybe_ba()
        self._maybe_loop_close(feats)
        return out

    def _maybe_loop_close(self, feats):
        rt = self.cfg.runtime
        if not rt.loop_closing:
            return
        # No sequence this short can contain a closable loop (detection only
        # considers points last seen > loop_min_gap keyframes ago) — skip
        # the dispatch entirely without a device sync.
        if len(self.outputs) <= rt.loop_min_gap:
            return
        if len(self.outputs) % rt.loop_check_interval != 0:
            return
        from . import loopclose
        import jax
        key = jax.random.PRNGKey(len(self.outputs))
        # Learned matcher (when available) routes to the keyframe-database
        # path (loopclose.detect_loop_db) — raw-cosine mutual-NN carries no
        # loop signal with the end-to-end-trained frontend, and neither do
        # aged map-point descriptors under ANY matcher (see detect_loop_db
        # docstring / scripts/diag_loop_matcher.py). Note: passing
        # self.matcher (a params-closing closure) as detect_loop's static
        # arg bakes the matcher weights into this second executable — the
        # same duplication track_step already carries on this per-frame
        # path; the chunked driver (the bench/eval path) passes params as
        # an argument instead (chunk_driver._build_detect_fn).
        det = loopclose.detect_loop(self.cfg, self.K, self.state.map, feats,
                                    key, min_gap=rt.loop_min_gap,
                                    matcher=self.matcher,
                                    R_cur=self.state.R_cur,
                                    t_cur=self.state.t_cur)
        if bool(det.ok):
            self.state = loopclose.close_loop(self.cfg, self.K, self.state,
                                              det, rt.pose_graph_window)
            self.loop_closures = getattr(self, "loop_closures", 0) + 1

    def _maybe_ba(self):
        if not self.enable_ba:
            return
        # BA trigger (`thread_pool.cpp:248-252`): every N new keyframes run a
        # sliding-window BA over them (+overlap frames). Frames can be
        # skipped by the acceptance gate, so the true keyframe count lives on
        # device; read it back only once per trigger period (one small sync
        # every N frames) rather than every frame.
        self._steps_since_check += 1
        if self._steps_since_check < self.cfg.runtime.ba_trigger_keyframes:
            return
        self._steps_since_check = 0
        if not self._health_check():
            return
        num_kf = int(self.state.map.num_kf)
        if num_kf - self._kf_at_last_ba >= self.cfg.runtime.ba_trigger_keyframes:
            first = max(self._kf_at_last_ba - self.cfg.ba.full_ba_overlap, 0)
            new_map = ba_mod.ba_step(
                self.cfg, self.K, self.state.map,
                jnp.asarray(first, jnp.int32),
                jnp.asarray(num_kf - first, jnp.int32))
            self._kf_at_last_ba = num_kf
            self._ba_count += 1
            if self.cfg.runtime.async_ba:
                # The mapping-thread split (C4): the BA runs on a snapshot
                # (JAX arrays are immutable — the dispatch above IS the
                # snapshot) while tracking continues on the live state; the
                # result merges at the next trigger via the anchor rigid
                # delta. No host blocking happens here: `new_map` is an
                # async-dispatched future.
                self._inflight_ba = (new_map, num_kf,
                                     int(self.state.map.num_pts))
            else:
                self.state = self.state._replace(
                    map=new_map,
                    R_cur=new_map.kf_R[new_map.num_kf - 1],
                    t_cur=new_map.kf_t[new_map.num_kf - 1],
                    t_rel_norm=_ba_step_norm(new_map))
                self._maybe_recycle()

    def _maybe_recycle(self):
        """Release long-dead culled point slots (state.recycle_free_slots).
        Runs at BA cadence on the LIVE map — never on the async snapshot, so
        the free stack has a single writer."""
        mc = self.cfg.map
        if not mc.recycle_enabled:
            return
        from .state import recycle_free_slots
        self.state = self.state._replace(map=recycle_free_slots(
            self.state.map, mc.recycle_min_age,
            min(mc.recycle_budget, mc.max_points),
            stale_age=mc.recycle_stale_age))

    def _health_check(self) -> bool:
        """Detect a non-finite pose (numerical blow-up) and roll back to the
        last healthy snapshot. Piggybacks on the BA-trigger sync point so no
        extra host round trips are added. Returns health status."""
        finite = bool(np.isfinite(np.asarray(self.state.t_cur)).all()
                      and np.isfinite(np.asarray(self.state.R_cur)).all())
        if finite:
            self._last_good = self.state
            return True
        self.num_recoveries += 1
        if self._last_good is not None:
            self.state = self._last_good
        self._inflight_ba = None
        return False

    def _reconcile_ba(self):
        """Fold an in-flight async BA result into the live state (C17)."""
        if self._inflight_ba is None:
            return
        ba_map, kf_from, pt_from = self._inflight_ba
        self._inflight_ba = None
        merged = ba_mod.reconcile_async_ba(
            self.state.map, ba_map,
            jnp.asarray(kf_from, jnp.int32), jnp.asarray(pt_from, jnp.int32))
        last = merged.num_kf - 1
        self.state = self.state._replace(
            map=merged,
            R_cur=merged.kf_R[last],
            t_cur=merged.kf_t[last],
            t_rel_norm=_ba_step_norm(merged))
        self._maybe_recycle()

    def finish(self):
        """Drain the async BA pipeline (call at end of sequence)."""
        self._reconcile_ba()
        self.block()

    # -- results -------------------------------------------------------------
    def trajectory(self):
        """Keyframe poses (world->camera) as numpy, post-BA corrected."""
        self._reconcile_ba()     # fold any in-flight async BA before reading
        m = self.state.map
        n = int(m.num_kf)
        return (np.asarray(m.kf_R[:n]), np.asarray(m.kf_t[:n]),
                np.asarray(m.kf_frame_idx[:n]))

    def map_stats(self) -> dict:
        self._reconcile_ba()
        m = self.state.map
        n_pts = int(m.num_pts)
        valid = np.asarray(m.pts_valid[:n_pts]) if n_pts else np.zeros(0, bool)
        bad = np.asarray(m.pts_bad[:n_pts]) if n_pts else np.zeros(0, bool)
        return {
            "num_keyframes": int(m.num_kf),
            "num_points": n_pts,
            "num_good_points": int((valid & ~bad).sum()),
            "num_bad_points": int(bad.sum()),
            "num_ba_runs": self._ba_count,
        }

    def block(self):
        jax.block_until_ready(self.state.map.num_kf)
