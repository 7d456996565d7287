"""Benchmark: tracked frames/sec/chip on the flagship learned pipeline.

Headline metric = single-stream throughput of the FULL learned pipeline per
frame at STRICT reference parity (trained flagship weights):
  1x SuperPoint-style extraction (376x1241, N=2048) + fused NMS/top-K +
  sub-pixel refinement, 3x LightGlue-style attention matching with
  fixed-2048 synthetic re-observation sets (prev<->cur, map-window set,
  covisibility set — the reference runs LightGlue 3x per frame,
  thread_pool.cpp:108-147), essential RANSAC, pose-only LM(30),
  triangulation, fused map insertion, and a vmapped sliding-window full BA
  (<=30 LM iters) every `ba_every` frames INSIDE the timed loop (the
  reference's steady state includes the concurrent BA thread).

Also reported in the same JSON line: the relaxed operating point (re-obs
sets capped at 1024 — at/above the reference's dynamic-N operating point —
and 256 RANSAC hypotheses), single-stream fps with mutual-NN re-observation
passes (the cheap configuration), and the 16-stream aggregate (BASELINE
configs[4]). Measured finding (BASELINE.md roofline): the pipeline
is compute-bound at these shapes, so the stream axis adds only ~15% on ONE
chip — it is the multi-CHIP scaling axis (communication-free over the data
mesh), not a single-chip lever; its vmapped BA also cannot early-stop
(lax.cond becomes select under vmap), so the multistream config runs the
solver at its typical-convergence iteration budget instead of the 30 cap.
Learned-path quality evidence lives in tests/test_learned_e2e.py (ATE).

Frames are distinct rendered images, pre-staged in HBM (the native
prefetcher handles disk IO off the hot path; runtime/native/dataloader.cpp).
Prints ONE JSON line. vs_baseline is against the driver-set north star of
500 tracked frames/sec/chip (BASELINE.json — the reference publishes no
numbers of its own; BASELINE.md documents this).
"""

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.models.lightglue import LightGlueNet
    from gl_slam_tpu.models.superpoint import SuperPointNet
    from gl_slam_tpu.slam import ba as ba_mod
    from gl_slam_tpu.slam import frontend, fused

    H, W, N, D = 376, 1241, 2048, 256
    CHUNK = 8
    S = 16                      # streams per chip (BASELINE configs[4])
    BA_EVERY = 8                # frames between BA dispatches (~ref cadence 7)
    import dataclasses

    from gl_slam_tpu.train.e2e import flagship_config

    # ONE source of truth: the SAME configuration the committed quality
    # evidence runs (FLAGSHIP_EVAL.json = scripts/eval_flagship.py with
    # e2e.flagship_config()). Its re-observation sets are capped at 1024
    # keypoints — at/above the reference's dynamic-N operating point
    # (lightglue.cpp:64-92: its 2nd/3rd passes carry only the
    # currently-unmatched candidates, typically a few hundred) — and its
    # essential RANSAC runs 256 vmapped hypotheses + 6 IRLS polish (the
    # reference's USAC_MAGSAC terminates far below its 1000 cap on
    # automotive motion). The STRICT variant below pads every synthetic
    # re-obs set to the full fixed 2048 and doubles the RANSAC budget —
    # an upper bound on the reference's per-frame work.
    cfg = flagship_config(H, W)
    cfg_strict = dataclasses.replace(
        cfg,
        map=dataclasses.replace(cfg.map, covis_max_points=2048),
        geometry=dataclasses.replace(cfg.geometry,
                                     essential_hypotheses=512))
    cfg_merged = dataclasses.replace(
        cfg, map=dataclasses.replace(cfg.map, reobs_mode="merged"))
    # Both re-obs passes as ONE batch-2 matcher call at the STRICT shapes
    # (fixed-2048 sets): same candidate pools as strict-separate, half the
    # serial attention chains (slam/reobserve.match_batched)
    cfg_batched = dataclasses.replace(
        cfg_strict, map=dataclasses.replace(cfg_strict.map,
                                            reobs_mode="batched"))
    key = jax.random.PRNGKey(0)
    # 64 DISTINCT timed frames (+2 bootstrap): every frame of the longest
    # timed loop is a unique rendered image of a continuous sequence —
    # no re-fed chunks (VERDICT r3 weak #6). Rendering is one-time host
    # setup, cached on disk; frames are staged in HBM once (~120 MB).
    N_FRAMES = 64
    scene = synthetic.make_scene(num_landmarks=14000,
                                 num_frames=N_FRAMES + 2,
                                 height=H, width=W, desc_dim=D, seed=0)
    K = jnp.asarray(scene.K, jnp.float32)

    sp = SuperPointNet(descriptor_dim=D)
    lg = LightGlueNet(dim=256, heads=2, layers=9, input_dim=D)
    pad_h, pad_w = (-H) % 8, (-W) % 8
    sp_params = sp.init(key, jnp.zeros((1, H + pad_h, W + pad_w, 1)))
    d8 = jnp.zeros((8, D)); k8 = jnp.zeros((8, 2)); m8 = jnp.ones((8,), bool)
    lg_params = lg.init(key, d8, d8, k8, k8, m8, m8)
    # The TRAINED flagship weights (scripts/train_frontend.py --preset
    # flagship) — perf is measured with the same weights the quality claim
    # uses (tests/test_flagship_e2e.py ATE); random init only if the
    # checkpoints are somehow absent.
    import os
    weights = "random-init"
    if os.path.exists("checkpoints/sp_flagship.npz"):
        from gl_slam_tpu.checkpoint import load_params
        sp_params = load_params("checkpoints/sp_flagship.npz", sp_params)
        lg_params = load_params("checkpoints/lg_flagship.npz", lg_params)
        weights = "trained-flagship"
    # Pair-conditioned Keypt2Subpx head IN the measured chunk: quality
    # (FLAGSHIP_EVAL) and perf now share one front-end configuration
    # (VERDICT r2 item 4 / weak #6; the reference runs its Keypt2Subpx
    # engine inside the per-frame loop, thread_pool.cpp:115).
    from gl_slam_tpu.train.e2e import load_flagship_subpix
    subpix = load_flagship_subpix("checkpoints", pair=True)
    ks_head, ks_params = subpix if subpix is not None else (None, None)
    params = fused.FusedParams(sp=sp_params, lg=lg_params, ks=ks_params)

    cache = f"/tmp/bench_frames_s0_{N_FRAMES + 2}_{H}x{W}.npy"
    if os.path.exists(cache):
        frames = np.load(cache)
    else:
        frames = np.stack([
            synthetic.render_frame(scene, i, max_keypoints=N)
            for i in range(N_FRAMES + 2)]).astype(np.float32)
        np.save(cache, frames)
    # Pre-split into chunk tensors staged in HBM (timed loop indexes a list)
    chunks = [jnp.asarray(frames[2 + c * CHUNK: 2 + (c + 1) * CHUNK])
              for c in range(N_FRAMES // CHUNK)]
    jax.block_until_ready(chunks[-1])
    obs = synthetic.observe_frame(scene, 1, max_keypoints=N)

    def mkstate(seed):
        st = frontend.init_track_state(
            cfg, jax.random.PRNGKey(seed),
            patch=None if ks_head is None else ks_head.patch)
        return st._replace(prev_kpts=jnp.asarray(obs.keypoints),
                           prev_desc=jnp.asarray(obs.descriptors),
                           prev_valid=jnp.asarray(obs.valid))

    ba1 = jax.jit(lambda m, first, win: ba_mod.ba_step(cfg, K, m, first, win),
                  donate_argnums=(0,))

    # Learned loop-detection program at the driver's default cadence
    # (cfg.runtime.loop_check_interval=20 frames): loop closing is ON by
    # default in the chunked driver, so its 4th matcher pass belongs in the
    # benched configuration (VERDICT r4 weak #7 — BENCH_r04 predated the
    # learned detection path and excluded it). The program is the SAME one
    # the driver dispatches (chunk_driver._build_detect_fn, params as an
    # argument so the weights are not constant-folded twice).
    from gl_slam_tpu.slam.chunk_driver import ChunkedPipeline
    pipe_det = ChunkedPipeline(cfg, K, sp, lg, params, chunk=CHUNK,
                               ba_every=BA_EVERY, subpix_head=ks_head)
    detect_fn = pipe_det._detect_fn
    LOOP_EVERY = cfg.runtime.loop_check_interval

    def run_single(reobs_lg: bool, n_chunks: int = 8, cfg_run=None,
                   with_loop_detect: bool = True):
        fn = fused.build_chunk_fn(cfg_run or cfg, sp, lg, K, CHUNK,
                                  reobs_with_lightglue=reobs_lg,
                                  subpix_head=ks_head)
        st = mkstate(0)
        st, _ = fn(params, st, chunks[0], jnp.asarray(2, jnp.int32))
        m = ba1(st.map, jnp.asarray(0, jnp.int32), jnp.asarray(9, jnp.int32))
        st = st._replace(map=m)
        k_det = jax.random.PRNGKey(7)
        if with_loop_detect and detect_fn is not None:
            detect_fn(params.lg, st.map, st.prev_kpts, st.prev_desc,
                      st.prev_valid, jnp.asarray(10, jnp.int32),
                      st.R_cur, st.t_cur, k_det)   # compile outside timing
        int(st.map.num_kf)                       # sync after warmup
        since_loop = 0
        t0 = time.perf_counter()
        for i in range(n_chunks):
            # every timed chunk is a DISTINCT slice of the 64-frame stream
            st, _ = fn(params, st, chunks[(i + 1) % len(chunks)],
                       jnp.asarray(2 + ((i + 1) % len(chunks)) * CHUNK,
                                   jnp.int32))
            if (i * CHUNK) % BA_EVERY == 0:
                first = jnp.asarray(max(2 + i * CHUNK - 3, 0), jnp.int32)
                m = ba1(st.map, first, jnp.asarray(CHUNK + 3, jnp.int32))
                st = st._replace(map=m)
            since_loop += CHUNK
            if with_loop_detect and detect_fn is not None \
                    and since_loop >= LOOP_EVERY:
                # fire-and-forget like the driver (result consumed lagged);
                # the device work lands inside the timed window via the
                # final sync
                detect_fn(params.lg, st.map, st.prev_kpts, st.prev_desc,
                          st.prev_valid,
                          jnp.asarray(2 + (i + 1) * CHUNK, jnp.int32),
                          st.R_cur, st.t_cur, k_det)
                since_loop = 0
        int(st.map.num_kf)
        dt = time.perf_counter() - t0
        return n_chunks * CHUNK / dt

    def run_multi(n_chunks: int = 3, S: int = S):
        # 16 concurrent sequences TIME-MULTIPLEXED on the one chip: each
        # stream dispatches its own donated single-stream chunk (one shared
        # compiled program; the host enqueues 16 chunks back-to-back and the
        # ~2 ms dispatch cost hides under the ~115 ms device chunks).
        # Measured alternative — vmapping the tracker across streams — ran
        # ~1.7x SLOWER than 16 sequential chunks (batched scatters serialize
        # and the pose-LM/BA early-stop lax.cond becomes select under vmap);
        # streams are embarrassingly parallel, so the stream axis is the
        # multi-CHIP scaling axis (parallel/multistream.py + mesh sharding),
        # not a single-chip batching axis.
        fn = fused.build_chunk_fn(cfg, sp, lg, K, CHUNK,
                                  reobs_with_lightglue=True,
                                  subpix_head=ks_head)
        states = [mkstate(s) for s in range(S)]
        for s in range(S):
            states[s], _ = fn(params, states[s], chunks[0],
                              jnp.asarray(2, jnp.int32))
            m = ba1(states[s].map, jnp.asarray(0, jnp.int32),
                    jnp.asarray(9, jnp.int32))
            states[s] = states[s]._replace(map=m)
        int(states[-1].map.num_kf)                  # sync after warmup
        t0 = time.perf_counter()
        for i in range(n_chunks):
            for s in range(S):
                # each stream walks the distinct-frame stream at its own
                # offset (streams are independent sequences)
                c = (i + 1 + s) % len(chunks)
                states[s], _ = fn(params, states[s], chunks[c],
                                  jnp.asarray(2 + c * CHUNK, jnp.int32))
            if (i * CHUNK) % BA_EVERY == 0:
                first = jnp.asarray(max(2 + i * CHUNK - 3, 0), jnp.int32)
                win = jnp.asarray(CHUNK + 3, jnp.int32)
                for s in range(S):
                    m = ba1(states[s].map, first, win)
                    states[s] = states[s]._replace(map=m)
        for s in range(S):
            int(states[s].map.num_kf)
        dt = time.perf_counter() - t0
        return n_chunks * CHUNK * S / dt

    if "--ms-econ" in sys.argv:
        # Multi-stream economics table (VERDICT r4 item 6): single-stream
        # fps vs S-stream time-multiplexed aggregate on the ONE real chip.
        # BASELINE.md documents why the stream axis is the multi-CHIP
        # scaling lever (vmapped multistream measured ~1.7x slower than
        # sequential chunks); this table is the committed evidence closing
        # the question on single-chip economics: each stream dispatches its
        # own donated chunk, so aggregate ~= single-stream fps with only
        # dispatch-overlap gains/losses.
        single = round(run_single(reobs_lg=True), 2)
        agg = {s: round(run_multi(S=s), 2) for s in (2, 4, 8, 16)}
        table = {
            "config": ("time-multiplexed independent streams, parity "
                       "chunked pipeline (1024-cap re-obs sets), one chip; "
                       "aggregate fps across all streams"),
            "single_stream_fps": single,
            "aggregate_fps_by_streams": agg,
            "per_stream_fps_by_streams": {
                s: round(v / s, 2) for s, v in agg.items()},
        }
        with open("MS_ECON.json", "w") as f:
            json.dump(table, f, indent=1)
        print(json.dumps(table))
        return

    fps_multi = run_multi()
    fps_single_parity = run_single(reobs_lg=True)
    fps_strict = run_single(reobs_lg=True, cfg_run=cfg_strict, n_chunks=4)
    fps_strict_batched = run_single(reobs_lg=True, cfg_run=cfg_batched,
                                    n_chunks=4)
    fps_merged = run_single(reobs_lg=True, cfg_run=cfg_merged)
    fps_single_nn = run_single(reobs_lg=False)

    # Headline = the STRICT reference-parity configuration: fixed-2048
    # re-observation synthetic sets + default RANSAC budget (ADVICE r1: the
    # relaxed operating point must not carry the 'parity' label). The
    # relaxed config (re-obs sets capped 1024, 256 RANSAC hypotheses — at or
    # above the reference's dynamic-N operating point) is the side field.
    print(json.dumps({
        "metric": ("tracked frames/sec/chip (full learned pipeline, strict "
                   "reference parity: 1x SuperPoint + 3x LightGlue with "
                   "fixed-2048 re-obs sets + pair-subpix head + RANSAC + "
                   "pose-LM30 + windowed BA30 in-loop + learned "
                   "loop-detection pass every 20 frames, KITTI 376x1241, "
                   "N=2048; every timed frame is a distinct rendered image "
                   "of a continuous 64-frame stream, staged in HBM)"),
        "value": round(fps_strict, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps_strict / 500.0, 4),
        "weights": weights,
        "relaxed_reobs1024_fps": round(fps_single_parity, 2),
        # strict shapes with both re-obs passes as one batch-2 matcher call
        # (cfg.map.reobs_mode="batched", non-default; quality test
        # tests/test_tracking.py::test_tracking_batched_reobs)
        "strict_batched_reobs_fps": round(fps_strict_batched, 2),
        "merged_reobs_fps": round(fps_merged, 2),
        "single_stream_mutualnn_reobs_fps": round(fps_single_nn, 2),
        "multistream_aggregate_fps": round(fps_multi, 2),
        "streams": S,
        "ba_every_frames": BA_EVERY,
        # ~775 GFLOP/frame at the strict configuration on 197 TFLOP/s bf16
        # peak -> 254 fps at 100% MFU (relaxed ~590 GFLOP -> 333). BASELINE.md.
        "strict_roofline_fps_at_100pct_mfu": 254,
        "relaxed_roofline_fps_at_100pct_mfu": 333,
    }))


if __name__ == "__main__":
    sys.exit(main())
