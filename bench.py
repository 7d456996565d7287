"""Benchmark: tracked frames/sec/chip on the flagship learned pipeline.

Headline metric = single-stream throughput of the FULL learned pipeline per
frame at reference parity:
  1x SuperPoint-style extraction (376x1241, N=2048) + fused NMS/top-K +
  sub-pixel refinement, 3x LightGlue-style attention matching (prev<->cur,
  map-window synthetic set, covisibility synthetic set — the reference runs
  LightGlue 3x per frame, thread_pool.cpp:108-147), essential RANSAC,
  pose-only LM(30), triangulation, fused map insertion, and a vmapped
  sliding-window full BA (<=30 LM iters) every `ba_every` frames INSIDE the
  timed loop (the reference's steady state includes the concurrent BA
  thread).

Also reported in the same JSON line: single-stream fps with mutual-NN
re-observation passes (the cheap configuration) and the 16-stream aggregate
(BASELINE configs[4]). Measured finding (BASELINE.md roofline): the pipeline
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

    from gl_slam_tpu.config import FrontendConfig, MapConfig, SLAMConfig
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.models.lightglue import LightGlueNet
    from gl_slam_tpu.models.superpoint import SuperPointNet
    from gl_slam_tpu.slam import ba as ba_mod
    from gl_slam_tpu.slam import frontend, fused

    H, W, N, D = 376, 1241, 2048, 256
    CHUNK = 8
    S = 16                      # streams per chip (BASELINE configs[4])
    BA_EVERY = 8                # frames between BA dispatches (~ref cadence 7)
    from gl_slam_tpu.config import BAConfig
    cfg = SLAMConfig(
        frontend=FrontendConfig(image_height=H, image_width=W,
                                max_keypoints=N, descriptor_dim=D,
                                score_threshold=5e-4),
        map=MapConfig(max_keyframes=512, max_points=65536),
        # Window capacities sized to the actual workload (<= 12 cams, ~2k
        # window points): over-provisioned padding is pure wasted BA compute
        ba=BAConfig(max_window_cameras=12, max_window_points=2048,
                    full_ba_overlap=3),
    )
    key = jax.random.PRNGKey(0)
    scene = synthetic.make_scene(num_landmarks=6000, num_frames=CHUNK + 2,
                                 height=H, width=W, desc_dim=D, seed=0)
    K = jnp.asarray(scene.K, jnp.float32)

    sp = SuperPointNet(descriptor_dim=D)
    lg = LightGlueNet(dim=256, heads=2, layers=9, input_dim=D)
    pad_h, pad_w = (-H) % 8, (-W) % 8
    sp_params = sp.init(key, jnp.zeros((1, H + pad_h, W + pad_w, 1)))
    d8 = jnp.zeros((8, D)); k8 = jnp.zeros((8, 2)); m8 = jnp.ones((8,), bool)
    lg_params = lg.init(key, d8, d8, k8, k8, m8, m8)
    params = fused.FusedParams(sp=sp_params, lg=lg_params)

    # Distinct frames, staged in HBM once (one chunk's worth, re-fed with
    # advancing frame indices; rendering 2048-blob KITTI frames is host-side
    # one-time setup)
    frames = np.stack([
        synthetic.render_frame(scene, i, max_keypoints=N)
        for i in range(2, 2 + CHUNK)]).astype(np.float32)
    images1 = jnp.asarray(frames)                           # (T,H,W)
    obs = synthetic.observe_frame(scene, 0, max_keypoints=N)

    def mkstate(seed):
        st = frontend.init_track_state(cfg, jax.random.PRNGKey(seed))
        return st._replace(prev_kpts=jnp.asarray(obs.keypoints),
                           prev_desc=jnp.asarray(obs.descriptors),
                           prev_valid=jnp.asarray(obs.valid))

    ba1 = jax.jit(lambda m, first, win: ba_mod.ba_step(cfg, K, m, first, win),
                  donate_argnums=(0,))

    def run_single(reobs_lg: bool, n_chunks: int = 8):
        fn = fused.build_chunk_fn(cfg, sp, lg, K, CHUNK,
                                  reobs_with_lightglue=reobs_lg)
        st = mkstate(0)
        st, _ = fn(params, st, images1, jnp.asarray(1, jnp.int32))
        m = ba1(st.map, jnp.asarray(0, jnp.int32), jnp.asarray(9, jnp.int32))
        st = st._replace(map=m)
        int(st.map.num_kf)                       # sync after warmup
        t0 = time.perf_counter()
        for i in range(n_chunks):
            st, _ = fn(params, st, images1,
                       jnp.asarray(1 + (i + 1) * CHUNK, jnp.int32))
            if (i * CHUNK) % BA_EVERY == 0:
                first = jnp.asarray(max(2 + i * CHUNK - 3, 0), jnp.int32)
                m = ba1(st.map, first, jnp.asarray(CHUNK + 3, jnp.int32))
                st = st._replace(map=m)
        int(st.map.num_kf)
        dt = time.perf_counter() - t0
        return n_chunks * CHUNK / dt

    def run_multi(n_chunks: int = 6):
        fn = fused.build_multistream_chunk_fn(cfg, sp, lg, K, CHUNK, S,
                                              reobs_with_lightglue=True)
        import dataclasses
        import functools
        # vmap turns the early-stop lax.cond into select (both branches
        # execute), so encode the measured typical convergence (~12 iters)
        # as the explicit budget for the batched solver.
        cfg_ms = dataclasses.replace(
            cfg, ba=dataclasses.replace(cfg.ba, full_ba_iters=12))
        ba_ms = jax.jit(jax.vmap(
            functools.partial(ba_mod.ba_step, cfg_ms),
            in_axes=(None, 0, 0, 0)),
            donate_argnums=(1,))
        states = jax.vmap(mkstate)(jnp.arange(S, dtype=jnp.uint32))
        images = jnp.broadcast_to(images1, (S,) + images1.shape)
        images = jax.device_put(images)                    # staged in HBM
        states, _ = fn(params, states, images, jnp.asarray(1, jnp.int32))
        firsts = jnp.zeros((S,), jnp.int32)
        wins = jnp.full((S,), 9, jnp.int32)
        m = ba_ms(K, states.map, firsts, wins)
        states = states._replace(map=m)
        int(np.asarray(states.map.num_kf)[0])
        t0 = time.perf_counter()
        for i in range(n_chunks):
            states, _ = fn(params, states, images,
                           jnp.asarray(1 + (i + 1) * CHUNK, jnp.int32))
            if (i * CHUNK) % BA_EVERY == 0:
                first = max(2 + i * CHUNK - 3, 0)
                m = ba_ms(K, states.map,
                          jnp.full((S,), first, jnp.int32),
                          jnp.full((S,), CHUNK + 3, jnp.int32))
                states = states._replace(map=m)
        int(np.asarray(states.map.num_kf)[0])
        dt = time.perf_counter() - t0
        return n_chunks * CHUNK * S / dt

    fps_multi = run_multi()
    fps_single_parity = run_single(reobs_lg=True)
    fps_single_nn = run_single(reobs_lg=False)

    print(json.dumps({
        "metric": ("tracked frames/sec/chip (full learned pipeline at "
                   "reference parity: 1x SuperPoint + 3x LightGlue + subpix "
                   "+ RANSAC + pose-LM30 + windowed BA30 in-loop, KITTI "
                   "376x1241, N=2048, distinct frames)"),
        "value": round(fps_single_parity, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps_single_parity / 500.0, 4),
        "single_stream_mutualnn_reobs_fps": round(fps_single_nn, 2),
        "multistream_aggregate_fps": round(fps_multi, 2),
        "streams": S,
        "ba_every_frames": BA_EVERY,
        "parity_roofline_fps_at_100pct_mfu": 237,
    }))


if __name__ == "__main__":
    sys.exit(main())
