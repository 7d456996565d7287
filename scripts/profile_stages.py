"""Per-stage TPU timing of the tracked-frame pipeline (ablation profile).

Times each stage as its own jitted program at flagship shapes to locate the
per-frame cost. Run on the real TPU: `python scripts/profile_stages.py`.

Pass `--json PATH` to also write the stage->ms table as JSON; the committed
`PERF_BASELINE.json` at the repo root is exactly such a run, and
`scripts/bench_diff.py` compares a fresh run against it (the perf-regression
guard, VERDICT r1 item 10)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the axon TPU plugin)

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RESULTS = {}            # stage name -> mean ms (filled by bench())


def _force(out):
    """Force completion with a host read-back: the experimental axon PJRT's
    block_until_ready can return early, a D2H value read cannot."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))


def bench(name, fn, *args, n=20):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:>28}: {dt * 1e3:8.3f} ms", flush=True)
    RESULTS[name] = dt * 1e3
    return dt


def main():
    from gl_slam_tpu.config import (FrontendConfig, MapConfig, SLAMConfig)
    from gl_slam_tpu.geometry import essential, triangulation
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.models.lightglue import (LightGlueNet, assignment,
                                              normalize_keypoints)
    from gl_slam_tpu.models.superpoint import SuperPointNet, sample_descriptors
    from gl_slam_tpu.models.subpix import centroid_refine
    from gl_slam_tpu.ops import nms as nms_ops
    from gl_slam_tpu.ops import match as match_ops
    from gl_slam_tpu.slam import frontend, pose_ba, reobserve
    from gl_slam_tpu.slam.state import insert_keyframe

    H, W, N, D = 376, 1241, 2048, 256
    pad_h, pad_w = (-H) % 8, (-W) % 8
    cfg = SLAMConfig(
        frontend=FrontendConfig(image_height=H, image_width=W,
                                max_keypoints=N, descriptor_dim=D),
        map=MapConfig(max_keyframes=512, max_points=65536),
    )
    key = jax.random.PRNGKey(0)
    scene = synthetic.make_scene(num_landmarks=3000, num_frames=3,
                                 height=H, width=W, desc_dim=D, seed=0)
    obs0 = synthetic.observe_frame(scene, 0, max_keypoints=N)
    obs1 = synthetic.observe_frame(scene, 1, max_keypoints=N)
    K = jnp.asarray(scene.K, jnp.float32)
    img = jnp.asarray(synthetic.render_frame(scene, 1, max_keypoints=N),
                      jnp.float32)

    sp = SuperPointNet(descriptor_dim=D)
    sp_params = sp.init(key, jnp.zeros((1, H + pad_h, W + pad_w, 1)))
    lg = LightGlueNet(dim=256, heads=2, layers=9, input_dim=D)
    d8 = jnp.zeros((8, D)); k8 = jnp.zeros((8, 2)); m8 = jnp.ones((8,), bool)
    lg_params = lg.init(key, d8, d8, k8, k8, m8, m8)

    # --- stage: SuperPoint CNN forward
    x = jnp.pad(img[None], ((0, 0), (0, pad_h), (0, pad_w)))[..., None]
    sp_fwd = jax.jit(lambda p, x: sp.apply(p, x))
    heat, grid = sp_fwd(sp_params, x)
    bench("superpoint CNN", sp_fwd, sp_params, x)

    # --- stage: NMS+topK (pallas) and (xla)
    heat32 = heat.astype(jnp.float32)
    nms_p = jax.jit(lambda h: nms_ops.detect_keypoints(h, N, 0.0005, 4,
                                                       use_pallas=True))
    nms_x = jax.jit(lambda h: nms_ops.detect_keypoints(h, N, 0.0005, 4,
                                                       use_pallas=False))
    bench("NMS+topK (pallas)", nms_p, heat32)
    bench("NMS+topK (xla)", nms_x, heat32)

    kpts, scores, valid = nms_p(heat32)
    kpts = kpts[0].astype(jnp.float32); valid = valid[0]

    # --- stage: subpix + descriptor sampling
    bench("centroid refine", jax.jit(
        lambda h, k: centroid_refine(h, k, 5)), heat32[0], kpts)
    bench("desc sampling", jax.jit(
        lambda g, k: sample_descriptors(g, k)), grid[0], kpts)

    # --- stage: LightGlue 9 layers @ 2048
    desc = sample_descriptors(grid[0], kpts)
    kn = normalize_keypoints(kpts, H, W)
    lg_fwd = jax.jit(lambda p, d0, d1, k0, k1, m0, m1: assignment(
        *lg.apply(p, d0, d1, k0, k1, m0, m1), m0, m1, 0.0))
    bench("lightglue 9L@2048", lg_fwd, lg_params, desc, desc, kn, kn,
          valid, valid)

    # --- stage: mutual NN match 2048x2048x256
    bench("mutual NN match", jax.jit(
        lambda d0, v0, d1, v1: match_ops.mutual_nn_match(d0, v0, d1, v1)),
        desc, valid, desc, valid)

    # --- stage: essential RANSAC
    uv0 = jnp.asarray(obs0.keypoints); uv1 = jnp.asarray(obs1.keypoints)
    mask = jnp.asarray(obs0.valid)
    ess_fn = jax.jit(lambda u0, u1, m, k: essential.estimate_essential(
        K, u0, u1, m, k, threshold_px=0.5, num_hypotheses=512,
        refine_iters=10))
    bench("essential RANSAC 512", ess_fn, uv0, uv1, mask,
          jax.random.PRNGKey(1))

    # --- stage: pose-only LM 30 iters
    pts = jnp.asarray(scene.landmarks[obs1.landmark_ids.clip(0)], jnp.float32)
    pb_fn = jax.jit(lambda R, t, p, u, m: pose_ba.pose_only_ba(
        K, R, t, p, u, m, iters=30))
    bench("pose-only LM30", pb_fn, jnp.eye(3), jnp.zeros(3), pts, uv1, mask)

    # --- stage: triangulation 2048
    tri_fn = jax.jit(lambda u0, u1, m: triangulation.triangulate(
        K, jnp.eye(3), jnp.zeros(3), jnp.eye(3), jnp.ones(3), u0, u1, m))
    bench("triangulate 2048", tri_fn, uv0, uv1, mask)

    # --- stage: full track_step (oracle features, includes all the above
    #     minus SP/LG) and insert_keyframe alone
    state = frontend.init_track_state(cfg, key)
    state = state._replace(prev_kpts=jnp.asarray(obs0.keypoints),
                           prev_desc=jnp.asarray(obs0.descriptors),
                           prev_valid=jnp.asarray(obs0.valid))
    feats = frontend.FrameFeatures(kpts=jnp.asarray(obs1.keypoints),
                                   desc=jnp.asarray(obs1.descriptors),
                                   valid=jnp.asarray(obs1.valid),
                                   frame_idx=jnp.asarray(1, jnp.int32))
    ins_fn = jax.jit(lambda m: insert_keyframe(
        m, jnp.eye(3), jnp.zeros(3), jnp.asarray(1, jnp.int32),
        feats.kpts, feats.desc, feats.valid,
        jnp.full((N,), -1, jnp.int32), jnp.zeros((N, 3)),
        jnp.zeros((N,), bool), jnp.full((N,), -1, jnp.int32),
        jnp.full((N,), -1, jnp.int32), jnp.asarray(0, jnp.int32)))
    bench("insert_keyframe", ins_fn, state.map)

    reob_fn = jax.jit(lambda m, f: reobserve.match_map_window(
        cfg, K, m, jnp.eye(3), jnp.zeros(3), f,
        jnp.full((N,), -1, jnp.int32), jnp.zeros((N,), bool)))
    bench("map window reobs", reob_fn, state.map, feats)

    cov_fn = jax.jit(lambda m, f: reobserve.match_covisible(
        cfg, K, m, jnp.eye(3), jnp.zeros(3), f,
        jnp.full((N,), -1, jnp.int32), jnp.full((N,), -1, jnp.int32)))
    bench("covis retrieval", cov_fn, state.map, feats)

    ts_fn = jax.jit(lambda s, f: frontend.track_step(cfg, K, s, f))
    bench("track_step (oracle)", ts_fn, state, feats)

    # --- stage: windowed BA step at bench shapes (the in-loop backend cost)
    import dataclasses

    from gl_slam_tpu.config import BAConfig
    from gl_slam_tpu.slam import ba as ba_mod
    cfg_ba = dataclasses.replace(
        cfg, ba=BAConfig(max_window_cameras=12, max_window_points=2048,
                         full_ba_overlap=3))
    st2 = frontend.bootstrap_step(
        cfg_ba, K, state,
        frontend.FrameFeatures(kpts=jnp.asarray(obs0.keypoints),
                               desc=jnp.asarray(obs0.descriptors),
                               valid=jnp.asarray(obs0.valid),
                               frame_idx=jnp.asarray(0, jnp.int32)),
        feats, jnp.asarray(1.0, jnp.float32))[0]
    for i in range(2, 10):
        o = synthetic.observe_frame(scene, min(i, 2), max_keypoints=N)
        st2, _ = frontend.track_step(
            cfg_ba, K, st2,
            frontend.FrameFeatures(kpts=jnp.asarray(o.keypoints),
                                   desc=jnp.asarray(o.descriptors),
                                   valid=jnp.asarray(o.valid),
                                   frame_idx=jnp.asarray(i, jnp.int32)))
    ba_fn = jax.jit(lambda m: ba_mod.ba_step(
        cfg_ba, K, m, jnp.asarray(0, jnp.int32), jnp.asarray(10, jnp.int32)))
    bench("ba_step win<=12 LM30", ba_fn, st2.map, n=5)


if __name__ == "__main__":
    main()
    if "--json" in _sys.argv:
        path = _sys.argv[_sys.argv.index("--json") + 1]
        with open(path, "w") as f:
            json.dump({"backend": jax.default_backend(),
                       "stages_ms": {k: round(v, 3)
                                     for k, v in RESULTS.items()}},
                      f, indent=1)
        print(f"wrote {path}")
