"""Ablation: where does the per-frame time go inside the fused chunk?

Times build_chunk_fn variants on the real TPU at flagship shapes. Each
variant ping-pongs the donated state exactly like bench.py.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the axon TPU plugin)

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from gl_slam_tpu.config import (FrontendConfig, MapConfig, SLAMConfig)
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.models.lightglue import LightGlueNet
    from gl_slam_tpu.models.superpoint import SuperPointNet
    from gl_slam_tpu.slam import frontend, fused

    H, W, N, D = 376, 1241, 2048, 256
    cfg = SLAMConfig(
        frontend=FrontendConfig(image_height=H, image_width=W,
                                max_keypoints=N, descriptor_dim=D,
                                score_threshold=5e-4),
        map=MapConfig(max_keyframes=512, max_points=65536),
    )
    cfg_nocov = SLAMConfig(
        frontend=cfg.frontend,
        map=MapConfig(max_keyframes=512, max_points=65536,
                      use_covis_retrieval=False),
    )
    key = jax.random.PRNGKey(0)
    scene = synthetic.make_scene(num_landmarks=3000, num_frames=3,
                                 height=H, width=W, desc_dim=D, seed=0)
    K = jnp.asarray(scene.K, jnp.float32)

    sp = SuperPointNet(descriptor_dim=D)
    lg = LightGlueNet(dim=256, heads=2, layers=9, input_dim=D)
    pad_h, pad_w = (-H) % 8, (-W) % 8
    sp_params = sp.init(key, jnp.zeros((1, H + pad_h, W + pad_w, 1)))
    d8 = jnp.zeros((8, D)); k8 = jnp.zeros((8, 2)); m8 = jnp.ones((8,), bool)
    lg_params = lg.init(key, d8, d8, k8, k8, m8, m8)
    params = fused.FusedParams(sp=sp_params, lg=lg_params)

    obs0 = synthetic.observe_frame(scene, 0, max_keypoints=N)
    img = synthetic.render_frame(scene, 1, max_keypoints=N)

    _mk_count = [0]

    def mkstate():
        # Fresh key per state: the chunk fn donates the state, so a shared
        # key buffer would be use-after-donate on the next variant.
        _mk_count[0] += 1
        st = frontend.init_track_state(cfg, jax.random.PRNGKey(_mk_count[0]))
        return st._replace(prev_kpts=jnp.asarray(obs0.keypoints),
                           prev_desc=jnp.asarray(obs0.descriptors),
                           prev_valid=jnp.asarray(obs0.valid))

    def run_variant(name, chunk_fn, chunk, n=8):
        st = mkstate()
        st, _ = chunk_fn(params, st,
                         jnp.asarray(jnp.broadcast_to(jnp.asarray(img),
                                                      (chunk, H, W)),
                                     jnp.float32),
                         jnp.asarray(1, jnp.int32))
        int(st.map.num_kf)          # force warmup completion (host read)
        images = jnp.asarray(jnp.broadcast_to(jnp.asarray(img),
                                              (chunk, H, W)), jnp.float32)
        t0 = time.perf_counter()
        for i in range(n):
            st, _ = chunk_fn(params, st, images,
                             jnp.asarray(1 + i * chunk, jnp.int32))
        int(st.map.num_kf)          # force
        dt = (time.perf_counter() - t0) / n
        print(f"{name:>36}: {dt * 1e3:8.2f} ms/chunk  "
              f"{dt * 1e3 / chunk:6.2f} ms/frame "
              f"({chunk / dt:6.1f} fps)", flush=True)

    # --- extraction/tracking split -------------------------------------
    CH = 8
    images8 = jnp.asarray(jnp.broadcast_to(jnp.asarray(img), (CH, H, W)),
                          jnp.float32)
    ext = jax.jit(lambda p, im: fused.build_extract_fn(cfg, sp)(p, im))
    feats = ext(params, images8)
    np.asarray(feats[0][:1, :1])
    t0 = time.perf_counter()
    for _ in range(16):
        feats = ext(params, images8)
    np.asarray(feats[0][:1, :1])
    dt = (time.perf_counter() - t0) / 16
    print(f"{'extract only chunk=8':>36}: {dt*1e3:8.2f} ms/chunk  "
          f"{dt*1e3/CH:6.2f} ms/frame", flush=True)

    track_par = jax.jit(
        lambda p, s, f, i: fused.build_chunk_fn(
            cfg, sp, lg, K, CH, jit=False, reobs_with_lightglue=True)(
            p, s, None, i, features=f), donate_argnums=(1,))
    st = mkstate()
    st, _ = track_par(params, st, feats, jnp.asarray(1, jnp.int32))
    int(st.map.num_kf)
    t0 = time.perf_counter()
    for i in range(8):
        st, _ = track_par(params, st, feats, jnp.asarray(1 + i * CH,
                                                         jnp.int32))
    int(st.map.num_kf)
    dt = (time.perf_counter() - t0) / 8
    print(f"{'track only (LG x3) chunk=8':>36}: {dt*1e3:8.2f} ms/chunk  "
          f"{dt*1e3/CH:6.2f} ms/frame", flush=True)

    for CHUNK in (8, 16):
        run_variant(
            f"LG x3 (parity) chunk={CHUNK}",
            fused.build_chunk_fn(cfg, sp, lg, K, CHUNK,
                                 reobs_with_lightglue=True), CHUNK)
        run_variant(
            f"LG x1 + mutualNN reobs chunk={CHUNK}",
            fused.build_chunk_fn(cfg, sp, lg, K, CHUNK,
                                 reobs_with_lightglue=False), CHUNK)
        run_variant(
            f"mutualNN everywhere chunk={CHUNK}",
            fused.build_chunk_fn(cfg, sp, lg, K, CHUNK,
                                 match_with_lightglue=False,
                                 reobs_with_lightglue=False), CHUNK)
        run_variant(
            f"LG x1, no covis chunk={CHUNK}",
            fused.build_chunk_fn(cfg_nocov, sp, lg, K, CHUNK,
                                 reobs_with_lightglue=False), CHUNK)

    # --- geometry component costs (all with LG x1 + mutual-NN reobs) -----
    import dataclasses
    CH = 8
    cfg_light = dataclasses.replace(
        cfg, geometry=dataclasses.replace(cfg.geometry,
                                          essential_hypotheses=128,
                                          essential_refine_iters=4))
    run_variant("ess 128 hyp / 4 IRLS chunk=8",
                fused.build_chunk_fn(cfg_light, sp, lg, K, CH,
                                     reobs_with_lightglue=False), CH)
    cfg_nopb = dataclasses.replace(
        cfg, runtime=dataclasses.replace(cfg.runtime, run_pose_ba=False))
    run_variant("no pose-LM chunk=8",
                fused.build_chunk_fn(cfg_nopb, sp, lg, K, CH,
                                     reobs_with_lightglue=False), CH)
    cfg_small = dataclasses.replace(
        cfg, map=dataclasses.replace(cfg.map, covis_max_points=256))
    run_variant("reobs cand 256 chunk=8",
                fused.build_chunk_fn(cfg_small, sp, lg, K, CH,
                                     reobs_with_lightglue=False), CH)
    run_variant("reobs cand 256 + LG x3 chunk=8",
                fused.build_chunk_fn(cfg_small, sp, lg, K, CH,
                                     reobs_with_lightglue=True), CH)


if __name__ == "__main__":
    main()
