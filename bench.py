"""Benchmark: tracked frames/sec/chip on the flagship learned pipeline.

Measures the steady-state per-frame cost of the full learned pipeline —
SuperPoint-style extraction at KITTI 376x1241 (batched over the chunk),
fused NMS+top-K, sub-pixel refinement, LightGlue-style attention matching at
N=2048, essential RANSAC, map re-observation + covisibility retrieval,
pose-only LM, triangulation, keyframe/map insertion — processing CHUNKS of
frames per dispatch (slam/fused.py) to amortize the per-program dispatch
latency. Prints ONE JSON line.

vs_baseline is measured against the driver-set north star of 500 tracked
frames/sec/chip (BASELINE.json; the reference publishes no numbers of its
own — BASELINE.md documents this).
"""

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gl_slam_tpu.config import (FrontendConfig, MapConfig, SLAMConfig)
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.models.lightglue import LightGlueNet
    from gl_slam_tpu.models.superpoint import SuperPointNet
    from gl_slam_tpu.slam import frontend, fused

    H, W, N, D = 376, 1241, 2048, 256
    CHUNK = 8
    cfg = SLAMConfig(
        frontend=FrontendConfig(image_height=H, image_width=W,
                                max_keypoints=N, descriptor_dim=D,
                                score_threshold=5e-4),
        map=MapConfig(max_keyframes=512, max_points=65536),
    )
    key = jax.random.PRNGKey(0)
    scene = synthetic.make_scene(num_landmarks=3000, num_frames=3,
                                 height=H, width=W, desc_dim=D, seed=0)
    K = jnp.asarray(scene.K, jnp.float32)

    sp = SuperPointNet(descriptor_dim=D)
    lg = LightGlueNet(dim=256, heads=4, layers=9, input_dim=D)
    pad_h, pad_w = (-H) % 8, (-W) % 8
    sp_params = sp.init(key, jnp.zeros((1, H + pad_h, W + pad_w, 1)))
    d8 = jnp.zeros((8, D)); k8 = jnp.zeros((8, 2)); m8 = jnp.ones((8,), bool)
    lg_params = lg.init(key, d8, d8, k8, k8, m8, m8)
    params = fused.FusedParams(sp=sp_params, lg=lg_params)

    chunk_fn = fused.build_chunk_fn(cfg, sp, lg, K, CHUNK)

    state = frontend.init_track_state(cfg, key)
    obs = synthetic.observe_frame(scene, 0, max_keypoints=N)
    state = state._replace(prev_kpts=jnp.asarray(obs.keypoints),
                           prev_desc=jnp.asarray(obs.descriptors),
                           prev_valid=jnp.asarray(obs.valid))
    img = synthetic.render_frame(scene, 1, max_keypoints=N)
    images = jnp.asarray(
        jnp.broadcast_to(jnp.asarray(img), (CHUNK, H, W)), jnp.float32)

    # Warm-up / compile (state donated: re-fetch the returned one)
    st = state
    st, _ = chunk_fn(params, st, images, jnp.asarray(1, jnp.int32))
    int(st.map.num_kf)  # host read-back: forces completion (axon block_
    #                     until_ready can return early)

    n_chunks = 8
    t0 = time.time()
    for i in range(n_chunks):
        st, _ = chunk_fn(params, st, images,
                         jnp.asarray(1 + i * CHUNK, jnp.int32))
    assert int(st.map.num_kf) >= 0
    elapsed = time.time() - t0

    fps = n_chunks * CHUNK / elapsed
    print(json.dumps({
        "metric": "tracked frames/sec/chip (full learned pipeline, KITTI 376x1241, N=2048, chunk=8)",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 500.0, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
