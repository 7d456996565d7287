"""Ablation: where does the per-frame time go inside the fused chunk?

Times build_chunk_fn variants on the real TPU at flagship shapes.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def force(x):
    # Host read-back of a small leaf forces completion (no new program
    # compile — the axon remote-compile path can reject ad-hoc programs).
    leaves = jax.tree_util.tree_leaves(x)
    leaf = min(leaves, key=lambda a: a.size)
    np.asarray(jax.device_get(leaf))


def timeit(name, fn, *args, n=10, chunk=8):
    out = fn(*args)
    force(out)
    # re-fetch donated state if present
    t0 = time.perf_counter()
    outs = None
    for _ in range(n):
        outs = fn(*args)
    force(outs)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:>40}: {dt * 1e3:8.2f} ms/chunk  "
          f"{dt * 1e3 / chunk:6.2f} ms/frame", flush=True)
    return dt


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
    lg = LightGlueNet(dim=256, heads=4, layers=9, input_dim=D)
    pad_h, pad_w = (-H) % 8, (-W) % 8
    sp_params = sp.init(key, jnp.zeros((1, H + pad_h, W + pad_w, 1)))
    d8 = jnp.zeros((8, D)); k8 = jnp.zeros((8, 2)); m8 = jnp.ones((8,), bool)
    lg_params = lg.init(key, d8, d8, k8, k8, m8, m8)
    params = fused.FusedParams(sp=sp_params, lg=lg_params)

    def mkstate():
        st = frontend.init_track_state(cfg, key)
        obs = synthetic.observe_frame(scene, 0, max_keypoints=N)
        return st._replace(prev_kpts=jnp.asarray(obs.keypoints),
                           prev_desc=jnp.asarray(obs.descriptors),
                           prev_valid=jnp.asarray(obs.valid))

    img = synthetic.render_frame(scene, 1, max_keypoints=N)

    for CHUNK in (8, 16, 32):
        images = jnp.asarray(
            jnp.broadcast_to(jnp.asarray(img), (CHUNK, H, W)), jnp.float32)
        idx0 = jnp.asarray(1, jnp.int32)

        # Full pipeline (no donation for repeatable timing: state reused)
        full = fused.build_chunk_fn(cfg, sp, lg, K, CHUNK)
        st = mkstate()
        st2, _ = full(params, st, images, idx0)
        force(st2)

        # Donated state: ping-pong with the returned state
        states = [mkstate()]
        def ping(params, images, idx0):
            s, o = full(params, states[0], images, idx0)
            states[0] = s
            return o
        timeit(f"full chunk={CHUNK}", ping, params, images, idx0, chunk=CHUNK)

        # No covis retrieval
        nocov = fused.build_chunk_fn(cfg_nocov, sp, lg, K, CHUNK)
        states_nc = [mkstate()]
        def ping_nc(params, images, idx0):
            s, o = nocov(params, states_nc[0], images, idx0)
            states_nc[0] = s
            return o
        timeit(f"no-covis chunk={CHUNK}", ping_nc, params, images, idx0,
               chunk=CHUNK)

        # Mutual-NN instead of LightGlue for pass 1
        nolg = fused.build_chunk_fn(cfg, sp, lg, K, CHUNK,
                                    match_with_lightglue=False)
        states_nl = [mkstate()]
        def ping_nl(params, images, idx0):
            s, o = nolg(params, states_nl[0], images, idx0)
            states_nl[0] = s
            return o
        timeit(f"mutualNN-pass1 chunk={CHUNK}", ping_nl, params, images,
               idx0, chunk=CHUNK)

    # Extraction only, batched
    CHUNK = 8
    images = jnp.asarray(
        jnp.broadcast_to(jnp.asarray(img), (CHUNK, H, W)), jnp.float32)
    from gl_slam_tpu.models.subpix import centroid_refine
    from gl_slam_tpu.models.superpoint import sample_descriptors
    from gl_slam_tpu.ops import nms as nms_ops

    @jax.jit
    def extract_only(sp_params, images):
        x = jnp.pad(images, ((0, 0), (0, pad_h), (0, pad_w)))[..., None]
        heat, grid = sp.apply(sp_params, x)
        row_ok = jnp.arange(heat.shape[1]) < H
        col_ok = jnp.arange(heat.shape[2]) < W
        heat = heat * row_ok[None, :, None] * col_ok[None, None, :]
        kpts, scores, valid = nms_ops.detect_keypoints(heat, N, 5e-4, 4)
        kpts = kpts.astype(jnp.float32)
        kpts = jax.vmap(lambda h, k: centroid_refine(h, k, 5))(heat, kpts)
        desc = jax.vmap(sample_descriptors)(grid, kpts)
        return kpts, desc, valid

    timeit("extract-only chunk=8", extract_only, sp_params, images, chunk=8)

    @jax.jit
    def sp_only(sp_params, images):
        x = jnp.pad(images, ((0, 0), (0, pad_h), (0, pad_w)))[..., None]
        return sp.apply(sp_params, x)

    timeit("SP-CNN-only chunk=8", sp_only, sp_params, images, chunk=8)

    # track_step only (oracle features), scanned over 8 frames
    obs1 = synthetic.observe_frame(scene, 1, max_keypoints=N)
    kb = jnp.broadcast_to(jnp.asarray(obs1.keypoints), (CHUNK, N, 2))
    db = jnp.broadcast_to(jnp.asarray(obs1.descriptors), (CHUNK, N, D))
    vb = jnp.broadcast_to(jnp.asarray(obs1.valid), (CHUNK, N))

    def scan_track(cfg_):
        def fn(state, kb, db, vb, idx0):
            def body(s, inp):
                k, d, v, i = inp
                f = frontend.FrameFeatures(kpts=k, desc=d, valid=v,
                                           frame_idx=i)
                return frontend.track_step(cfg_, K, s, f)
            idxs = idx0 + jnp.arange(CHUNK, dtype=jnp.int32)
            return jax.lax.scan(body, state, (kb, db, vb, idxs))
        return jax.jit(fn)

    ts = scan_track(cfg)
    states_t = [mkstate()]
    def ping_t(kb, db, vb):
        s, o = ts(states_t[0], kb, db, vb, jnp.asarray(1, jnp.int32))
        states_t[0] = s
        return o
    timeit("track-scan (oracle) chunk=8", ping_t, kb, db, vb, chunk=8)

    ts_nc = scan_track(cfg_nocov)
    states_t2 = [mkstate()]
    def ping_t2(kb, db, vb):
        s, o = ts_nc(states_t2[0], kb, db, vb, jnp.asarray(1, jnp.int32))
        states_t2[0] = s
        return o
    timeit("track-scan no-covis chunk=8", ping_t2, kb, db, vb, chunk=8)


if __name__ == "__main__":
    main()
