"""Measure ba_step cost vs early-stop tolerance + in-scan insert cost."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the axon TPU plugin)

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench(name, fn, *args, n=10):
    out = fn(*args)
    np.asarray(jax.device_get(jnp.ravel(
        jax.tree_util.tree_leaves(out)[0])[:1]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.device_get(jnp.ravel(
        jax.tree_util.tree_leaves(out)[0])[:1]))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:>44}: {dt*1e3:8.2f} ms", flush=True)
    return out


def main():
    from gl_slam_tpu.config import (BAConfig, FrontendConfig, MapConfig,
                                    SLAMConfig)
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.slam import ba as ba_mod
    from gl_slam_tpu.slam import frontend
    from gl_slam_tpu.slam.state import insert_keyframe

    H, W, N, D = 376, 1241, 2048, 256
    cfg = SLAMConfig(
        frontend=FrontendConfig(image_height=H, image_width=W,
                                max_keypoints=N, descriptor_dim=D),
        map=MapConfig(max_keyframes=512, max_points=65536),
        ba=BAConfig(max_window_cameras=12, max_window_points=2048,
                    full_ba_overlap=3),
    )
    key = jax.random.PRNGKey(0)
    scene = synthetic.make_scene(num_landmarks=3000, num_frames=12,
                                 height=H, width=W, desc_dim=D, seed=0)
    K = jnp.asarray(scene.K, jnp.float32)

    # Build a 10-keyframe map with the oracle front-end
    st = frontend.init_track_state(cfg, key)
    def feat(i):
        o = synthetic.observe_frame(scene, i, max_keypoints=N, noise_px=0.3,
                                    seed=i)
        return frontend.FrameFeatures(kpts=jnp.asarray(o.keypoints),
                                      desc=jnp.asarray(o.descriptors),
                                      valid=jnp.asarray(o.valid),
                                      frame_idx=jnp.asarray(i, jnp.int32))
    c0 = -scene.poses_R[0].T @ scene.poses_t[0]
    c1 = -scene.poses_R[1].T @ scene.poses_t[1]
    st, _ = frontend.bootstrap_step(
        cfg, K, st, feat(0), feat(1),
        jnp.asarray(float(np.linalg.norm(c1 - c0)), jnp.float32))
    ts = jax.jit(lambda s, f: frontend.track_step(cfg, K, s, f))
    for i in range(2, 10):
        st, _ = ts(st, feat(i))
    print("map: kf", int(st.map.num_kf), "pts", int(st.map.num_pts),
          flush=True)

    # insert_keyframe in-scan (8 iters)
    T = 8
    f1 = feat(10)
    def ins_body(c):
        m2 = insert_keyframe(
            c.map, c.R_cur, c.t_cur, jnp.asarray(10, jnp.int32),
            f1.kpts, f1.desc, f1.valid,
            jnp.full((N,), -1, jnp.int32),
            jnp.zeros((N, 3), jnp.float32), f1.valid,
            jnp.arange(N, dtype=jnp.int32), jnp.arange(N, dtype=jnp.int32),
            jnp.asarray(0, jnp.int32))
        return c._replace(map=m2)
    scan_ins = jax.jit(lambda c: jax.lax.scan(
        lambda cc, _: (ins_body(cc), None), c, None, length=T)[0])
    bench("insert_keyframe scan8 (merged scatters)", scan_ins, st)
    scan_noop = jax.jit(lambda c: jax.lax.scan(
        lambda cc, _: (cc._replace(t_cur=cc.t_cur + 1e-9), None), c, None,
        length=T)[0])
    bench("scan8 noop", scan_noop, st)

    # ba_step at tolerances
    for tol in (1e-4, 3e-4, 1e-3):
        cfg_t = dataclasses.replace(
            cfg, ba=dataclasses.replace(cfg.ba, lm_rel_tol=tol))
        fn = jax.jit(lambda m, cfg_t=cfg_t: ba_mod.ba_step(
            cfg_t, K, m, jnp.asarray(0, jnp.int32),
            jnp.asarray(10, jnp.int32)))
        out = bench(f"ba_step win10 tol={tol:g}", fn, st.map)

    # Reprojection quality after BA per tolerance (host check)
    def mean_reproj(mstate):
        prob = ba_mod.extract_window(cfg, mstate, jnp.asarray(0),
                                     jnp.asarray(10))
        Kc = cfg.ba.max_window_cameras
        R = mstate.kf_R[jnp.clip(prob.cam_ids, 0, 511)]
        t = mstate.kf_t[jnp.clip(prob.cam_ids, 0, 511)]
        X = mstate.pts_xyz[jnp.clip(prob.pt_ids, 0, 65535)]
        r, _, _, behind = ba_mod._residual_jacobians(K, R, t, X, prob)
        msk = prob.obs_mask & ~behind
        e = jnp.sqrt(jnp.sum(r * r, axis=1))
        return float(jnp.sum(jnp.where(msk, e, 0)) / jnp.sum(msk))

    print(f"pre-BA mean reproj {mean_reproj(st.map):.4f} px", flush=True)
    for tol in (1e-4, 3e-4, 1e-3):
        cfg_t = dataclasses.replace(
            cfg, ba=dataclasses.replace(cfg.ba, lm_rel_tol=tol))
        m2 = jax.jit(lambda m, cfg_t=cfg_t: ba_mod.ba_step(
            cfg_t, K, m, jnp.asarray(0, jnp.int32),
            jnp.asarray(10, jnp.int32)))(st.map)
        print(f"tol={tol:g} -> mean reproj {mean_reproj(m2):.4f} px",
              flush=True)


if __name__ == "__main__":
    main()
