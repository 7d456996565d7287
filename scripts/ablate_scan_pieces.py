"""In-scan cost of each tracking-step component at flagship shapes.

Each piece is timed as `lax.scan` over 8 iterations inside ONE jitted
program (same conditions as the fused chunk body), so dispatch overhead and
standalone-program scheduling artifacts cancel out."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the axon TPU plugin)

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T = 8


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
    print(f"{name:>40}: {dt*1e3:8.2f} ms/scan8  {dt*1e3/T:6.2f} ms/iter",
          flush=True)


def main():
    from gl_slam_tpu.config import FrontendConfig, MapConfig, SLAMConfig
    from gl_slam_tpu.geometry import essential, triangulation
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.ops import match as match_ops
    from gl_slam_tpu.slam import frontend, pose_ba, reobserve
    from gl_slam_tpu.slam.state import insert_keyframe

    H, W, N, D = 376, 1241, 2048, 256
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

    st = frontend.init_track_state(cfg, key)
    f0 = frontend.FrameFeatures(kpts=jnp.asarray(obs0.keypoints),
                                desc=jnp.asarray(obs0.descriptors),
                                valid=jnp.asarray(obs0.valid),
                                frame_idx=jnp.asarray(0, jnp.int32))
    f1 = frontend.FrameFeatures(kpts=jnp.asarray(obs1.keypoints),
                                desc=jnp.asarray(obs1.descriptors),
                                valid=jnp.asarray(obs1.valid),
                                frame_idx=jnp.asarray(1, jnp.int32))
    st, _ = frontend.bootstrap_step(cfg, K, st, f0, f1,
                                    jnp.asarray(1.0, jnp.float32))
    m = st.map

    def scan8(body):
        def fn(carry, *xs):
            return jax.lax.scan(lambda c, _: (body(c), None), carry, None,
                                length=T)[0]
        return jax.jit(fn)

    # mutual NN match in-scan
    bench("mutualNN 2048x2048", scan8(
        lambda c: c._replace(prev_desc=jnp.roll(match_ops.mutual_nn_match(
            c.prev_desc, c.prev_valid, f1.desc, f1.valid
        ).mscores0[:, None] * 0 + c.prev_desc, 1, axis=0))), st)

    # essential RANSAC 512/10 in-scan
    def ess_body(c):
        e = essential.estimate_essential(K, c.prev_kpts, f1.kpts,
                                         c.prev_valid, c.key,
                                         threshold_px=0.5,
                                         num_hypotheses=512, refine_iters=10)
        return c._replace(R_cur=e.R, key=jax.random.fold_in(c.key, 1))
    bench("essential 512/10", scan8(ess_body), st)

    # pose-only LM30 in-scan
    pts = jnp.asarray(scene.landmarks[obs1.landmark_ids.clip(0)], jnp.float32)
    def pb_body(c):
        r = pose_ba.pose_only_ba(K, c.R_cur, c.t_cur, pts, f1.kpts,
                                 f1.valid, iters=30)
        return c._replace(R_cur=r.R, t_cur=r.t)
    bench("pose-LM30", scan8(pb_body), st)

    # triangulation in-scan
    def tri_body(c):
        tr = triangulation.triangulate(K, c.R_cur, c.t_cur, c.R_cur,
                                       c.t_cur + 1.0, c.prev_kpts, f1.kpts,
                                       mask=c.prev_valid, max_depth=100.0,
                                       max_reproj_px=0.1)
        return c._replace(t_cur=c.t_cur + tr.points[0] * 1e-9)
    bench("triangulate 2048", scan8(tri_body), st)

    # map-window reobserve (mutual-NN) in-scan
    def reobs_body(c):
        r = reobserve.match_map_window(cfg, K, c.map, c.R_cur, c.t_cur, f1,
                                       jnp.full((N,), -1, jnp.int32),
                                       jnp.zeros((N,), bool))
        return c._replace(t_cur=c.t_cur + r.num_candidates * 1e-9)
    bench("map-window reobs (NN)", scan8(reobs_body), st)

    # covis retrieval (mutual-NN) in-scan
    def covis_body(c):
        r = reobserve.match_covisible(cfg, K, c.map, c.R_cur, c.t_cur, f1,
                                      seed_mpid=c.map.kf_kp2mp[0],
                                      already_mpid=c.map.kf_kp2mp[0])
        return c._replace(t_cur=c.t_cur + r.num_candidates * 1e-9)
    bench("covis retrieval (NN)", scan8(covis_body), st)

    # insert_keyframe in-scan
    def ins_body(c):
        m2 = insert_keyframe(
            c.map, c.R_cur, c.t_cur, jnp.asarray(2, jnp.int32),
            f1.kpts, f1.desc, f1.valid,
            jnp.full((N,), -1, jnp.int32),
            jnp.zeros((N, 3), jnp.float32), f1.valid,
            jnp.arange(N, dtype=jnp.int32), jnp.arange(N, dtype=jnp.int32),
            jnp.asarray(0, jnp.int32))
        return c._replace(map=m2)
    bench("insert_keyframe", scan8(ins_body), st)

    # no-op baseline (scan overhead)
    bench("scan noop", scan8(
        lambda c: c._replace(t_cur=c.t_cur + 1e-9)), st)


if __name__ == "__main__":
    main()
