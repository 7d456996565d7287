"""In-process A/B of the map-point selection op inside the fused chunk.

Swaps select_ops implementations before building each chunk fn, so all
variants run back-to-back in one TPU session (immune to session drift)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the axon TPU plugin)

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from gl_slam_tpu.config import FrontendConfig, MapConfig, SLAMConfig
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.models.lightglue import LightGlueNet
    from gl_slam_tpu.models.superpoint import SuperPointNet
    from gl_slam_tpu.ops import select as select_ops
    from gl_slam_tpu.slam import frontend, fused

    H, W, N, D = 376, 1241, 2048, 256
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
    lg = LightGlueNet(dim=256, heads=2, layers=9, input_dim=D)
    pad_h, pad_w = (-H) % 8, (-W) % 8
    sp_params = sp.init(key, jnp.zeros((1, H + pad_h, W + pad_w, 1)))
    d8 = jnp.zeros((8, D)); k8 = jnp.zeros((8, 2)); m8 = jnp.ones((8,), bool)
    lg_params = lg.init(key, d8, d8, k8, k8, m8, m8)
    params = fused.FusedParams(sp=sp_params, lg=lg_params)

    obs0 = synthetic.observe_frame(scene, 0, max_keypoints=N)
    img = synthetic.render_frame(scene, 1, max_keypoints=N)
    _n = [0]

    def mkstate():
        _n[0] += 1
        st = frontend.init_track_state(cfg, jax.random.PRNGKey(_n[0]))
        return st._replace(prev_kpts=jnp.asarray(obs0.keypoints),
                           prev_desc=jnp.asarray(obs0.descriptors),
                           prev_valid=jnp.asarray(obs0.valid))

    CH = 8
    images = jnp.asarray(jnp.broadcast_to(jnp.asarray(img), (CH, H, W)),
                         jnp.float32)

    impls = {
        "topk": (select_ops.select_lowest_ids,
                 select_ops.select_newest_ids),
        "cumsum+scatter": (select_ops.select_lowest_ids_cumsum,
                           select_ops.select_newest_ids_cumsum),
        "searchsorted": (select_ops.select_lowest_ids_ss,
                         select_ops.select_newest_ids_ss),
    }
    base = (select_ops.select_lowest_ids, select_ops.select_newest_ids)

    def run(name, lo, hi, reobs):
        select_ops.select_lowest_ids = lo
        select_ops.select_newest_ids = hi
        try:
            fn = fused.build_chunk_fn(cfg, sp, lg, K, CH,
                                      reobs_with_lightglue=reobs)
            st = mkstate()
            st, _ = fn(params, st, images, jnp.asarray(1, jnp.int32))
            int(st.map.num_kf)
            t0 = time.perf_counter()
            n = 8
            for i in range(n):
                st, _ = fn(params, st, images,
                           jnp.asarray(1 + i * CH, jnp.int32))
            int(st.map.num_kf)
            dt = (time.perf_counter() - t0) / n
            tag = "LGx3" if reobs else "LGx1"
            print(f"{tag} select={name:>16}: {dt*1e3:8.2f} ms/chunk  "
                  f"{dt*1e3/CH:6.2f} ms/frame ({CH/dt:6.1f} fps)",
                  flush=True)
        finally:
            select_ops.select_lowest_ids, select_ops.select_newest_ids = base

    for rep in range(2):
        for reobs in (False, True):
            for name, (lo, hi) in impls.items():
                run(name, lo, hi, reobs)


if __name__ == "__main__":
    main()
