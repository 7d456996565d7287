"""A/B the detection top-K inside the batched extraction program.

Times build_extract_fn variants (whole extraction: CNN + NMS + top-K +
subpix + descriptor sampling) back-to-back in one TPU session, swapping the
detect_keypoints top-K strategy."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the axon TPU plugin)

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from gl_slam_tpu.config import FrontendConfig, MapConfig, SLAMConfig
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.models.superpoint import SuperPointNet
    from gl_slam_tpu.ops import nms as nms_ops
    from gl_slam_tpu.slam import fused

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
    sp = SuperPointNet(descriptor_dim=D)
    pad_h, pad_w = (-H) % 8, (-W) % 8
    sp_params = sp.init(key, jnp.zeros((1, H + pad_h, W + pad_w, 1)))
    params = fused.FusedParams(sp=sp_params, lg=None)
    img = synthetic.render_frame(scene, 1, max_keypoints=N)
    CH = 8
    images = jnp.asarray(jnp.broadcast_to(jnp.asarray(img), (CH, H, W)),
                         jnp.float32)

    def bench(name, fn, *args, n=16):
        out = fn(*args)
        np.asarray(jax.device_get(jnp.ravel(
            jax.tree_util.tree_leaves(out)[0])[:1]))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(jax.device_get(jnp.ravel(
            jax.tree_util.tree_leaves(out)[0])[:1]))
        dt = (time.perf_counter() - t0) / n
        print(f"{name:>44}: {dt*1e3:8.2f} ms/chunk  "
              f"{dt*1e3/CH:6.2f} ms/frame", flush=True)

    # full extraction with current detect_keypoints
    ext = jax.jit(lambda p, im: fused.build_extract_fn(cfg, sp)(p, im))
    bench("extract (current 2-stage topk)", ext, params, images)

    # CNN forward only
    x = jnp.pad(images, ((0, 0), (0, pad_h), (0, pad_w)))[..., None]
    fwd = jax.jit(lambda p, x: sp.apply(p.sp, x))
    bench("CNN fwd only", fwd, params, x)

    # detection only, variants
    heat, grid = fwd(params, x)
    heat = heat.astype(jnp.float32)

    det_cur = jax.jit(lambda h: nms_ops.detect_keypoints(h, N, 5e-4, 4))
    bench("detect (current)", det_cur, heat)

    def detect_rowcap(h, R):
        supp = nms_ops.nms(h, 4)
        B, Hh, Ww = supp.shape
        s_row, x_row = jax.lax.top_k(supp, R)
        rows = jnp.broadcast_to(
            jnp.arange(Hh, dtype=jnp.int32)[None, :, None], s_row.shape)
        scores, sel = jax.lax.top_k(s_row.reshape(B, Hh * R), N)
        xs = jnp.take_along_axis(x_row.reshape(B, Hh * R).astype(jnp.int32),
                                 sel, axis=1)
        ys = jnp.take_along_axis(rows.reshape(B, Hh * R), sel, axis=1)
        valid = scores > 5e-4
        return jnp.stack([xs, ys], -1), jnp.where(valid, scores, 0.), valid

    for R in (64, 32, 16):
        bench(f"detect (row cap R={R})",
              jax.jit(functools.partial(detect_rowcap, R=R)), heat)

    def detect_cumsum(h):
        # threshold mask -> index-ordered selection (no score ordering)
        from gl_slam_tpu.ops import select as select_ops
        supp = nms_ops.nms(h, 4)
        B, Hh, Ww = supp.shape
        flat = supp.reshape(B, Hh * Ww)
        def one(fl):
            ids, valid = select_ops.select_lowest_ids_cumsum(fl > 5e-4, N)
            idc = jnp.clip(ids, 0, Hh * Ww - 1)
            sc = fl[idc]
            return (jnp.stack([(idc % Ww).astype(jnp.int32),
                               (idc // Ww).astype(jnp.int32)], -1),
                    jnp.where(valid, sc, 0.0), valid)
        return jax.vmap(one)(flat)

    bench("detect (cumsum threshold)", jax.jit(detect_cumsum), heat)

    print("valid counts (scene image):",
          int(det_cur(heat)[2][0].sum()), flush=True)


if __name__ == "__main__":
    main()
