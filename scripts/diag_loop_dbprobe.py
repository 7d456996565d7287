"""Measure the keyframe-db matcher's TRUE precision at the re-traversal.

diag_loopdetect_learned.py round 5 shows the db path reaching the matcher
(good=30-70 hits) but dying at PnP (0-2 inliers). This probes the match
quality directly: track the re-traversal circle to a probe frame, pick
candidate old keyframes, run the exact db matcher (stored kf features vs
current frame), and check each hit against GROUND TRUTH (project the stored
3D snapshot under the current frame's GT pose; < 3 px = true). Also prints
the score distribution of true vs false hits — if true hits exist but are
outnumbered, the fix is thresholds/ratio; if true hits are absent, the
stored-descriptor premise fails even at separation ~0.

  python scripts/diag_loop_dbprobe.py --frames 420 --period 360 --stop 368
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses

import numpy as np

ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=420)
    ap.add_argument("--period", type=int, default=360)
    ap.add_argument("--seed", type=int, default=31)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--stop", type=int, default=368)
    ap.add_argument("--save-state", default="",
                    help="npz path to dump the map state + frame features "
                    "at the probe frame (fast offline iteration)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.models.lightglue import normalize_keypoints
    from gl_slam_tpu.ops import assignment as assignment_ops
    from gl_slam_tpu.slam import fused
    from gl_slam_tpu.slam.chunk_driver import ChunkedPipeline
    from gl_slam_tpu.train import e2e

    n = args.frames
    cfg = e2e.flagship_config()
    H, W = cfg.frontend.image_height, cfg.frontend.image_width
    D = cfg.frontend.descriptor_dim
    N = cfg.frontend.max_keypoints
    scene = synthetic.make_scene(num_landmarks=max(20000, n * 170),
                                 num_frames=n, height=H, width=W,
                                 desc_dim=D, seed=args.seed, motion="loop",
                                 loop_period=args.period)
    cfg = dataclasses.replace(cfg, map=dataclasses.replace(
        cfg.map, max_keyframes=max(512, 1 << (n - 1).bit_length())))
    per = f"_p{args.period}" if args.period else ""
    cache = _os.path.join(
        "/tmp", f"render_loop{per}_{args.seed}_{n}_{H}x{W}.npy")
    stack = np.load(cache)

    sp, sp_params, lg, lg_params = e2e.load_flagship_frontend(
        _os.path.join(ROOT, "checkpoints"))
    ks_head, ks_params = e2e.load_flagship_subpix(
        _os.path.join(ROOT, "checkpoints"), pair=True)
    params = fused.FusedParams(sp=sp_params, lg=lg_params, ks=ks_params)
    K = jnp.asarray(scene.K, jnp.float32)
    pipe = ChunkedPipeline(cfg, K, sp, lg, params, chunk=args.chunk,
                           ba_every=8, subpix_head=ks_head)
    pipe._maybe_loop_close = lambda: None      # probe isolation
    c0 = -scene.poses_R[0].T @ scene.poses_t[0]
    c1 = -scene.poses_R[1].T @ scene.poses_t[1]
    pipe.bootstrap_from_images(stack[0], stack[1],
                               float(np.linalg.norm(c1 - c0)))
    all_imgs = jnp.asarray(stack[2:n])
    start = 2
    while start + args.chunk <= min(args.stop, n):
        imgs = jax.lax.dynamic_slice_in_dim(all_imgs, start - 2, args.chunk)
        pipe.track_chunk(imgs, start)
        start += args.chunk
    pipe.finish()
    fi = start - 1                     # prev frame features = frame fi
    st = pipe.state
    m = st.map
    print(f"probe frame {fi} (re-traversal of ~f{fi - args.period}), "
          f"kf={int(m.num_kf)}")
    if args.save_state:
        flat = {f"map_{k}": np.asarray(v)
                for k, v in m._asdict().items()}
        flat.update(prev_kpts=np.asarray(st.prev_kpts),
                    prev_desc=np.asarray(st.prev_desc),
                    prev_valid=np.asarray(st.prev_valid),
                    R_cur=np.asarray(st.R_cur),
                    t_cur=np.asarray(st.t_cur),
                    fi=np.asarray(fi))
        np.savez(args.save_state, **flat)
        print(f"state saved to {args.save_state}")

    Rg, tg = scene.poses_R[fi], scene.poses_t[fi]
    Km = scene.K
    thr = cfg.frontend.map_match_threshold

    for c in [max(fi - args.period - 1, 1), fi - args.period + 1,
              fi - args.period + 3]:
        rows = np.clip(np.asarray(m.kf_db_idx[c]), 0, N - 1)
        uv0 = jnp.asarray(np.asarray(m.kf_kpts[c])[rows], jnp.float32)
        desc0 = jnp.asarray(m.kf_db_desc[c]).astype(st.prev_desc.dtype)
        v0 = jnp.asarray(m.kf_db_valid[c])
        kn0 = normalize_keypoints(uv0, H, W)
        kn1 = normalize_keypoints(st.prev_kpts, H, W)
        with jax.default_matmul_precision("default"):
            f0, f1, z0, z1 = lg.apply(lg_params, desc0, st.prev_desc,
                                      kn0, kn1, v0, st.prev_valid,
                                      return_features=True)
            mo = assignment_ops.fused_assignment(
                f0, f1, z0, z1, v0, st.prev_valid,
                1.0 / float(lg.dim) ** 0.5, 0.0)
        m0 = np.asarray(mo.matches0)
        sc = np.asarray(mo.mscores0, np.float64)
        vv = np.asarray(v0)
        xyz = np.asarray(m.kf_db_xyz[c], np.float64)
        kp_cur = np.asarray(st.prev_kpts, np.float64)
        # GT projection of stored 3D under current GT pose
        pc = xyz @ Rg.T + tg
        z = np.maximum(pc[:, 2], 1e-6)
        uvp = pc[:, :2] / z[:, None] * [Km[0, 0], Km[1, 1]] \
            + [Km[0, 2], Km[1, 2]]
        hit = vv & (m0 >= 0)
        uv_m = kp_cur[np.clip(m0, 0, N - 1)]
        err = np.linalg.norm(uvp - uv_m, axis=1)
        true_hit = hit & (pc[:, 2] > 0) & (err < 3.0)
        above = hit & (sc >= thr)
        true_above = true_hit & above
        pr = lambda a: np.percentile(a, [10, 50, 90]).round(3) \
            if len(a) else "-"
        # widen the "true" definition to see the snapshot-reproj tail
        true10 = hit & (pc[:, 2] > 0) & (err < 10.0)
        print(f"  kf{c:3d}: db_valid={int(vv.sum()):3d} "
              f"matched={int(hit.sum()):3d} true={int(true_hit.sum()):3d} "
              f"true10px={int(true10.sum()):3d} "
              f"above_thr={int(above.sum()):3d} "
              f"true_above={int(true_above.sum()):3d} "
              f"sc_true={pr(sc[true_hit])} "
              f"sc_false={pr(sc[hit & ~true_hit])} "
              f"err_on_true10={pr(err[true10])}")
        # run the EXACT driver PnP at several thresholds
        from gl_slam_tpu.geometry import pnp as pnp_mod
        import jax as _jax
        good_j = jnp.asarray(above)
        uvm_j = jnp.asarray(uv_m, jnp.float32)
        for tpx in (1.8, 3.0, 5.0):
            res = pnp_mod.solve_pnp_ransac(
                K, jnp.asarray(xyz, jnp.float32), uvm_j, good_j,
                _jax.random.PRNGKey(7), threshold_px=tpx,
                num_hypotheses=512, min_inliers=30)
            Rp = np.asarray(res.R, np.float64)
            tp = np.asarray(res.t, np.float64)
            cp = -Rp.T @ tp
            cgt = -Rg.T @ tg
            print(f"      pnp@{tpx}px: inl={int(res.num_inliers)} "
                  f"ok={bool(res.ok)} centre_err={np.linalg.norm(cp - cgt):.3f}m")


if __name__ == "__main__":
    main()
