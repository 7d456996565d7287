"""Per-gate diagnosis of the LEARNED loop-detection path (round 5).

Round-4 landed a learned-LightGlue detection path (`_detect_loop_learned`)
in the final hour and the A/B still recorded 0 closures — with no committed
evidence of WHICH gate it dies at (VERDICT r4 weak #2). This script replays
the A/B scenario through the chunked flagship pipeline and, at every
loop-check cadence, dispatches the SAME jitted detection program the driver
uses (`ChunkedPipeline._dispatch_detect`) and prints the per-gate counters
now carried on LoopDetection: visible-archive pool size, matcher hits,
winning region votes, consistency count, PnP inliers + raw PnP verdict —
plus the current pose-estimate error vs GT (the projection-quality premise).

  python scripts/diag_loopdetect_learned.py --frames 360 [--domain hard]
                                            [--ba-every 8] [--no-gt-scale]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses

import numpy as np

ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=360)
    ap.add_argument("--seed", type=int, default=31)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--ba-every", type=int, default=8)
    ap.add_argument("--domain", default="clean", choices=["clean", "hard"])
    ap.add_argument("--period", type=int, default=None,
                    help="circle period < frames gives a re-traversal tail")
    ap.add_argument("--apply", action="store_true",
                    help="actually apply closures (full driver path)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gl_slam_tpu.io import synthetic
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
    cfg = dataclasses.replace(cfg, runtime=dataclasses.replace(
        cfg.runtime, loop_closing=True))
    dom = "" if args.domain == "clean" else f"_{args.domain}"
    per = "" if args.period is None else f"_p{args.period}"
    cache = _os.path.join(
        "/tmp", f"render_loop{dom}{per}_{args.seed}_{n}_{H}x{W}.npy")
    if _os.path.exists(cache):
        stack = np.load(cache)
    else:
        stack = np.stack([
            synthetic.render_frame(scene, i, max_keypoints=N,
                                   domain=args.domain)
            for i in range(n)]).astype(np.float32)
        np.save(cache, stack)

    sp, sp_params, lg, lg_params = e2e.load_flagship_frontend(
        _os.path.join(ROOT, "checkpoints"))
    ks_head, ks_params = e2e.load_flagship_subpix(
        _os.path.join(ROOT, "checkpoints"), pair=True)
    params = fused.FusedParams(sp=sp_params, lg=lg_params, ks=ks_params)
    K = jnp.asarray(scene.K, jnp.float32)
    pipe = ChunkedPipeline(cfg, K, sp, lg, params, chunk=args.chunk,
                           ba_every=args.ba_every, subpix_head=ks_head)
    c0 = -scene.poses_R[0].T @ scene.poses_t[0]
    c1 = -scene.poses_R[1].T @ scene.poses_t[1]
    pipe.bootstrap_from_images(stack[0], stack[1],
                               float(np.linalg.norm(c1 - c0)))
    all_imgs = jnp.asarray(stack[2:n])
    rt = cfg.runtime
    if not args.apply:
        # Probe-only: disable the driver's own hook so detections are
        # observed but never applied (isolates detection from correction)
        pipe._detect_probe_only = True
        orig = pipe._maybe_loop_close
        pipe._maybe_loop_close = lambda: None

    start = 2
    while start + args.chunk <= n:
        imgs = jax.lax.dynamic_slice_in_dim(all_imgs, start - 2, args.chunk)
        pipe.track_chunk(imgs, start)
        fi = start + args.chunk - 1
        if fi % rt.loop_check_interval < args.chunk and fi > rt.loop_min_gap:
            det = pipe._dispatch_detect(jax.random.PRNGKey(fi))
            st = pipe.state
            m = st.map
            cur_kf = int(m.num_kf)
            # pose error vs GT at the probe frame
            Rg, tg = scene.poses_R[fi], scene.poses_t[fi]
            cg = -Rg.T @ tg
            Re = np.asarray(st.R_cur, np.float64)
            te = np.asarray(st.t_cur, np.float64)
            ce = -Re.T @ te
            print(f"f{fi:4d} kf={cur_kf:4d} "
                  f"pose_err={np.linalg.norm(ce - cg):6.3f}m "
                  f"vis={int(np.asarray(det.n_vis)):5d} "
                  f"good={int(np.asarray(det.n_good)):4d} "
                  f"regv={int(np.asarray(det.region_votes)):4d} "
                  f"cons={int(np.asarray(det.n_cons)):4d} "
                  f"pnp_inl={int(np.asarray(det.num_inliers)):4d} "
                  f"pnp_ok={int(np.asarray(det.pnp_raw_ok))} "
                  f"lkf={int(np.asarray(det.loop_kf)):4d} "
                  f"OK={int(np.asarray(det.ok))} "
                  f"closed={pipe.num_loop_closures}",
                  flush=True)
        start += args.chunk
    pipe.finish()
    # final ATE vs GT
    Rk, tk, fidx = pipe.trajectory()
    cg = np.stack([-scene.poses_R[i].T @ scene.poses_t[i]
                   for i in fidx.astype(int)])
    cest = np.einsum('kji,kj->ki', Rk, -tk)
    ate = float(np.sqrt(np.mean(np.sum((cest - cg) ** 2, axis=1))))
    print(f"final: kf={len(fidx)} ATE={ate:.4f} m "
          f"closures={pipe.num_loop_closures} events={pipe.loop_events}")


if __name__ == "__main__":
    main()
