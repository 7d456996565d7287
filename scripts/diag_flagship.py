"""Per-frame diagnosis of flagship-eval frame rejections (TPU).

Runs the flagship pipeline on the held-out scene and prints per-frame
frame_ok / matches / inliers / map-matches / pose-cost so rejection events
can be localized (turn segments? chunk-cascade? low map matches?).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the axon TPU plugin)

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=42)
    ap.add_argument("--seed", type=int, default=101)
    ap.add_argument("--landmarks", type=int, default=20000)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--motion", default="forward_turn")
    ap.add_argument("--subpix", default="pair",
                    choices=["pair", "single", "centroid"])
    ap.add_argument("--reproj", type=float, default=None,
                    help="override cfg.geometry.triangulation_reproj_px")
    ap.add_argument("--parallax", type=float, default=None,
                    help="override cfg.geometry.min_parallax_deg")
    ap.add_argument("--reobs-gate", type=float, default=None,
                    help="override cfg.geometry.reobs_max_reproj_px")
    ap.add_argument("--render-cache", default=None,
                    help=".npy frame-stack cache (e2e.run_learned_e2e)")
    ap.add_argument("--ba-every", type=int, default=8)
    ap.add_argument("--max-keyframes", type=int, default=None,
                    help="override cfg.map.max_keyframes (long runs: the "
                    "flagship default is 512)")
    ap.add_argument("--max-points", type=int, default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.train import e2e

    ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    sp, sp_params, lg, lg_params = e2e.load_flagship_frontend(
        _os.path.join(ROOT, "checkpoints"))
    subpix = None
    if args.subpix != "centroid":
        subpix = e2e.load_flagship_subpix(_os.path.join(ROOT, "checkpoints"),
                                          pair=(args.subpix == "pair"))
    cfg = e2e.flagship_config()
    if (args.reproj is not None or args.parallax is not None
            or args.reobs_gate is not None):
        import dataclasses
        geo = cfg.geometry
        if args.reproj is not None:
            geo = dataclasses.replace(geo,
                                      triangulation_reproj_px=args.reproj)
        if args.parallax is not None:
            geo = dataclasses.replace(geo, min_parallax_deg=args.parallax)
        if args.reobs_gate is not None:
            geo = dataclasses.replace(geo,
                                      reobs_max_reproj_px=args.reobs_gate)
        cfg = dataclasses.replace(cfg, geometry=geo)
    if args.max_keyframes is not None or args.max_points is not None:
        import dataclasses
        mp = cfg.map
        if args.max_keyframes is not None:
            mp = dataclasses.replace(mp, max_keyframes=args.max_keyframes)
        if args.max_points is not None:
            mp = dataclasses.replace(mp, max_points=args.max_points)
        cfg = dataclasses.replace(cfg, map=mp)
    scene = synthetic.make_scene(
        num_landmarks=args.landmarks, num_frames=args.frames,
        height=cfg.frontend.image_height, width=cfg.frontend.image_width,
        desc_dim=cfg.frontend.descriptor_dim, seed=args.seed,
        motion=args.motion)
    diag = {}
    res = e2e.run_learned_e2e(sp, sp_params, lg, lg_params, scene, cfg,
                              n_frames=args.frames, chunk=args.chunk,
                              ba_every=args.ba_every, diag_out=diag,
                              subpix=subpix,
                              render_cache=args.render_cache)
    print(f"ate={res.ate_m:.3f} kf={res.num_keyframes}/{res.num_frames} "
          f"rejected={res.num_rejected}")
    # Per-frame camera-centre step vs the GT 1 m/frame: monocular-scale
    # drift/collapse shows up here directly
    c = np.einsum('fij,fj->fi', diag["R"].transpose(0, 2, 1), -diag["t"])
    step = np.linalg.norm(np.diff(c, axis=0), axis=1)
    gt_c = np.stack([-scene.poses_R[i].T @ scene.poses_t[i]
                     for i in range(2, 2 + len(c))])
    gt_step = np.linalg.norm(np.diff(gt_c, axis=0), axis=1)
    print("step/gt_step per frame:",
          " ".join(f"{s/g:.2f}" for s, g in zip(step, gt_step)))
    for i in range(len(diag["frame_ok"])):
        print(f"f{i+2:4d} ok={int(diag['frame_ok'][i])} "
              f"m={diag['num_matches'][i]:5d} "
              f"inl={diag['num_inliers'][i]:5d} "
              f"map={diag['num_map_matches'][i]:5d} "
              f"a={diag['num_assoc_prev'][i]:4d} "
              f"b={diag['num_assoc_window'][i]:4d} "
              f"c={diag['num_assoc_covis'][i]:4d} "
              f"g={diag['num_assoc_gated'][i]:4d} "
              f"rest={diag['num_rest'][i]:5d} "
              f"cheir={diag['num_tri_cheir'][i]:5d} "
              f"reprj={diag['num_tri_reproj'][i]:5d} "
              f"new={diag['num_new_points'][i]:5d} "
              f"rho={diag['pose_cost'][i]:9.2f}")


if __name__ == "__main__":
    main()
