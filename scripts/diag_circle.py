"""Isolate the sustained-rotation scale feedback (VERDICT r3 item 1).

Tracks the closed-circle scene with ORACLE observations (exact projected
keypoints + id-descriptors, optional pixel noise) through the per-frame
TrackingPipeline at configurable shapes, and prints per-frame step/GT-step
ratio, rotation error vs GT, and the association counters. Separates the
structural behavior of the essential->LM->triangulate->BA loop from the
learned front-end's detection noise: if noise=0 holds and noise=0.3
diverges, the feedback is noise-driven; if both diverge, it is structural.

  python scripts/diag_circle.py --frames 200 --noise 0.3
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--noise", type=float, default=0.3)
    ap.add_argument("--kpts", type=int, default=1024)
    ap.add_argument("--height", type=int, default=376)
    ap.add_argument("--width", type=int, default=1241)
    ap.add_argument("--seed", type=int, default=31)
    ap.add_argument("--landmarks", type=int, default=40000)
    ap.add_argument("--ba-every", type=int, default=8)
    ap.add_argument("--reobs-gate", type=float, default=None)
    ap.add_argument("--parallax", type=float, default=None)
    ap.add_argument("--young-weight", type=float, default=None)
    ap.add_argument("--cull-px", type=float, default=None)
    ap.add_argument("--no-ba", action="store_true")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()

    import dataclasses

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gl_slam_tpu.config import (BAConfig, FrontendConfig, GeometryConfig,
                                    MapConfig, RuntimeConfig, SLAMConfig)
    from gl_slam_tpu.geometry import se3
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.slam.pipeline import TrackingPipeline

    H, W, N, D = args.height, args.width, args.kpts, 64
    geo = GeometryConfig(
        essential_hypotheses=256, essential_refine_iters=6,
        essential_threshold_px=0.75,
        triangulation_reproj_px=1.5, triangulation_reproj_bootstrap_px=1.5,
        reobs_max_reproj_px=3.0)
    if args.reobs_gate is not None:
        geo = dataclasses.replace(geo, reobs_max_reproj_px=args.reobs_gate)
    if args.parallax is not None:
        geo = dataclasses.replace(geo, min_parallax_deg=args.parallax)
    ba = BAConfig(max_window_cameras=12, max_window_points=4096,
                  full_ba_iters=30, pose_only_iters=30, full_ba_overlap=3)
    if args.young_weight is not None:
        ba = dataclasses.replace(ba, pose_young_weight=args.young_weight)
    mp = MapConfig(max_keyframes=1 << max(9, (args.frames - 1).bit_length()),
                   max_points=65536, covis_max_points=1024,
                   cull_max_reproj_px=2.0)
    if args.cull_px is not None:
        mp = dataclasses.replace(mp, cull_max_reproj_px=args.cull_px)
    cfg = SLAMConfig(
        frontend=FrontendConfig(image_height=H, image_width=W,
                                max_keypoints=N, descriptor_dim=D,
                                match_threshold=0.6, map_match_threshold=0.6,
                                reobs_matcher="mutual_nn"),
        geometry=geo, ba=ba, map=mp,
        runtime=RuntimeConfig(ba_trigger_keyframes=args.ba_every,
                              async_ba=False, loop_closing=False,
                              run_full_ba=not args.no_ba),
    )
    scene = synthetic.make_scene(num_landmarks=args.landmarks,
                                 num_frames=args.frames, height=H, width=W,
                                 desc_dim=D, seed=args.seed, motion="loop")
    obs = [synthetic.observe_frame(scene, i, max_keypoints=N, seed=4,
                                   noise_px=args.noise)
           for i in range(args.frames)]
    pipe = TrackingPipeline(cfg, scene.K)
    c_gt = np.stack([-scene.poses_R[i].T @ scene.poses_t[i]
                     for i in range(args.frames)])
    pipe.bootstrap((obs[0].keypoints, obs[0].descriptors, obs[0].valid, 0),
                   (obs[1].keypoints, obs[1].descriptors, obs[1].valid, 1),
                   gt_scale=float(np.linalg.norm(c_gt[1] - c_gt[0])))
    for i in range(2, args.frames):
        pipe.step(obs[i].keypoints, obs[i].descriptors, obs[i].valid, i)
    pipe.finish()

    R_est, t_est, fidx = pipe.trajectory()
    R_est = R_est.astype(np.float64)
    t_est = t_est.astype(np.float64)
    c_est = np.einsum('kij,kj->ki', R_est.transpose(0, 2, 1), -t_est)
    cg = c_gt[fidx]
    ate = float(np.sqrt(((c_est - cg) ** 2).sum(1).mean()))
    outs = pipe.outputs
    step = np.linalg.norm(np.diff(c_est, axis=0), axis=1)
    gt_step = np.linalg.norm(np.diff(cg, axis=0), axis=1)
    # Host float64 error metrics (a device 3x3 product here runs at the TPU
    # bf16 matmul default -> ~5 deg of pure measurement noise)
    rot_err = []
    for k in range(len(fidx)):
        Rrel = scene.poses_R[int(fidx[k])].T @ R_est[k]
        cth = np.clip((np.trace(Rrel) - 1.0) / 2.0, -1.0, 1.0)
        rot_err.append(np.degrees(np.arccos(cth)))
    pos_err = np.linalg.norm(c_est - cg, axis=1)
    print(f"ate={ate:.3f} m  kf={len(fidx)}/{args.frames} "
          f"end_err={np.linalg.norm(c_est[-1] - cg[-1]):.3f}")
    # As-inserted per-frame poses (pre-BA-refinement): outs[j] for j>=1 is
    # frame j+1's accepted pose
    c_ins = {}
    for j in range(1, len(outs)):
        o = outs[j]
        Rj = np.asarray(o.R, np.float64)
        tj = np.asarray(o.t, np.float64)
        c_ins[j + 1] = -Rj.T @ tj
    if not args.quiet:
        for k in range(1, len(fidx)):
            fi = int(fidx[k])
            o = outs[fi - 1] if 1 <= fi - 1 < len(outs) else outs[-1]
            si = (np.linalg.norm(c_ins[fi] - c_ins[fi - 1])
                  if fi in c_ins and fi - 1 in c_ins else 0.0)
            ei = (np.linalg.norm(c_ins[fi] - c_gt[fi]) if fi in c_ins
                  else 0.0)
            print(f"f{int(fidx[k]):4d} r={step[k-1]/max(gt_step[k-1],1e-9):6.2f} "
                  f"rot={rot_err[k]:7.3f} e={pos_err[k]:7.3f} "
                  f"map={int(o.num_map_matches):4d} "
                  f"g={int(o.num_assoc_gated):4d} "
                  f"new={int(o.num_new_points):4d} "
                  f"rho={float(o.pose_cost):8.1f} "
                  f"si={si:6.3f} ei={ei:7.3f} "
                  f"slm={float(o.dbg_s_lm)/max(gt_step[k-1],1e-9):7.4f} "
                  f"eo={float(o.dbg_err_old):5.2f} "
                  f"ey={float(o.dbg_err_young):5.2f} "
                  f"no={int(o.dbg_n_old):4d} "
                  f"sok={int(o.dbg_soft_ok)} "
                  f"rat={float(o.dbg_step_ratio):5.2f}")


if __name__ == "__main__":
    main()
