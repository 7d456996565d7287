"""Per-frame diagnosis of the tiny long-run config (association sources,
gate drops, triangulation survival, step-scale ratio) — the longrun
counterpart of scripts/diag_flagship.py, sharing run_learned_e2e."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--ba-every", type=int, default=5)
    ap.add_argument("--scene-seed", type=int, default=11)
    ap.add_argument("--kpts", type=int, default=256)
    ap.add_argument("--every", type=int, default=1)
    ap.add_argument("--no-loopclose", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gl_slam_tpu.config import MapConfig
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.train import e2e

    ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    sp, sp_params, lg, lg_params = e2e.load_tiny_frontend(
        _os.path.join(ROOT, "checkpoints"))
    H, W, N = 240, 320, args.kpts
    D = e2e.TINY_DESC_DIM
    n = args.frames
    scene = synthetic.make_scene(
        num_landmarks=max(1500, (n + 120) * 16), num_frames=n,
        height=H, width=W, desc_dim=D, seed=args.scene_seed, min_depth=4.0)
    cfg = e2e.micro_config(H, W, N, D)
    cfg = dataclasses.replace(
        cfg,
        geometry=dataclasses.replace(cfg.geometry, max_depth=60.0),
        map=MapConfig(
            max_keyframes=max(128, 1 << (n - 1).bit_length()),
            max_points=max(16384, n * 96),
            covis_max_points=512, covis_edge_threshold=10))
    if args.no_loopclose:
        cfg = dataclasses.replace(cfg, runtime=dataclasses.replace(
            cfg.runtime, loop_closing=False))
    diag = {}
    res = e2e.run_learned_e2e(sp, sp_params, lg, lg_params, scene, cfg,
                              n_frames=n, chunk=args.chunk,
                              ba_every=args.ba_every, diag_out=diag)
    print(f"ate={res.ate_m:.3f} kf={res.num_keyframes}/{res.num_frames} "
          f"rejected={res.num_rejected} closures={res.loop_closures}")
    c = np.einsum('fij,fj->fi', diag["R"].transpose(0, 2, 1), -diag["t"])
    step = np.linalg.norm(np.diff(c, axis=0), axis=1)
    for i in range(0, len(diag["frame_ok"]), args.every):
        s = step[i - 1] if i >= 1 else 1.0
        print(f"f{i+2:4d} ok={int(diag['frame_ok'][i])} "
              f"m={diag['num_matches'][i]:4d} "
              f"inl={diag['num_inliers'][i]:4d} "
              f"map={diag['num_map_matches'][i]:4d} "
              f"a={diag['num_assoc_prev'][i]:4d} "
              f"b={diag['num_assoc_window'][i]:4d} "
              f"c={diag['num_assoc_covis'][i]:4d} "
              f"g={diag['num_assoc_gated'][i]:4d} "
              f"rest={diag['num_rest'][i]:4d} "
              f"cheir={diag['num_tri_cheir'][i]:4d} "
              f"reprj={diag['num_tri_reproj'][i]:4d} "
              f"new={diag['num_new_points'][i]:4d} "
              f"step={s:6.2f} "
              f"rho={diag['pose_cost'][i]:8.2f}")


if __name__ == "__main__":
    main()
