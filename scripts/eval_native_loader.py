"""End-to-end eval STREAMING PNGs through the native libpng prefetch loader.

VERDICT r4 item 7: the C++ prefetch ring (runtime/native/dataloader.cpp) was
unit-tested in isolation but no committed eval actually fed a tracked
sequence through it. This script closes that gap the way the reference
consumes data — PNG files read per frame off the tracking hot path
(`/root/reference/src/threading/thread_pool.cpp:101-106`):

  1. renders a held-out HARD-domain flagship sequence (io/synthetic.py
     photometric nuisance: repetitive structure, illumination drift,
     occluders, sensor noise) and writes it to disk as a KITTI-layout
     sequence tree (image_0/%06d.png + calib.txt P0 + poses/00.txt GT);
  2. runs the real CLI (`gl-slam-tpu run --dataset <tree> --frontend
     superpoint --preset flagship`) over that tree — the CLI's KITTI route
     decodes every frame through NativeLoader (cli.py:126-143), so the
     tracked result is evidence the native loader feeds the full learned
     pipeline correctly;
  3. commits the CLI's report (ATE vs the GT poses written in step 1,
     keyframe counts, fps including IO) to NATIVE_LOADER_EVAL.json;
     tests/test_runtime.py asserts the committed bounds.

Run on the TPU:  python scripts/eval_native_loader.py --frames 72
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the axon TPU plugin)

import argparse
import contextlib
import io
import json

import numpy as np

ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def write_kitti_tree(root: str, scene, frames: np.ndarray) -> None:
    """Write a KITTI odometry layout: sequences/00/image_0/%06d.png (8-bit
    grayscale), sequences/00/calib.txt (P0 row), poses/00.txt
    (camera-to-world 3x4 rows — io/kitti.load_poses inverts back)."""
    from PIL import Image

    seq = _os.path.join(root, "sequences", "00")
    img_dir = _os.path.join(seq, "image_0")
    _os.makedirs(img_dir, exist_ok=True)
    _os.makedirs(_os.path.join(root, "poses"), exist_ok=True)
    for i, f in enumerate(frames):
        a = np.clip(f * 255.0, 0, 255).astype(np.uint8)
        Image.fromarray(a, mode="L").save(
            _os.path.join(img_dir, f"{i:06d}.png"))
    K = np.asarray(scene.K, np.float64)
    P0 = np.hstack([K, np.zeros((3, 1))]).reshape(-1)
    with open(_os.path.join(seq, "calib.txt"), "w") as f:
        f.write("P0: " + " ".join(f"{v:.12e}" for v in P0) + "\n")
    rows = []
    for i in range(len(frames)):
        R = np.asarray(scene.poses_R[i], np.float64)   # world->cam
        t = np.asarray(scene.poses_t[i], np.float64)
        Rcw = R.T
        c = -R.T @ t
        rows.append(np.hstack([Rcw, c[:, None]]).reshape(-1))
    np.savetxt(_os.path.join(root, "poses", "00.txt"), np.array(rows))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=72)
    ap.add_argument("--seed", type=int, default=101)
    ap.add_argument("--domain", default="hard", choices=["clean", "hard"])
    ap.add_argument("--tree", default="/tmp/kitti_native_eval")
    ap.add_argument("--out", default=_os.path.join(
        ROOT, "NATIVE_LOADER_EVAL.json"))
    ap.add_argument("--render-cache", default=None)
    args = ap.parse_args()

    from gl_slam_tpu.runtime import native_lib
    if not native_lib.available():
        raise SystemExit("native runtime failed to build — this eval is "
                         "specifically evidence for the C++ loader")

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.train import e2e

    cfg = e2e.flagship_config()
    H, W = cfg.frontend.image_height, cfg.frontend.image_width
    n = args.frames
    scene = synthetic.make_scene(
        num_landmarks=20000, num_frames=max(n, 120), height=H, width=W,
        desc_dim=cfg.frontend.descriptor_dim, seed=args.seed,
        motion="forward_turn")
    cache = args.render_cache or _os.path.join(
        "/tmp", f"render_{args.domain}_{args.seed}_{max(n, 120)}_"
        f"{H}x{W}.npy")
    if _os.path.exists(cache):
        stack = np.load(cache)[:n]
    else:
        stack = np.stack([
            synthetic.render_frame(scene, i, max_keypoints=2048,
                                   domain=args.domain)
            for i in range(max(n, 120))]).astype(np.float32)
        np.save(cache, stack)
        stack = stack[:n]
    write_kitti_tree(args.tree, scene, stack)

    from gl_slam_tpu import cli
    out_dir = _os.path.join(args.tree, "out")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main([
            "run", "--dataset", args.tree, "--sequence", "00",
            "--frontend", "superpoint", "--preset", "flagship",
            "--first-frame", "0", "--last-frame", str(n - 1),
            "--out", out_dir])
    text = buf.getvalue()
    print(text)
    if rc not in (0, None):
        raise SystemExit(f"CLI run failed rc={rc}")
    rep = json.loads(text[text.index("{"):])
    rep.update(native_loader=True, domain=args.domain,
               png_tree_frames=n, seed=args.seed)
    with open(args.out, "w") as f:
        json.dump(rep, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    _sys.exit(main())
