"""Dataset I/O tests: KITTI + EuRoC loaders on fabricated fixtures."""

import os

import numpy as np
import pytest

from gl_slam_tpu.io import euroc, kitti


@pytest.fixture()
def kitti_root(tmp_path):
    seq = tmp_path / "sequences" / "07"
    (seq / "image_0").mkdir(parents=True)
    (tmp_path / "poses").mkdir()
    (seq / "calib.txt").write_text(
        "P0: 700.0 0.0 600.0 0.0 0.0 700.0 180.0 0.0 0.0 0.0 1.0 0.0\n")
    rows = []
    for i in range(3):
        T = np.eye(4)[:3]
        T[2, 3] = float(i)      # forward motion 1 m/frame
        rows.append(" ".join(str(v) for v in T.reshape(-1)))
    (tmp_path / "poses" / "07.txt").write_text("\n".join(rows) + "\n")
    from PIL import Image
    for i in range(3):
        img = (np.random.default_rng(i).random((8, 16)) * 255).astype(
            np.uint8)
        Image.fromarray(img, mode="L").save(
            seq / "image_0" / f"{i:06d}.png")
    return str(tmp_path)


def test_kitti_sequence(kitti_root):
    seq = kitti.KittiSequence(kitti_root, "07")
    np.testing.assert_allclose(seq.K[0, 0], 700.0)
    assert seq.num_frames == 3
    f = seq.frame(1)
    assert f.shape == (8, 16) and f.dtype == np.float32
    assert abs(seq.gt_scale(0, 1) - 1.0) < 1e-9
    assert seq.gt_motion_small(0, 1, mag_thr=2.0, rot_thr_deg=1.0)
    assert not seq.gt_motion_small(0, 1, mag_thr=0.5, rot_thr_deg=1.0)


@pytest.fixture()
def euroc_root(tmp_path):
    cam = tmp_path / "mav0" / "cam0"
    (cam / "data").mkdir(parents=True)
    gt = tmp_path / "mav0" / "state_groundtruth_estimate0"
    gt.mkdir(parents=True)
    (cam / "sensor.yaml").write_text("""\
sensor_type: camera
T_BS:
  cols: 4
  rows: 4
  data: [1.0, 0.0, 0.0, 0.1,
         0.0, 1.0, 0.0, 0.0,
         0.0, 0.0, 1.0, 0.0,
         0.0, 0.0, 0.0, 1.0]
rate_hz: 20
resolution: [752, 480]
camera_model: pinhole
intrinsics: [458.654, 457.296, 367.215, 248.375]
distortion_model: radial-tangential
distortion_coefficients: [-0.28, 0.07, 0.0002, 0.00002]
""")
    from PIL import Image
    ts = [1403636579763555584, 1403636579813555456, 1403636579863555584]
    for i, t in enumerate(ts):
        img = (np.random.default_rng(i).random((480 // 60, 752 // 94))
               * 255).astype(np.uint8)
        Image.fromarray(img, mode="L").save(cam / "data" / f"{t}.png")
    lines = ["#timestamp,px,py,pz,qw,qx,qy,qz,vx,vy,vz,bw,bw,bw,ba,ba,ba"]
    for i, t in enumerate(ts):
        lines.append(f"{t},{0.5 * i},0.0,0.0,1.0,0.0,0.0,0.0,"
                     "0,0,0,0,0,0,0,0,0")
    (gt / "data.csv").write_text("\n".join(lines) + "\n")
    return str(tmp_path)


def test_euroc_sequence(euroc_root):
    seq = euroc.EurocSequence(euroc_root)
    np.testing.assert_allclose(seq.K[0, 0], 458.654)
    np.testing.assert_allclose(seq.K[1, 2], 248.375)
    assert (seq.height, seq.width) == (480, 752)
    assert seq.num_frames == 3
    assert seq.gt_R.shape == (3, 3, 3)
    # Body moves +x 0.5 m/frame; camera = body shifted by T_BS (+0.1 x)
    c0 = -seq.gt_R[0].T @ seq.gt_t[0]
    c1 = -seq.gt_R[1].T @ seq.gt_t[1]
    np.testing.assert_allclose(c0, [0.1, 0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(c1 - c0, [0.5, 0.0, 0.0], atol=1e-9)
    assert abs(seq.gt_scale(0, 1) - 0.5) < 1e-9
    f = seq.frame(0)
    assert f.dtype == np.float32
    assert seq.gt_motion_small(0, 1, mag_thr=1.0, rot_thr_deg=0.5)
    assert not seq.gt_motion_small(0, 1, mag_thr=0.1, rot_thr_deg=0.5)
