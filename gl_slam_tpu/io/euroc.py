"""EuRoC MAV dataset I/O (ASL layout) — BASELINE configs[3].

Layout (e.g. MH_01_easy):
  mav0/cam0/data/<timestamp_ns>.png     grayscale frames
  mav0/cam0/sensor.yaml                 intrinsics + body->sensor extrinsic
  mav0/state_groundtruth_estimate0/data.csv   GT body states

Mirrors io/kitti.py's surface: intrinsics K, per-frame world->camera GT
(R, t) in the framework convention x_cam = R @ x_world + t, lazy frame
loading, GT scale / motion-gate helpers. The sensor.yaml is parsed with a
purpose-built mini-parser (only the fields EuRoC actually uses) to avoid a
YAML dependency.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import numpy as np


def _parse_sensor_yaml(path: str):
    """Extract intrinsics, resolution, and T_BS from an EuRoC sensor.yaml."""
    with open(path) as f:
        text = f.read()

    def block_list(name):
        m = re.search(name + r":\s*(?:.|\n)*?data:\s*\[([^\]]*)\]", text)
        if m is None:
            return None
        return np.array([float(v) for v in m.group(1).replace("\n", " ")
                         .split(",")])

    def inline_list(name):
        m = re.search(name + r":\s*\[([^\]]*)\]", text)
        if m is None:
            return None
        return np.array([float(v) for v in m.group(1).split(",")])

    intr = inline_list("intrinsics")          # [fu, fv, cu, cv]
    res = inline_list("resolution")           # [width, height]
    tbs = block_list("T_BS")                  # 16 values row-major
    K = np.array([[intr[0], 0.0, intr[2]],
                  [0.0, intr[1], intr[3]],
                  [0.0, 0.0, 1.0]], dtype=np.float64)
    T_BS = tbs.reshape(4, 4) if tbs is not None else np.eye(4)
    width, height = int(res[0]), int(res[1])
    return K, (height, width), T_BS


def _quat_to_R(qw, qx, qy, qz):
    """Hamilton quaternion (w,x,y,z) -> rotation matrix."""
    n = np.sqrt(qw * qw + qx * qx + qy * qy + qz * qz)
    qw, qx, qy, qz = qw / n, qx / n, qy / n, qz / n
    return np.array([
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz),
         2 * (qx * qz + qw * qy)],
        [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz),
         2 * (qy * qz - qw * qx)],
        [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx),
         1 - 2 * (qx * qx + qy * qy)]])


class EurocSequence:
    """One EuRoC sequence: intrinsics + time-aligned GT + lazy frames."""

    def __init__(self, root: str, cam: str = "cam0",
                 gt_dir: str = "state_groundtruth_estimate0"):
        mav = os.path.join(root, "mav0")
        self.cam_dir = os.path.join(mav, cam, "data")
        self.K, (self.height, self.width), self.T_BS = _parse_sensor_yaml(
            os.path.join(mav, cam, "sensor.yaml"))
        self.timestamps = sorted(
            int(f[:-4]) for f in os.listdir(self.cam_dir)
            if f.endswith(".png"))
        self.num_frames = len(self.timestamps)

        gt_csv = os.path.join(mav, gt_dir, "data.csv")
        self.gt_R: Optional[np.ndarray] = None
        self.gt_t: Optional[np.ndarray] = None
        if os.path.exists(gt_csv):
            raw = np.loadtxt(gt_csv, delimiter=",", skiprows=1)
            gt_ts = raw[:, 0]
            # Nearest-timestamp GT per camera frame; world->camera pose from
            # T_WC = T_WB (body GT) @ T_BS (body->cam extrinsic), inverted.
            R_list, t_list = [], []
            for ts in self.timestamps:
                i = int(np.argmin(np.abs(gt_ts - ts)))
                p = raw[i, 1:4]
                qw, qx, qy, qz = raw[i, 4:8]
                T_WB = np.eye(4)
                T_WB[:3, :3] = _quat_to_R(qw, qx, qy, qz)
                T_WB[:3, 3] = p
                T_WC = T_WB @ self.T_BS
                R_cw = T_WC[:3, :3]
                c = T_WC[:3, 3]
                R = R_cw.T
                R_list.append(R)
                t_list.append(-R @ c)
            self.gt_R = np.stack(R_list)
            self.gt_t = np.stack(t_list)

    def frame(self, idx: int) -> np.ndarray:
        from PIL import Image
        p = os.path.join(self.cam_dir, f"{self.timestamps[idx]}.png")
        img = Image.open(p).convert("L")
        return np.asarray(img, dtype=np.float32) / 255.0

    def gt_scale(self, i: int, j: int) -> float:
        if self.gt_R is None:
            return 1.0
        ci = -self.gt_R[i].T @ self.gt_t[i]
        cj = -self.gt_R[j].T @ self.gt_t[j]
        return float(np.linalg.norm(cj - ci))

    def gt_motion_small(self, i: int, j: int, mag_thr: float,
                        rot_thr_deg: float) -> bool:
        """GT motion gate, same semantics as KittiSequence."""
        if self.gt_R is None:
            return False
        dmag = self.gt_scale(i, j)
        dR = self.gt_R[j] @ self.gt_R[i].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        return dmag < mag_thr and ang < rot_thr_deg
