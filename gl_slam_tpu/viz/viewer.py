"""Trajectory / map visualization (C13 equivalent) — out of the hot path.

The reference runs a live Pangolin OpenGL thread with a follow camera, blue
map points, RGB keyframe axes and gray covisibility edges
(`/root/reference/src/visualization/visualization.cpp:27-165`) plus OpenCV
keypoint overlays (`src/threading/thread_pool.cpp:297-314`). This
environment is headless, so the equivalent is a snapshot renderer: the host
consumes device-streamed pose/landmark buffers and renders (a) a top-down
trajectory + map plot, (b) per-frame keypoint overlays, both to PNG via
matplotlib (Agg) when available; plus a JSON map export any external 3D
viewer (e.g. rerun) can consume.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np


class MapSnapshot:
    """Host-side copy of the visualizable state (reads are snapshots — the
    functional analogue of the reference's reads under map_mutex,
    `visualization.cpp:50-62`)."""

    def __init__(self, map_state, max_points: int = 100000):
        n_kf = int(map_state.num_kf)
        n_pts = int(map_state.num_pts)
        self.kf_R = np.asarray(map_state.kf_R[:n_kf])
        self.kf_t = np.asarray(map_state.kf_t[:n_kf])
        self.centers = -np.einsum('fij,fj->fi',
                                  np.transpose(self.kf_R, (0, 2, 1)),
                                  self.kf_t) if n_kf else np.zeros((0, 3))
        pts = np.asarray(map_state.pts_xyz[:n_pts])
        good = (np.asarray(map_state.pts_valid[:n_pts])
                & ~np.asarray(map_state.pts_bad[:n_pts]))
        self.points = pts[good][:max_points]
        nbr = np.asarray(map_state.covis_nbr[:n_kf])
        self.covis_edges = [(k, int(j)) for k in range(n_kf)
                            for j in nbr[k] if j >= 0]

    def to_json(self, path: str):
        with open(path, "w") as f:
            json.dump({
                "keyframe_centers": self.centers.tolist(),
                "points": self.points.tolist(),
                "covisibility_edges": self.covis_edges,
            }, f)


def render_topdown(snapshot: MapSnapshot, path: str,
                   gt_centers: Optional[np.ndarray] = None) -> bool:
    """Top-down (x-z) map + trajectory plot. Returns False if matplotlib is
    unavailable (headless fallback: use to_json)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return False
    fig, ax = plt.subplots(figsize=(8, 8))
    if len(snapshot.points):
        ax.scatter(snapshot.points[:, 0], snapshot.points[:, 2], s=0.5,
                   c="tab:blue", alpha=0.4, label="map points")
    for a, b in snapshot.covis_edges:
        if a < len(snapshot.centers) and b < len(snapshot.centers):
            ax.plot([snapshot.centers[a, 0], snapshot.centers[b, 0]],
                    [snapshot.centers[a, 2], snapshot.centers[b, 2]],
                    c="gray", lw=0.3, alpha=0.5)
    if len(snapshot.centers):
        ax.plot(snapshot.centers[:, 0], snapshot.centers[:, 2],
                c="tab:red", lw=1.5, label="estimated")
    if gt_centers is not None:
        ax.plot(gt_centers[:, 0], gt_centers[:, 2], c="tab:green", lw=1.0,
                ls="--", label="ground truth")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    ax.legend(loc="best")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return True


def render_keypoint_overlay(image: np.ndarray, kpts: np.ndarray,
                            valid: np.ndarray, path: str,
                            tracked_mask: Optional[np.ndarray] = None) -> bool:
    """Per-frame overlay: tracked keypoints green, new ones red (the OpenCV
    imshow overlay of `thread_pool.cpp:297-314`, rendered to file)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return False
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.imshow(image, cmap="gray", vmin=0, vmax=1)
    k = kpts[valid]
    if tracked_mask is not None:
        tm = tracked_mask[valid]
        ax.scatter(k[tm, 0], k[tm, 1], s=6, c="lime", marker="o",
                   linewidths=0, label="tracked")
        ax.scatter(k[~tm, 0], k[~tm, 1], s=6, c="red", marker="o",
                   linewidths=0, label="new")
    else:
        ax.scatter(k[:, 0], k[:, 1], s=6, c="lime", linewidths=0)
    ax.axis("off")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return True
