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
                   gt_centers: Optional[np.ndarray] = None,
                   follow_center: Optional[np.ndarray] = None,
                   follow_radius_m: Optional[float] = None) -> bool:
    """Top-down (x-z) map + trajectory plot. Returns False if matplotlib is
    unavailable (headless fallback: use to_json). `follow_center` +
    `follow_radius_m` crop the view to a window around the given world point
    — the follow-camera mode of the reference viewer
    (`visualization.cpp:64-71`)."""
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
    if follow_center is not None and follow_radius_m is not None:
        ax.set_xlim(follow_center[0] - follow_radius_m,
                    follow_center[0] + follow_radius_m)
        ax.set_ylim(follow_center[2] - follow_radius_m,
                    follow_center[2] + follow_radius_m)
    ax.legend(loc="best")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return True


class LiveViewer:
    """During-run map streaming — the reference's live viewer thread
    equivalent (`visualization.cpp:27-165`) for a headless environment.

    The tracking loop calls `update(map_state, frame_idx)` at keyframe
    cadence; a background render thread (the analogue of the reference's
    viewer thread, `src/main.cpp:128`) snapshots the state and writes
    `live.json` + `live.png` (follow-camera top-down view centered on the
    latest keyframe) via atomic rename, so an external poller always sees a
    complete file. Rendering never blocks tracking: the queue holds ONE
    pending snapshot and newer updates replace it (frame drops, exactly like
    a real-time viewer)."""

    def __init__(self, out_dir: str, every: int = 8,
                 follow_radius_m: float = 60.0, history: bool = False):
        import os
        import queue
        import threading
        self.out_dir = out_dir
        self.every = max(int(every), 1)
        self.follow_radius_m = follow_radius_m
        self.history = history
        self.num_renders = 0
        self._n_updates = 0
        os.makedirs(out_dir, exist_ok=True)
        self._q: "queue.Queue" = queue.Queue(maxsize=1)
        self._stop = object()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def update(self, map_state, frame_idx: int) -> None:
        """Called from the tracking loop. Cheap unless this is an export
        frame; the host copy (MapSnapshot) happens on the caller to keep the
        worker free of device handles, mirroring the reference's
        read-under-mutex snapshot (`visualization.cpp:50-62`)."""
        self._n_updates += 1
        if self._n_updates % self.every != 0:
            return
        snap = MapSnapshot(map_state)
        try:
            self._q.put_nowait((snap, int(frame_idx)))
        except Exception:       # queue full: drop the stale pending frame
            try:
                self._q.get_nowait()
            except Exception:
                pass
            try:
                self._q.put_nowait((snap, int(frame_idx)))
            except Exception:
                pass

    def close(self) -> None:
        """Flush pending renders and stop the worker."""
        self._q.put(self._stop)
        self._thread.join(timeout=30)

    # -- worker ---------------------------------------------------------------
    def _worker(self):
        import os
        while True:
            item = self._q.get()
            if item is self._stop:
                return
            snap, frame_idx = item
            tag = f"{frame_idx:06d}" if self.history else "live"
            jtmp = os.path.join(self.out_dir, ".live.json.tmp")
            snap.to_json(jtmp)
            os.replace(jtmp, os.path.join(self.out_dir, f"{tag}.json"))
            # matplotlib infers the format from the suffix — the temp name
            # must still end in .png
            ptmp = os.path.join(self.out_dir, ".tmp.live.png")
            center = snap.centers[-1] if len(snap.centers) else None
            if render_topdown(snap, ptmp, follow_center=center,
                              follow_radius_m=self.follow_radius_m):
                os.replace(ptmp, os.path.join(self.out_dir, f"{tag}.png"))
            self.num_renders += 1


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
