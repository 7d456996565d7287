"""Trajectory / map quality metrics.

Programmatic versions of the reference's printed diagnostics (SURVEY.md §4):
per-frame GT pose errors — rotation (deg), translation direction (deg),
translation magnitude (m) (`/root/reference/src/threading/thread_pool.cpp:
278-295`) — plus ATE-RMSE with Horn/Umeyama alignment and reprojection-error
statistics (`src/main.cpp:41-77`, `Old/mult_img_recoverpose_single_ba:600-644`).
Host-side numpy: these run on trajectories, not in the hot loop.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np


class PoseErrors(NamedTuple):
    rot_deg: np.ndarray     # (F,)
    t_dir_deg: np.ndarray   # (F,)
    t_mag: np.ndarray       # (F,)


def per_frame_pose_errors(R_est: np.ndarray, t_est: np.ndarray,
                          R_gt: np.ndarray, t_gt: np.ndarray) -> PoseErrors:
    """Per-frame absolute pose errors vs GT (both world->camera)."""
    F = len(R_est)
    rot = np.zeros(F)
    tdir = np.zeros(F)
    tmag = np.zeros(F)
    for i in range(F):
        dR = R_gt[i].T @ R_est[i]
        rot[i] = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        # Camera centers
        c_est = -R_est[i].T @ t_est[i]
        c_gt = -R_gt[i].T @ t_gt[i]
        tmag[i] = np.linalg.norm(c_est - c_gt)
        n_est = np.linalg.norm(c_est) + 1e-12
        n_gt = np.linalg.norm(c_gt) + 1e-12
        tdir[i] = np.degrees(np.arccos(np.clip(
            np.dot(c_est / n_est, c_gt / n_gt), -1, 1)))
    return PoseErrors(rot_deg=rot, t_dir_deg=tdir, t_mag=tmag)


def umeyama_alignment(src: np.ndarray, dst: np.ndarray,
                      with_scale: bool = False):
    """Least-squares similarity transform aligning src -> dst (both (N,3)).

    Returns (s, R, t) with dst ~= s * R @ src + t."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, S, Vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, 1.0, d])
    R = U @ D @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / len(src)
        s = float(np.trace(np.diag(S) @ D) / var_s)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(centers_est: np.ndarray, centers_gt: np.ndarray,
             align: bool = True, with_scale: bool = False) -> float:
    """Absolute trajectory error RMSE over camera centers (N,3)."""
    if align:
        s, R, t = umeyama_alignment(centers_est, centers_gt, with_scale)
        aligned = (s * (R @ centers_est.T)).T + t
    else:
        aligned = centers_est
    err = np.linalg.norm(aligned - centers_gt, axis=1)
    return float(np.sqrt((err ** 2).mean()))


def camera_centers(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """(F,3,3),(F,3) world->camera poses -> (F,3) camera centers."""
    return -np.einsum('fij,fj->fi', np.transpose(R, (0, 2, 1)), t)


def reprojection_stats(errors: np.ndarray,
                       valid: Optional[np.ndarray] = None) -> dict:
    """avg/max/min reprojection error in px (reference src/main.cpp:41-77)."""
    e = errors[valid] if valid is not None else errors
    if len(e) == 0:
        return {"mean_px": float("nan"), "max_px": float("nan"),
                "min_px": float("nan"), "count": 0}
    return {"mean_px": float(e.mean()), "max_px": float(e.max()),
            "min_px": float(e.min()), "count": int(len(e))}
