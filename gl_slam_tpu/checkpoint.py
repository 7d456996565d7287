"""Checkpoint / resume + trajectory export (SURVEY.md §5.4).

The reference persists nothing (map lives in RAM; only TensorRT engine files
are cached, `src/core/superpoint.cpp:29-31,75-78`). Required additions here:
orbax checkpoints of the full functional SLAM state (map + tracker), and
KITTI-format trajectory export for ATE evaluation.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def save_state(path: str, state) -> None:
    """Save a TrackState / MapState pytree with orbax."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree_util.tree_map(np.asarray, state), force=True)
    ckptr.wait_until_finished()


def load_state(path: str, like):
    """Restore a pytree saved by save_state; `like` provides the structure."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), like)
    return ckptr.restore(path, abstract)


def params_path(out_dir: str, name: str) -> str:
    return os.path.join(out_dir, f"{name}.npz")


def save_params(path: str, params) -> None:
    """Save a Flax params pytree as a flat .npz (portable, no orbax dirs)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    np.savez(path, **arrays)


def load_params(path: str, like, sharding=None):
    """Restore a params pytree saved by save_params; `like` gives structure.

    Leaves are device_put ONCE here: returning numpy leaves makes every
    jitted call that closes over nothing re-upload the full parameter set
    H2D (for the flagship LightGlue that is ~50 MB per tracking-chunk
    dispatch — measured ~1.3 s/chunk of pure transfer on a tunneled device,
    dwarfing the ~115 ms of device compute). The transfer is one batched
    `jax.device_put` call over all leaves (ADVICE r2). `sharding`: optional
    jax.sharding.Sharding (or per-leaf pytree of them) — mesh users pass a
    replicated NamedSharding so loaded params co-operate with mesh-sharded
    arguments instead of being committed to the single default device."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    host = [data[jax.tree_util.keystr(k)] for k, _ in flat]
    leaves = jax.device_put(host) if sharding is None \
        else jax.device_put(host, sharding)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def export_kitti_trajectory(path: str, R: np.ndarray, t: np.ndarray) -> None:
    """Write world->camera poses as KITTI rows (camera-to-world 3x4)."""
    rows = []
    for i in range(len(R)):
        Rcw = R[i].T
        c = -R[i].T @ t[i]
        P = np.concatenate([Rcw, c[:, None]], axis=1)
        rows.append(" ".join(f"{v:.9e}" for v in P.reshape(-1)))
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")


def load_kitti_trajectory(path: str):
    rows = np.loadtxt(path).reshape(-1, 3, 4)
    Rcw = rows[:, :, :3]
    c = rows[:, :, 3]
    R = np.transpose(Rcw, (0, 2, 1))
    t = -np.einsum('fij,fj->fi', R, c)
    return R, t
