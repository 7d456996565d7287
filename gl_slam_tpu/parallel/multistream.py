"""Multi-stream SLAM: S concurrent sequences, vmapped and mesh-sharded.

BASELINE configs[4]: 16 concurrent KITTI sequences batched per chip and
data-parallel across chips. The whole tracker — matcher, RANSAC, pose LM,
map scatters, sliding-window BA — is already fixed-shape, so scale-out is
`jax.vmap` over a stream axis plus a NamedSharding placing that axis on the
mesh's `data` dimension; pjit emits whatever collectives the program needs
(none in steady state: streams are independent, so the program is
embarrassingly parallel and communication-free on ICI).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import SLAMConfig
from ..slam import ba as ba_mod
from ..slam import frontend
from . import mesh as mesh_lib


class MultiStreamTracker:
    """Lock-step tracker over S independent sequences."""

    def __init__(self, cfg: SLAMConfig, K, num_streams: int,
                 mesh: Optional[jax.sharding.Mesh] = None, seed: int = 0):
        self.cfg = cfg
        self.S = num_streams
        self.mesh = mesh
        self.K = jnp.asarray(K, jnp.float32)
        if self.K.ndim == 2:
            self.K = jnp.broadcast_to(self.K, (num_streams, 3, 3))

        keys = jax.random.split(jax.random.PRNGKey(seed), num_streams)
        init_one = partial(frontend.init_track_state, cfg)
        self.state = jax.vmap(init_one)(keys)
        if mesh is not None:
            self.K = mesh_lib.shard_streams(self.K, mesh)
            self.state = mesh_lib.shard_streams(self.state, mesh)

        self._bootstrap = jax.jit(jax.vmap(
            partial(frontend.bootstrap_step, cfg), in_axes=(0, 0, 0, 0, 0)))
        self._step = jax.jit(jax.vmap(
            partial(frontend.track_step, cfg), in_axes=(0, 0, 0)))
        self._ba = jax.jit(jax.vmap(
            partial(ba_mod.ba_step, cfg), in_axes=(0, 0, 0, 0)))

    def _feats(self, kpts, desc, valid, frame_idx):
        return frontend.FrameFeatures(
            kpts=jnp.asarray(kpts, jnp.float32),
            desc=jnp.asarray(desc, jnp.float32),
            valid=jnp.asarray(valid),
            frame_idx=jnp.broadcast_to(
                jnp.asarray(frame_idx, jnp.int32), (self.S,)))

    def bootstrap(self, f0, f1, gt_scales):
        """f0/f1: tuples of stream-batched (kpts (S,N,2), desc, valid)."""
        feats0 = self._feats(*f0, 0)
        feats1 = self._feats(*f1, 1)
        self.state, out = self._bootstrap(
            self.K, self.state, feats0, feats1,
            jnp.asarray(gt_scales, jnp.float32))
        return out

    def step(self, kpts, desc, valid, frame_idx):
        feats = self._feats(kpts, desc, valid, frame_idx)
        self.state, out = self._step(self.K, self.state, feats)
        return out

    def ba(self, first_kf, window):
        new_map = self._ba(
            self.K, self.state.map,
            jnp.broadcast_to(jnp.asarray(first_kf, jnp.int32), (self.S,)),
            jnp.broadcast_to(jnp.asarray(window, jnp.int32), (self.S,)))
        last = new_map.num_kf - 1
        idx = jnp.clip(last, 0, new_map.kf_R.shape[1] - 1)
        self.state = self.state._replace(
            map=new_map,
            R_cur=jnp.take_along_axis(
                new_map.kf_R, idx[:, None, None, None], axis=1)[:, 0],
            t_cur=jnp.take_along_axis(
                new_map.kf_t, idx[:, None, None], axis=1)[:, 0])

    def block(self):
        jax.block_until_ready(self.state.map.num_kf)
