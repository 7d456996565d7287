"""Fixed-size masked index selection over the map-point table.

"Give me up to M eligible points, newest/oldest first" over the
creation-ordered point table. This replaces the reference's ragged
std::vector candidate collection (e.g. `get_matches_from_previous_frames`,
/root/reference/src/core/slam_core.cpp:428-541) at fixed shape.

Implementation choice is measured, not guessed (scripts/ablate_select.py,
v5e, inside the fused tracking scan at 65k-point tables): the int32
index-priority `lax.top_k` formulation beats a cumsum+scatter prefix
selection by ~0.6 ms/frame and a cumsum+searchsorted one by ~0.45 ms/frame
— in-program, XLA overlaps the partial sort well, while the 65k-wide
scatter serializes. (Standalone microbenchmarks say the opposite;
scripts/microbench_ops.py documents the trap.) The alternates are kept
below for re-measurement on future hardware/compilers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def select_lowest_ids(mask: jnp.ndarray, M: int):
    """Up to M set positions of `mask`, LOWEST index first.

    Returns (ids (M,) int32 with -1 padding, valid (M,) bool). Overflow
    drops the highest indices. Deterministic.
    """
    n = mask.shape[0]
    prio = jnp.where(mask, n - jnp.arange(n, dtype=jnp.int32), -1)
    top, _ = jax.lax.top_k(prio, M)
    ids = jnp.where(top >= 0, n - top, -1).astype(jnp.int32)
    return ids, ids >= 0


def select_newest_ids(mask: jnp.ndarray, M: int):
    """Up to M set positions of `mask`, HIGHEST index first.

    Map tables allocate point ids in creation order, so highest index =
    most recently created. Overflow drops the oldest. Returns
    (ids (M,) int32 with -1 padding, valid (M,) bool).
    """
    n = mask.shape[0]
    prio = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), -1)
    top, _ = jax.lax.top_k(prio, M)
    return top, top >= 0


# --- measured alternates (scripts/ablate_select.py) ----------------------

def _rank_to_ids(pos: jnp.ndarray, mask: jnp.ndarray, M: int):
    """Scatter indices whose rank `pos` < M into an (M,) id list."""
    n = mask.shape[0]
    pos = jnp.where(mask, pos, M)
    ids = jnp.full((M,), -1, jnp.int32).at[
        jnp.clip(pos, 0, M)].set(jnp.arange(n, dtype=jnp.int32),
                                 mode='drop')
    return ids, ids >= 0


def select_lowest_ids_cumsum(mask: jnp.ndarray, M: int):
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1          # rank among set
    return _rank_to_ids(pos, mask, M)


def select_newest_ids_cumsum(mask: jnp.ndarray, M: int):
    # rank 0 = last set element: count set entries strictly after i
    pos = jnp.cumsum(mask[::-1].astype(jnp.int32))[::-1] - 1
    return _rank_to_ids(pos, mask, M)


def select_newest_ids_ss(mask: jnp.ndarray, M: int):
    """searchsorted formulation: rank->index by binary search over the
    (monotone) suffix-count array; M log n gathers, no scatter."""
    c = jnp.cumsum(mask[::-1].astype(jnp.int32))          # suffix counts
    total = c[-1]
    j = jnp.arange(M, dtype=jnp.int32)
    # smallest reversed-position with count >= j+1
    rpos = jnp.searchsorted(c, j + 1, side='left').astype(jnp.int32)
    ids = mask.shape[0] - 1 - rpos
    valid = j < total
    return jnp.where(valid, ids, -1).astype(jnp.int32), valid


def select_lowest_ids_ss(mask: jnp.ndarray, M: int):
    c = jnp.cumsum(mask.astype(jnp.int32))
    total = c[-1]
    j = jnp.arange(M, dtype=jnp.int32)
    pos = jnp.searchsorted(c, j + 1, side='left').astype(jnp.int32)
    valid = j < total
    return jnp.where(valid, pos, -1).astype(jnp.int32), valid
