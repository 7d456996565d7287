"""Descriptor matching ops — masked, fixed-shape, MXU-friendly.

The similarity matrix is one (N,D)x(D,M) matmul — the natural TPU mapping of
descriptor matching. Output convention mirrors the reference's LightGlue
results (`/root/reference/src/core/lightglue.cpp:204-294`): `matches0[i]` is
the index in image 1 matched to keypoint i of image 0, -1 = unmatched, plus a
per-match score; the 0.7 score filter reproduces `lightglue_score_filter`
(`src/core/slam_core.cpp:93-133`).

Mutual-NN is the classical matcher used by BASELINE configs[2]; the learned
LightGlue-style matcher (models/lightglue.py) emits the same output format so
the pipeline is front-end agnostic.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class MatchResult(NamedTuple):
    matches0: jnp.ndarray  # (N,) int32 index into set 1, -1 = none
    mscores0: jnp.ndarray  # (N,) float32 match confidence


def mutual_nn_match(desc0: jnp.ndarray, valid0: jnp.ndarray,
                    desc1: jnp.ndarray, valid1: jnp.ndarray,
                    min_score: float = 0.0,
                    ratio_test: float = 0.0) -> MatchResult:
    """Mutual nearest-neighbour matching on unit-norm descriptors.

    Scores are cosine similarities remapped to [0,1] so the reference's 0.7
    threshold semantics apply. Optional Lowe ratio test (disabled by default).
    """
    sim = jnp.dot(desc0, desc1.T, preferred_element_type=jnp.float32)
    neg = jnp.asarray(-1e9, sim.dtype)
    sim = jnp.where(valid0[:, None] & valid1[None, :], sim, neg)

    nn0 = jnp.argmax(sim, axis=1)            # (N,)
    nn1 = jnp.argmax(sim, axis=0)            # (M,)
    best0 = jnp.max(sim, axis=1)
    mutual = nn1[nn0] == jnp.arange(sim.shape[0])

    score01 = 0.5 * (best0 + 1.0)            # cosine -> [0,1]
    ok = mutual & valid0 & (score01 > min_score) & (best0 > -1e8)

    if ratio_test > 0.0:
        # Second-best without the best column
        sim2 = sim.at[jnp.arange(sim.shape[0]), nn0].set(neg)
        second = jnp.max(sim2, axis=1)
        ok = ok & (best0 * ratio_test >= second)

    matches0 = jnp.where(ok, nn0.astype(jnp.int32), -1)
    mscores0 = jnp.where(ok, score01, 0.0)
    return MatchResult(matches0=matches0, mscores0=mscores0)


def score_filter(matches0: jnp.ndarray, mscores0: jnp.ndarray,
                 threshold: float) -> jnp.ndarray:
    """`lightglue_score_filter` semantics: valid match AND score > thr."""
    return (matches0 >= 0) & (mscores0 > threshold)


def gather_matched(kpts0, kpts1, matches0, pair_mask):
    """Build aligned (N,2)/(N,2) correspondence arrays: row i is
    (kpt0[i], kpt1[matches0[i]]), garbage where ~pair_mask."""
    idx = jnp.clip(matches0, 0, kpts1.shape[0] - 1)
    return kpts0, kpts1[idx], pair_mask
