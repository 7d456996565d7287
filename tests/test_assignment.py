"""Fused Pallas assignment vs the XLA dual-softmax reference."""

import jax
import jax.numpy as jnp
import numpy as np

from gl_slam_tpu.models.lightglue import assignment
from gl_slam_tpu.ops.assignment import fused_assignment


def _setup(seed, N=128, M=192, Df=64):
    rng = np.random.default_rng(seed)
    f0 = jnp.asarray(rng.normal(scale=0.5, size=(N, Df)).astype(np.float32))
    f1 = jnp.asarray(rng.normal(scale=0.5, size=(M, Df)).astype(np.float32))
    z0 = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
    z1 = jnp.asarray(rng.normal(size=(M,)).astype(np.float32))
    m0 = jnp.asarray(rng.random(N) > 0.2)
    m1 = jnp.asarray(rng.random(M) > 0.2)
    return f0, f1, z0, z1, m0, m1


def _xla_ref(f0, f1, z0, z1, m0, m1, scale, thr=0.0):
    sim = jnp.einsum('nd,md->nm', f0, f1,
                     preferred_element_type=jnp.float32) * scale
    return assignment(sim, z0, z1, m0, m1, thr)


def test_fused_assignment_matches_xla():
    f0, f1, z0, z1, m0, m1 = _setup(0)
    scale = 1.0 / np.sqrt(f0.shape[1])
    ref = _xla_ref(f0, f1, z0, z1, m0, m1, scale)
    out = fused_assignment(f0, f1, z0, z1, m0, m1, scale, 0.0,
                           tile_q=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(out.matches0),
                                  np.asarray(ref.matches0))
    np.testing.assert_array_equal(np.asarray(out.matches1),
                                  np.asarray(ref.matches1))
    np.testing.assert_allclose(np.asarray(out.mscores0),
                               np.asarray(ref.mscores0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.mscores1),
                               np.asarray(ref.mscores1), atol=1e-5)


def test_fused_assignment_threshold_and_all_masked():
    f0, f1, z0, z1, m0, m1 = _setup(1)
    scale = 1.0 / np.sqrt(f0.shape[1])
    thr = 0.2
    ref = _xla_ref(f0, f1, z0, z1, m0, m1, scale, thr)
    out = fused_assignment(f0, f1, z0, z1, m0, m1, scale, thr,
                           tile_q=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(out.matches0),
                                  np.asarray(ref.matches0))
    # fully masked set 1: no matches, no NaNs
    out2 = fused_assignment(f0, f1, z0, z1, m0, jnp.zeros_like(m1),
                            scale, 0.0, tile_q=64, interpret=True)
    assert (np.asarray(out2.matches0) == -1).all()
    assert np.isfinite(np.asarray(out2.mscores0)).all()


def test_fused_assignment_vmap():
    """The kernel is grid-free so pallas vmap batching must be exact."""
    scale = 0.125
    batches = [_setup(s) for s in (2, 3)]
    stack = [jnp.stack(x) for x in zip(*batches)]
    out = jax.vmap(lambda f0, f1, z0, z1, m0, m1: fused_assignment(
        f0, f1, z0, z1, m0, m1, scale, 0.0, tile_q=32,
        interpret=True))(*stack)
    for b, (f0, f1, z0, z1, m0, m1) in enumerate(batches):
        ref = _xla_ref(f0, f1, z0, z1, m0, m1, scale)
        np.testing.assert_array_equal(np.asarray(out.matches0[b]),
                                      np.asarray(ref.matches0))
        np.testing.assert_allclose(np.asarray(out.mscores0[b]),
                                   np.asarray(ref.mscores0), atol=1e-5)


def test_fused_assignment_xla_fallback():
    """use_pallas=False path returns identical results minus `scores`."""
    f0, f1, z0, z1, m0, m1 = _setup(4)
    scale = 0.2
    ref = _xla_ref(f0, f1, z0, z1, m0, m1, scale)
    out = fused_assignment(f0, f1, z0, z1, m0, m1, scale, 0.0,
                           use_pallas=False)
    np.testing.assert_array_equal(np.asarray(out.matches0),
                                  np.asarray(ref.matches0))
    assert out.scores is None
