"""Unit tests for the LAPACK-free small-matrix kernels (ops/smallmat.py),
validated against numpy's LAPACK-backed references."""

import jax
import jax.numpy as jnp
import numpy as np

from gl_slam_tpu.ops import smallmat as sm


def test_smallest_eigvec():
    """Contract case: near-rank-deficient Gram matrices (minimal fitting
    problems with noise) — the Rayleigh quotient must approach the true
    smallest eigenvalue."""
    rng = np.random.default_rng(0)
    # 8 strong rows + 12 weak noise rows in 9 dims: lambda_min << lambda_2
    A = np.concatenate([
        rng.normal(size=(64, 8, 9)),
        0.02 * rng.normal(size=(64, 12, 9))], axis=1).astype(np.float32)
    M = jnp.einsum('bni,bnj->bij', jnp.asarray(A), jnp.asarray(A))
    v = jax.jit(sm.smallest_eigvec)(M)
    Mn = np.asarray(M)
    wnp, _ = np.linalg.eigh(Mn)
    vr = np.asarray(v)
    rq = np.einsum('bi,bij,bj->b', vr, Mn, vr)
    gap = wnp[:, 1] - wnp[:, 0]
    assert np.all(rq <= wnp[:, 0] + 0.05 * gap + 1e-4), \
        ((rq - wnp[:, 0]) / gap).max()


def test_smallest_eigvec_nullspace():
    """Exact nullspace (rank-deficient Gram) must be recovered to ~1e-6."""
    rng = np.random.default_rng(3)
    # Build 9x9 Gram with exact null vector: A has 8 rows
    A = rng.normal(size=(32, 8, 9)).astype(np.float32)
    M = jnp.einsum('bni,bnj->bij', jnp.asarray(A), jnp.asarray(A))
    v = jax.jit(lambda m: sm.smallest_eigvec(m, iters=4))(M)
    resid = np.linalg.norm(np.einsum('bij,bj->bi', np.asarray(M),
                                     np.asarray(v)), axis=1)
    scale = np.linalg.norm(np.asarray(M), axis=(1, 2))
    assert (resid / scale).max() < 1e-5


def test_eigh3x3():
    rng = np.random.default_rng(1)
    S = rng.normal(size=(128, 3, 3)).astype(np.float32)
    S = S + S.transpose(0, 2, 1)
    w, V = jax.jit(sm.eigh3x3)(jnp.asarray(S))
    wr, _ = np.linalg.eigh(S)
    assert np.abs(np.asarray(w) - wr).max() < 1e-4
    recon = np.einsum('bij,bj,bkj->bik', np.asarray(V), np.asarray(w),
                      np.asarray(V))
    assert np.abs(recon - S).max() < 1e-3


def test_svd3():
    rng = np.random.default_rng(2)
    E = rng.normal(size=(128, 3, 3)).astype(np.float32)
    U, s, Vt = jax.jit(sm.svd3)(jnp.asarray(E))
    recon = np.einsum('bij,bj,bjk->bik', np.asarray(U), np.asarray(s),
                      np.asarray(Vt))
    assert np.abs(recon - E).max() < 1e-3
    sr = np.linalg.svd(E, compute_uv=False)
    assert np.abs(np.asarray(s) - sr).max() < 1e-3
    # U orthonormality
    UtU = np.einsum('bij,bik->bjk', np.asarray(U), np.asarray(U))
    assert np.abs(UtU - np.eye(3)).max() < 1e-4


def test_svd3_rank2():
    """Essential-matrix-like rank-2 inputs (the actual use case)."""
    rng = np.random.default_rng(5)
    U0, _ = np.linalg.qr(rng.normal(size=(16, 3, 3)))
    V0, _ = np.linalg.qr(rng.normal(size=(16, 3, 3)))
    E = np.einsum('bij,j,bkj->bik', U0,
                  np.array([1.0, 1.0, 0.0]), V0).astype(np.float32)
    U, s, Vt = jax.jit(sm.svd3)(jnp.asarray(E))
    recon = np.einsum('bij,bj,bjk->bik', np.asarray(U), np.asarray(s),
                      np.asarray(Vt))
    # f32 limit: sigma_2 = sqrt(eig) amplifies rounding near zero to ~3e-4
    assert np.abs(recon - E).max() < 1e-3
    assert np.abs(np.asarray(s) - np.array([1.0, 1.0, 0.0])).max() < 1e-3


def test_cholesky_solve():
    rng = np.random.default_rng(4)
    A6 = rng.normal(size=(32, 10, 6)).astype(np.float32)
    H = jnp.einsum('bni,bnj->bij', jnp.asarray(A6), jnp.asarray(A6)) \
        + 0.1 * jnp.eye(6)
    b = jnp.asarray(rng.normal(size=(32, 6)).astype(np.float32))
    x = jax.jit(jax.vmap(sm.cholesky_solve))(H, b)
    xr = np.linalg.solve(np.asarray(H), np.asarray(b)[..., None])[..., 0]
    assert np.abs(np.asarray(x) - xr).max() < 1e-3


def test_cg_solve():
    rng = np.random.default_rng(6)
    A96 = rng.normal(size=(200, 96)).astype(np.float32)
    H = jnp.asarray(A96.T @ A96 + 5.0 * np.eye(96, dtype=np.float32))
    b = jnp.asarray(rng.normal(size=96).astype(np.float32))
    x = jax.jit(lambda a, c: sm.cg_solve(a, c, 120))(H, b)
    xr = np.linalg.solve(np.asarray(H), np.asarray(b))
    rel = np.linalg.norm(np.asarray(x) - xr) / np.linalg.norm(xr)
    assert rel < 1e-3, rel


def test_inv3x3():
    rng = np.random.default_rng(7)
    S = rng.normal(size=(64, 3, 3)).astype(np.float32)
    S = S @ S.transpose(0, 2, 1) + 0.5 * np.eye(3, dtype=np.float32)
    I3 = jax.jit(sm.inv3x3)(jnp.asarray(S))
    assert np.abs(np.asarray(I3) - np.linalg.inv(S)).max() < 1e-3
