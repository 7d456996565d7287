"""LAPACK-free small-matrix linear algebra — the TPU-native numerics core.

Why this module exists: `jnp.linalg.{eigh,svd,solve}` lower to LAPACK custom
calls on CPU and to large generic XLA loop programs on TPU. Both are slow to
compile when instantiated repeatedly (e.g. inside an unrolled LM scan) and the
TPU lowerings are slow at runtime for tiny matrices. Every solver here is
built from matmuls + elementwise arithmetic only, so it fuses, batches with
`vmap`, and compiles in milliseconds:

  * `smallest_eigvec`  — shifted power iteration with matrix squaring, for
    the Gram-matrix nullspace solves (8-point essential 9x9, DLT
    triangulation 4x4, DLT PnP 12x12);
  * `eigh3x3` / `svd3` — closed-form symmetric 3x3 eigendecomposition
    (Cardano) and the SVD built from it (essential decomposition,
    SO(3) projection);
  * `cholesky_solve`   — unrolled Cholesky for the 6x6 pose normal equations;
  * `cg_solve`         — fixed-iteration conjugate gradients for the BA
    reduced camera system (PSD by construction from LM damping);
  * `inv3x3`           — adjugate closed form for the point Hessian blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def smallest_eigvec(M: jnp.ndarray, squarings: int = 4,
                    iters: int = 3) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue of a symmetric PSD matrix.

    Works on (..., n, n) batches. Inverse iteration with a tiny diagonal
    shift, solved by the unrolled Cholesky — for the nullspace-style Gram
    matrices of minimal fitting problems (smallest eigenvalue near zero,
    healthy gap to the rest) this converges in 2-3 iterations with ratio
    (lambda_min + eps) / (lambda_2 + eps). Pure arithmetic, no custom calls.

    `squarings` is kept for API compatibility; iterations dominate accuracy.
    """
    del squarings
    n = M.shape[-1]
    I = jnp.eye(n, dtype=M.dtype)
    tr = jnp.trace(M, axis1=-2, axis2=-1)[..., None, None]
    scale = jnp.maximum(tr, _EPS) / n
    Ms = M / scale + 1e-6 * I  # shift keeps Cholesky PD even for exact rank-def.

    batch_shape = M.shape[:-2]
    solve = cholesky_solve
    for _ in range(len(batch_shape)):
        import jax
        solve = jax.vmap(solve)

    v = jnp.broadcast_to(
        1.0 + 0.01 * jnp.arange(n, dtype=M.dtype), M.shape[:-1])
    for _ in range(iters):
        v = solve(Ms, v)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), _EPS)
    return v


def inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse via the adjugate."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A00 = e * i - f * h
    A01 = c * h - b * i
    A02 = b * f - c * e
    A10 = f * g - d * i
    A11 = a * i - c * g
    A12 = c * d - a * f
    A20 = d * h - e * g
    A21 = b * g - a * h
    A22 = a * e - b * d
    det = a * A00 + b * A10 + c * A20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < _EPS, _EPS, det)
    adj = jnp.stack([
        jnp.stack([A00, A01, A02], axis=-1),
        jnp.stack([A10, A11, A12], axis=-1),
        jnp.stack([A20, A21, A22], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None]


def det3x3(A: jnp.ndarray) -> jnp.ndarray:
    return (A[..., 0, 0] * (A[..., 1, 1] * A[..., 2, 2]
                            - A[..., 1, 2] * A[..., 2, 1])
            - A[..., 0, 1] * (A[..., 1, 0] * A[..., 2, 2]
                              - A[..., 1, 2] * A[..., 2, 0])
            + A[..., 0, 2] * (A[..., 1, 0] * A[..., 2, 1]
                              - A[..., 1, 1] * A[..., 2, 0]))


def eigh3x3(A: jnp.ndarray):
    """Closed-form eigendecomposition of symmetric 3x3 (batched).

    Returns (w, V): eigenvalues ascending (..., 3) and eigenvectors as
    columns of V (..., 3, 3). Cardano for eigenvalues; eigenvectors from
    products (A - w_j I)(A - w_k I) whose columns span the w_i eigenspace.
    """
    dtype = A.dtype
    # Scale-normalize for f32 robustness; eigenvalues rescaled at the end.
    nrm = jnp.maximum(jnp.abs(A).max(axis=(-2, -1)), _EPS)
    A = A / nrm[..., None, None]
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    I = jnp.eye(3, dtype=dtype)
    B = A - q[..., None, None] * I
    p2 = jnp.einsum('...ij,...ij->...', B, B) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    detB = det3x3(B)
    r = detB / (2.0 * jnp.maximum(p, _EPS) ** 3)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    w2 = q + 2.0 * p * jnp.cos(phi)                       # largest
    w0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    w1 = 3.0 * q - w0 - w2
    w = jnp.stack([w0, w1, w2], axis=-1)                  # ascending

    def eigvec(wi):
        # Rows of (A - wi I) are orthogonal to the wi eigenvector; the
        # largest pairwise cross product of rows is the most stable estimate.
        # Returns (v, quality): quality ~ 0 when wi belongs to a degenerate
        # pair (B becomes rank-1 and all cross products vanish).
        B = A - wi[..., None, None] * I
        c01 = jnp.cross(B[..., 0, :], B[..., 1, :])
        c02 = jnp.cross(B[..., 0, :], B[..., 2, :])
        c12 = jnp.cross(B[..., 1, :], B[..., 2, :])
        cands = jnp.stack([c01, c02, c12], axis=-2)       # (...,3,3)
        norms = jnp.linalg.norm(cands, axis=-1)
        idx = jnp.argmax(norms, axis=-1)
        v = jnp.take_along_axis(
            cands, idx[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        fallback = jnp.zeros_like(v).at[..., 0].set(1.0)
        v = jnp.where(n > 1e-20, v / jnp.maximum(n, _EPS), fallback)
        return v, jnp.max(norms, axis=-1)

    va, qa = eigvec(w0)
    vb, qb = eigvec(w2)
    # Trust the better-conditioned end of the spectrum (the other may sit in
    # a degenerate pair); orthonormally complete the frame from it.
    use_a = (qa >= qb)[..., None]
    prim = jnp.where(use_a, va, vb)
    sec_raw = jnp.where(use_a, vb, va)
    sec = sec_raw - jnp.sum(sec_raw * prim, axis=-1, keepdims=True) * prim
    sn = jnp.linalg.norm(sec, axis=-1, keepdims=True)
    # Degenerate fallback: any unit vector orthogonal to prim
    alt = jnp.cross(prim, jnp.zeros_like(prim).at[..., 0].set(1.0))
    alt2 = jnp.cross(prim, jnp.zeros_like(prim).at[..., 1].set(1.0))
    alt = jnp.where(jnp.linalg.norm(alt, axis=-1, keepdims=True) > 0.1,
                    alt, alt2)
    alt = alt / jnp.maximum(jnp.linalg.norm(alt, axis=-1, keepdims=True),
                            _EPS)
    sec = jnp.where(sn > 1e-5, sec / jnp.maximum(sn, _EPS), alt)
    v0 = jnp.where(use_a, prim, sec)
    v2 = jnp.where(use_a, sec, prim)
    v1 = jnp.cross(v2, v0)
    v1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), _EPS)
    V = jnp.stack([v0, v1, v2], axis=-1)
    return w * nrm[..., None], V


def svd3(E: jnp.ndarray):
    """SVD of a (batched) 3x3 matrix via eigh3x3(E^T E).

    Returns (U, s, Vt) with singular values DESCENDING. The third left
    singular vector (null direction for rank-2 inputs) is the cross product
    of the first two, so U is always a proper orthonormal frame.
    """
    w, V = eigh3x3(jnp.swapaxes(E, -1, -2) @ E)
    # Reorder descending
    V = V[..., ::-1]
    s = jnp.sqrt(jnp.maximum(w[..., ::-1], 0.0))
    u0 = jnp.einsum('...ij,...j->...i', E, V[..., 0])
    u0 = u0 / jnp.maximum(jnp.linalg.norm(u0, axis=-1, keepdims=True), _EPS)
    u1 = jnp.einsum('...ij,...j->...i', E, V[..., 1])
    u1 = u1 - jnp.sum(u1 * u0, axis=-1, keepdims=True) * u0
    u1 = u1 / jnp.maximum(jnp.linalg.norm(u1, axis=-1, keepdims=True), _EPS)
    u2 = jnp.cross(u0, u1)
    # Sign-align u2 with E v2 so U diag(s) V^T reconstructs E exactly for
    # full-rank inputs; for rank-2 inputs (s2 ~ 0) the sign is free and the
    # cross product keeps U a proper orthonormal frame.
    Ev2 = jnp.einsum('...ij,...j->...i', E, V[..., 2])
    d = jnp.sum(u2 * Ev2, axis=-1, keepdims=True)
    sgn = jnp.where(jnp.abs(d) > 1e-7, jnp.sign(d), 1.0)
    u2 = u2 * sgn
    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, s, jnp.swapaxes(V, -1, -2)


def cholesky_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for small symmetric positive-definite A (n,n), n static.

    Fully unrolled Cholesky + two triangular solves: pure arithmetic, no
    custom calls. Batched via vmap by callers. Intended for n <= ~12.
    """
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, _EPS))
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s / L[j][j]
    # Forward solve L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # Backward solve L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def scaled_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Direct dense solve with symmetric Jacobi scaling, for small SPD
    systems with badly mixed parameter scales (e.g. a Schur-reduced camera
    system: rotation columns scale like f*depth, translation like f).

    x = D y where (D A D) y = D b, D = diag(A)^{-1/2}. The scaling keeps the
    f32 LU well-conditioned; unpreconditioned f32 CG on these systems was
    measured to DIVERGE (relative residuals > 1) once LM damping gets small.
    n here is <= a few hundred — the LU is negligible next to the Jacobian
    products around it.
    """
    d = jnp.diagonal(A, axis1=-2, axis2=-1)
    s = jax.lax.rsqrt(jnp.maximum(jnp.abs(d), _EPS))
    As = A * s[..., :, None] * s[..., None, :]
    bs = b * s
    y = jnp.linalg.solve(As, bs[..., None])[..., 0]
    return y * s


def block_jacobi_pcg(S: jnp.ndarray, b: jnp.ndarray,
                     iters: int) -> jnp.ndarray:
    """Preconditioned CG on a block-structured SPD system.

    S: (C,C,6,6) block matrix (e.g. the Schur-reduced camera system),
    b: (C,6). Preconditioner = exact inverse of the (6,6) diagonal blocks —
    the block analog of Ceres' CLUSTER_JACOBI. This removes the brutal
    rotation-vs-translation scale mix (kappa ~ (f*depth)^2 / f^2 squared)
    that makes plain f32 CG diverge, while staying matmul-only: one
    (C,C,6,6)x(C,6) contraction + one block solve per iteration, no LU
    custom call (jnp.linalg.solve costs ~10 ms per call on TPU at this
    size; this whole solve is well under a millisecond).
    """
    C = S.shape[0]
    diag = S[jnp.arange(C), jnp.arange(C)]                  # (C,6,6)
    eye = jnp.broadcast_to(jnp.eye(6, dtype=S.dtype), (C, 6, 6))
    # Exact 6x6 inverses via the unrolled Cholesky solve against I
    Minv = jax.vmap(lambda A: jax.vmap(
        lambda e: cholesky_solve(A, e))(jnp.eye(6, dtype=S.dtype)))(diag)
    Minv = jnp.swapaxes(Minv, -1, -2)                       # (C,6,6)
    del eye

    def mv(x):
        return jnp.einsum('cdij,dj->ci', S, x)

    def pre(r):
        return jnp.einsum('cij,cj->ci', Minv, r)

    x = jnp.zeros_like(b)
    r = b
    z = pre(r)
    p = z
    rz = jnp.sum(r * z)

    def body(carry, _):
        x, r, p, rz = carry
        Ap = mv(p)
        denom = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(denom) < _EPS, _EPS, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        z = pre(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < _EPS, _EPS, rz)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rz), None, length=iters)
    return x


def cg_solve(A: jnp.ndarray, b: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Conjugate gradients with a Jacobi preconditioner for PSD A.

    Fixed iteration count (static), matmul-only — ideal inside jitted LM
    loops where A is the damped Schur-reduced camera system. For n x n with
    iters >= n this is exact in exact arithmetic.
    """
    import jax

    diag = jnp.diagonal(A, axis1=-2, axis2=-1)
    Minv = 1.0 / jnp.maximum(jnp.abs(diag), _EPS)

    def mv(x):
        return jnp.einsum('...ij,...j->...i', A, x)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = Minv * r0
    p0 = z0
    rz0 = jnp.sum(r0 * z0, axis=-1)

    def body(carry, _):
        x, r, p, rz = carry
        Ap = mv(p)
        denom = jnp.sum(p * Ap, axis=-1)
        alpha = rz / jnp.where(jnp.abs(denom) < _EPS, _EPS, denom)
        x = x + alpha[..., None] * p
        r = r - alpha[..., None] * Ap
        z = Minv * r
        rz_new = jnp.sum(r * z, axis=-1)
        beta = rz_new / jnp.where(jnp.abs(rz) < _EPS, _EPS, rz)
        p = z + beta[..., None] * p
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x0, r0, p0, rz0), None,
                                   length=iters)
    return x


# Full-f32 matmul precision (ops/precision.py): the bf16 TPU matmul default
# is unit-scale-model-path-only; on pixel/metre-scale geometry it injects
# ~4e-3 relative noise, measured as a ~0.7 px floor on exact-input
# triangulation before the round-3 fix.
from .precision import f32 as _precision_f32  # noqa: E402

for _name in ("smallest_eigvec", "inv3x3", "det3x3", "eigh3x3", "svd3", "cholesky_solve", "scaled_solve", "block_jacobi_pcg", "cg_solve",):
    globals()[_name] = _precision_f32(globals()[_name])
del _name
