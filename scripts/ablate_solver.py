"""Small dense SPD solve alternatives at Schur-system size (72x72),
measured INSIDE a scan (the LM loop's conditions)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the axon TPU plugin)

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T = 12   # ~effective LM iterations


def bench(name, fn, *args, n=20):
    out = fn(*args)
    np.asarray(jax.device_get(jnp.ravel(
        jax.tree_util.tree_leaves(out)[0])[:1]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.device_get(jnp.ravel(
        jax.tree_util.tree_leaves(out)[0])[:1]))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:>40}: {dt*1e3:8.2f} ms/scan{T}  {dt*1e3/T:6.3f} ms/iter",
          flush=True)


def main():
    from gl_slam_tpu.ops import smallmat

    n = 72
    key = jax.random.PRNGKey(0)
    A0 = jax.random.normal(key, (n, n))
    S = A0 @ A0.T + n * jnp.eye(n)
    b = jax.random.normal(key, (n,))

    def scan_over(solver):
        def fn(S, b):
            def body(c, _):
                x = solver(S + c * 1e-9, b)
                return jnp.sum(x) * 1e-12, x
            return jax.lax.scan(body, 0.0, None, length=T)
        return jax.jit(fn)

    bench("linalg.solve (LU)", scan_over(
        lambda S, b: jnp.linalg.solve(S, b[:, None])[:, 0]), S, b)
    bench("scaled_solve (current)", scan_over(
        smallmat.scaled_solve), S, b)

    import jax.scipy.linalg as jsl
    bench("cho_factor+cho_solve", scan_over(
        lambda S, b: jsl.cho_solve(jsl.cho_factor(S), b)), S, b)

    def chol_factor(A):
        """Unrolled dense Cholesky factor for small static n."""
        nn = A.shape[-1]
        L = [[None] * nn for _ in range(nn)]
        for j in range(nn):
            s = A[..., j, j]
            for k in range(j):
                s = s - L[j][k] * L[j][k]
            L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            for i in range(j + 1, nn):
                s = A[..., i, j]
                for k in range(j):
                    s = s - L[i][k] * L[j][k]
                L[i][j] = s / L[j][j]
        rows = [jnp.stack([L[i][j] if j <= i else jnp.zeros_like(L[i][i])
                           for j in range(nn)], axis=-1) for i in range(nn)]
        return jnp.stack(rows, axis=-2)

    def chol_unrolled_block(S, b, nb=12):
        """Blocked Cholesky solve, python-unrolled over nb x nb blocks."""
        C = n // nb
        Sb = S.reshape(C, nb, C, nb).transpose(0, 2, 1, 3)
        L = [[None] * C for _ in range(C)]
        A = {(i, j): Sb[i, j] for i in range(C) for j in range(i + 1)}
        eye = jnp.eye(nb, dtype=S.dtype)
        for j in range(C):
            Ljj = chol_factor(A[(j, j)])
            Ljj_inv = jax.scipy.linalg.solve_triangular(Ljj, eye,
                                                        lower=True)
            L[j][j] = Ljj
            for i in range(j + 1, C):
                L[i][j] = A[(i, j)] @ Ljj_inv.T
            for i in range(j + 1, C):
                for k2 in range(j + 1, i + 1):
                    A[(i, k2)] = A[(i, k2)] - L[i][j] @ L[k2][j].T
        # forward solve L y = b
        bb = [b[i * nb:(i + 1) * nb] for i in range(C)]
        y = [None] * C
        for i in range(C):
            s = bb[i]
            for j in range(i):
                s = s - L[i][j] @ y[j]
            y[i] = jax.scipy.linalg.solve_triangular(L[i][i], s, lower=True)
        # backward solve L^T x = y
        x = [None] * C
        for i in reversed(range(C)):
            s = y[i]
            for j in range(i + 1, C):
                s = s - L[j][i].T @ x[j]
            x[i] = jax.scipy.linalg.solve_triangular(L[i][i], s, lower=True,
                                                     trans='T')
        return jnp.concatenate(x)

    bench("blocked-chol 12x12 unrolled", scan_over(
        chol_unrolled_block), S, b)
    bench("blocked-chol 6x6 unrolled", scan_over(
        lambda S, b: chol_unrolled_block(S, b, nb=6)), S, b)
    x_bc = chol_unrolled_block(S, b)
    x_lu0 = jnp.linalg.solve(S, b[:, None])[:, 0]
    print("blocked-chol vs lu max diff:",
          float(jnp.max(jnp.abs(x_bc - x_lu0))), flush=True)

    # accuracy check
    x_lu = jnp.linalg.solve(S, b[:, None])[:, 0]
    import jax.scipy.linalg as jsl2
    x_ch = jsl2.cho_solve(jsl2.cho_factor(S), b)
    print("cho vs lu max diff:", float(jnp.max(jnp.abs(x_ch - x_lu))),
          flush=True)


if __name__ == "__main__":
    main()
