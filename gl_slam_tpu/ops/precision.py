"""f32 matmul precision for the geometry/optimization path.

On TPU, JAX's DEFAULT matmul precision for float32 operands runs the MXU in
bfloat16 (8 mantissa bits, ~4e-3 relative). That is the right trade for the
MODEL path (conv/attention/descriptor matmuls — unit-scale data, designed
for bf16), and exactly wrong for the GEOMETRY path: pixel coordinates are
O(1000) and camera centers O(10-100) a few dozen frames into a sequence, so
a single bf16 3x3 matvec injects ~0.1-4 px of noise. Measured effect before
this fix (round 3): triangulating EXACT correspondences at KITTI shapes
returned 0.7 px median view-1 residual and metre-level depths — a silent
noise floor under every gate, the pose solve and the BA, and the root cause
of the flagship map starvation (VERDICT r2 items 1-2). The CPU test suite
could not see it: conftest pins matmul precision to 'highest', which is a
no-op on CPU but masked the TPU behavior.

`@f32` wraps a function so that everything traced inside it uses full-f32
matmuls (jax.default_matmul_precision('float32') — trace-time, composes
with jit/vmap/scan). Apply it to geometry/solver entry points ONLY; model
code stays bf16 by design. The affected matmuls are tiny (3x3 transforms,
<=72x72 solver blocks), so the cost is unmeasurable next to the model path.
"""

from __future__ import annotations

import functools

import jax


def f32(fn):
    """Decorator: trace `fn` under full-float32 matmul precision.

    Sets `__f32_precision__` on the wrapper so tests/test_precision.py can
    ENUMERATE the geometry/solver export surface and assert every entry
    point is wrapped — a new unwrapped export would otherwise regress
    silently on TPU (the CPU suite pins precision and cannot see it)."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)
    wrapped.__f32_precision__ = True
    return wrapped
