"""f32-precision coverage of the geometry/solver export surface.

VERDICT r3 weak #8: the CPU suite pins matmul precision (conftest), so a
geometry function that is NOT wrapped by ops/precision.f32 regresses
silently on TPU, where the default matmul precision is bfloat16 — measured
at MEDIAN 6 px / p95 240 px of projection error 40 m from the world origin
(the round-4 probe that exposed the unwrapped association gate). This test
ENUMERATES every public function of the geometry/solver modules and asserts
each one carries the `__f32_precision__` marker the wrapper sets, so a new
unwrapped export fails here instead of on TPU hardware.
"""

import inspect

# module path -> names intentionally NOT wrapped (each with a reason)
SURFACES = {
    "gl_slam_tpu.geometry.projection": set(),
    "gl_slam_tpu.geometry.se3": set(),
    "gl_slam_tpu.geometry.essential": set(),
    "gl_slam_tpu.geometry.triangulation": set(),
    "gl_slam_tpu.geometry.pnp": set(),
    "gl_slam_tpu.slam.pose_ba": set(),
    "gl_slam_tpu.slam.ba": set(),
    "gl_slam_tpu.slam.loopclose": set(),
    "gl_slam_tpu.ops.smallmat": set(),
    "gl_slam_tpu.ops.optim": set(),
    "gl_slam_tpu.ops.select": {
        # integer index-priority top_k — no float matmuls by construction
        "select_lowest_ids", "select_newest_ids",
        "select_lowest_ids_cumsum", "select_newest_ids_cumsum",
        "select_lowest_ids_ss", "select_newest_ids_ss",
    },
}


def _public_functions(mod):
    for name, obj in vars(mod).items():
        if name.startswith("_"):
            continue
        if not callable(obj) or inspect.isclass(obj):
            continue
        mod_of = getattr(obj, "__module__", None)
        # functools.wraps preserves __module__; jit/partial wrappers keep
        # the underlying function reachable via __wrapped__/func
        if mod_of != mod.__name__:
            inner = getattr(obj, "__wrapped__", None) or getattr(
                obj, "func", None)
            if getattr(inner, "__module__", None) != mod.__name__:
                continue
        yield name, obj


def test_geometry_surface_is_f32_wrapped():
    import importlib
    missing = []
    checked = 0
    for mod_path, allow in SURFACES.items():
        mod = importlib.import_module(mod_path)
        for name, fn in _public_functions(mod):
            if name in allow:
                continue
            checked += 1
            if not getattr(fn, "__f32_precision__", False):
                missing.append(f"{mod_path}.{name}")
    assert checked > 30, f"surface enumeration broke (only {checked} fns)"
    assert not missing, (
        "geometry/solver exports missing the ops/precision.f32 wrapper "
        f"(bf16 TPU matmul default would poison them): {missing}")


def test_f32_wrapper_changes_precision_semantics():
    """The marker must correspond to real behavior: inside a wrapped
    function the traced matmul precision is float32."""
    import jax
    import jax.numpy as jnp

    from gl_slam_tpu.ops.precision import f32

    seen = {}

    @f32
    def probe(a, b):
        seen["prec"] = jax.config.jax_default_matmul_precision
        return a @ b

    assert probe.__f32_precision__ is True
    a = jnp.ones((4, 4))
    probe(a, a)
    assert seen["prec"] == "float32"
