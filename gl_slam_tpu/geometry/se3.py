"""SO(3)/SE(3) utilities — batched, jit-friendly, float32.

Covers the reference's Rodrigues conversions (Ceres AngleAxisToRotationMatrix
used in `src/core/slam_core.cpp:764-777,859-871`), the SO(3) projection +
rigid-delta logic (`ProjectToSO3` `src/core/slam_core.cpp:885-897`,
`ComputeDeltaPose_SO3` `:899-912`) and world<->camera pose chaining
(`src/threading/thread_pool.cpp:131-132`). All functions work on unbatched
inputs and compose with `jax.vmap`.

Convention: a camera pose is (R, t) mapping world points to camera frame,
x_cam = R @ x_world + t  — the same convention as the reference's projection
matrices K[R|t] (`src/core/slam_core.cpp:181-188`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a 3-vector."""
    wx, wy, wz = w[0], w[1], w[2]
    z = jnp.zeros((), w.dtype)
    return jnp.array([[z, -wz, wy], [wz, z, -wx], [-wy, wx, z]])


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: axis-angle 3-vector -> rotation matrix (3,3)."""
    theta2 = jnp.dot(w, w)
    theta = jnp.sqrt(theta2 + _EPS)
    # Stable small-angle coefficients: sin(t)/t, (1-cos t)/t^2
    use_taylor = theta2 < 1e-8
    a = jnp.where(use_taylor, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(use_taylor, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    W = hat(w)
    return jnp.eye(3, dtype=w.dtype) + a * W + b * (W @ W)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle 3-vector (inverse Rodrigues).

    Three regimes, selected branchlessly: Taylor near theta=0, the standard
    antisymmetric-part formula in the middle, and the theta~pi branch (the
    antisymmetric part v -> 0 there, so the axis is recovered from the
    dominant diagonal of (R+I)/2 with sign fixed by v) — pose-graph edges
    through near-180-degree loop closures stay well-conditioned."""
    trace = jnp.clip(jnp.trace(R), -1.0, 3.0)
    # Keep arccos' input strictly inside (-1, 1): d/dx arccos = -1/sqrt(1-x^2)
    # is infinite at the endpoints, which poisons JVPs through pose-graph
    # residuals at zero rotation with NaNs.
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    # Off-diagonal antisymmetric part: v = 2 sin(theta) * axis
    v = jnp.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    sin_theta = jnp.sin(theta)
    scale = jnp.where(theta < 1e-5, 0.5 + theta * theta / 12.0,
                      theta / (2.0 * sin_theta + _EPS))
    w_mid = scale * v

    # theta ~ pi: R ~ 2*n*n^T - I, so n_i^2 = (R_ii + 1)/2. Take the axis
    # candidate anchored at each diagonal and select the dominant one.
    nsq = jnp.clip((jnp.diagonal(R) + 1.0) * 0.5, 0.0, 1.0)       # (3,)
    anchor = jnp.sqrt(jnp.maximum(nsq, 1e-12))                     # (3,)
    sym = 0.5 * (R + R.T)
    # cand[k, j] = n_j assuming anchor k: off-diagonals give n_k*n_j = sym_kj
    cand = sym / (2.0 * anchor[:, None])                           # (3,3)
    cand = cand.at[jnp.arange(3), jnp.arange(3)].set(anchor)
    pick = jnp.argmax(nsq)
    n = cand[pick]
    n = n / jnp.maximum(jnp.linalg.norm(n), _EPS)
    # Sign from the antisymmetric part where it is still nonzero; at exactly
    # pi the sign is genuinely ambiguous (w and -w are the same rotation).
    sign = jnp.where(jnp.dot(n, v) >= 0.0, 1.0, -1.0)
    w_pi = theta * sign * n

    near_pi = theta > jnp.pi - 1e-2
    return jnp.where(near_pi, w_pi, w_mid)


def project_to_so3(M: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation matrix via SVD with det correction.

    Reference `ProjectToSO3` `src/core/slam_core.cpp:885-897`. Uses the
    closed-form 3x3 SVD (ops/smallmat.py) — no LAPACK custom call, so it
    fuses inside jitted loops on TPU.
    """
    from ..ops import smallmat
    U, _, Vt = smallmat.svd3(M)
    d = jnp.sign(smallmat.det3x3(U @ Vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], M.dtype).at[2].set(d))
    return U @ D @ Vt


def compose(R1, t1, R2, t2):
    """(R1,t1) ∘ (R2,t2): apply (R2,t2) first, then (R1,t1)."""
    return R1 @ R2, R1 @ t2 + t1


def inverse(R, t):
    Rt = R.T
    return Rt, -(Rt @ t)


def delta_pose(R_pre, t_pre, R_post, t_post):
    """Rigid delta T_post ∘ T_pre^{-1} with SO(3)-projected rotation.

    Reference `ComputeDeltaPose_SO3` `src/core/slam_core.cpp:899-912`: the
    delta applied to frames/points created during an in-flight BA.
    """
    Ri, ti = inverse(R_pre, t_pre)
    dR = project_to_so3(R_post @ Ri)
    dt = t_post - dR @ t_pre
    return dR, dt


def apply_to_points(R, t, pts):
    """Transform (N,3) points: R @ p + t."""
    return pts @ R.T + t


def chain_relative(R_prev, t_prev, R_rel, t_rel):
    """Accumulate a relative camera motion into a world pose.

    Reference chaining `src/threading/thread_pool.cpp:131-132`:
    R_cur = R_prev @ R_rel ; t_cur = t_prev + R_prev @ t_rel — note the
    reference stores camera-to-world there; we keep world-to-camera and chain
    as T_cur = T_rel ∘ T_prev.
    """
    return R_rel @ R_prev, R_rel @ t_prev + t_rel


def pose_matrix(R, t):
    """(R,t) -> 4x4 homogeneous matrix."""
    T = jnp.eye(4, dtype=R.dtype)
    return T.at[:3, :3].set(R).at[:3, 3].set(t)


def from_pose_matrix(T):
    return T[:3, :3], T[:3, 3]


def rotation_angle_deg(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation magnitude in degrees (GT error metric, thread_pool.cpp:287)."""
    cos_theta = jnp.clip((jnp.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos_theta))


def translation_direction_angle_deg(t1: jnp.ndarray, t2: jnp.ndarray) -> jnp.ndarray:
    """Angle between two translation directions, degrees."""
    n1 = t1 / (jnp.linalg.norm(t1) + _EPS)
    n2 = t2 / (jnp.linalg.norm(t2) + _EPS)
    return jnp.degrees(jnp.arccos(jnp.clip(jnp.dot(n1, n2), -1.0, 1.0)))


# Batched variants
exp_so3_batched = jax.vmap(exp_so3)
log_so3_batched = jax.vmap(log_so3)

# Full-f32 matmul precision on every pose-algebra entry point: the bf16 TPU
# matmul default injects ~4e-3 relative error, which on O(10-100) camera
# translations is decimetre-level noise per 3x3 matvec (ops/precision.py).
from ..ops.precision import f32 as _f32  # noqa: E402

for _name in ("hat", "exp_so3", "log_so3", "project_to_so3", "compose",
              "inverse", "delta_pose", "apply_to_points", "chain_relative",
              "pose_matrix", "from_pose_matrix", "rotation_angle_deg",
              "translation_direction_angle_deg", "exp_so3_batched",
              "log_so3_batched"):
    globals()[_name] = _f32(globals()[_name])
del _name
