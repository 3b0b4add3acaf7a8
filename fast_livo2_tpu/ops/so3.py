"""SO(3) numerics, batched and jit-friendly.

Provides the Exp/Log/skew maps the whole filter is built on (reference:
include/utils/so3_math.h:9-87). Everything here is shape-polymorphic over
leading batch dimensions: inputs of shape (..., 3) / (..., 3, 3).

Numerical policy: float32 throughout, with series expansions below a
threshold so Exp/Log are smooth through the origin (required both for the
filter near convergence and for finite-difference unit tests).
"""

import jax
import jax.numpy as jnp

# Rotation algebra must accumulate in true float32 on TPU: the MXU's
# default bf16 matmul precision injects ~4e-3 relative error per
# composition, which integrates into unbounded attitude drift.
_HI = jax.lax.Precision.HIGHEST

_EPS = 1e-8
_SMALL = 1e-4  # below this angle (rad), use Taylor series


def skew(v):
    """Skew-symmetric matrix [v]_x of shape (..., 3, 3) from (..., 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def exp(w, dt=None):
    """Exponential map so(3) -> SO(3), Rodrigues with Taylor fallback.

    `exp(w)` maps an axis-angle vector (..., 3) to rotation matrices
    (..., 3, 3). `exp(w, dt)` matches the reference's `Exp(ang_vel, dt)`
    overload (so3_math.h:29-49).
    """
    if dt is not None:
        w = w * dt
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # sin(t)/t and (1-cos(t))/t^2 with series fallback near zero.
    small = theta < _SMALL
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS * _EPS))
    K = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    KK = jnp.matmul(K, K, precision=_HI)
    return eye + a[..., None, None] * K + b[..., None, None] * KK


def log(R):
    """Logarithm map SO(3) -> so(3), (..., 3, 3) -> (..., 3).

    Mirrors so3_math.h:61-66 (acos of (tr-1)/2, axis from the
    antisymmetric part) but is batched and guarded at 0 and near pi.
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # Antisymmetric part -> axis * 2 sin(theta)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    small = theta < _SMALL
    # theta / (2 sin(theta)), -> 1/2 as theta -> 0
    scale = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / (2.0 * jnp.where(jnp.abs(sin_theta) < _EPS, _EPS, sin_theta)),
    )
    w_generic = w * scale[..., None]
    # Near pi the antisymmetric part vanishes; recover axis from the
    # symmetric part: R ~ 2 a a^T - I.
    near_pi = theta > (jnp.pi - 1e-3)
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_abs = jnp.sqrt(jnp.clip((diag + 1.0) * 0.5, 0.0, None))
    # Fix signs from off-diagonals relative to the largest component.
    k = jnp.argmax(axis_abs, axis=-1)
    off = jnp.stack(
        [
            jnp.stack([diag[..., 0], R[..., 0, 1], R[..., 0, 2]], axis=-1),
            jnp.stack([R[..., 0, 1], diag[..., 1], R[..., 1, 2]], axis=-1),
            jnp.stack([R[..., 0, 2], R[..., 1, 2], diag[..., 2]], axis=-1),
        ],
        axis=-2,
    )
    row = jnp.take_along_axis(off, k[..., None, None].repeat(3, axis=-1), axis=-2)[..., 0, :]
    sign = jnp.sign(jnp.where(jnp.abs(row) < _EPS, 1.0, row))
    axis = axis_abs * sign
    norm = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    axis = axis / jnp.where(norm < _EPS, 1.0, norm)
    w_pi = axis * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def normalize_rotation(R):
    """Project (..., 3, 3) back onto SO(3) via one Newton-like step.

    Cheap re-orthonormalization to stop float32 drift over thousands of
    composed increments (the f64 reference never needs this; we do).
    """
    # R (3 I - R^T R) / 2 is a second-order orthogonalization step.
    RtR = jnp.matmul(jnp.swapaxes(R, -1, -2), R, precision=_HI)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    return jnp.matmul(R, 1.5 * eye - 0.5 * RtR, precision=_HI)


def euler_zyx(R):
    """Rotation matrix -> (roll, pitch, yaw), reference RotMtoEuler (so3_math.h:69-87)."""
    sy = jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2)
    singular = sy < 1e-6
    roll = jnp.where(
        singular,
        jnp.arctan2(-R[..., 1, 2], R[..., 1, 1]),
        jnp.arctan2(R[..., 2, 1], R[..., 2, 2]),
    )
    pitch = jnp.arctan2(-R[..., 2, 0], sy)
    yaw = jnp.where(singular, 0.0, jnp.arctan2(R[..., 1, 0], R[..., 0, 0]))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_wxyz(R):
    """Rotation matrix -> unit quaternion (w, x, y, z), batched, branch-free.

    Uses the standard four-way trace construction and picks the numerically
    best case per element (needed for TUM pose export, LIVMapper.cpp:400-404).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; each valid when its pivot is largest.
    qw = jnp.sqrt(jnp.clip(1.0 + tr, 1e-12, None)) * 0.5
    c0 = jnp.stack([qw, (m21 - m12) / (4 * qw), (m02 - m20) / (4 * qw), (m10 - m01) / (4 * qw)], axis=-1)
    qx = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 1e-12, None)) * 0.5
    c1 = jnp.stack([(m21 - m12) / (4 * qx), qx, (m01 + m10) / (4 * qx), (m02 + m20) / (4 * qx)], axis=-1)
    qy = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, 1e-12, None)) * 0.5
    c2 = jnp.stack([(m02 - m20) / (4 * qy), (m01 + m10) / (4 * qy), qy, (m12 + m21) / (4 * qy)], axis=-1)
    qz = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, 1e-12, None)) * 0.5
    c3 = jnp.stack([(m10 - m01) / (4 * qz), (m02 + m20) / (4 * qz), (m12 + m21) / (4 * qz), qz], axis=-1)
    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)
