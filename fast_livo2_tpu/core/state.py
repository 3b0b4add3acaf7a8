"""The 19-dim filter state as a JAX pytree.

Mirrors the reference StatesGroup (include/common_lib.h:126-223): the error
state is ordered

    [ rot(0:3)  pos(3:6)  inv_expo(6)  vel(7:10)  bias_g(10:13)
      bias_a(13:16)  gravity(16:19) ]

with the rotation living on SO(3) (stored as a 3x3 matrix) and everything
else in R^n. `boxplus` / `boxminus` are the manifold retraction pair
(common_lib.h:167-206). The 19x19 covariance rides alongside as a plain
array — it is not part of NavState so that step functions can donate and
thread the two independently.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import so3

DIM_STATE = 19
GRAVITY = 9.81  # common_lib.h:29
INIT_COV = 0.01  # common_lib.h:31


class NavState(NamedTuple):
    """Nominal state. All float32; rot is a 3x3 rotation matrix."""

    rot: jnp.ndarray  # (3, 3) R_world_from_imu at scan/frame end
    pos: jnp.ndarray  # (3,)
    vel: jnp.ndarray  # (3,)
    bias_g: jnp.ndarray  # (3,)
    bias_a: jnp.ndarray  # (3,)
    grav: jnp.ndarray  # (3,)
    inv_expo: jnp.ndarray  # () inverse exposure time


def init_state(dtype=jnp.float32) -> NavState:
    return NavState(
        rot=jnp.eye(3, dtype=dtype),
        pos=jnp.zeros(3, dtype=dtype),
        vel=jnp.zeros(3, dtype=dtype),
        bias_g=jnp.zeros(3, dtype=dtype),
        bias_a=jnp.zeros(3, dtype=dtype),
        grav=jnp.zeros(3, dtype=dtype),
        inv_expo=jnp.asarray(1.0, dtype=dtype),
    )


def init_cov(dtype=jnp.float32) -> jnp.ndarray:
    """Initial covariance (common_lib.h:137-139): 0.01 I, except
    var(inv_expo)=1e-5 and var(biases+gravity)=1e-5."""
    cov = jnp.eye(DIM_STATE, dtype=dtype) * INIT_COV
    cov = cov.at[6, 6].set(1e-5)
    cov = cov.at[10:19, 10:19].set(jnp.eye(9, dtype=dtype) * 1e-5)
    return cov


def boxplus(s: NavState, delta: jnp.ndarray) -> NavState:
    """State ⊞ 19-vector (common_lib.h:167-180). Rotation is retracted on
    the right: R <- R Exp(delta[0:3])."""
    return NavState(
        rot=jnp.matmul(s.rot, so3.exp(delta[0:3]),
                       precision=jax.lax.Precision.HIGHEST),
        pos=s.pos + delta[3:6],
        inv_expo=s.inv_expo + delta[6],
        vel=s.vel + delta[7:10],
        bias_g=s.bias_g + delta[10:13],
        bias_a=s.bias_a + delta[13:16],
        grav=s.grav + delta[16:19],
    )


def boxminus(a: NavState, b: NavState) -> jnp.ndarray:
    """a ⊟ b -> 19-vector (common_lib.h:194-206): Log(b.R^T a.R) for the
    rotation block, plain differences elsewhere."""
    return jnp.concatenate(
        [
            so3.log(jnp.matmul(b.rot.T, a.rot,
                               precision=jax.lax.Precision.HIGHEST)),
            a.pos - b.pos,
            (a.inv_expo - b.inv_expo)[None],
            a.vel - b.vel,
            a.bias_g - b.bias_g,
            a.bias_a - b.bias_a,
            a.grav - b.grav,
        ]
    )


def pack_state(s: NavState, cov: jnp.ndarray) -> jnp.ndarray:
    """Flatten state+covariance into ONE vector for jit boundaries.

    On remote-TPU links, dispatch cost of a chained jit call scales with
    the number of pytree leaves (~1 ms each), so per-frame step functions
    take/return this packed form and unpack inside."""
    return jnp.concatenate([
        s.rot.reshape(9), s.pos, s.vel, s.bias_g, s.bias_a, s.grav,
        s.inv_expo[None] if s.inv_expo.ndim == 0 else s.inv_expo,
        cov.reshape(DIM_STATE * DIM_STATE),
    ])


def unpack_state(v: jnp.ndarray):
    s = NavState(
        rot=v[0:9].reshape(3, 3), pos=v[9:12], vel=v[12:15],
        bias_g=v[15:18], bias_a=v[18:21], grav=v[21:24], inv_expo=v[24],
    )
    cov = v[25:25 + DIM_STATE * DIM_STATE].reshape(DIM_STATE, DIM_STATE)
    return s, cov
