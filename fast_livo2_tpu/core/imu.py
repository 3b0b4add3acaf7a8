"""IMU forward propagation + covariance, and batched scan undistortion.

TPU-native re-design of ImuProcess (reference src/IMU_Processing.cpp):

- Forward propagation (reference :322-439) runs as a `lax.scan` over a
  fixed-size padded batch of IMU intervals. Each step does the midpoint
  integration of (R, p, v) and the 19x19 covariance update
  P <- F P F^T + Q, and emits the interval-start pose for undistortion.
- Backward per-point undistortion (reference :494-539, a sequential
  pointer walk) becomes one batched gather: every LiDAR point finds its
  IMU interval by searchsorted on the interval end-offsets, then applies
  the closed-form segment transform.

Deviation from the reference, by design: for a point inside interval i the
reference uses the angular/linear rates stored at the interval-start pose,
which are the rates of interval i-1 (IMU_Processing.cpp:499-508 reads
`head->gyr/acc` which were written at the *end* of the previous interval).
We use interval i's own midpoint rates — at least as accurate, and it
removes the special case at the packet boundary.

The per-packet ragged->fixed batching (reading a deque of IMU samples and
computing midpoint averages / dt / offsets with the prop_beg/prop_end cut
rules of :332-372) is inherently tiny host work and lives in
`prepare_imu_batch` (numpy).
"""

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Covariance-scan backend: the Pallas kernel (ops/cov_scan.py) on TPU,
# the associative-scan composition elsewhere (and under FLV_NO_PALLAS=1
# for A/B measurement).
_PALLAS_COV = os.environ.get("FLV_NO_PALLAS", "0") != "1"

from ..ops import so3
from ..ops.precision import hi_precision
from .state import DIM_STATE, GRAVITY, NavState


class ImuNoise(NamedTuple):
    """Continuous-time noise densities and feature toggles (as 0/1 floats
    so one jitted function serves every config)."""

    cov_gyr: jnp.ndarray  # (3,)
    cov_acc: jnp.ndarray  # (3,)
    cov_bias_gyr: jnp.ndarray  # (3,)
    cov_bias_acc: jnp.ndarray  # (3,)
    cov_inv_expo: jnp.ndarray  # ()
    mean_acc_norm: jnp.ndarray  # () |mean static acc|, scales raw acc to m/s^2
    est_bias: jnp.ndarray  # () 1.0 if ba/bg estimated (disable_bias_est)
    est_gravity: jnp.ndarray  # () 1.0 if gravity estimated
    est_exposure: jnp.ndarray  # () 1.0 if exposure estimated


def make_noise(acc_cov=0.5, gyr_cov=0.3, b_acc_cov=1e-4, b_gyr_cov=1e-4,
               inv_expo_cov=0.1, mean_acc_norm=GRAVITY,
               est_bias=True, est_gravity=True, est_exposure=True) -> ImuNoise:
    f = jnp.float32
    return ImuNoise(
        cov_gyr=jnp.full(3, gyr_cov, f),
        cov_acc=jnp.full(3, acc_cov, f),
        cov_bias_gyr=jnp.full(3, b_gyr_cov, f),
        cov_bias_acc=jnp.full(3, b_acc_cov, f),
        cov_inv_expo=jnp.asarray(inv_expo_cov, f),
        mean_acc_norm=jnp.asarray(mean_acc_norm, f),
        est_bias=jnp.asarray(1.0 if est_bias else 0.0, f),
        est_gravity=jnp.asarray(1.0 if est_gravity else 0.0, f),
        est_exposure=jnp.asarray(1.0 if est_exposure else 0.0, f),
    )


class ImuBatch(NamedTuple):
    """Fixed-size padded batch of IMU integration intervals for one
    propagation span [prop_beg, prop_end]."""

    gyr: jnp.ndarray  # (K, 3) midpoint angular velocity (raw, rad/s)
    acc: jnp.ndarray  # (K, 3) midpoint specific force (raw units)
    dt: jnp.ndarray  # (K,) integration step, 0 for padding
    offs_end: jnp.ndarray  # (K,) interval end time relative to prop_beg
    valid: jnp.ndarray  # (K,) 1.0 for real intervals


class ImuPoses(NamedTuple):
    """Per-interval start poses emitted by propagation, consumed by
    undistortion. Index i describes the state at the *start* of interval i
    plus that interval's world-frame rates."""

    offs_start: jnp.ndarray  # (K,)
    offs_end: jnp.ndarray  # (K,)
    rot: jnp.ndarray  # (K, 3, 3)
    pos: jnp.ndarray  # (K, 3)
    vel: jnp.ndarray  # (K, 3)
    acc_w: jnp.ndarray  # (K, 3) world-frame acceleration over interval i
    gyr_unbiased: jnp.ndarray  # (K, 3)
    valid: jnp.ndarray  # (K,)


def prepare_imu_batch(stamps: np.ndarray, gyr: np.ndarray, acc: np.ndarray,
                      prop_beg: float, prop_end: float, max_k: int):
    """Host-side ragged->fixed batching of one packet's IMU samples.

    `stamps/gyr/acc` must include the last sample of the previous packet at
    the front (reference pushes `last_imu`, IMU_Processing.cpp:245). The
    dt/offset cut rules mirror :355-372: the first interval is clipped to
    start at prop_beg and the last to end at prop_end.
    """
    stamps = np.asarray(stamps, np.float64)
    n = len(stamps) - 1
    g = np.zeros((max_k, 3), np.float32)
    a = np.zeros((max_k, 3), np.float32)
    dt = np.zeros(max_k, np.float32)
    offs = np.zeros(max_k, np.float32)
    valid = np.zeros(max_k, np.float32)
    k = 0
    for i in range(n):
        t_head, t_tail = stamps[i], stamps[i + 1]
        if t_tail < prop_beg:
            continue
        if k >= max_k:
            break
        g[k] = 0.5 * (gyr[i] + gyr[i + 1])
        a[k] = 0.5 * (acc[i] + acc[i + 1])
        if t_head < prop_beg:
            d = t_tail - prop_beg
            o = t_tail - prop_beg
        elif i != n - 1:
            d = t_tail - t_head
            o = t_tail - prop_beg
        else:
            d = prop_end - t_head
            o = prop_end - prop_beg
        dt[k] = max(d, 0.0)
        offs[k] = o
        valid[k] = 1.0
        k += 1
    # Pad offsets past the end so searchsorted sends no point out of range.
    if k > 0:
        offs[k:] = offs[k - 1] + 1e6
    else:
        offs[:] = 1e6
    # numpy fields (not device arrays): per-field jnp.asarray here cost 5
    # separate h2d dispatches per packet on the remote link; callers
    # assemble/upload in one shot (jit consumers take numpy seamlessly).
    return ImuBatch(gyr=g, acc=a, dt=dt, offs_end=offs, valid=valid)


@hi_precision
def propagate(state: NavState, cov: jnp.ndarray, batch: ImuBatch, noise: ImuNoise):
    """Forward-propagate state + covariance through one IMU batch.

    Returns (state_prop, cov_prop, ImuPoses). Matches the per-sample
    recursion of IMU_Processing.cpp:327-431 exactly, but evaluated as
    PARALLEL PREFIXES instead of a sequential lax.scan (K dependent
    19x19 matmul steps serialize on the device):

    - the rotation chain R_i = R_0 ∏ Exp(w_j dt_j) is an associative scan
      of 3x3 products (the increments depend only on the carried biases,
      which are constant over the batch);
    - with all R_i known, world accelerations are batch math and the v/p
      chains are cumulative sums;
    - the covariance recursion P <- F P F^T + Q is the composition of
      affine maps (A, B) ∘ (A', B') = (A A', A B' A^T + B), which is
      associative — one associative scan of (19,19) pairs yields the
      full-batch transition, applied to P once.

    Padding intervals have dt=0 and are exact no-ops (Exp=I, F=I, Q=0).
    """
    f32 = cov.dtype
    K = batch.dt.shape[0]
    dt = batch.dt
    dt2 = dt * dt
    w = batch.gyr - state.bias_g  # (K, 3)
    a = batch.acc * (GRAVITY / noise.mean_acc_norm) - state.bias_a

    mm = lambda x, y: jnp.matmul(x, y, precision=jax.lax.Precision.HIGHEST)

    # Rotation prefix: R_incl[i] = R_0 Exp_0 ... Exp_i (post-step i).
    dExp = so3.exp(w * dt[:, None])  # (K, 3, 3)
    prod = jax.lax.associative_scan(mm, dExp)
    R_incl = jnp.einsum("ij,kjl->kil", state.rot, prod)
    R_start = jnp.concatenate([state.rot[None], R_incl[:-1]], axis=0)

    # Velocity / position prefixes (reference uses post-step R for acc_w,
    # :412-415).
    acc_w = jnp.einsum("kij,kj->ki", R_incl, a) + state.grav
    dv = acc_w * dt[:, None]
    v_start = state.vel + jnp.cumsum(dv, axis=0) - dv
    dp = v_start * dt[:, None] + 0.5 * acc_w * dt2[:, None]
    p_start = state.pos + jnp.cumsum(dp, axis=0) - dp
    v_end = v_start[-1] + dv[-1]
    p_end = p_start[-1] + dp[-1]
    R_end = R_incl[-1]

    # Batched F_i / Q_i blocks (IMU_Processing.cpp:377-431), then ONE
    # associative scan composing the affine covariance maps.
    eyeK = jnp.broadcast_to(jnp.eye(DIM_STATE, dtype=f32), (K, DIM_STATE, DIM_STATE))
    I3dt = jnp.eye(3, dtype=f32)[None] * dt[:, None, None]
    F = eyeK
    F = F.at[:, 0:3, 0:3].set(jnp.swapaxes(dExp, -1, -2))  # Exp(w, -dt)
    F = F.at[:, 0:3, 10:13].set(-I3dt * noise.est_bias)
    F = F.at[:, 3:6, 7:10].set(I3dt)
    F = F.at[:, 7:10, 0:3].set(-mm(R_start, so3.skew(a)) * dt[:, None, None])
    F = F.at[:, 7:10, 13:16].set(-R_start * dt[:, None, None] * noise.est_bias)
    F = F.at[:, 7:10, 16:19].set(I3dt * noise.est_gravity)

    Q = jnp.zeros((K, DIM_STATE, DIM_STATE), f32)
    Q = Q.at[:, 6, 6].set(noise.cov_inv_expo * dt2 * noise.est_exposure)
    Q = Q.at[:, 0:3, 0:3].set(jnp.diag(noise.cov_gyr)[None] * dt2[:, None, None])
    Racc = mm(R_start * noise.cov_acc[None, None, :], jnp.swapaxes(R_start, -1, -2))
    Q = Q.at[:, 7:10, 7:10].set(Racc * dt2[:, None, None])
    Q = Q.at[:, 10:13, 10:13].set(
        jnp.diag(noise.cov_bias_gyr)[None] * dt2[:, None, None]
    )
    Q = Q.at[:, 13:16, 13:16].set(
        jnp.diag(noise.cov_bias_acc)[None] * dt2[:, None, None]
    )

    if _PALLAS_COV and jax.default_backend() == "tpu":
        # One Pallas launch instead of the associative-scan micro-kernel
        # swarm (log K levels of slice/concat/batched-matmul): the
        # recursion only needs the FINAL covariance. Measured device-
        # time NEUTRAL on v5e-via-relay (see ops/cov_scan.py) — kept as
        # the TPU default for launch-count robustness, FLV_NO_PALLAS=1
        # selects the scan path.
        from ..ops import cov_scan

        P_e = cov_scan.propagate_cov(F, Q, cov)
    else:
        def compose(e1, e2):
            A1, B1 = e1
            A2, B2 = e2
            return mm(A2, A1), mm(mm(A2, B1), jnp.swapaxes(A2, -1, -2)) + B2

        A_all, B_all = jax.lax.associative_scan(compose, (F, Q))
        A_T, B_T = A_all[-1], B_all[-1]
        P_e = mm(mm(A_T, cov), A_T.T) + B_T

    state_out = state._replace(rot=so3.normalize_rotation(R_end), pos=p_end,
                               vel=v_end)
    imu_poses = ImuPoses(offs_start=batch.offs_end - dt,
                         offs_end=batch.offs_end, rot=R_start, pos=p_start,
                         vel=v_start, acc_w=acc_w, gyr_unbiased=w,
                         valid=batch.valid)
    return state_out, P_e, imu_poses


@hi_precision
def undistort(points: jnp.ndarray, t_offs: jnp.ndarray, poses: ImuPoses,
              state_end: NavState, ext_R: jnp.ndarray, ext_T: jnp.ndarray):
    """Motion-compensate LiDAR points to the scan-end IMU frame.

    points: (N, 3) in the LiDAR body frame; t_offs: (N,) seconds relative
    to the propagation start. Replaces the backward walk of
    IMU_Processing.cpp:494-539 with a batched searchsorted + gather:

        P_comp = extR^T ( R_end^T ( R_i (extR P + extT) + T_ei ) - extT )
        R_i  = R_head Exp(w_i dt),  dt = t - offs_start_i
        T_ei = p_head + v_head dt + 0.5 a_i dt^2 - p_end
    """
    # Interval index + pose fields via a one-hot matmul instead of
    # searchsorted + 6 gathers: the pose table is tiny (K<=64 rows), so
    # (N, K) comparisons and one (N, K) @ (K, 22) MXU matmul replace all
    # random access (gathers are latency-bound on this link regardless of
    # table size).
    K = poses.offs_end.shape[0]
    idx = jnp.sum(poses.offs_end[None, :] < t_offs[:, None], axis=1)
    idx = jnp.clip(idx, 0, K - 1)
    onehot = (idx[:, None] == jnp.arange(K)[None, :]).astype(points.dtype)
    table = jnp.concatenate(
        [poses.offs_start[:, None], poses.rot.reshape(K, 9), poses.pos,
         poses.vel, poses.acc_w, poses.gyr_unbiased], axis=-1,
    )  # (K, 22)
    g = onehot @ table  # (N, 22)
    R_h = g[:, 1:10].reshape(-1, 3, 3)
    p_h = g[:, 10:13]
    v_h = g[:, 13:16]
    a_h = g[:, 16:19]
    w_h = g[:, 19:22]
    dt = jnp.clip(t_offs - g[:, 0], 0.0, None)

    R_i = R_h @ so3.exp(w_h * dt[:, None])
    T_ei = p_h + v_h * dt[:, None] + 0.5 * a_h * dt[:, None] ** 2 - state_end.pos

    p_imu = points @ ext_R.T + ext_T  # body -> IMU frame at sample time
    p_world_rel = jnp.einsum("nij,nj->ni", R_i, p_imu) + T_ei
    p_end_imu = p_world_rel @ state_end.rot  # R_end^T applied from the right
    return (p_end_imu - ext_T) @ ext_R


def static_init(acc_samples: np.ndarray, gyr_samples: np.ndarray):
    """IMU static initialization (reference IMU_init, :104-149): gravity
    direction from the mean specific force; returns (gravity_vec(3),
    mean_acc_norm). Host-side numpy."""
    mean_acc = np.mean(np.asarray(acc_samples, np.float64), axis=0)
    norm = float(np.linalg.norm(mean_acc))
    gravity = -mean_acc / norm * GRAVITY
    return gravity.astype(np.float32), np.float32(norm)


@hi_precision
def propagate_without_imu(state: NavState, cov: jnp.ndarray, dt,
                          noise: ImuNoise):
    """Constant-velocity propagation for IMU-less (LO) operation
    (Forward_without_imu, IMU_Processing.cpp:151-234). In this mode the
    gyro-bias block of the state doubles as a constant angular-velocity
    estimate (the reference reuses bias_g the same way, :183-188)."""
    f32 = cov.dtype
    eye19 = jnp.eye(DIM_STATE, dtype=f32)
    F = eye19
    F = F.at[0:3, 0:3].set(so3.exp(state.bias_g, -dt))
    F = F.at[0:3, 10:13].set(jnp.eye(3, dtype=f32) * dt)
    F = F.at[3:6, 7:10].set(jnp.eye(3, dtype=f32) * dt)
    Q = jnp.zeros((DIM_STATE, DIM_STATE), f32)
    Q = Q.at[10:13, 10:13].set(jnp.diag(noise.cov_gyr) * dt * dt)
    Q = Q.at[7:10, 7:10].set(jnp.diag(noise.cov_acc) * dt * dt)
    cov_new = F @ cov @ F.T + Q
    state_new = state._replace(
        rot=state.rot @ so3.exp(state.bias_g, dt),
        pos=state.pos + state.vel * dt,
    )
    return state_new, cov_new


@hi_precision
def undistort_without_imu(points: jnp.ndarray, t_offs: jnp.ndarray,
                          t_end_offset, state: NavState):
    """Constant-velocity backward undistortion (Forward_without_imu,
    IMU_Processing.cpp:215-233): rotate by Exp(w, -dt_j) and shift by
    -R^T v dt_j, dt_j = time from the point to scan end."""
    dt_j = jnp.clip(t_end_offset - t_offs, 0.0, None)
    R_jk = so3.exp(-state.bias_g[None, :] * dt_j[:, None])
    p_jk = -(state.rot.T @ state.vel)[None, :] * dt_j[:, None]
    return jnp.einsum("nij,nj->ni", R_jk, points) + p_jk


@hi_precision
def imu_rate_odometry(state: NavState, batch: ImuBatch, noise: ImuNoise):
    """IMU-rate pose output between filter updates: forward-only
    propagation of (R, p, v) through a padded IMU batch, no covariance
    (the 250 Hz imu_prop_callback, LIVMapper.cpp:576-635). Returns
    (offs_end (K,), R (K,3,3), p (K,3), v (K,3), valid (K,))."""

    def step(carry, inp):
        R, p, v = carry
        w_raw, a_raw, dt, offs_end, valid = inp
        w = w_raw - state.bias_g
        a = a_raw * (GRAVITY / noise.mean_acc_norm) - state.bias_a
        R_new = R @ so3.exp(w, dt)
        acc_w = R_new @ a + state.grav
        p_new = p + v * dt + 0.5 * acc_w * dt * dt
        v_new = v + acc_w * dt
        return (R_new, p_new, v_new), (offs_end, R_new, p_new, v_new, valid)

    init = (state.rot, state.pos, state.vel)
    _, out = jax.lax.scan(
        step, init, (batch.gyr, batch.acc, batch.dt, batch.offs_end, batch.valid)
    )
    return out
