"""IMU propagation + undistortion tests against a float64 numpy oracle
that re-implements the reference recursion (IMU_Processing.cpp:322-439)."""

import numpy as np
import jax.numpy as jnp

from fast_livo2_tpu.core import imu as imu_mod
from fast_livo2_tpu.core.state import GRAVITY, init_cov, init_state


def _oracle_propagate(R, p, v, P, bias_g, bias_a, grav, gyr, acc, dt, noise):
    """float64 reference recursion for one interval."""

    def exp(w):
        th = np.linalg.norm(w)
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        if th < 1e-12:
            return np.eye(3)
        return np.eye(3) + np.sin(th) / th * K + (1 - np.cos(th)) / th**2 * (K @ K)

    w = gyr - bias_g
    a = acc * (GRAVITY / noise["mean_acc_norm"]) - bias_a
    F = np.eye(19)
    F[0:3, 0:3] = exp(-w * dt)
    F[0:3, 10:13] = -np.eye(3) * dt
    F[3:6, 7:10] = np.eye(3) * dt
    a_skew = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    F[7:10, 0:3] = -R @ a_skew * dt
    F[7:10, 13:16] = -R * dt
    F[7:10, 16:19] = np.eye(3) * dt
    Q = np.zeros((19, 19))
    Q[6, 6] = noise["cov_inv_expo"] * dt * dt
    Q[0:3, 0:3] = np.diag(noise["cov_gyr"]) * dt * dt
    Q[7:10, 7:10] = R @ np.diag(noise["cov_acc"]) @ R.T * dt * dt
    Q[10:13, 10:13] = np.diag(noise["cov_bias_gyr"]) * dt * dt
    Q[13:16, 13:16] = np.diag(noise["cov_bias_acc"]) * dt * dt
    P = F @ P @ F.T + Q
    R = R @ exp(w * dt)
    acc_w = R @ a + grav
    p = p + v * dt + 0.5 * acc_w * dt * dt
    v = v + acc_w * dt
    return R, p, v, P


def _make_inputs(n_imu=20, hz=200.0, seed=0):
    rng = np.random.default_rng(seed)
    stamps = np.arange(n_imu) / hz
    gyr = rng.normal(size=(n_imu, 3)) * 0.3
    acc = np.tile(np.array([0.05, -0.02, 1.0]), (n_imu, 1)) + rng.normal(size=(n_imu, 3)) * 0.05
    return stamps, gyr, acc


def test_propagate_matches_oracle():
    stamps, gyr, acc = _make_inputs()
    prop_beg, prop_end = float(stamps[0]), float(stamps[-1])
    batch = imu_mod.prepare_imu_batch(stamps, gyr, acc, prop_beg, prop_end, max_k=32)
    noise = imu_mod.make_noise(mean_acc_norm=1.0)

    state = init_state()._replace(grav=jnp.asarray([0.0, 0.0, -GRAVITY], jnp.float32))
    cov = init_cov()
    s_out, P_out, poses = imu_mod.propagate(state, cov, batch, noise)

    # float64 oracle over the same midpoint-averaged intervals
    nd = {"cov_gyr": [0.3] * 3, "cov_acc": [0.5] * 3, "cov_bias_gyr": [1e-4] * 3,
          "cov_bias_acc": [1e-4] * 3, "cov_inv_expo": 0.1, "mean_acc_norm": 1.0}
    R, p, v = np.eye(3), np.zeros(3), np.zeros(3)
    P = np.asarray(init_cov(), np.float64)
    g = np.array([0.0, 0.0, -GRAVITY])
    bd = np.asarray(batch.dt)
    bg = np.asarray(batch.gyr)
    ba = np.asarray(batch.acc)
    for k in range(len(bd)):
        if bd[k] == 0:
            continue
        R, p, v, P = _oracle_propagate(R, p, v, P, np.zeros(3), np.zeros(3), g,
                                       bg[k], ba[k], bd[k], nd)
    np.testing.assert_allclose(np.asarray(s_out.rot), R, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_out.pos), p, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_out.vel), v, atol=1e-4)
    np.testing.assert_allclose(np.asarray(P_out), P, atol=1e-4, rtol=1e-3)


def test_propagate_padding_is_noop():
    stamps, gyr, acc = _make_inputs(n_imu=8)
    prop_beg, prop_end = float(stamps[0]), float(stamps[-1])
    noise = imu_mod.make_noise(mean_acc_norm=1.0)
    state = init_state()
    cov = init_cov()
    b16 = imu_mod.prepare_imu_batch(stamps, gyr, acc, prop_beg, prop_end, max_k=16)
    b64 = imu_mod.prepare_imu_batch(stamps, gyr, acc, prop_beg, prop_end, max_k=64)
    s16, P16, _ = imu_mod.propagate(state, cov, b16, noise)
    s64, P64, _ = imu_mod.propagate(state, cov, b64, noise)
    np.testing.assert_allclose(np.asarray(s16.pos), np.asarray(s64.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(P16), np.asarray(P64), atol=1e-6)


def test_undistort_stationary_identity():
    """Zero motion => undistortion must return the input points."""
    n_imu = 10
    stamps = np.arange(n_imu) / 100.0
    gyr = np.zeros((n_imu, 3))
    acc = np.tile(np.array([0.0, 0.0, 1.0]), (n_imu, 1))  # static, unit acc norm
    batch = imu_mod.prepare_imu_batch(stamps, gyr, acc, stamps[0], stamps[-1], 16)
    noise = imu_mod.make_noise(mean_acc_norm=1.0)
    state = init_state()._replace(grav=jnp.asarray([0.0, 0.0, -GRAVITY], jnp.float32))
    s_out, _, poses = imu_mod.propagate(state, init_cov(), batch, noise)

    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.normal(size=(100, 3)) * 10, jnp.float32)
    t_offs = jnp.asarray(rng.uniform(0, stamps[-1], size=100), jnp.float32)
    ext_R = jnp.eye(3)
    ext_T = jnp.asarray([0.1, -0.05, 0.02], jnp.float32)
    out = imu_mod.undistort(pts, t_offs, poses, s_out, ext_R, ext_T)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-4)


def test_undistort_pure_rotation():
    """Constant yaw rate: a point captured at time t must map to the
    scan-end frame by the residual rotation Exp(w (t_end - t))^{-1}... i.e.
    R_end^T R(t) p."""
    n_imu = 21
    hz = 100.0
    w_z = 1.0  # rad/s about z
    stamps = np.arange(n_imu) / hz
    gyr = np.tile(np.array([0.0, 0.0, w_z]), (n_imu, 1))
    acc = np.tile(np.array([0.0, 0.0, 1.0]), (n_imu, 1))
    batch = imu_mod.prepare_imu_batch(stamps, gyr, acc, stamps[0], stamps[-1], 32)
    noise = imu_mod.make_noise(mean_acc_norm=1.0)
    state = init_state()._replace(grav=jnp.asarray([0.0, 0.0, -GRAVITY], jnp.float32))
    s_out, _, poses = imu_mod.propagate(state, init_cov(), batch, noise)

    p_body = np.array([2.0, 0.0, 0.0])
    t = 0.12345
    out = imu_mod.undistort(jnp.asarray(p_body[None], jnp.float32),
                            jnp.asarray([t], jnp.float32), poses, s_out,
                            jnp.eye(3), jnp.zeros(3))

    def rotz(a):
        return np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])

    t_end = stamps[-1]
    expected = rotz(w_z * t_end).T @ rotz(w_z * t) @ p_body
    np.testing.assert_allclose(np.asarray(out[0]), expected, atol=2e-3)


def test_pallas_cov_scan_matches_composed():
    """ops/cov_scan.propagate_cov (the TPU kernel path, run here in
    interpreter mode) must equal the associative-scan composition used
    on CPU — same recursion P <- F P F^T + Q, different evaluation
    order."""
    import jax
    import jax.numpy as jnp

    from fast_livo2_tpu.ops import cov_scan

    rng = np.random.default_rng(3)
    K, D = 16, 19
    F = jnp.asarray(
        np.eye(D)[None] + rng.normal(size=(K, D, D)) * 0.02, jnp.float32)
    Q = rng.normal(size=(K, D, D)) * 0.01
    Q = jnp.asarray(np.einsum("kij,klj->kil", Q, Q), jnp.float32)
    P0 = rng.normal(size=(D, D)) * 0.1
    P0 = jnp.asarray(P0 @ P0.T + np.eye(D) * 0.01, jnp.float32)

    got = cov_scan.propagate_cov(F, Q, P0, interpret=True)

    mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)

    def compose(e1, e2):
        A1, B1 = e1
        A2, B2 = e2
        return mm(A2, A1), mm(mm(A2, B1), jnp.swapaxes(A2, -1, -2)) + B2

    A_all, B_all = jax.lax.associative_scan(compose, (F, Q))
    want = mm(mm(A_all[-1], P0), A_all[-1].T) + B_all[-1]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
