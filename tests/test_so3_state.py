"""Unit tests for the numerics substrate (SURVEY.md §4 consequence (a)):
SO(3) ops and the 19-dim state's manifold ⊞/⊟."""

import numpy as np
import jax.numpy as jnp

from fast_livo2_tpu.ops import so3
from fast_livo2_tpu.core.state import (
    DIM_STATE,
    boxminus,
    boxplus,
    init_cov,
    init_state,
)


def random_rotations(n, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(n, 3)).astype(np.float32)
    return so3.exp(jnp.asarray(w)), w


def test_exp_matches_scipy_style_rodrigues():
    rng = np.random.default_rng(1)
    for scale in [1e-6, 1e-3, 0.1, 1.0, 3.0]:
        w = rng.normal(size=3) * scale
        R = np.asarray(so3.exp(jnp.asarray(w, jnp.float32)))
        # numpy float64 Rodrigues reference
        th = np.linalg.norm(w)
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        if th < 1e-10:
            R_ref = np.eye(3) + K
        else:
            R_ref = (
                np.eye(3)
                + np.sin(th) / th * K
                + (1 - np.cos(th)) / th**2 * (K @ K)
            )
        np.testing.assert_allclose(R, R_ref, atol=2e-6)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(64, 3)).astype(np.float32)
    w = w / np.maximum(np.linalg.norm(w, axis=-1, keepdims=True), 1e-9)
    for mag in [1e-5, 1e-2, 0.5, 1.5, 3.0, 3.1]:
        ww = (w * mag).astype(np.float32)
        back = np.asarray(so3.log(so3.exp(jnp.asarray(ww))))
        np.testing.assert_allclose(back, ww, atol=5e-4)


def test_log_identity_and_orthonormality():
    R, _ = random_rotations(32)
    Rn = np.asarray(so3.normalize_rotation(R))
    eye = np.broadcast_to(np.eye(3), Rn.shape)
    np.testing.assert_allclose(Rn @ np.transpose(Rn, (0, 2, 1)), eye, atol=1e-5)
    np.testing.assert_allclose(np.asarray(so3.log(jnp.eye(3))), np.zeros(3), atol=1e-7)


def test_quat_wxyz_consistency():
    R, _ = random_rotations(64, seed=5)
    q = np.asarray(so3.quat_wxyz(R))
    # Rebuild rotation from quaternion, compare.
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R2 = np.stack(
        [
            1 - 2 * (y**2 + z**2), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x**2 + z**2), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x**2 + y**2),
        ],
        axis=-1,
    ).reshape(-1, 3, 3)
    np.testing.assert_allclose(R2, np.asarray(R), atol=1e-5)


def test_boxplus_boxminus_inverse():
    rng = np.random.default_rng(3)
    s = init_state()
    s = boxplus(s, jnp.asarray(rng.normal(size=DIM_STATE) * 0.5, jnp.float32))
    delta = jnp.asarray(rng.normal(size=DIM_STATE) * 0.3, jnp.float32)
    s2 = boxplus(s, delta)
    rec = np.asarray(boxminus(s2, s))
    np.testing.assert_allclose(rec, np.asarray(delta), atol=1e-5)
    # boxminus(s, s) == 0
    np.testing.assert_allclose(np.asarray(boxminus(s, s)), np.zeros(DIM_STATE), atol=1e-6)


def test_init_cov_layout():
    cov = np.asarray(init_cov())
    assert cov.shape == (DIM_STATE, DIM_STATE)
    assert np.isclose(cov[0, 0], 0.01)
    assert np.isclose(cov[6, 6], 1e-5)  # inv exposure (common_lib.h:138)
    assert np.isclose(cov[12, 12], 1e-5)  # biases/gravity block (:139)
