"""Closed-form 3x3 symmetric eigensolver vs numpy oracle."""

import numpy as np
import jax.numpy as jnp

from fast_livo2_tpu.ops.eig3 import eigh3


def _check(mats, tol_val=1e-4, tol_vec=2e-3):
    evals, evecs = eigh3(jnp.asarray(mats, jnp.float32))
    evals, evecs = np.asarray(evals), np.asarray(evecs)
    ref_vals, ref_vecs = np.linalg.eigh(mats)
    np.testing.assert_allclose(evals, ref_vals, atol=tol_val * np.abs(mats).max())
    # eigenvector check: A v = lambda v (sign-free, robust to degeneracy)
    for k in range(3):
        v = evecs[..., :, k]
        lam = evals[..., k][..., None]
        resid = np.einsum("...ij,...j->...i", mats, v) - lam * v
        assert np.abs(resid).max() < tol_vec * np.abs(mats).max() + 1e-6, (
            k, np.abs(resid).max())
        # unit norm, orthogonal
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-4)


def test_random_symmetric():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 3, 3))
    _check((a + np.swapaxes(a, -1, -2)) * 0.5)


def test_planar_scatter_shapes():
    """Near-planar covariance matrices (tiny min eigenvalue) — the exact
    regime of the voxel plane fit."""
    rng = np.random.default_rng(1)
    mats = []
    for _ in range(300):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        lam = np.sort(np.abs([rng.uniform(1e-6, 1e-4), rng.uniform(0.01, 0.05),
                              rng.uniform(0.01, 0.08)]))
        mats.append(q @ np.diag(lam) @ q.T)
    _check(np.array(mats), tol_val=2e-4, tol_vec=5e-3)


def test_degenerate_isotropic():
    mats = np.stack([np.eye(3) * s for s in [1e-6, 1.0, 50.0]])
    evals, evecs = eigh3(jnp.asarray(mats, jnp.float32))
    np.testing.assert_allclose(np.asarray(evals), [[1e-6] * 3, [1.0] * 3, [50.0] * 3],
                               rtol=1e-3)
    # orthonormal basis even when fully degenerate
    E = np.asarray(evecs)
    eye = np.broadcast_to(np.eye(3), E.shape)
    np.testing.assert_allclose(np.swapaxes(E, -1, -2) @ E, eye, atol=1e-3)


def test_pallas_gather_rows_exact():
    """DMA row-gather kernel (interpret mode) matches table[idx]."""
    from fast_livo2_tpu.ops.pallas_gather import gather_rows

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(2048, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 2048, 512).astype(np.int32))
    out = gather_rows(table, idx, group=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table)[np.asarray(idx)])
