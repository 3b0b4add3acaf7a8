"""Native C++ host kernels: build, decode, downsample, undistort oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from fast_livo2_tpu import native


pytestmark = pytest.mark.skipif(not native.available(), reason="no compiler")


def test_decode_strided():
    n = 1000
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 5
    t = (np.arange(n) * 1e5).astype(np.uint32)  # ns
    rec = np.zeros(n, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                             ("pad", "u4"), ("t", "u4")])
    rec["x"], rec["y"], rec["z"], rec["t"] = xyz[:, 0], xyz[:, 1], xyz[:, 2], t
    pts, offs = native.decode_strided(
        rec.tobytes(), n, rec.itemsize, (0, 4, 8), off_t=16, time_mode=3,
        blind=1.0, filter_num=1,
    )
    keep = (xyz * xyz).sum(1) > 1.0
    np.testing.assert_allclose(pts, xyz[keep], atol=0)
    np.testing.assert_allclose(offs, t[keep] * 1e-9, rtol=1e-6)


def test_native_downsample_matches_device():
    from fast_livo2_tpu.core import lio

    rng = np.random.default_rng(1)
    pts = rng.uniform(-3, 3, size=(20000, 3)).astype(np.float32)
    host = native.voxel_downsample(pts, 0.5)
    dev, dev_valid = lio.voxel_downsample(
        jnp.asarray(pts), jnp.ones(len(pts), bool), 0.5, 4096
    )
    dev_np = np.asarray(dev)[np.asarray(dev_valid)]
    assert len(host) == len(dev_np)
    # same centroids (order differs): sort both by voxel key
    def canon(a):
        k = np.floor(a / 0.5).astype(np.int64)
        order = np.lexsort((k[:, 2], k[:, 1], k[:, 0]))
        return a[order]
    np.testing.assert_allclose(canon(host), canon(dev_np), atol=1e-4)


def test_undistort_device_matches_native_oracle():
    from fast_livo2_tpu.core import imu as imu_mod
    from fast_livo2_tpu.core.state import GRAVITY, init_cov, init_state

    rng = np.random.default_rng(2)
    n_imu = 21
    stamps = np.arange(n_imu) / 100.0
    gyr = rng.normal(size=(n_imu, 3)) * 0.5
    acc = np.tile([0.0, 0, 1.0], (n_imu, 1)) + rng.normal(size=(n_imu, 3)) * 0.1
    batch = imu_mod.prepare_imu_batch(stamps, gyr, acc, stamps[0], stamps[-1], 32)
    noise = imu_mod.make_noise(mean_acc_norm=1.0)
    state = init_state()._replace(grav=jnp.asarray([0.0, 0.0, -GRAVITY]))
    s_out, _, poses = imu_mod.propagate(state, init_cov(), batch, noise)

    pts = rng.normal(size=(500, 3)).astype(np.float32) * 8
    t_offs = rng.uniform(0, stamps[-1], 500).astype(np.float32)
    ext_R = np.asarray(jnp.eye(3))
    ext_T = np.array([0.1, -0.02, 0.05])

    dev = np.asarray(imu_mod.undistort(
        jnp.asarray(pts), jnp.asarray(t_offs), poses, s_out,
        jnp.asarray(ext_R, jnp.float32), jnp.asarray(ext_T, jnp.float32),
    ))
    k = int(np.sum(np.asarray(batch.valid)))
    oracle = native.undistort_oracle(
        pts, t_offs,
        np.asarray(poses.offs_start)[:k], np.asarray(poses.offs_end)[:k],
        np.asarray(poses.rot)[:k], np.asarray(poses.pos)[:k],
        np.asarray(poses.vel)[:k], np.asarray(poses.acc_w)[:k],
        np.asarray(poses.gyr_unbiased)[:k],
        np.asarray(s_out.rot), np.asarray(s_out.pos), ext_R, ext_T,
    )
    np.testing.assert_allclose(dev, oracle, atol=2e-3)
