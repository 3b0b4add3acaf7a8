"""Parity of the fused Pallas photometric iteration (ops/pallas_photo)
against the XLA building blocks it replaces (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fast_livo2_tpu.models import camera as cam_mod
from fast_livo2_tpu.ops import image as img_ops
from fast_livo2_tpu.ops import pallas_photo as pp
from fast_livo2_tpu.ops import so3


def _xla_iteration(img, pos, ref, scale, ok, Rcw, Pcw, tau, Jdphi_dR,
                   Jdp_dR, cam, expo_flag):
    """The exact per-iteration math of vio.photometric_update's body."""
    ps = 8
    pf = pos @ Rcw.T + Pcw
    px = cam_mod.world2cam(cam, pf)
    okz = ok & (pf[:, 2] > 1e-6)
    val, du, dv = img_ops.sample_patches_with_grad(img, px, scale, ps)
    inv_scale = 1.0 / scale.astype(jnp.float32)
    Jimg = jnp.stack([du, dv], axis=-1) * (tau * inv_scale[:, None])[..., None]
    Jdpi = cam_mod.projection_jacobian(cam, pf)
    p_hat = so3.skew(pf)
    Jca = jnp.einsum("mpi,mij->mpj", Jimg, Jdpi)
    Jdphi = jnp.einsum("mpi,mij->mpj", Jca, p_hat)
    JdR = (jnp.einsum("mpi,ij->mpj", Jdphi, Jdphi_dR)
           + jnp.einsum("mpi,ij->mpj", -Jca, Jdp_dR))
    Jdt = jnp.einsum("mpi,ij->mpj", -Jca, Rcw)
    res = tau * val - ref
    Hcol = (val * expo_flag)[..., None]
    H = jnp.concatenate([JdR, Jdt, Hcol], axis=-1)
    okf = okz.astype(jnp.float32)
    HTH = jnp.einsum("mpi,mpj,m->ij", H, H, okf)
    HTz = jnp.einsum("mpi,mp,m->i", H, res, okf)
    err = jnp.sum(okf[:, None] * res * res)
    cnt = jnp.sum(okf) * ps * ps
    return HTH, HTz, err, cnt


@pytest.mark.parametrize("with_dist", [False, True])
def test_pallas_photo_matches_xla(with_dist):
    rng = np.random.default_rng(0)
    H, W = 96, 128
    img = jnp.asarray(
        np.cumsum(np.cumsum(rng.standard_normal((H, W)), 0), 1)
        .astype(np.float32) / 50.0)

    class _Cfg:
        cam_model = "Pinhole"
        cam_width = W
        cam_height = H
        cam_fx = 60.0
        cam_fy = 60.0
        cam_cx = W / 2
        cam_cy = H / 2
        _d = [0.02, -0.01, 0.001, -0.002] if with_dist else [0.0] * 4
        cam_d0, cam_d1, cam_d2, cam_d3 = _d
        scale = 1.0
        blind = 0.1

    cam = cam_mod.make_camera(_Cfg)

    M = 8
    # points projecting well inside the image for strides up to 4
    ang = np.linspace(0, 2 * np.pi, M, endpoint=False)
    pos = np.stack([0.25 * np.cos(ang), 0.2 * np.sin(ang),
                    np.full(M, 2.0)], axis=-1).astype(np.float32)
    Rcw = so3.exp(jnp.asarray([0.02, -0.01, 0.03]))
    Pcw = jnp.asarray([0.01, -0.02, 0.05])
    pos = jnp.asarray(pos) @ Rcw + (-Rcw.T @ Pcw)  # keep pf ~ [.,.,2]
    ref = jnp.asarray(rng.standard_normal((M, 64)).astype(np.float32))
    slog = jnp.asarray(rng.integers(0, 3, M), jnp.int32)
    scale = (1 << slog).astype(jnp.int32)
    ok = jnp.asarray([True] * (M - 1) + [False])
    tau = jnp.float32(1.1)
    Rci = so3.exp(jnp.asarray([0.1, 0.2, -0.05]))
    Pci = jnp.asarray([0.05, -0.03, 0.02])
    Pic = -Rci.T @ Pci
    Jdphi_dR = Rci
    Jdp_dR = -Rci @ so3.skew(Pic)

    HTH0, HTz0, err0, cnt0 = _xla_iteration(
        img, pos, ref, scale, ok, Rcw, Pcw, tau, Jdphi_dR, Jdp_dR, cam,
        1.0)

    meta, refp = pp.pack_points(pos, ref, slog, ok)
    par = pp.pack_params(Rcw, Pcw, tau, Jdphi_dR, Jdp_dR,
                         cam.fx, cam.fy, cam.cx, cam.cy,
                         jnp.asarray(cam.d), 1.0,
                         1.0 if with_dist else 0.0)
    HTH1, HTz1, err1, cnt1 = pp.photo_iteration(img, meta, refp, par,
                                                interpret=True)

    np.testing.assert_allclose(np.asarray(HTH1), np.asarray(HTH0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(HTz1), np.asarray(HTz0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(err1), float(err0), rtol=1e-4)
    assert float(cnt1) == float(cnt0)


def test_photometric_update_pallas_matches_xla_end_to_end():
    """Full photometric_update with the fused kernel == the XLA path on
    a real submap from the synthetic pipeline (CPU, interpret mode)."""
    from fast_livo2_tpu.core import vio as vio_mod
    from fast_livo2_tpu.core.pipeline import LIVOPipeline
    from fast_livo2_tpu.io import synthetic
    from fast_livo2_tpu.utils import config as cfg_mod

    cfg = cfg_mod.LIVOConfig()
    cfg.tpu.max_points_per_scan = 4096
    cfg.tpu.max_points_down = 1024
    cfg.tpu.max_tracked_points = 64
    cam = __import__(
        "fast_livo2_tpu.models.camera", fromlist=["make_camera"]
    ).make_camera(cfg.camera)
    seq = synthetic.make_sequence(duration=1.2, lidar_hz=10.0, img_hz=10.0,
                                  imu_hz=200.0, cam=cam, seed=3,
                                  render=True)
    trajs = {}
    vio_mod._PALLAS_ON_CPU = True
    try:
        for flag in (False, True):
            cfg2 = cfg_mod.LIVOConfig()
            cfg2.tpu.max_points_per_scan = 4096
            cfg2.tpu.max_points_down = 1024
            cfg2.tpu.max_tracked_points = 64
            cfg2.tpu.pallas_photo = flag
            pipe = LIVOPipeline(cfg2, slam_mode="livo")
            trajs[flag] = pipe.process(seq, progress=False)
    finally:
        vio_mod._PALLAS_ON_CPU = False
    p0 = np.asarray([p for _, _, p in trajs[False]])
    p1 = np.asarray([p for _, _, p in trajs[True]])
    # Border-tap semantics differ slightly (see module docstring);
    # trajectories must agree to sub-mm.
    assert np.max(np.linalg.norm(p0 - p1, axis=-1)) < 1e-3
