"""Per-step TPU timing: compile + steady-state latency of the two jitted
per-frame programs (the split-mode LIO half and VIO half) in isolation.
Run on the real chip: `python scripts/profile_steps.py`."""

import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from fast_livo2_tpu.core import imu as imu_mod
from fast_livo2_tpu.core.pipeline import LIVOPipeline
from fast_livo2_tpu.io import synthetic
from fast_livo2_tpu.utils.config import CameraConfig, LIVOConfig


def main():
    cam_cfg = CameraConfig(cam_model="Pinhole", cam_width=640, cam_height=512,
                           scale=1.0, cam_fx=400.0, cam_fy=400.0,
                           cam_cx=320.0, cam_cy=256.0)
    cfg = LIVOConfig()
    cfg.camera = cam_cfg
    cfg.extrin_calib.Rcl = list(synthetic.R_CI_FORWARD.reshape(-1))
    cfg.preprocess.filter_size_surf = 0.15
    pipe = LIVOPipeline(cfg, slam_mode="livo")
    pipe.noise = imu_mod.make_noise()

    rng = np.random.default_rng(0)
    n_raw = cfg.tpu.max_points_per_scan
    pack = np.zeros((n_raw, 5), np.float32)
    pack[:, 0:3] = rng.uniform(-5, 5, (n_raw, 3))
    pack[:, 3] = rng.uniform(0, 0.1, n_raw)
    pack[:, 4] = 1.0
    pts_pack = jnp.asarray(pack)
    stamps = np.arange(22) / 200.0
    b = imu_mod.prepare_imu_batch(
        stamps, rng.normal(size=(22, 3)) * 0.1,
        np.tile([0, 0, 9.81], (22, 1)), 0.0, 0.105,
        cfg.tpu.max_imu_per_packet)
    imu_pack = jnp.concatenate(
        [b.gyr, b.acc, b.dt[:, None], b.offs_end[:, None],
         b.valid[:, None]], axis=-1)
    img = jnp.asarray(rng.uniform(0, 255, (512, 640)).astype(np.uint8))
    fid = jnp.asarray(0, jnp.int32)

    # first=True builds the map
    t0 = time.perf_counter()
    out = pipe._frame_jit(pipe.packed, pipe.vmap_state, pipe.pool, pipe.ring,
                          imu_pack, pts_pack, img, fid,
                          first=True, use_vio=False, emit_pg=True)
    jax.block_until_ready(out[0])
    print(f"frame first=True compile+run: {time.perf_counter() - t0:.1f} s")
    pipe.packed, pipe.vmap_state, pipe.pool, pipe.ring = out[:4]

    def lio_half():
        out = pipe._frame_jit(pipe.packed, pipe.vmap_state, pipe.pool,
                              pipe.ring, imu_pack, pts_pack, img, fid,
                              first=False, use_vio=False, emit_pg=True)
        pipe.packed, pipe.vmap_state, pipe.pool, pipe.ring = out[:4]
        return out

    t0 = time.perf_counter()
    out = lio_half()
    jax.block_until_ready(out[0])
    print(f"lio half compile+run: {time.perf_counter() - t0:.1f} s")
    pg_pack = out[5]

    for name, fn, n in [("lio half", lio_half, 10)]:
        fn()
        jax.block_until_ready(pipe.packed)
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        jax.block_until_ready(pipe.packed)
        print(f"{name} steady: {(time.perf_counter() - t0) / n * 1e3:.2f} ms")

    t0 = time.perf_counter()
    vout = pipe._vio_half_jit(pipe.packed, pipe.pool, pipe.ring,
                              pipe.vmap_state, img, pg_pack, fid)
    jax.block_until_ready(vout[0])
    print(f"vio half compile+run: {time.perf_counter() - t0:.1f} s")
    pipe.packed, pipe.pool, pipe.ring = vout[:3]

    def vio_half():
        vout = pipe._vio_half_jit(pipe.packed, pipe.pool, pipe.ring,
                                  pipe.vmap_state, img, pg_pack, fid)
        pipe.packed, pipe.pool, pipe.ring = vout[:3]
        return vout

    vio_half()
    jax.block_until_ready(pipe.packed)
    t0 = time.perf_counter()
    for _ in range(10):
        vio_half()
    jax.block_until_ready(pipe.packed)
    print(f"vio half steady: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms")

    img_host = np.asarray(img)  # hoisted: d2h is NOT part of the h2d cost

    def h2d():
        return jax.device_put(img_host), jax.device_put(pack)

    h2d()
    t0 = time.perf_counter()
    for _ in range(10):
        a, b2 = h2d()
    jax.block_until_ready(a)
    print(f"h2d img+points: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
