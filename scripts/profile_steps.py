"""Per-step TPU timing: compile + steady-state latency of the LIO and VIO
jitted steps in isolation (run on the real chip; `python scripts/profile_steps.py`)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from fast_livo2_tpu.core.pipeline import LIVOPipeline
from fast_livo2_tpu.core import imu as imu_mod
from fast_livo2_tpu.io import synthetic
from fast_livo2_tpu.models import camera as cam_mod
from fast_livo2_tpu.utils.config import CameraConfig, LIVOConfig


def timeit(name, fn, n=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1e3:.2f} ms")
    return out


def main():
    cam_cfg = CameraConfig(cam_model="Pinhole", cam_width=640, cam_height=512,
                           scale=1.0, cam_fx=400.0, cam_fy=400.0,
                           cam_cx=320.0, cam_cy=256.0)
    cfg = LIVOConfig()
    cfg.camera = cam_cfg
    cfg.extrin_calib.Rcl = list(synthetic.R_CI_FORWARD.reshape(-1))
    pipe = LIVOPipeline(cfg, slam_mode="livo")
    pipe.noise = imu_mod.make_noise()

    rng = np.random.default_rng(0)
    n_raw = cfg.tpu.max_points_per_scan
    pts = jnp.asarray(rng.uniform(-5, 5, (n_raw, 3)).astype(np.float32))
    offs = jnp.asarray(rng.uniform(0, 0.1, n_raw).astype(np.float32))
    valid = jnp.ones(n_raw, bool)
    stamps = np.arange(22) / 200.0
    batch = imu_mod.prepare_imu_batch(
        stamps, rng.normal(size=(22, 3)) * 0.1,
        np.tile([0, 0, 9.81], (22, 1)), 0.0, 0.105, cfg.tpu.max_imu_per_packet)

    t0 = time.perf_counter()
    out = pipe._lio_jit(pipe.state, pipe.cov, pipe.vmap_state, batch, pts, offs,
                        valid, first=True)
    jax.block_until_ready(out)
    print(f"lio first=True compile+run: {time.perf_counter() - t0:.1f} s")
    pipe.vmap_state = out[2]

    t0 = time.perf_counter()
    out = pipe._lio_jit(pipe.state, pipe.cov, pipe.vmap_state, batch, pts, offs,
                        valid, first=False)
    jax.block_until_ready(out)
    print(f"lio first=False compile+run: {time.perf_counter() - t0:.1f} s")
    pipe.vmap_state = out[2]

    def lio_call():
        nonlocal_out = pipe._lio_jit(pipe.state, pipe.cov, pipe.vmap_state,
                                     batch, pts, offs, valid, first=False)
        pipe.vmap_state = nonlocal_out[2]
        return nonlocal_out[0]
    timeit("lio steady", lio_call)

    img = jnp.asarray(rng.uniform(0, 255, (512, 640)).astype(np.float32))
    pg_w, pg_n, pg_v, pg_val = out[3], out[4], out[5], out[6]
    t0 = time.perf_counter()
    res = pipe._vio_jit(pipe.state, pipe.cov, pipe.pool, pipe.ring,
                        pipe.vmap_state, img, pg_w, pg_n, pg_v, pg_val,
                        jnp.asarray(0, jnp.int32))
    jax.block_until_ready(res.state)
    print(f"vio compile+run: {time.perf_counter() - t0:.1f} s")
    pipe.pool, pipe.ring = res.pool, res.ring

    fid = [1]
    def vio_call():
        res = pipe._vio_jit(pipe.state, pipe.cov, pipe.pool, pipe.ring,
                            pipe.vmap_state, img, pg_w, pg_n, pg_v, pg_val,
                            jnp.asarray(fid[0], jnp.int32))
        fid[0] += 1
        pipe.pool, pipe.ring = res.pool, res.ring
        return res.state
    timeit("vio steady", vio_call)

    # host->device transfer cost of per-frame inputs
    def h2d():
        a = jax.device_put(np.asarray(img))
        b = jax.device_put(np.asarray(pts))
        return a, b
    timeit("h2d img+points", h2d)


if __name__ == "__main__":
    main()
