"""Sub-stage TPU timing: each pipeline stage as its own jit, steady-state
latency on realistic shapes. Run on the real chip."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from fast_livo2_tpu.core import imu as imu_mod
from fast_livo2_tpu.core import lio as lio_mod
from fast_livo2_tpu.core import vio as vio_mod
from fast_livo2_tpu.core import voxel_map as vm
from fast_livo2_tpu.core.state import init_cov, init_state
from fast_livo2_tpu.models.camera import Camera


def timeit(name, fn, n=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms")


def main():
    rng = np.random.default_rng(0)
    N_RAW, N_DOWN = 32768, 8192
    map_cfg = vm.VoxelMapConfig(voxel_size=0.5, n_layers=3, capacity_log2=18)

    # populated map
    scene = rng.uniform(-6, 6, (30000, 3)).astype(np.float32)
    scene[:, 2] = np.round(scene[:, 2])  # planar-ish sheets
    m = vm.make_map(map_cfg)
    var30k = jnp.tile(jnp.eye(3) * 1e-4, (30000, 1, 1))
    m = jax.block_until_ready(
        vm.update_map(m, jnp.asarray(scene), var30k, jnp.ones(30000, bool), map_cfg))

    state, cov = init_state(), init_cov()
    noise = imu_mod.make_noise()
    raw = jnp.asarray(rng.uniform(-6, 6, (N_RAW, 3)).astype(np.float32))
    offs = jnp.asarray(rng.uniform(0, 0.1, N_RAW).astype(np.float32))
    valid_raw = jnp.ones(N_RAW, bool)
    stamps = np.arange(22) / 200.0
    batch = imu_mod.prepare_imu_batch(stamps, rng.normal(size=(22, 3)) * 0.1,
                                      np.tile([0, 0, 9.81], (22, 1)), 0.0, 0.105, 64)

    prop = jax.jit(lambda s, c: imu_mod.propagate(s, c, batch, noise))
    timeit("imu.propagate (21 steps)", lambda: prop(state, cov))
    s_prop, c_prop, poses = prop(state, cov)

    und = jax.jit(lambda: imu_mod.undistort(raw, offs, poses, s_prop, jnp.eye(3), jnp.zeros(3)))
    timeit("imu.undistort (32k)", und)

    down_fn = jax.jit(lambda p: lio_mod.voxel_downsample(p, valid_raw, 0.15, N_DOWN))
    timeit("voxel_downsample (32k->8k)", lambda: down_fn(raw))
    down, down_valid = down_fn(raw)

    match_fn = jax.jit(lambda p: vm.match_planes(m, p, jnp.tile(jnp.eye(3) * 1e-4, (N_DOWN, 1, 1)), down_valid, map_cfg))
    timeit("match_planes x1 (8k, 3 layers)", lambda: match_fn(down))

    upd = jax.jit(lambda s, c: lio_mod.lio_update(s, c, m, down, down_valid,
                                                  jnp.eye(3), jnp.zeros(3), map_cfg))
    timeit("lio_update (5 it, 8k)", lambda: upd(s_prop, c_prop))
    res = upd(s_prop, c_prop)

    mu = jax.jit(lambda mm: vm.update_map(mm, res.pts_w, res.var_w, down_valid, map_cfg))
    timeit("update_map (3 layers)", lambda: mu(m))

    # --- VIO stages ---
    cam = Camera(model="pinhole", width=640, height=512, fx=400.0, fy=400.0,
                 cx=320.0, cy=256.0, d=(0.0,) * 4)
    vcfg = vio_mod.VIOConfig(grid_size=30, grid_n_width=22, grid_n_height=18,
                             pyramid_levels=4, max_obs=8, pool_capacity=65536,
                             frame_ring=64)
    pool = vio_mod.make_pool(vcfg)
    ring = vio_mod.make_ring(vcfg, cam)
    img = jnp.asarray(rng.uniform(0, 255, (512, 640)).astype(np.float32))
    Rci, Pci = jnp.eye(3), jnp.zeros(3)
    fid = jnp.asarray(5, jnp.int32)

    vfull = jax.jit(lambda s, c, pl, rg: vio_mod.vio_step(
        s, c, pl, rg, m, img, res.pts_w,
        jnp.where(res.match.valid[:, None], res.match.normal, 0.0),
        res.var_w, down_valid, fid, cam, Rci, Pci, vcfg, map_cfg))
    out = jax.block_until_ready(vfull(res.state, res.cov, pool, ring))
    pool2, ring2 = out.pool, out.ring
    timeit("vio_step full (empty->warm pool)", lambda: vfull(res.state, res.cov, pool2, ring2))

    # individual: retrieval / photometric on a warm pool
    Rcw, Pcw = vio_mod.camera_pose(res.state, Rci, Pci)
    depth = jax.jit(lambda: vio_mod.rasterize_depth(cam, Rcw, Pcw, res.pts_w, down_valid, 40))
    timeit("vio.rasterize_depth", depth)
    d_img = depth()
    retr = jax.jit(lambda pl: vio_mod.retrieve(pl, ring2, img, d_img, res.state, cam, Rci, Pci, vcfg))
    timeit("vio.retrieve", lambda: retr(pool2))
    submap, _ = retr(pool2)
    phot = jax.jit(lambda s, c: vio_mod.photometric_update(s, c, submap, img, cam, Rci, Pci, vcfg))
    timeit("vio.photometric (4 lvl x 5 it)", lambda: phot(res.state, res.cov))

    pgn = jnp.where(res.match.valid[:, None], res.match.normal, 0.0)
    gen = jax.jit(lambda pl: vio_mod.generate_points(
        pl, img, res.pts_w, pgn, vm.sym6(res.var_w), down_valid, submap.valid,
        res.state, cam, Rci, Pci, jnp.asarray(7, jnp.int32),
        jnp.asarray(7, jnp.int32), vcfg)[0])
    timeit("vio.generate_points", lambda: gen(pool2))
    maint = jax.jit(lambda pl: vio_mod.maintain_points(
        pl, m, map_cfg, submap, img, res.state, cam, Rci, Pci,
        jnp.asarray(7, jnp.int32), jnp.asarray(7, jnp.int32), vcfg)[0])
    timeit("vio.maintain_points (obs+ref)", lambda: maint(pool2))
    ring_i = jax.jit(lambda pl, rg: vio_mod.ring_insert(pl, rg, img,
                                                        jnp.asarray(9, jnp.int32), vcfg)[:2])
    timeit("vio.ring_insert", lambda: ring_i(pool2, ring2))


if __name__ == "__main__":
    main()
