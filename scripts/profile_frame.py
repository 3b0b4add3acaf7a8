"""Sub-stage device timing of one LIVO frame on REALISTIC state.

Replays the cached bench sequence for a few frames to warm the voxel map
and the visual pool, then times each stage of the frame program standalone
on the real chip. This is the instrument for deciding where the next
millisecond comes from (the FLV_SKIP bench bisection perturbs the
workload — skipping a stage changes every downstream stage's work).

Run: `python scripts/profile_frame.py` (regenerates /tmp/flv_bench_seq
via bench.py's cache if missing).
"""

import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from fast_livo2_tpu.core import imu as imu_mod
from fast_livo2_tpu.core import lio as lio_mod
from fast_livo2_tpu.core import vio as vio_mod
from fast_livo2_tpu.core import voxel_map as vmap_mod
from fast_livo2_tpu.core.pipeline import LIVOPipeline
from fast_livo2_tpu.core.state import unpack_state
from fast_livo2_tpu.io import dataset as ds
from fast_livo2_tpu.io import synthetic
from fast_livo2_tpu.models import camera as cam_mod
from fast_livo2_tpu.utils.config import CameraConfig, LIVOConfig


def timeit(name, fn, n=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms")


def main():
    cam_cfg = CameraConfig(cam_model="Pinhole", cam_width=640, cam_height=512,
                           scale=1.0, cam_fx=400.0, cam_fy=400.0,
                           cam_cx=320.0, cam_cy=256.0)
    cam = cam_mod.make_camera(cam_cfg)
    cache = "/tmp/flv_bench_seq_10"
    if not os.path.exists(os.path.join(cache, "imu.npz")):
        print("no cached sequence; run bench.py once first", file=sys.stderr)
        sys.exit(1)
    seq = ds.load_sequence(cache)

    cfg = LIVOConfig()
    cfg.camera = cam_cfg
    cfg.extrin_calib.Rcl = list(synthetic.R_CI_FORWARD.reshape(-1))
    cfg.extrin_calib.Pcl = [0.0, 0.0, 0.0]
    cfg.preprocess.filter_size_surf = 0.15
    pipe = LIVOPipeline(cfg, slam_mode="livo")

    n_warm = 12
    pipe.process(seq, max_frames=n_warm, progress=False)
    jax.block_until_ready(pipe.packed)
    print(f"warmed {n_warm} frames")

    # One more frame's inputs, prepared by the host exactly like process().
    t_ev, img = seq.images[pipe.frame_id + 2]
    imu_pack, pts_pack = pipe._prepare_packet(t_ev, seq)
    img_dev = jnp.asarray(img)
    fid = jnp.asarray(pipe.frame_id, jnp.int32)

    state, cov = unpack_state(pipe.packed)
    noise = pipe.noise
    batch = imu_mod.ImuBatch(
        gyr=imu_pack[:, 0:3], acc=imu_pack[:, 3:6], dt=imu_pack[:, 6],
        offs_end=imu_pack[:, 7], valid=imu_pack[:, 8])
    pts = pts_pack[:, 0:3]
    t_offs = pts_pack[:, 3]
    valid = pts_pack[:, 4] > 0.5

    prop = jax.jit(lambda s, c, b: imu_mod.propagate(s, c, b, noise))
    timeit("imu.propagate (assoc-scan, K=64)", lambda: prop(state, cov, batch))
    state_prop, cov_prop, poses = jax.block_until_ready(prop(state, cov, batch))

    und_f = jax.jit(lambda p, t, po, sp: imu_mod.undistort(
        p, t, po, sp, pipe.ext_R, pipe.ext_T))
    timeit("imu.undistort (one-hot, 32k)",
           lambda: und_f(pts, t_offs, poses, state_prop))
    und = jax.block_until_ready(und_f(pts, t_offs, poses, state_prop))

    down_f = jax.jit(lambda u, v: lio_mod.voxel_downsample(
        u, v, cfg.preprocess.filter_size_surf, cfg.tpu.max_points_down))
    timeit("lio.voxel_downsample (2-sort, 32k->8k)", lambda: down_f(und, valid))
    down, down_valid = jax.block_until_ready(down_f(und, valid))

    lio_f = jax.jit(lambda sp, cp, vm, d, dv: lio_mod.lio_update(
        sp, cp, vm, d, dv, pipe.ext_R, pipe.ext_T, pipe.map_cfg,
        dept_err=cfg.lio.dept_err, beam_err=cfg.lio.beam_err,
        max_iterations=cfg.lio.max_iterations))
    timeit("lio.lio_update (iterated ESIKF)",
           lambda: lio_f(state_prop, cov_prop, pipe.vmap_state, down, down_valid))
    res = jax.block_until_ready(
        lio_f(state_prop, cov_prop, pipe.vmap_state, down, down_valid))

    mp_f = jax.jit(lambda vm, pw, vw, v: vmap_mod.match_planes(
        vm, pw, vw, v, pipe.map_cfg))
    timeit("  voxel_map.match_planes (one round)",
           lambda: mp_f(pipe.vmap_state, res.pts_w, res.var_w, down_valid))

    um_f = jax.jit(lambda vm, pw, vw, v: vmap_mod.update_map(
        vm, pw, vw, v, pipe.map_cfg, compact=True))
    # no donation here (we reuse the same map every rep)
    timeit("voxel_map.update_map (insert+refit)",
           lambda: um_f(pipe.vmap_state, res.pts_w, res.var_w, down_valid))

    # ---- VIO stages on the warmed pool ----
    vio_cfg = pipe.vio_cfg
    normal = jnp.where(res.match.valid[:, None], res.match.normal, 0.0)
    pg_w, pg_var6 = res.pts_w, vmap_mod.sym6(res.var_w)
    state_l = res.state

    ri_f = jax.jit(lambda pool, ring: vio_mod.ring_insert(
        pool, ring, img_dev, fid, vio_cfg))
    timeit("vio.ring_insert (+obs invalidation)",
           lambda: ri_f(pipe.pool, pipe.ring))
    pool, ring, frame_slot = jax.block_until_ready(ri_f(pipe.pool, pipe.ring))

    Rcw0, Pcw0 = vio_mod.camera_pose(state_l, pipe.Rci, pipe.Pci)
    rd_f = jax.jit(lambda pw, v: vio_mod.rasterize_depth(
        cam, Rcw0, Pcw0, pw, v, vio_mod.border_px(vio_cfg)))
    timeit("vio.rasterize_depth (scatter-min)", lambda: rd_f(pg_w, down_valid))
    depth_img = jax.block_until_ready(rd_f(pg_w, down_valid))

    rt_f = jax.jit(lambda pool: vio_mod.retrieve(
        pool, ring, img_dev, depth_img, state_l, cam, pipe.Rci, pipe.Pci,
        vio_cfg))
    timeit("vio.retrieve (project+select+warp)", lambda: rt_f(pool))
    submap, pool2 = jax.block_until_ready(rt_f(pool))
    n_trk = int(jnp.sum(submap.valid))
    print(f"  (tracked submap points: {n_trk})")

    pu_f = jax.jit(lambda sp, cp: vio_mod.photometric_update(
        sp, cp, submap, img_dev, cam, pipe.Rci, pipe.Pci, vio_cfg))
    timeit("vio.photometric_update (3 lvls iter)",
           lambda: pu_f(state_l, res.cov))
    state_v, cov_v, _ = jax.block_until_ready(pu_f(state_l, res.cov))

    gp_f = jax.jit(lambda pool: vio_mod.generate_points(
        pool, img_dev, pg_w, normal, pg_var6, down_valid, submap.valid,
        state_v, cam, pipe.Rci, pipe.Pci, fid, frame_slot, vio_cfg))
    timeit("vio.generate_points (Shi-Tomasi grid)", lambda: gp_f(pool2))

    mt_f = jax.jit(lambda pool: vio_mod.maintain_points(
        pool, pipe.vmap_state, pipe.map_cfg, submap, img_dev, state_v, cam,
        pipe.Rci, pipe.Pci, fid, frame_slot, vio_cfg))
    timeit("vio.maintain_points (obs+ref refine)", lambda: mt_f(pool2))


if __name__ == "__main__":
    main()
