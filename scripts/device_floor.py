"""On-chip bisection of the VIO stage's device time (r4 roofline
follow-up: the staged `vio_ms` is 25-29 ms relay-corrected, 3.4-6.6x its
modeled bound — this script attributes it to sub-stages).

Method: build realistic state by running the bench pipeline a few
frames, then time each sub-program with chained-iteration differencing
(k calls inside one jitted fori_loop, scalar-fenced; the (T(k2)-T(k1))
/(k2-k1) slope cancels dispatch/transfer/relay constants — the same
method as scripts/roofline.py machine constants).

Usage: python scripts/device_floor.py [--dense]
"""

import os
import sys
import time

os.environ.setdefault("FLV_BLOCK", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import fast_livo2_tpu

    fast_livo2_tpu.enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from fast_livo2_tpu.core import vio as vio_mod
    from fast_livo2_tpu.core.pipeline import LIVOPipeline
    from fast_livo2_tpu.core.state import unpack_state
    from fast_livo2_tpu.io import synthetic
    from fast_livo2_tpu.models import camera as cam_mod
    from fast_livo2_tpu.utils.config import CameraConfig, LIVOConfig
    import bench

    dense = "--dense" in sys.argv
    cam_cfg = CameraConfig(
        cam_model="Pinhole", cam_width=640, cam_height=512, scale=1.0,
        cam_fx=400.0, cam_fy=400.0, cam_cx=320.0, cam_cy=256.0)
    cam = cam_mod.make_camera(cam_cfg)
    if dense:
        seq = bench.cached_sequence(
            "dense", lambda: synthetic.make_sequence(
                duration=4.0, lidar_hz=10.0, img_hz=10.0, imu_hz=200.0,
                cam=cam, seed=5, n_lines=48, n_per_line=2000, render=True,
                fov_deg=360.0),
            duration=4.0, seed=5, n_lines=48, n_per_line=2000, v=2)
    else:
        seq = bench.cached_sequence(
            "seq", lambda: synthetic.make_sequence(
                duration=10.0, lidar_hz=10.0, img_hz=10.0, imu_hz=200.0,
                cam=cam, seed=0, n_lines=24, n_per_line=1000, render=True,
                fov_deg=360.0),
            duration=10.0, seed=0, n_lines=24, n_per_line=1000, v=2)

    cfg = LIVOConfig()
    cfg.camera = cam_cfg
    cfg.extrin_calib.Rcl = list(synthetic.R_CI_FORWARD.reshape(-1))
    cfg.extrin_calib.Pcl = [0.0, 0.0, 0.0]
    cfg.preprocess.filter_size_surf = 0.075 if dense else 0.15
    if dense:
        cfg.tpu.max_points_per_scan = 131072
        cfg.tpu.max_points_down = 32768
        cfg.tpu.descend_compact = 16384
        cfg.tpu.insert_compact = 8192
        cfg.tpu.max_tracked_points = 512
    pipe = LIVOPipeline(cfg, slam_mode="livo")
    pipe.process(seq, max_frames=14)
    log(f"[bisect] pipeline warm: frame {pipe.frame_id}")

    # realistic operands
    state, cov = unpack_state(pipe.packed)
    pool, ring, vmap_state = pipe.pool, pipe.ring, pipe.vmap_state
    vcfg, map_cfg = pipe.vio_cfg, pipe.map_cfg
    camm, Rci, Pci = pipe.cam, pipe.Rci, pipe.Pci
    img = ring.imgs[0].astype(jnp.float32)
    # a plausible world-point pack from the last frame's scan
    N = cfg.tpu.max_points_down
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, size=(N, 3)).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2])
    pg_w = jnp.asarray(pts) + state.pos
    pg_normal = jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (N, 1))
    pg_var6 = jnp.tile(jnp.asarray([1e-4, 0, 0, 1e-4, 0, 1e-4], jnp.float32),
                       (N, 1))
    pg_valid = jnp.ones(N, bool)
    fid = jnp.asarray(pipe.frame_id, jnp.int32)

    def _time_scalar(fn, *args, reps=5):
        float(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def slope(make_scalar, k1=2, k2=8):
        def chained(k):
            @jax.jit
            def run(s0):
                def body(i, s):
                    out = jnp.sum(jnp.asarray(make_scalar(s * 1e-12),
                                              jnp.float32))
                    return (s + out).astype(jnp.float32)
                return jax.lax.fori_loop(0, k, body, s0)

            return _time_scalar(run, jnp.asarray(0.0, jnp.float32))

        return max((chained(k2) - chained(k1)) / (k2 - k1), 0.0)

    rows = []

    # full vio_step
    def full_step(eps):
        r = vio_mod.vio_step(
            state, cov, pool, ring, vmap_state, img + eps, pg_w, pg_normal,
            pg_var6, pg_valid, fid, camm, Rci, Pci, vcfg, map_cfg)
        return r.mean_error + r.state.pos[0]

    rows.append(("vio_step (full)", slope(full_step)))

    # rasterize_depth
    Rcw0, Pcw0 = vio_mod.camera_pose(state, Rci, Pci)

    def raster(eps):
        d = vio_mod.rasterize_depth(camm, Rcw0, Pcw0, pg_w + eps, pg_valid,
                                    vio_mod.border_px(vcfg))
        return d[0, 0] + d[100, 100]

    rows.append(("rasterize_depth", slope(raster)))

    depth_img = vio_mod.rasterize_depth(camm, Rcw0, Pcw0, pg_w, pg_valid,
                                        vio_mod.border_px(vcfg))

    # retrieve
    def retr(eps):
        sm, pl2 = vio_mod.retrieve(pool, ring, img + eps, depth_img, state,
                                   camm, Rci, Pci, vcfg)
        return jnp.sum(sm.valid.astype(jnp.float32)) + sm.pos[0, 0]

    rows.append(("retrieve", slope(retr)))

    submap, _ = vio_mod.retrieve(pool, ring, img, depth_img, state, camm,
                                 Rci, Pci, vcfg)
    log(f"[bisect] tracked in submap: "
        f"{int(np.asarray(jnp.sum(submap.valid.astype(jnp.int32))))}")

    # photometric update
    def photo(eps):
        st, cv, err = vio_mod.photometric_update(
            state, cov, submap, img + eps, camm, Rci, Pci, vcfg)
        return err + st.pos[0]

    rows.append(("photometric_update", slope(photo)))

    # the fused Pallas variant (r5, VERDICT item 5): same update with
    # every iteration's sample+Jacobian+reduce in one kernel
    vcfg_p = vcfg._replace(pallas_photo=True)

    def photo_pallas(eps):
        st, cv, err = vio_mod.photometric_update(
            state, cov, submap, img + eps, camm, Rci, Pci, vcfg_p)
        return err + st.pos[0]

    rows.append(("photometric_update (pallas)", slope(photo_pallas)))

    # generate + maintain
    def gen(eps):
        pl2, upd, n_added = vio_mod.generate_and_maintain(
            pool, vmap_state, map_cfg, submap, img + eps, pg_w, pg_normal,
            pg_var6, pg_valid, state, camm, Rci, Pci, fid,
            jnp.asarray(0, jnp.int32), vcfg)
        return n_added.astype(jnp.float32) + pl2.point[0, 0]

    rows.append(("generate_and_maintain", slope(gen)))

    # ---- whole-frame stages through the production stage jits --------
    if pipe._stage_jits is None:
        pipe._build_stage_jits()
    K = cfg.tpu.max_imu_per_packet
    rngp = np.random.default_rng(1)
    imu_pack = np.zeros((K, 9), np.float32)
    imu_pack[:, 0:3] = rngp.normal(size=(K, 3)) * 0.01
    imu_pack[:, 3:6] = [0, 0, 9.81]
    imu_pack[:, 6] = 0.005
    imu_pack[:, 7] = np.linspace(0, 0.1, K)
    imu_pack[:, 8] = 1.0
    imu_pack = jnp.asarray(imu_pack)
    Nraw = cfg.tpu.max_points_per_scan
    pts_pack = np.zeros((Nraw, 5), np.float32)
    pts_pack[:, 0:3] = rngp.uniform(-5, 5, size=(Nraw, 3))
    pts_pack[:, 3] = rngp.uniform(0, 0.1, size=Nraw)
    pts_pack[:, 4] = 1.0
    pts_pack = jnp.asarray(pts_pack)

    sj = pipe._stage_jits

    def s_prop(eps):
        pk, tab = sj["propagate"](pipe.packed, imu_pack + eps)
        return pk[9] + tab[0, 0]

    rows.append(("stage propagate", slope(s_prop)))
    packed_prop, pose_tab = sj["propagate"](pipe.packed, imu_pack)

    def s_und(eps):
        u = sj["undistort"](packed_prop, pose_tab, pts_pack + eps)
        return u[0, 0] + u[100, 1]

    rows.append(("stage undistort", slope(s_und)))
    und_pts = sj["undistort"](packed_prop, pose_tab, pts_pack)

    def s_down(eps):
        d, v = sj["downsample"](und_pts + eps, pts_pack)
        return d[0, 0] + jnp.sum(v.astype(jnp.float32))

    rows.append(("stage downsample", slope(s_down)))
    down_pts, down_valid = sj["downsample"](und_pts, pts_pack)

    def s_lio(eps):
        pk, pg, dg = sj["lio"](packed_prop, vmap_state, down_pts + eps,
                               down_valid)
        return pk[9] + dg[1]

    rows.append(("stage lio (5 iter)", slope(s_lio)))
    _, pg_pack2, _ = sj["lio"](packed_prop, vmap_state, down_pts, down_valid)

    def s_map(eps):
        vm2 = pipe._map_jit(vmap_state, pg_pack2 + eps)
        return vm2.stats[0, 0]

    rows.append(("stage map insert", slope(s_map, k1=2, k2=6)))

    tag = "dense" if dense else "avia"
    print(f"## Per-stage TRUE device times ({tag}, chained-slope, ms)")
    print("| stage | device ms |")
    print("|---|---|")
    for name, t in rows:
        print(f"| {name} | {t * 1e3:.2f} |")


if __name__ == "__main__":
    main()
