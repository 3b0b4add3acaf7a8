"""Speed-of-light accounting for the per-frame stages (VERDICT r3 item 4).

Measures on the attached chip:
  1. machine constants — streaming HBM bandwidth (big-array copy), MXU
     matmul throughput, and the random-row gather floor (rows/s for
     scattered row gathers, the dominant primitive of hash probing and
     patch sampling);
  2. per-stage device times from the production pipeline
     (tpu.stage_timing) at the avia (1x) and dense (4x) operating
     points, relay-corrected by the measured null-program sync;
  3. an analytic lower bound per stage from bytes moved / FLOPs /
     gather rows at those constants,
and prints the bounds table (markdown) — measured vs bound and the
ratio. Stages >3x off their bound are the optimization candidates.

Usage: python scripts/roofline.py [--dense-only]
Writes docs/ROOFLINE.md unless --no-write.
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


def _time_scalar(fn, *args, reps=5):
    """Wall time of fn(*args) -> scalar, forcing completion via the
    scalar's d2h (block_until_ready alone is unreliable for chip
    completion on this relay — it returned microseconds for 256 MB
    sweeps, a physical impossibility)."""
    float(fn(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def machine_constants():
    """Measured machine constants via chained-iteration differencing.
    Iteration counts are sized so the k2-k1 delta is >=50 ms of on-chip
    work — the relay injects ~10 ms jitter per call, which would
    otherwise dominate (the r4 first attempt measured 6 TB/s "HBM" with
    too-small deltas)."""
    import jax
    import jax.numpy as jnp

    sync_s = 0.0  # measured per operating point AFTER the staged run:
    # at idle this relay completes tiny programs in ~50 us, but during
    # pipeline operation a null dispatch+block costs ~25 ms (bench.py's
    # sync_overhead_ms) — the correction must match the stage rows'
    # regime (see _sync_after_run).

    def chained_time(body, init, k):
        @jax.jit
        def run(x):
            x = jax.lax.fori_loop(0, k, body, x)
            leaf = x[0] if isinstance(x, tuple) else x
            return jnp.sum(leaf.ravel()[:8])

        return _time_scalar(run, init)

    def per_iter(body, init, k1=4, k2=64):
        t1 = chained_time(body, init, k1)
        t2 = chained_time(body, init, k2)
        return max((t2 - t1) / (k2 - k1), 1e-9)

    # streaming bandwidth: full read+write per iteration (roll defeats
    # algebraic folding across iterations); 60 iters x ~1 ms each
    n = 64 * 1024 * 1024  # 256 MB f32
    big = jnp.ones(n, jnp.float32)
    t = per_iter(lambda i, x: jnp.roll(x, 1) * 1.000001, big)
    hbm_gbs = 2 * n * 4 / t / 1e9

    # MXU: one 4096^3 matmul per iteration (f32 inputs), ~1 ms each
    m = 4096
    A = jnp.full((m, m), 1e-4, jnp.float32)
    t = per_iter(lambda i, y: (y @ A) * (1.0 / (m * 1e-4)), A)
    mxu_tflops = 2 * m**3 / t / 1e12

    # random-row gather floor: R scattered rows of 32 f32 per iteration
    rows, width = 1 << 18, 32
    table = jnp.ones((1 << 21, width), jnp.float32)  # 256 MB
    idx = jnp.asarray(np.random.default_rng(0).integers(
        0, 1 << 21, size=(12, rows)), jnp.int32)

    def gbody(i, carry):
        acc, _ = carry
        sel = jax.lax.dynamic_index_in_dim(idx, i % 12, 0, keepdims=False)
        return (acc + table[sel].sum(axis=0), 0.0)

    def gtime(k):
        f = jax.jit(lambda _:
                    jax.lax.fori_loop(0, k, gbody,
                                      (jnp.zeros(width), 0.0))[0].sum())
        return _time_scalar(f, 0.0)

    t = max((gtime(10) - gtime(2)) / 8, 1e-9)
    grows_per_s = rows / t

    return dict(sync_ms=sync_s * 1e3, hbm_gbs=hbm_gbs,
                mxu_tflops=mxu_tflops, gather_mrows_s=grows_per_s / 1e6)


def _sync_after_run():
    """Null dispatch+block round trip measured in the post-run regime
    (matches how the staged per-stage rows were timed)."""
    import jax
    import jax.numpy as jnp

    nullf = jax.jit(lambda x: x + 1.0)
    ts = []
    for i in range(12):
        z = jnp.full(8, float(i))
        t0 = time.perf_counter()
        jax.block_until_ready(nullf(z))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def stage_bounds(shapes, const):
    """Analytic lower bound (ms) per stage: max(bytes/BW, flops/MXU,
    rows/gather-floor) + 0 dispatch (the dispatch/sync cost is the
    relay's, subtracted from measurements)."""
    N_raw = shapes["n_raw"]          # raw points/scan
    N_down = shapes["n_down"]        # downsampled points
    M = shapes["n_patches"]          # tracked patches
    HW = shapes["img_px"]            # image pixels
    L = shapes["pyr_levels"]
    I_LIO = shapes["lio_iters"]
    I_VIO = shapes["vio_iters"]
    probes = shapes["probe_len"] * shapes["layers"]  # worst case
    BW = const["hbm_gbs"] * 1e9
    GR = const["gather_mrows_s"] * 1e6

    def ms(byts=0, flops=0, rows=0):
        return 1e3 * max(byts / BW, flops / (const["mxu_tflops"] * 1e12),
                         rows / GR)

    b = {}
    # propagate: ~64 19x19 chains — tiny; bound = bytes of state+cov
    b["propagate_ms"] = ms(byts=64 * (19 * 19 + 32) * 4 * 2,
                           flops=64 * 2 * 19**3)
    # undistort: gather segment per point + rotate (reads 9 f32/pt)
    b["undistort_ms"] = ms(byts=N_raw * (4 * 4 + 9 * 4 + 3 * 4),
                           rows=0)  # contiguous reads, BW-bound
    # downsample: two-sort of N keys: ~2 * log2(N) passes over (key,idx)
    p = int(np.ceil(np.log2(max(N_raw, 2))))
    b["downsample_ms"] = ms(byts=2 * p * N_raw * 8 * 2)
    # LIO: per iteration, N_down layer-0 hash probes (expected ~2 of
    # probe_len before a hit in a healthily-loaded table) + fine-layer
    # probes on the descend_compact lanes only + one plane-stat row per
    # match. 6-wide jacobian math is negligible flops.
    exp_probe = 2.0
    fine = shapes["descend_compact"] * exp_probe * (shapes["layers"] - 1)
    b["lio_ms"] = ms(rows=I_LIO * (N_down * (exp_probe + 1) + fine),
                     byts=I_LIO * N_down * 64 * 4)
    # map insert: scatter of moment rows (adds ~ 16 f32/pt) — scatters
    # land near the gather floor
    b["map_ms"] = ms(rows=N_down * 2, byts=N_down * 16 * 4 * 2)
    # VIO: image h2d excluded (transfer, not compute). Per level x iter:
    # M superpatch gathers (13 rows each) + einsums; retrieval adds one
    # depth raster (HW scatter) + pool gathers
    b["vio_ms"] = ms(rows=L * I_VIO * M * 13 + HW / 8 + M * 40,
                     flops=L * I_VIO * M * 64 * 7 * 7 * 2 * 2,
                     byts=L * I_VIO * M * 13 * 13 * 4 * 3)
    return b


def main():
    import fast_livo2_tpu

    fast_livo2_tpu.enable_compile_cache()
    from fast_livo2_tpu.core import pipeline as pipeline_mod
    from fast_livo2_tpu.core.pipeline import LIVOPipeline
    from fast_livo2_tpu.io import synthetic
    from fast_livo2_tpu.models import camera as cam_mod
    from fast_livo2_tpu.utils.config import CameraConfig, LIVOConfig

    const = machine_constants()
    log(f"[roofline] constants: {const}")

    cam_cfg = CameraConfig(
        cam_model="Pinhole", cam_width=640, cam_height=512, scale=1.0,
        cam_fx=400.0, cam_fy=400.0, cam_cx=320.0, cam_cy=256.0)
    cam = cam_mod.make_camera(cam_cfg)

    # sequences (reuse bench caches when present)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    operating_points = []
    if "--dense-only" not in sys.argv:
        seq = bench.cached_sequence(
            "seq", lambda: synthetic.make_sequence(
                duration=10.0, lidar_hz=10.0, img_hz=10.0, imu_hz=200.0,
                cam=cam, seed=0, n_lines=24, n_per_line=1000, render=True,
                fov_deg=360.0),
            duration=10.0, seed=0, n_lines=24, n_per_line=1000, v=2)
        operating_points.append(("avia_1x", seq, {}))
    dseq = bench.cached_sequence(
        "dense", lambda: synthetic.make_sequence(
            duration=4.0, lidar_hz=10.0, img_hz=10.0, imu_hz=200.0,
            cam=cam, seed=5, n_lines=48, n_per_line=2000, render=True,
            fov_deg=360.0),
        duration=4.0, seed=5, n_lines=48, n_per_line=2000, v=2)
    operating_points.append(("dense_4x", dseq, dict(
        filter_size_surf=0.075, max_points_per_scan=131072,
        max_points_down=32768, descend_compact=16384, insert_compact=8192,
        max_tracked_points=512)))
    if "--dense16" in sys.argv:
        # 16x: 384k-point scans, 0.05 m leaf, 1024 patches — the regime
        # where compute genuinely outweighs the relay floor.
        d16 = bench.cached_sequence(
            "dense16", lambda: synthetic.make_sequence(
                duration=2.0, lidar_hz=10.0, img_hz=10.0, imu_hz=200.0,
                cam=cam, seed=6, n_lines=96, n_per_line=4000, render=True,
                fov_deg=360.0),
            duration=2.0, seed=6, n_lines=96, n_per_line=4000, v=2)
        operating_points.append(("dense_16x", d16, dict(
            filter_size_surf=0.05, max_points_per_scan=524288,
            max_points_down=65536, descend_compact=32768,
            insert_compact=16384, max_tracked_points=1024)))

    lines = ["# Speed-of-light accounting (measured on chip)", "",
             f"Machine constants (measured): sync {const['sync_ms']:.2f} ms, "
             f"HBM {const['hbm_gbs']:.0f} GB/s, MXU "
             f"{const['mxu_tflops']:.1f} TFLOP/s f32, random-row gather "
             f"{const['gather_mrows_s']:.1f} Mrows/s.", ""]

    for name, seq, overrides in operating_points:
        cfg = LIVOConfig()
        cfg.camera = cam_cfg
        cfg.extrin_calib.Rcl = list(synthetic.R_CI_FORWARD.reshape(-1))
        cfg.extrin_calib.Pcl = [0.0, 0.0, 0.0]
        cfg.preprocess.filter_size_surf = overrides.pop(
            "filter_size_surf", 0.15)
        for k, v in overrides.items():
            setattr(cfg.tpu, k, v)
        cfg.tpu.stage_timing = True
        pipeline_mod._BLOCK = True
        pipe = LIVOPipeline(cfg, slam_mode="livo")
        pipe.process(seq, max_frames=28)
        rows = [r for r in pipe.log.rows if "lio_ms" in r][4:]
        keys = ["propagate_ms", "undistort_ms", "downsample_ms",
                "lio_ms", "map_ms", "vio_ms"]
        meas = {k: float(np.median([r[k] for r in rows])) for k in keys}
        const = dict(const, sync_ms=_sync_after_run() * 1e3)
        log(f"[roofline] {name} sync_after_run {const['sync_ms']:.2f} ms")
        n_raw = int(np.median([len(p) for _, p, _ in seq.scans]))
        n_down_cap = cfg.tpu.max_points_down
        shapes = dict(
            n_raw=min(n_raw, cfg.tpu.max_points_per_scan),
            n_down=n_down_cap, n_patches=cfg.tpu.max_tracked_points,
            img_px=640 * 512, pyr_levels=cfg.vio.patch_pyrimid_level,
            lio_iters=cfg.lio.max_iterations, vio_iters=cfg.vio.max_iterations,
            probe_len=cfg.tpu.hash_probe_len, layers=cfg.lio.max_layer + 1,
            descend_compact=cfg.tpu.descend_compact)
        bounds = stage_bounds(shapes, const)
        lines += [f"## {name} ({n_raw} pts/scan)", "",
                  "| stage | measured raw (ms) | relay-corrected (ms) | "
                  "bound (ms) | corrected/bound |", "|---|---|---|---|---|"]
        log(f"[roofline] {name}:")
        for k in keys:
            corr = max(0.0, meas[k] - const["sync_ms"])
            ratio = corr / bounds[k] if bounds[k] > 1e-6 else float("inf")
            lines.append(f"| {k[:-3]} | {meas[k]:.1f} | {corr:.2f} | "
                         f"{bounds[k]:.3f} | {ratio:.0f}x |")
            log(f"  {k[:-3]:>11}: raw {meas[k]:6.1f}  corr {corr:6.2f}  "
                f"bound {bounds[k]:8.3f}  ratio {ratio:8.1f}x")
        lines.append("")

    lines += [
        "Reading: 'bound' is max(bytes/HBM-BW, FLOPs/MXU, gather-rows/",
        "measured-floor) for the stage's dominant arrays — a true",
        "speed-of-light floor, not an achievable target (it ignores",
        "kernel launch and serial-iteration structure). 'corrected'",
        "subtracts the measured null-program sync (one relay round trip",
        "per staged timing). Stages whose corrected time sits far above",
        "their bound are dominated by per-iteration dispatch chains and",
        "small-op latency, not by bandwidth or compute — the fusion",
        "candidates. NOTE: the propagate row is the FIRST staged program",
        "of the frame, so its 'corrected' time is dominated by waiting",
        "for the frame's entire input h2d (points packet + image) over",
        "the relay — a transfer cost of this environment, not device",
        "compute (at dense 4x it tracks the 2.6 MB packet, not the 19^2",
        "covariance math). The LIO bound assumes ~2 expected probes per",
        "lookup and fine-layer work on the compacted lanes only; treat",
        "its ratio as approximate.",
    ]
    out = "\n".join(lines) + "\n"
    print(out)
    if "--no-write" not in sys.argv:
        path = os.path.join(os.path.dirname(__file__), "..", "docs",
                            "ROOFLINE.md")
        with open(path, "w") as f:
            f.write(out)
        log(f"[roofline] wrote {path}")


if __name__ == "__main__":
    main()
