"""Measure fleet-axis scaling: aggregate frames/s of B independent
streams placed on B devices vs stacked on one device
(MultiStreamReplay(devices=...), VERDICT r2 item 4).

Run on a CPU mesh (the environment has one TPU chip, so the multi-device
axis is virtual):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/fleet_scaling.py [B ...]

The measured ceiling on a CPU mesh is the PHYSICAL core count — virtual
devices share them — so read the table as "placement distributes work
across devices" (device-parallel dispatch works, per-stream state is
independent), with the N-chip throughput claim carried by the fact that
each stream's programs run entirely on its own device (no cross-device
traffic; see tests/test_fleet_placement.py for the correctness gate).
"""

import os
import sys
import time

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fast_livo2_tpu.io import synthetic
from fast_livo2_tpu.parallel.batch import MultiStreamReplay
from fast_livo2_tpu.utils.config import LIVOConfig


def config():
    cfg = LIVOConfig()
    cfg.tpu.max_points_per_scan = 8192
    cfg.tpu.max_points_down = 4096
    cfg.tpu.hash_capacity_log2 = 15
    cfg.lio.max_layer = 1
    cfg.preprocess.filter_size_surf = 0.15
    return cfg


def run(B, devices):
    seqs = [
        synthetic.make_sequence(duration=3.0, lidar_hz=10.0, imu_hz=200.0,
                                seed=30 + b, n_lines=12, n_per_line=500,
                                render=False, fov_deg=360.0)
        for b in range(B)
    ]
    mp = MultiStreamReplay(config(), batch=B, slam_mode="only_lio",
                           devices=devices)
    t0 = time.time()
    mp.process(seqs)
    fps = mp.n_frames / mp.wall_s if mp.wall_s > 0 else 0.0
    print(f"B={B} devices={'placed' if devices else 'single'}: "
          f"{mp.n_frames} frames steady in {mp.wall_s:.1f}s -> "
          f"{fps:.1f} frames/s aggregate (total {time.time()-t0:.0f}s)")
    return fps


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    devs = jax.devices()
    print(f"{len(devs)} devices, {os.cpu_count()} physical cores")
    rows = []
    for B in sizes:
        f1 = run(B, None)
        fp = run(B, devs[:B]) if B > 1 else f1
        rows.append((B, f1, fp))
    print("\n| B | single-device agg fps | placed agg fps | placed/single |")
    print("|---|---|---|---|")
    for B, f1, fp in rows:
        print(f"| {B} | {f1:.1f} | {fp:.1f} | {fp / max(f1, 1e-9):.2f}x |")


if __name__ == "__main__":
    main()
