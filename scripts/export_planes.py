"""Export the fitted voxel plane map as a PLY of oriented disks.

The reference publishes its plane map to rviz as colored surfels
(pubVoxelMap / pubSinglePlane, voxel_map.cpp:788-878: one marker per
converged plane, colored by trace of the plane covariance). Without ROS,
the equivalent tooling surface is a PLY disk cloud: each fitted plane
becomes a small triangulated disk at the plane center, oriented by the
fitted normal, sized by the fitted in-plane radius, colored by
normal-covariance magnitude (red = uncertain, green = tight).

Usage inside tooling/notebooks:

    from scripts.export_planes import export_plane_ply
    export_plane_ply(pipe.vmap_state, pipe.map_cfg, "planes.ply")
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def export_plane_ply(vmap_state, map_cfg, path: str, segments: int = 8,
                     max_planes: int = 200000):
    """Write fitted planes of every layer as colored oriented disks."""
    from fast_livo2_tpu.core import voxel_map as vm

    verts, faces, cols = [], [], []
    n_off = 0
    rec_all = np.asarray(vm.derive_rec(vmap_state, map_cfg))
    for layer in range(vmap_state.keys.shape[0]):
        keys = np.asarray(vmap_state.keys[layer])
        rec = rec_all[layer]
        used = (keys != vm.EMPTY).all(-1)
        is_pl = (rec[:, 0] > 0.5) & used  # _ISPL slot
        idx = np.where(is_pl)[0]
        if len(idx) == 0:
            continue
        n = rec[idx, 1:4]
        c = rec[idx, 5:8]
        radius = np.maximum(rec[idx, 8], 0.05)
        # normal uncertainty = trace of cov_nn (sym6 diag at 9, 12, 14)
        tr = rec[idx, 9] + rec[idx, 12] + rec[idx, 14]
        # orthonormal in-plane axes
        a = np.where(np.abs(n[:, 2:3]) < 0.9,
                     np.tile([0.0, 0.0, 1.0], (len(idx), 1)),
                     np.tile([1.0, 0.0, 0.0], (len(idx), 1)))
        u = np.cross(n, a)
        u /= np.maximum(np.linalg.norm(u, axis=-1, keepdims=True), 1e-9)
        v = np.cross(n, u)
        # color: green (tight) -> red (uncertain), log-scaled
        t = np.clip((np.log10(np.maximum(tr, 1e-12)) + 8) / 6, 0, 1)
        col = np.stack([255 * t, 255 * (1 - t), np.zeros_like(t)], -1)

        ang = np.linspace(0, 2 * np.pi, segments, endpoint=False)
        ring = (np.cos(ang)[None, :, None] * u[:, None, :]
                + np.sin(ang)[None, :, None] * v[:, None, :])
        ring = c[:, None, :] + 0.5 * radius[:, None, None] * ring
        for i in range(len(idx)):
            if n_off // (segments + 1) >= max_planes:
                break
            verts.append(c[i])
            verts.extend(ring[i])
            cols.extend([col[i]] * (segments + 1))
            for s in range(segments):
                faces.append((n_off, n_off + 1 + s,
                              n_off + 1 + (s + 1) % segments))
            n_off += segments + 1

    verts = np.asarray(verts, np.float32).reshape(-1, 3)
    cols = np.asarray(cols, np.uint8).reshape(-1, 3)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for p, cl in zip(verts, cols):
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} "
                    f"{int(cl[0])} {int(cl[1])} {int(cl[2])}\n")
        for a3, b3, c3 in faces:
            f.write(f"3 {a3} {b3} {c3}\n")
    return len(faces) // segments


def main():
    import argparse

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="planes.ply")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--duration", type=float, default=3.0)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from fast_livo2_tpu.core.pipeline import LIVOPipeline
    from fast_livo2_tpu.io import synthetic
    from fast_livo2_tpu.utils.config import LIVOConfig

    seq = synthetic.make_sequence(duration=args.duration, lidar_hz=10.0,
                                  imu_hz=200.0, seed=0, n_lines=12,
                                  n_per_line=500, render=False,
                                  fov_deg=360.0)
    cfg = LIVOConfig()
    cfg.tpu.max_points_per_scan = 8192
    cfg.tpu.max_points_down = 4096
    cfg.tpu.hash_capacity_log2 = 15
    cfg.lio.max_layer = 1
    pipe = LIVOPipeline(cfg, slam_mode="only_lio")
    pipe.process(seq)
    n = export_plane_ply(pipe.vmap_state, pipe.map_cfg, args.out)
    print(f"wrote {n} planes -> {args.out}")


if __name__ == "__main__":
    main()
