#!/usr/bin/env python3
"""Dense colored-mesh reconstruction from saved PCD clouds.

Parity with the reference's offline pipeline
(/root/reference/scripts/mesh.py:1-115: VDBFusion TSDF integration over
a folder of PCDs -> extract_triangle_mesh -> KDTree vertex recoloring ->
colored PLY). Neither VDBFusion nor Open3D ships in this image, so the
whole chain is first-party: TPU-native TSDF scatter integration
(io.tsdf.integrate), vectorized marching-tetrahedra extraction
(io.tsdf.extract_mesh), nearest-point vertex colors
(io.tsdf.colorize_vertices), dependency-free PLY writer.

Usage:
  python scripts/mesh.py <dir-with-pcds-or-pcd-file> [-o mesh.ply]
      [--voxel 0.02] [--grid 256] [--min-weight 1.0]
      [--sensor x y z]   # per-cloud sensor origin (default: cloud mean
                         # pulled 2 m up — fine for room-scale scans)
"""

import argparse
import glob
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fast_livo2_tpu.io import tsdf as tsdf_mod  # noqa: E402
from fast_livo2_tpu.io.export import read_pcd  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="PCD file or directory of PCD files")
    ap.add_argument("-o", "--out", default="mesh.ply")
    ap.add_argument("--voxel", type=float, default=0.05)
    ap.add_argument("--grid", type=int, default=256)
    ap.add_argument("--min-weight", type=float, default=1.0)
    ap.add_argument("--sensor", nargs=3, type=float, default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    files = (sorted(glob.glob(os.path.join(args.src, "*.pcd")))
             if os.path.isdir(args.src) else [args.src])
    if not files:
        sys.exit(f"no .pcd files under {args.src}")
    clouds = [read_pcd(f) for f in files]
    all_pts = np.concatenate([c[0] for c in clouds])
    center = 0.5 * (all_pts.min(0) + all_pts.max(0))
    side = max(float((all_pts.max(0) - all_pts.min(0)).max()) * 1.1,
               args.voxel * args.grid)
    vol = tsdf_mod.make_volume(center, side, grid=args.grid)
    print(f"[mesh] volume: {args.grid}^3 voxels of {vol.voxel:.3f} m "
          f"over {len(files)} cloud(s), {len(all_pts)} points")

    for pts, colors, _ in clouds:
        sensor = (np.asarray(args.sensor) if args.sensor is not None
                  else pts.mean(0) + np.array([0.0, 0.0, 2.0]))
        vol = tsdf_mod.integrate(
            vol, jnp.asarray(pts), jnp.ones(len(pts), bool),
            jnp.asarray(sensor, jnp.float32))

    verts, faces = tsdf_mod.extract_mesh(vol, min_weight=args.min_weight)
    print(f"[mesh] extracted {len(verts)} vertices / {len(faces)} triangles")
    vert_colors = None
    all_rgb = [c[1] for c in clouds if c[1] is not None]
    if all_rgb and len(verts):
        rgb = np.concatenate(all_rgb)
        pts_rgb = np.concatenate([c[0] for c in clouds if c[1] is not None])
        vert_colors = tsdf_mod.colorize_vertices(verts, pts_rgb, rgb)
        print("[mesh] colored vertices from nearest cloud points")
    tsdf_mod.write_ply_mesh(args.out, verts, faces, vert_colors)
    print(f"[mesh] wrote {args.out}")


if __name__ == "__main__":
    main()
