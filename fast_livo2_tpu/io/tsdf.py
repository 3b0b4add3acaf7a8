"""TSDF fusion + surface extraction (dense reconstruction tooling).

Parity surface for the reference's offline mesh pipeline
(scripts/mesh.py: VDBFusion TSDF integration over saved PCDs + marching
cubes — neither library ships in this image). Here the TSDF integration
itself is TPU-native: each frame's world-frame cloud updates a dense
(G³) voxel grid of (tsdf, weight) with one batched scatter along the
sensor rays (projective truncated signed distance, the standard
KinectFusion-style update), and surface points + normals are extracted
as zero-crossing voxels with central-difference gradients. Output is a
surfel cloud written as PLY/PCD (meshable downstream by any MC tool).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TSDFVolume(NamedTuple):
    tsdf: jnp.ndarray  # (G, G, G) float32 in [-1, 1]
    weight: jnp.ndarray  # (G, G, G) float32
    origin: jnp.ndarray  # (3,) world position of voxel (0,0,0)
    voxel: float  # voxel edge length (static)
    trunc: float  # truncation distance (static)


def make_volume(center, side: float, grid: int = 256, trunc_voxels: float = 3.0):
    voxel = side / grid
    origin = jnp.asarray(center, jnp.float32) - side / 2.0
    return TSDFVolume(
        tsdf=jnp.ones((grid, grid, grid), jnp.float32),
        weight=jnp.zeros((grid, grid, grid), jnp.float32),
        origin=origin,
        voxel=float(voxel),
        trunc=float(trunc_voxels * voxel),
    )


def integrate(vol: TSDFVolume, pts_w: jnp.ndarray, valid: jnp.ndarray,
              sensor_pos: jnp.ndarray, samples_inside: int = 3,
              samples_outside: int = 3):
    """Fuse one cloud: for each point, update voxels along the ray within
    ±trunc of the surface with the projective SDF (distance along the ray
    to the measured point), weight-averaged (KinectFusion rule)."""
    grid = vol.tsdf.shape[0]
    n_samp = samples_inside + samples_outside + 1
    ray = pts_w - sensor_pos
    dist = jnp.linalg.norm(ray, axis=-1, keepdims=True)
    dirn = ray / jnp.maximum(dist, 1e-6)
    # sample offsets along the ray in [-trunc, +trunc] (behind the surface
    # = inside = negative sdf)
    offs = jnp.linspace(-vol.trunc, vol.trunc, n_samp)
    samp = pts_w[:, None, :] + dirn[:, None, :] * offs[None, :, None]
    sdf = -offs / vol.trunc  # +1 in front (towards sensor), -1 behind
    sdf = jnp.broadcast_to(sdf[None, :], samp.shape[:2])

    idx = jnp.floor((samp - vol.origin) / vol.voxel).astype(jnp.int32)
    inb = jnp.all((idx >= 0) & (idx < grid), axis=-1) & valid[:, None]
    flat = jnp.where(
        inb,
        (idx[..., 0] * grid + idx[..., 1]) * grid + idx[..., 2],
        grid * grid * grid,
    ).reshape(-1)
    sdf_f = sdf.reshape(-1)
    w_new = jnp.where(inb.reshape(-1), 1.0, 0.0)

    wsum = jnp.zeros((grid ** 3,), jnp.float32).at[flat].add(w_new, mode="drop")
    ssum = jnp.zeros((grid ** 3,), jnp.float32).at[flat].add(sdf_f * w_new, mode="drop")
    wsum = wsum.reshape(vol.tsdf.shape)
    ssum = ssum.reshape(vol.tsdf.shape)
    w_old = vol.weight
    w_tot = w_old + wsum
    tsdf = jnp.where(
        w_tot > 0, (vol.tsdf * w_old + ssum) / jnp.maximum(w_tot, 1e-6), vol.tsdf
    )
    return vol._replace(tsdf=tsdf, weight=jnp.minimum(w_tot, 64.0))


def extract_surface(vol: TSDFVolume, min_weight: float = 1.0):
    """Zero-crossing voxels -> surfel cloud (points + normals), host-side
    numpy return. A voxel is on the surface when its TSDF changes sign
    against any +axis neighbor; the point is linearly interpolated."""
    t = np.asarray(vol.tsdf)
    w = np.asarray(vol.weight)
    origin = np.asarray(vol.origin)
    pts, nrms = [], []
    grid = t.shape[0]
    ok = w >= min_weight
    for ax in range(3):
        t2 = np.roll(t, -1, axis=ax)
        ok2 = np.roll(ok, -1, axis=ax)
        cross = ok & ok2 & (np.sign(t) != np.sign(t2)) & (np.abs(t - t2) > 1e-6)
        ii = np.argwhere(cross)
        if not len(ii):
            continue
        a = t[cross]
        b = t2[cross]
        frac = a / (a - b)
        p = (ii + 0.5).astype(np.float64)
        p[:, ax] += frac
        pts.append(origin + p * vol.voxel)
        # normal from central differences of the tsdf
        g = np.stack(np.gradient(t), axis=-1)
        n = g[cross]
        nn = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
        nrms.append(nn)
    if not pts:
        return np.zeros((0, 3)), np.zeros((0, 3))
    return np.concatenate(pts), np.concatenate(nrms)


def write_ply(path: str, pts: np.ndarray, normals: np.ndarray = None):
    """ASCII PLY surfel cloud (meshable with any downstream tool)."""
    n = len(pts)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if normals is not None:
            f.write("property float nx\nproperty float ny\nproperty float nz\n")
        f.write("end_header\n")
        for i in range(n):
            row = f"{pts[i,0]:.5f} {pts[i,1]:.5f} {pts[i,2]:.5f}"
            if normals is not None:
                row += f" {normals[i,0]:.4f} {normals[i,1]:.4f} {normals[i,2]:.4f}"
            f.write(row + "\n")
