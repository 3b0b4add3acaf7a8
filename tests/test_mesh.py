"""TSDF -> triangle-mesh extraction (scripts/mesh.py parity chain:
integrate -> marching tetrahedra -> recolor -> PLY)."""

import subprocess
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from fast_livo2_tpu.io import tsdf as T
from fast_livo2_tpu.io.export import read_pcd, write_pcd


def _sphere_volume(G=48, radius=0.8, side=2.4):
    vol = T.make_volume((0, 0, 0), side, grid=G)
    idx = np.stack(np.meshgrid(*([np.arange(G)] * 3), indexing="ij"), axis=-1)
    pos = np.asarray(vol.origin) + (idx + 0.5) * vol.voxel
    d = np.linalg.norm(pos, axis=-1) - radius
    t = np.clip(d / vol.trunc, -1, 1).astype(np.float32)
    return vol._replace(tsdf=jnp.asarray(t), weight=jnp.ones_like(jnp.asarray(t)))


def test_marching_tets_sphere_watertight():
    vol = _sphere_volume()
    v, f = T.extract_mesh(vol)
    assert len(f) > 1000
    r = np.linalg.norm(v, axis=-1)
    assert np.abs(r - 0.8).max() < vol.voxel  # sub-voxel surface accuracy
    # winding: all normals outward (along +grad tsdf)
    v0, v1, v2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    n = np.cross(v1 - v0, v2 - v0)
    c = (v0 + v1 + v2) / 3
    assert (np.sum(n * c, axis=-1) > 0).all()
    # closed surface: Euler characteristic V - E + F == 2
    e = np.unique(np.sort(np.concatenate(
        [f[:, [0, 1]], f[:, [1, 2]], f[:, [0, 2]]]), axis=1), axis=0)
    assert len(v) - len(e) + len(f) == 2


def test_integrated_cloud_to_mesh():
    """Points sampled on a sphere, integrated from a central sensor, must
    mesh back to the sphere."""
    rng = np.random.default_rng(0)
    d = rng.normal(size=(20000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pts = d * 1.0
    vol = T.make_volume((0, 0, 0), 2.6, grid=64)
    vol = T.integrate(vol, jnp.asarray(pts, jnp.float32),
                      jnp.ones(len(pts), bool), jnp.zeros(3, jnp.float32))
    v, f = T.extract_mesh(vol, min_weight=1.0)
    assert len(f) > 500
    r = np.linalg.norm(v, axis=-1)
    assert np.abs(np.median(r) - 1.0) < 2 * vol.voxel


def test_pcd_roundtrip_and_mesh_script(tmp_path):
    rng = np.random.default_rng(1)
    d = rng.normal(size=(15000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pts = (d * 1.0).astype(np.float32)
    rgb = np.clip((d * 0.5 + 0.5) * 255, 0, 255).astype(np.uint8)
    pcd = tmp_path / "cloud.pcd"
    write_pcd(str(pcd), pts, colors=rgb)
    rp, rc, _ = read_pcd(str(pcd))
    np.testing.assert_allclose(rp, pts, atol=1e-6)
    np.testing.assert_array_equal(rc, rgb)

    out = tmp_path / "mesh.ply"
    res = subprocess.run(
        [sys.executable, "scripts/mesh.py", str(pcd), "-o", str(out),
         "--grid", "64", "--sensor", "0", "0", "0"],
        capture_output=True, text=True, cwd=Path(__file__).parent.parent,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"},
    )
    assert res.returncode == 0, res.stderr
    head = out.read_text().split("end_header")[0]
    assert "element face" in head and "uchar red" in head
    nv = int([l for l in head.splitlines() if l.startswith("element vertex")][0].split()[-1])
    nf = int([l for l in head.splitlines() if l.startswith("element face")][0].split()[-1])
    assert nv > 100 and nf > 100
