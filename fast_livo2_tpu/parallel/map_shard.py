"""Spatially-sharded voxel map for the sliding-window backend.

The replicated-map SPMD contract (voxel_map.update_map(mesh=) /
parallel/ba.refine_window) is latency-smart per frame but caps map
capacity at ONE device's HBM and makes the BA map rebuild an O(points)
all-gather — the wrong trade for MARS-scale aerial mapping
(BASELINE.json north star: "voxel-map blocks ... sharded across a
multi-host TPU pod slice"; VERDICT r4 missing #4). This module shards
the map itself: the hash key space is partitioned by an independent
spatial hash of each point's LAYER-0 voxel key, so

  - every device owns a map BLOCK: per-layer tables of capacity C/D
    (the per-device memory ceiling lifts by Dx — a map too big to
    replicate fits sharded);
  - a voxel's whole layer chain colocates (children of a layer-0 voxel
    hash with their ancestor), so descent gating stays device-local;
  - points are replicated (cheap: O(N) vs O(map)); each device inserts
    and matches only the points it owns, and per-keyframe normal
    equations combine with ONE psum of (K, 6, 6) + (K, 6) + scalars —
    the collective volume is O(K * 42) floats per GN iteration,
    independent of both map size and point count (vs the replicated
    design's O(K * N * 3) world-point all-gather per rebuild).

Built on jax.shard_map: inside, each device runs the SAME voxel_map
code on its local block (capacity C/D), which keeps this file a thin
partitioning layer rather than a second map implementation.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import voxel_map as vm
from ..core.lio import calc_body_cov
from ..ops import so3

# Owner-routing hash: DIFFERENT prime mix than ops.voxel_hash._bucket so
# block assignment is independent of in-block slot buckets (a shared hash
# would alias whole bucket ranges onto one device and overload its block).
_Q1, _Q2, _Q3 = -1640531535, 40503, -2048144777  # int32 views of
# 0x9e3779b1 / 0x9e37 / 0x85ebca77 (Fibonacci/murmur-family constants)


def owner_of(pts_w, cfg: vm.VoxelMapConfig, n_devices: int):
    """Device index (N,) owning each point's layer-0 voxel (and thereby
    its whole layer chain)."""
    key0 = jnp.floor(pts_w / cfg.voxel_size).astype(jnp.int32)
    h = (key0[..., 0] * jnp.int32(_Q1)
         ^ key0[..., 1] * jnp.int32(_Q2)
         ^ key0[..., 2] * jnp.int32(_Q3))
    h = h ^ (h >> 15)
    h = h * jnp.int32(-1640531527)  # 0x9e3779b9 as signed int32
    h = h ^ (h >> 13)
    return jnp.abs(h) % n_devices


def local_cfg(cfg: vm.VoxelMapConfig, n_devices: int) -> vm.VoxelMapConfig:
    """Per-device block configuration: capacity C/D, same semantics."""
    shift = int(math.log2(n_devices))
    assert (1 << shift) == n_devices, "mesh size must be a power of two"
    assert cfg.capacity_log2 > shift, "capacity below one slot per device"
    return cfg._replace(capacity_log2=cfg.capacity_log2 - shift)


def refine_window_map_sharded(window, map_cfg: vm.VoxelMapConfig,
                              mesh: Mesh, axis: str = None,
                              outer_iters: int = 2, gn_iters: int = 3,
                              dept_err: float = 0.02,
                              beam_err: float = 0.05):
    """refine_window with the MAP sharded over the mesh instead of the
    keyframes: per-device map blocks are rebuilt from the (replicated)
    window, each keyframe's Gauss-Newton normal equations accumulate
    device-locally over owned points and combine with one psum.
    Numerically matches the replicated ba.refine_window (plane factors
    only) up to float addition order — see tests/test_map_shard.py.

    Returns (window, n_used (K,))."""
    axis = axis or mesh.axis_names[0]
    D = mesh.devices.size
    lcfg = local_cfg(map_cfg, D)
    K, N, _ = window.scans.shape

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P()), out_specs=(P(), P(), P()))
    def run(rot, pos, scans, valid):
        my = jax.lax.axis_index(axis)
        body6 = vm.sym6(calc_body_cov(
            scans.reshape(K * N, 3), dept_err, beam_err))

        n_used = jnp.zeros((K,), jnp.int32)
        for _ in range(outer_iters):
            pts_w = (jnp.einsum("kij,knj->kni", rot, scans)
                     + pos[:, None, :]).reshape(K * N, 3)
            mine = owner_of(pts_w, map_cfg, D) == my
            m = vm.make_map(lcfg)
            m = vm.update_map(m, pts_w, body6,
                              valid.reshape(K * N) & mine, lcfg)

            def gn_one(rot_k, pos_k, scan_k, valid_k, body6_k):
                def gn(carry, _):
                    rot_k, pos_k = carry
                    pw = scan_k @ rot_k.T + pos_k
                    mine_k = owner_of(pw, map_cfg, D) == my
                    match = vm.match_planes(m, pw, body6_k,
                                            valid_k & mine_k, lcfg)
                    use = match.valid & valid_k & mine_k
                    n = match.normal
                    Jr = jnp.cross(pw - pos_k, n)
                    H = jnp.concatenate([Jr, n], axis=-1)
                    w = jnp.where(
                        use,
                        1.0 / (1e-3 + match.sigma_plane
                               + vm.quad6(body6_k, n)), 0.0)
                    HtH = jnp.einsum("ni,n,nj->ij", H, w, H)
                    Htz = jnp.einsum("ni,n,n->i", H, w, -match.dist)
                    cnt = jnp.sum(use)
                    # THE cross-device combine: 6x6 + 6 + 1 per keyframe
                    HtH = jax.lax.psum(HtH, axis)
                    Htz = jax.lax.psum(Htz, axis)
                    cnt = jax.lax.psum(cnt, axis)
                    sol = jnp.linalg.solve(HtH + jnp.eye(6) * 1e-6, Htz)
                    rot_k = so3.exp(sol[0:3]) @ rot_k
                    pos_k = pos_k + sol[3:6]
                    return (rot_k, pos_k), cnt

                (rot_k, pos_k), cnts = jax.lax.scan(
                    gn, (rot_k, pos_k), None, length=gn_iters)
                return rot_k, pos_k, cnts[-1]

            rot, pos, n_used = jax.vmap(gn_one)(
                rot, pos, scans, valid,
                body6.reshape(K, N, 6))
            rot = so3.normalize_rotation(rot)
        return rot, pos, n_used

    rot, pos, n_used = run(window.rot, window.pos, window.scans,
                           window.valid)
    return window._replace(rot=rot, pos=pos), n_used


def sharded_map_arrays(map_cfg: vm.VoxelMapConfig, mesh: Mesh,
                       axis: str = None):
    """A persistent spatially-sharded VoxelMap: per-layer tables laid
    out (L, C, ...) with the CAPACITY axis sharded over the mesh — each
    device materializes only C/D rows (the addressable-shard shapes are
    asserted in tests). Use with shard_map blocks like
    refine_window_map_sharded's; kept separate so callers can hold a
    long-lived sharded map between refinements."""
    axis = axis or mesh.axis_names[0]
    C = 1 << map_cfg.capacity_log2
    L = map_cfg.n_layers
    spec = NamedSharding(mesh, P(None, axis))
    keys = jax.device_put(
        jnp.full((L, C, 3), vm.EMPTY, jnp.int32), spec)
    stats = jax.device_put(
        jnp.zeros((L, C, vm.STATS_W), jnp.float32), spec)
    rec = jax.device_put(jnp.zeros((L, C, vm.REC_W), jnp.float32), spec)
    return vm.VoxelMap(keys=keys, stats=stats, rec=rec)
