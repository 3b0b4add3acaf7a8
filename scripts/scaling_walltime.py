"""Measured wall-clock scaling of the sharded backend (VERDICT r3 item 9).

Times `parallel.ba.refine_window` (the device-bound batch backend) and
the sharded LIO normal-equation fan-in at 1/2/4/8 virtual CPU devices,
strong-scaling (fixed total work, keyframe/point axis sharded over the
mesh). Replaces the FLOP-count proxy with wall-clock measurement.

CAVEAT (stated wherever these numbers are quoted): the virtual devices
are XLA host-platform devices multiplexed onto this machine's physical
cores (2 here), so ideal strong-scaling speedup saturates at
min(D, physical_cores); what D>cores runs DO measure is the added
collective/partitioning overhead of wider meshes. On real multi-chip
ICI the per-device compute is private and the collective rides
dedicated links, so these numbers are a pessimistic lower bound on
cross-device efficiency.

Usage: python scripts/scaling_walltime.py [--quick]
"""

import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from fast_livo2_tpu.core import voxel_map as vm  # noqa: E402
from fast_livo2_tpu.ops import so3  # noqa: E402
from fast_livo2_tpu.parallel import ba, sharding as shd  # noqa: E402

MAP_CFG = vm.VoxelMapConfig(voxel_size=0.5, n_layers=2, capacity_log2=15,
                            layer_init_num=(5, 5))


def make_window(K, N, seed=0):
    rng = np.random.default_rng(seed)

    def plane_pts(n, normal, d):
        normal = np.asarray(normal, np.float64)
        a = (np.array([1.0, 0, 0]) if abs(normal[0]) < 0.9
             else np.array([0, 1.0, 0]))
        b1 = np.cross(normal, a)
        b1 /= np.linalg.norm(b1)
        b2 = np.cross(normal, b1)
        uv = rng.uniform(-5, 5, size=(n, 2))
        return (-d * normal + uv[:, :1] * b1 + uv[:, 1:] * b2
                + rng.normal(size=(n, 3)) * 0.004)

    rot, pos, scans = [], [], []
    for k in range(K):
        w = rng.normal(size=3) * 0.05
        R = np.asarray(so3.exp(jnp.asarray(w, jnp.float32)))
        p = np.array([0.2 * k, 0.1 * np.sin(k), 0.05 * k])
        world = np.concatenate([
            plane_pts(N // 3, [0, 0, 1], 1.0),
            plane_pts(N // 3, [1, 0, 0], -6.0),
            plane_pts(N - 2 * (N // 3), [0, 1, 0], -6.0),
        ])
        rot.append(R)
        pos.append(p)
        scans.append((world - p) @ R)
    return ba.Window(
        rot=jnp.asarray(np.array(rot), jnp.float32),
        pos=jnp.asarray(np.array(pos), jnp.float32),
        scans=jnp.asarray(np.array(scans), jnp.float32),
        valid=jnp.ones((K, N), bool),
    )


def time_fn(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_refine(K, N, reps):
    window = make_window(K, N)
    rows = []
    for d in (1, 2, 4, 8):
        mesh = shd.make_mesh(d)
        ksh = NamedSharding(mesh, P("dp"))
        w_s = ba.Window(*(jax.device_put(a, ksh) for a in window))
        fn = jax.jit(lambda w: ba.refine_window(
            w, MAP_CFG, outer_iters=1, gn_iters=2, mesh=mesh)[0])
        t = time_fn(fn, w_s, reps=reps)
        rows.append((d, t))
    return rows


def bench_lio_fanin(N, reps):
    """The sharded measurement fan-in: per-point residual/Jacobian +
    psum-reduced 6x6 normal equations against a replicated map."""
    window = make_window(1, N)
    scan = window.scans[0]
    body6 = vm.sym6(
        __import__("fast_livo2_tpu.core.lio", fromlist=["calc_body_cov"])
        .calc_body_cov(scan, 0.02, 0.05))
    m = vm.make_map(MAP_CFG)
    m = vm.update_map(m, scan, body6, window.valid[0], MAP_CFG)

    def fanin(pts, cov6, valid, vmap_state):
        match = vm.match_planes(vmap_state, pts, cov6, valid, MAP_CFG)
        use = match.valid & valid
        n = match.normal
        Jr = jnp.cross(pts, n)
        H = jnp.concatenate([Jr, n], axis=-1)
        w = jnp.where(use, 1.0 / (1e-3 + match.sigma_plane), 0.0)
        HtH = jnp.einsum("ni,n,nj->ij", H, w, H)
        Htz = jnp.einsum("ni,n,n->i", H, w, -match.dist)
        return HtH, Htz

    rows = []
    for d in (1, 2, 4, 8):
        mesh = shd.make_mesh(d)
        psh = NamedSharding(mesh, P("dp"))
        rep = NamedSharding(mesh, P())
        pts = jax.device_put(scan, psh)
        cov = jax.device_put(body6, psh)
        val = jax.device_put(window.valid[0], psh)
        ms = jax.tree.map(lambda x: jax.device_put(x, rep), m)
        fn = jax.jit(fanin, out_shardings=rep)
        t = time_fn(fn, pts, cov, val, ms, reps=reps)
        rows.append((d, t))
    return rows


def main():
    quick = "--quick" in sys.argv
    K, N = (8, 2048) if quick else (32, 8192)
    reps = 2 if quick else 3
    print(f"# physical cores: {os.cpu_count()}")
    print(f"\n## refine_window strong scaling (K={K} keyframes, "
          f"N={N} pts/kf)")
    rows = bench_refine(K, N, reps)
    t1 = rows[0][1]
    print("| devices | wall (s) | speedup | eff vs min(D,cores) |")
    print("|---|---|---|---|")
    cores = os.cpu_count() or 1
    for d, t in rows:
        print(f"| {d} | {t:.3f} | {t1 / t:.2f}x | "
              f"{100 * (t1 / t) / min(d, cores):.0f}% |")

    n_big = N * 4
    print(f"\n## sharded LIO fan-in strong scaling (N={n_big} points)")
    rows = bench_lio_fanin(n_big, reps)
    t1 = rows[0][1]
    print("| devices | wall (ms) | speedup | eff vs min(D,cores) |")
    print("|---|---|---|---|")
    for d, t in rows:
        print(f"| {d} | {t * 1e3:.1f} | {t1 / t:.2f}x | "
              f"{100 * (t1 / t) / min(d, cores):.0f}% |")


if __name__ == "__main__":
    main()
