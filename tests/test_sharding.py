"""Multi-device sharding equivalence: the LIO update sharded over the
measurement axis of an 8-device mesh must produce the same posterior as
the single-device run (XLA inserts the psum collectives; the math is a
sum over points, so sharding is exact up to reduction order)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from fast_livo2_tpu.core import lio as lio_mod
from fast_livo2_tpu.core import voxel_map as vm
from fast_livo2_tpu.core.state import boxminus, init_cov, init_state
from fast_livo2_tpu.parallel import sharding as shd


def _setup():
    cfg = vm.VoxelMapConfig(voxel_size=0.5, n_layers=2, capacity_log2=13,
                            layer_init_num=(5, 5))
    rng = np.random.default_rng(0)

    def plane_pts(n, normal, d):
        normal = np.asarray(normal, np.float64)
        a = np.array([1.0, 0, 0]) if abs(normal[0]) < 0.9 else np.array([0, 1.0, 0])
        b1 = np.cross(normal, a); b1 /= np.linalg.norm(b1)
        b2 = np.cross(normal, b1)
        uv = rng.uniform(-4, 4, size=(n, 2))
        return (-d * normal + uv[:, :1] * b1 + uv[:, 1:] * b2
                + rng.normal(size=(n, 3)) * 0.004).astype(np.float32)

    scene = np.concatenate([
        plane_pts(4000, [0, 0, 1], 1.0),
        plane_pts(4000, [1, 0, 0], -5.0),
        plane_pts(4000, [0, 1, 0], -5.0),
    ])
    m = vm.make_map(cfg)
    var = jnp.tile(jnp.eye(3) * 1e-4, (len(scene), 1, 1))
    m = vm.update_map(m, jnp.asarray(scene), var, jnp.ones(len(scene), bool), cfg)
    body = jnp.asarray(np.concatenate([
        plane_pts(512, [0, 0, 1], 1.0), plane_pts(512, [1, 0, 0], -5.0)]))
    return cfg, m, body


def test_sharded_lio_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    cfg, m, body = _setup()
    state, cov = init_state(), init_cov()
    valid = jnp.ones(body.shape[0], bool)

    def step(state, cov, m, body, valid):
        return lio_mod.lio_update(state, cov, m, body, valid, jnp.eye(3),
                                  jnp.zeros(3), cfg, max_iterations=3)

    ref = jax.jit(step)(state, cov, m, body, valid)

    mesh = shd.make_mesh(8)
    pt_sh = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    state_s = shd.put_replicated(state, mesh)
    cov_s = jax.device_put(cov, rep)
    m_s = shd.put_replicated(m, mesh)
    body_s = jax.device_put(body, pt_sh)
    valid_s = jax.device_put(valid, pt_sh)
    out = jax.jit(step)(state_s, cov_s, m_s, body_s, valid_s)

    delta = np.asarray(boxminus(out.state, ref.state))
    assert np.abs(delta).max() < 1e-4, delta
    np.testing.assert_allclose(np.asarray(out.cov), np.asarray(ref.cov),
                               atol=1e-5, rtol=1e-3)
    assert int(out.n_effective) == int(ref.n_effective)


def test_sharded_map_update_consistent():
    """Map insertion with points sharded across devices must agree with
    the single-device table contents (same keys found, same counts)."""
    cfg, m, body = _setup()
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(-4, 4, (1024, 3)).astype(np.float32))
    var = jnp.tile(jnp.eye(3) * 1e-4, (1024, 1, 1))
    valid = jnp.ones(1024, bool)

    ref = vm.update_map(m, pts, var, valid, cfg)

    mesh = shd.make_mesh(8)
    pt_sh = NamedSharding(mesh, P("dp"))
    m_s = shd.put_replicated(m, mesh)
    # writes require replicated inputs (see update_map docstring): pass
    # the mesh so the all-gather is inserted inside the jit
    out = jax.jit(
        lambda mm, p, v, vl: vm.update_map(mm, p, v, vl, cfg, mesh=mesh)
    )(
        m_s, jax.device_put(pts, pt_sh),
        jax.device_put(var, NamedSharding(mesh, P("dp"))),
        jax.device_put(valid, pt_sh),
    )
    # Voxels must resolve identically in both tables (a sub-percent of
    # inserts may legitimately drop at the probe-window limit; they must
    # drop in BOTH).
    keys = vm.voxel_hash.voxel_key(pts, cfg.voxel_size)
    s_ref = np.asarray(vm.voxel_hash.lookup(vm.voxel_hash.HashTable(keys=vm.map_keys(ref, 0)), keys))
    s_out = np.asarray(vm.voxel_hash.lookup(vm.voxel_hash.HashTable(keys=vm.map_keys(out, 0)), keys))
    assert (s_ref >= 0).mean() > 0.99
    found = (s_ref >= 0) & (s_out >= 0)
    assert found.mean() > 0.99
    np.testing.assert_array_equal(
        np.asarray((vm.map_count(ref, 0)))[s_ref[found]],
        np.asarray((vm.map_count(out, 0)))[s_out[found]],
    )
