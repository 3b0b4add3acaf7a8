"""Scaling-efficiency proxy for the sharded per-frame LIO step
(VERDICT round-1 item 6: "a measured serial-fraction/scaling-efficiency
proxy for the >=70% north star").

Wall-clock on 8 *virtual* CPU devices says nothing about ICI scaling, so
the proxy is compiled per-device FLOP counts from XLA's cost model: under
GSPMD, work that shards over the measurement axis divides by N while the
replicated remainder (the 19x19 solve, plane gating on the carried
matches, map bookkeeping) does not. Amdahl from FLOPs:

    serial fraction s = (N*f_N/f_1 - 1) / (N - 1)
    efficiency   E(N) = f_1 / (N * f_N)

This is the compute-side bound on scaling efficiency (collectives add
latency on top, but the normal-equation fan-in is one 19x19+19 psum per
iteration — negligible bytes)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import __graft_entry__ as ge


def _per_device_flops(n_devices: int, n_pts: int = 8192):
    step, (state, cov, m, body, valid), _ = ge._build_lio_example(
        n_pts=n_pts, cap_log2=14)
    devs = jax.devices()[:n_devices]
    mesh = Mesh(np.array(devs), ("dp",))
    pt_sh = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    args = (
        jax.tree.map(lambda x: jax.device_put(x, rep), state),
        jax.device_put(cov, rep),
        jax.tree.map(lambda x: jax.device_put(x, rep), m),
        jax.device_put(body, pt_sh),
        jax.device_put(valid, pt_sh),
    )
    compiled = jax.jit(step).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca["flops"])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_compute_scaling_efficiency_exceeds_north_star():
    f1 = _per_device_flops(1)
    f8 = _per_device_flops(8)
    eff = f1 / (8 * f8)
    serial = (8 * f8 / f1 - 1) / 7
    print(f"\n[scaling-proxy] per-device flops: 1dev {f1:.3e}, 8dev {f8:.3e} "
          f"-> efficiency {eff:.1%}, serial fraction {serial:.2%}")
    assert eff >= 0.70, (
        f"compute-side scaling efficiency {eff:.1%} below the 70% north "
        f"star (serial fraction {serial:.1%})")
