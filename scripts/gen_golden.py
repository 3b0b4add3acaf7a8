#!/usr/bin/env python3
"""Regenerate tests/golden/lio_traj.npz under the exact test environment
(CPU, 8 virtual devices). Run: python scripts/gen_golden.py"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from tests.test_golden_trace import GOLDEN, _run  # noqa: E402

ts, ps, Rs = _run()
os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
np.savez_compressed(GOLDEN, ts=ts, ps=ps, Rs=Rs)
print(f"wrote {GOLDEN}: {len(ts)} poses")
