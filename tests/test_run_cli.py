"""End-to-end test of the user-facing CLI (scripts/run_livo.py — the
reference's roslaunch+rosbag-replay surface): config yaml -> npz
sequence -> trajectory.txt + artifacts + JSON summary with ATE/drift."""

import json
import os
import sys
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from fast_livo2_tpu.io import dataset, synthetic


def test_run_livo_cli_end_to_end(tmp_path):
    from run_livo import derive_mode, main

    seq = synthetic.make_sequence(
        duration=2.0, lidar_hz=10.0, imu_hz=200.0, seed=5, n_lines=12,
        n_per_line=400, render=False, fov_deg=360.0)
    seq_dir = tmp_path / "seq"
    dataset.save_sequence(str(seq_dir), seq)

    cfg_yaml = tmp_path / "sensor.yaml"
    cfg_yaml.write_text(yaml.safe_dump({
        "common": {"img_en": 0, "lidar_en": 1},
        "preprocess": {"filter_size_surf": 0.15},
        "lio": {"max_layer": 1},
        "tpu": {"max_points_per_scan": 8192, "max_points_down": 4096,
                "hash_capacity_log2": 15},
    }))

    out = tmp_path / "out"
    summary = main([
        "--config", str(cfg_yaml), "--seq", str(seq_dir),
        "--out", str(out), "--pcd", "--checkpoint",
        str(tmp_path / "ck.npz"),
    ])

    assert summary["mode"] == "only_lio"  # derived from img_en: 0
    assert summary["frames"] >= 12
    assert summary["ate_rmse_m"] < 0.06
    assert "drift_pct" in summary and "rpe_1s_m" in summary
    assert os.path.exists(out / "trajectory.txt")
    assert os.path.exists(out / "cloud.pcd")
    assert summary["pcd_points"] > 0  # geometry-only accumulation
    assert os.path.exists(tmp_path / "ck.npz")

    rows = np.loadtxt(out / "trajectory.txt")
    assert rows.shape[1] == 8 and len(rows) == summary["frames"]

    # mode derivation for the other flag combos
    from fast_livo2_tpu.utils.config import LIVOConfig

    c = LIVOConfig()
    c.imu.imu_en = False
    assert derive_mode(c) == "only_lo"
    c = LIVOConfig()
    assert derive_mode(c) == "livo"
