"""Rosbag-converter core (scripts/convert_rosbag.py::build_sequence)
exercised with faked ROS messages — the rosbags package is absent from
this image, so the reader shell is mocked and the conversion plumbing
(PointCloud2 struct decode, livox CustomMsg decode, IMU accumulation,
raw-image decode, t0 rebase, npz round trip) is covered for real."""

import sys
from pathlib import Path
from types import SimpleNamespace as NS

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from convert_rosbag import build_sequence  # noqa: E402

from fast_livo2_tpu.io.dataset import load_sequence, save_sequence  # noqa: E402


def _imu_msg(w, a):
    return NS(angular_velocity=NS(x=w[0], y=w[1], z=w[2]),
              linear_acceleration=NS(x=a[0], y=a[1], z=a[2]))


def _livox_msg(pts, offs_ns):
    return NS(points=[NS(x=float(p[0]), y=float(p[1]), z=float(p[2]),
                         offset_time=int(o), tag=0x10)
                      for p, o in zip(pts, offs_ns)])


def _pc2_msg(pts, t_rel):
    """Ouster-style PointCloud2: x y z f4 + t u4 (ns)."""
    n = len(pts)
    dt = np.dtype({"names": ["x", "y", "z", "t"],
                   "formats": ["f4", "f4", "f4", "u4"],
                   "offsets": [0, 4, 8, 12], "itemsize": 16})
    arr = np.zeros(n, dt)
    arr["x"], arr["y"], arr["z"] = pts[:, 0], pts[:, 1], pts[:, 2]
    arr["t"] = (t_rel * 1e9).astype(np.uint64)
    fields = [NS(name=nm, datatype=7 if nm != "t" else 6, offset=off)
              for nm, off in zip(dt.names, [0, 4, 8, 12])]
    return NS(fields=fields, point_step=16, width=n, height=1,
              data=arr.tobytes())


def _img_msg(img):
    h, w = img.shape
    return NS(height=h, width=w, step=w, data=img.tobytes())


def test_build_sequence_livox_and_images(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.uniform(2, 5, (300, 3)).astype(np.float32)
    offs = np.linspace(0, 0.1, 300) * 1e9
    img = rng.integers(0, 255, (8, 12), dtype=np.uint8)
    base = 1000.0
    records = [
        ("imu", "sensor_msgs/msg/Imu", base + 0.005 * i,
         _imu_msg([0.01, 0, 0], [0, 0, 9.81])) for i in range(20)
    ] + [
        ("lidar", "livox_ros_driver/msg/CustomMsg", base + 0.02,
         _livox_msg(pts, offs)),
        ("image", "sensor_msgs/msg/Image", base + 0.07, _img_msg(img)),
    ]
    seq = build_sequence(records, lidar_type=1, blind=0.8, filter_num=1)
    # t0 rebase: earliest message (imu at base) -> 0
    assert seq.imu_stamps[0] == 0.0
    np.testing.assert_allclose(seq.scans[0][0], 0.02)
    np.testing.assert_allclose(seq.images[0][0], 0.07)
    assert len(seq.scans[0][1]) == 300  # all beyond blind, tag accepted
    np.testing.assert_allclose(seq.scans[0][2][-1], 0.1, atol=1e-6)
    np.testing.assert_array_equal(seq.images[0][1], img)
    np.testing.assert_allclose(seq.imu_acc[0], [0, 0, 9.81])

    # npz round trip through io.dataset
    save_sequence(str(tmp_path / "s"), seq)
    back = load_sequence(str(tmp_path / "s"))
    np.testing.assert_allclose(back.scans[0][1], seq.scans[0][1], atol=1e-6)
    assert len(back.images) == 1


def test_build_sequence_pointcloud2_ouster():
    rng = np.random.default_rng(1)
    pts = rng.uniform(2, 5, (200, 3)).astype(np.float32)
    near = np.array([[0.1, 0.1, 0.1]], np.float32)  # inside blind radius
    t_rel = np.linspace(0, 0.1, 201)
    msg = _pc2_msg(np.concatenate([pts, near]), t_rel)
    records = [("lidar", "sensor_msgs/msg/PointCloud2", 5.0, msg)]
    seq = build_sequence(records, lidar_type=3, blind=0.8, filter_num=1)
    assert len(seq.scans[0][1]) == 200  # blind point dropped
    np.testing.assert_allclose(
        np.linalg.norm(seq.scans[0][1], axis=1),
        np.linalg.norm(pts, axis=1), atol=1e-5)
