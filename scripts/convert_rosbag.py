#!/usr/bin/env python3
"""Convert a ROS1 bag to the npz sequence layout of io/dataset.py.

One-time offline conversion replacing the reference's live rosbag replay
(README.md "rosbag play"). Dependency-free: the bag container and the
FAST-LIVO2 message set are parsed by fast_livo2_tpu.io.rosbag (r5 —
previously this shell required the external `rosbags` package, the one
untested link in the real-data path). If `rosbags` IS installed it is
used instead (it covers more codecs, e.g. lz4 chunks and ROS2 bags).
The message-processing core (`build_sequence`) is reader-independent and
covered by tests/test_convert.py; the whole bag->npz->run chain is
covered end-to-end by tests/test_rosbag_end_to_end.py on a real bag
file written by fast_livo2_tpu.io.rosbag.write_bag.

Usage:
  python scripts/convert_rosbag.py <bag> <out_dir> \
      --lidar-type 1 --lid-topic /livox/lidar --imu-topic /livox/imu \
      --img-topic /left_camera/image [--blind 0.8] [--filter-num 1]

Point decoding is delegated to fast_livo2_tpu.models.lidar (the
vectorized equivalents of the reference's per-vendor handlers).
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def pointcloud2_to_fields(msg):
    """Structured-array view of a PointCloud2 message."""
    names, formats, offsets = [], [], []
    for f in msg.fields:
        dt = {1: "i1", 2: "u1", 3: "i2", 4: "u2", 5: "i4", 6: "u4",
              7: "f4", 8: "f8"}[f.datatype]
        names.append(f.name)
        formats.append(dt)
        offsets.append(f.offset)
    dtype = np.dtype({"names": names, "formats": formats, "offsets": offsets,
                      "itemsize": msg.point_step})
    arr = np.frombuffer(msg.data, dtype=dtype, count=msg.width * msg.height)
    return {n: np.ascontiguousarray(arr[n]) for n in names}


def livox_to_fields(msg):
    """Field dict from a livox CustomMsg (vendored CustomPoint.h layout).
    Fast path: io.rosbag's deserializer exposes the points as one
    structured array (points_arr) — zero per-point Python objects."""
    if hasattr(msg, "points_arr"):
        arr = msg.points_arr
        return {
            "x": np.ascontiguousarray(arr["x"]),
            "y": np.ascontiguousarray(arr["y"]),
            "z": np.ascontiguousarray(arr["z"]),
            "offset_time": arr["offset_time"].astype(np.uint64),
            "tag": np.ascontiguousarray(arr["tag"]),
        }
    return {
        "x": np.array([p.x for p in msg.points], np.float32),
        "y": np.array([p.y for p in msg.points], np.float32),
        "z": np.array([p.z for p in msg.points], np.float32),
        "offset_time": np.array([p.offset_time for p in msg.points],
                                np.uint64),
        "tag": np.array([p.tag for p in msg.points], np.uint8),
    }


def decode_image_msg(msg):
    """sensor_msgs/Image (raw) or CompressedImage -> (H, W[, C]) uint8."""
    if hasattr(msg, "format"):  # CompressedImage
        import cv2
        return cv2.imdecode(np.frombuffer(msg.data, np.uint8),
                            cv2.IMREAD_GRAYSCALE)
    h, w = msg.height, msg.width
    ch = msg.step // w
    return np.frombuffer(msg.data, np.uint8).reshape(h, w, ch).squeeze()


def build_sequence(records, lidar_type: int, blind: float, filter_num: int):
    """Core conversion, independent of the bag reader. `records` yields
    (kind, msgtype, stamp_seconds, msg) with kind in
    {"imu", "lidar", "image"}. Returns an io.dataset.NpzSequence with
    timestamps rebased to the earliest message."""
    from fast_livo2_tpu.io.dataset import NpzSequence
    from fast_livo2_tpu.models import lidar as lidar_mod

    imu_t, gyr, acc = [], [], []
    scans = []
    images = []
    for kind, msgtype, t, msg in records:
        if kind == "imu":
            imu_t.append(t)
            gyr.append([msg.angular_velocity.x, msg.angular_velocity.y,
                        msg.angular_velocity.z])
            acc.append([msg.linear_acceleration.x, msg.linear_acceleration.y,
                        msg.linear_acceleration.z])
        elif kind == "lidar":
            fields = (livox_to_fields(msg) if "CustomMsg" in msgtype
                      else pointcloud2_to_fields(msg))
            pts, offs = lidar_mod.decode(
                lidar_type, fields, blind=blind, filter_num=filter_num)
            scans.append((t, pts, offs))
        else:
            images.append((t, decode_image_msg(msg)))

    t0 = min(
        [imu_t[0] if imu_t else np.inf]
        + [scans[0][0] if scans else np.inf]
        + [images[0][0] if images else np.inf]
    )
    return NpzSequence(
        imu_stamps=np.array(imu_t) - t0,
        imu_gyr=np.array(gyr), imu_acc=np.array(acc),
        scans=[(t - t0, p, o) for t, p, o in scans],
        images=[(t - t0, im) for t, im in images],
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bag")
    ap.add_argument("out")
    ap.add_argument("--lidar-type", type=int, default=1)
    ap.add_argument("--lid-topic", default="/livox/lidar")
    ap.add_argument("--imu-topic", default="/livox/imu")
    ap.add_argument("--img-topic", default="/left_camera/image")
    ap.add_argument("--blind", type=float, default=0.8)
    ap.add_argument("--filter-num", type=int, default=1)
    args = ap.parse_args()

    from fast_livo2_tpu.io.dataset import save_sequence

    kind_of = {args.imu_topic: "imu", args.lid_topic: "lidar",
               args.img_topic: "image"}

    try:
        from rosbags.highlevel import AnyReader
    except ImportError:
        AnyReader = None

    if AnyReader is not None:
        def records():
            with AnyReader([Path(args.bag)]) as reader:
                conns = [c for c in reader.connections if c.topic in kind_of]
                for conn, ts, raw in reader.messages(connections=conns):
                    msg = reader.deserialize(raw, conn.msgtype)
                    t = (msg.header.stamp.sec
                         + msg.header.stamp.nanosec * 1e-9)
                    yield kind_of[conn.topic], conn.msgtype, t, msg
    else:
        from fast_livo2_tpu.io import rosbag as bag_mod

        def records():
            for topic, mtype, t_recv, msg in bag_mod.read_messages(
                    args.bag, topics=list(kind_of)):
                h = getattr(msg, "header", None)
                t = (h.stamp.sec + h.stamp.nanosec * 1e-9) if h else t_recv
                yield kind_of[topic], mtype, t, msg

    seq = build_sequence(records(), args.lidar_type, args.blind,
                         args.filter_num)
    save_sequence(args.out, seq)
    print(f"wrote {args.out}: {len(seq.imu_stamps)} imu, {len(seq.scans)} "
          f"scans, {len(seq.images)} images")


if __name__ == "__main__":
    main()
