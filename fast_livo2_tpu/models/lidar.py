"""Per-vendor LiDAR decode / preprocess, vectorized (host-side numpy).

Replaces the reference Preprocess class (include/preprocess.h:150-196,
src/preprocess.cpp) for the offline pipeline: each handler takes the
structured arrays a rosbag converter produces for that vendor's point
type and returns (points (N, 3) float32 body-frame, t_offs (N,) float32
seconds from scan begin), after the same filtering the reference applies:
1-in-N point decimation (`point_filter_num`), blind-radius rejection, NaN
rejection, and monotonic-time repair for wrap-around
(preprocess.cpp:95-744). The LOAM-style planar feature-extraction path
(give_feature, :746-980; default-off in every bundled config) is
provided by `extract_surf_features` below.

LID_TYPE numbering follows common_lib.h:38-47.
"""

from typing import Dict, Tuple

import numpy as np

AVIA, VELO16, OUST64, L515, XT32, PANDAR128, ROBOSENSE = 1, 2, 3, 4, 5, 6, 7


def _base_filter(pts: np.ndarray, offs: np.ndarray, blind: float,
                 filter_num: int) -> Tuple[np.ndarray, np.ndarray]:
    keep = np.isfinite(pts).all(axis=1)
    keep &= (pts * pts).sum(axis=1) > blind * blind
    idx = np.flatnonzero(keep)
    if filter_num > 1:
        idx = idx[::filter_num]
    return pts[idx].astype(np.float32), offs[idx].astype(np.float32)


def decode_avia(fields: Dict[str, np.ndarray], blind: float = 0.8,
                filter_num: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    """Livox CustomMsg points (avia_handler, preprocess.cpp:95-201):
    keeps returns with tag bits 0x30 in {0x00, 0x10}, offset_time is ns."""
    pts = np.stack([fields["x"], fields["y"], fields["z"]], axis=-1)
    offs = fields["offset_time"].astype(np.float64) * 1e-9
    if "tag" in fields:
        tag = fields["tag"].astype(np.uint8)
        good = ((tag & 0x30) == 0x10) | ((tag & 0x30) == 0x00)
        pts, offs = pts[good], offs[good]
    return _base_filter(pts, offs, blind, filter_num)


def decode_ouster(fields: Dict[str, np.ndarray], blind: float = 0.8,
                  filter_num: int = 1, time_offset: float = 0.0):
    """Ouster OS points (oust64_handler, preprocess.cpp:243-342): per-point
    `t` is ns from scan begin; an optional constant lidar_time_offset is
    added (NTU-VIRAL uses -0.1s, config/NTU_VIRAL.yaml)."""
    pts = np.stack([fields["x"], fields["y"], fields["z"]], axis=-1)
    offs = fields["t"].astype(np.float64) * 1e-9 + time_offset
    return _base_filter(pts, offs, blind, filter_num)


def decode_velodyne(fields: Dict[str, np.ndarray], blind: float = 0.8,
                    filter_num: int = 1, scan_rate: float = 10.0):
    """Velodyne points (velodyne_handler, preprocess.cpp:346-512): the
    `time` field is seconds relative to scan begin (or end — negative
    values are rebased); if absent, azimuth-unwound offsets are computed
    from the yaw angle at `scan_rate` Hz like the reference's
    given_offset_time=false path."""
    pts = np.stack([fields["x"], fields["y"], fields["z"]], axis=-1)
    if "time" in fields:
        offs = fields["time"].astype(np.float64)
        if len(offs) and offs.min() < -1e-6:
            offs = offs - offs.min()
    else:
        yaw = np.degrees(np.arctan2(fields["y"], fields["x"]))
        omega = 0.361 * scan_rate  # deg/ms (preprocess.cpp:365)
        ring = fields.get("ring", np.zeros(len(yaw), np.int32))
        offs = np.zeros(len(yaw))
        for r in np.unique(ring):
            m = ring == r
            y = yaw[m]
            dy = np.diff(y, prepend=y[0] if len(y) else 0.0)
            dy = np.where(dy > 180, dy - 360, np.where(dy < -180, dy + 360, dy))
            unw = np.cumsum(dy)
            offs[m] = -unw / omega * 1e-3
        offs = offs - offs.min() if len(offs) else offs
    return _base_filter(pts, offs, blind, filter_num)


def decode_xt32(fields: Dict[str, np.ndarray], blind: float = 0.8,
                filter_num: int = 1):
    """Hesai XT32 (xt32_handler, preprocess.cpp:566-708): absolute
    `timestamp` seconds per point; offsets rebased to the scan's first."""
    pts = np.stack([fields["x"], fields["y"], fields["z"]], axis=-1)
    ts = fields["timestamp"].astype(np.float64)
    offs = ts - (ts.min() if len(ts) else 0.0)
    return _base_filter(pts, offs, blind, filter_num)


def decode_pandar128(fields, blind: float = 0.8, filter_num: int = 1):
    """Pandar128 (Pandar128_handler, preprocess.cpp:514-564): same
    absolute-timestamp convention as XT32."""
    return decode_xt32(fields, blind, filter_num)


def decode_robosense(fields, blind: float = 0.8, filter_num: int = 1):
    """Robosense (robosense_handler, preprocess.cpp:710-744)."""
    return decode_xt32(fields, blind, filter_num)


def decode_l515(fields, blind: float = 0.1, filter_num: int = 1):
    """Realsense L515 (l515_handler, preprocess.cpp:203-241): no per-point
    time (solid state, negligible distortion)."""
    pts = np.stack([fields["x"], fields["y"], fields["z"]], axis=-1)
    offs = np.zeros(len(pts))
    return _base_filter(pts, offs, blind, filter_num)


_DECODERS = {
    AVIA: decode_avia,
    VELO16: decode_velodyne,
    OUST64: decode_ouster,
    L515: decode_l515,
    XT32: decode_xt32,
    PANDAR128: decode_pandar128,
    ROBOSENSE: decode_robosense,
}


def decode(lidar_type: int, fields: Dict[str, np.ndarray], **kw):
    """Dispatch on LID_TYPE (Preprocess::process, preprocess.cpp:54-93)."""
    return _DECODERS[lidar_type](fields, **kw)


def extract_surf_features(pts: np.ndarray, offs: np.ndarray,
                          ring: np.ndarray = None, group_size: int = 8,
                          disA: float = 0.01, disB: float = 0.1,
                          p2l_ratio: float = 225.0,
                          blind: float = 0.8):
    """LOAM-style planar-feature selection, vectorized (the reference's
    optional feature path: give_feature/plane_judge,
    preprocess.cpp:746-1097; `feature_extract_enabled`, default off in
    every shipped config).

    For each point, fit the chord over its `group_size` forward neighbors
    along the scan line and accept the group as planar when the maximum
    point-to-chord distance is small relative to the chord length
    (the reference's two-point distance / point-to-line ratio test with
    range-adaptive threshold disA*range + disB). Edge/jump classification
    is omitted — the reference only feeds *surf* points to the LIO filter.

    Returns a boolean keep-mask over pts.
    """
    n = len(pts)
    if n < group_size + 2:
        return np.ones(n, bool)
    if ring is None:
        ring = np.zeros(n, np.int32)
    keep = np.zeros(n, bool)
    order = np.lexsort((offs, ring))
    p = pts[order]
    r = ring[order]
    # forward chord over the group
    g = group_size
    head = p[: n - g]
    tail = p[g:]
    chord = tail - head
    chord_len2 = (chord * chord).sum(-1) + 1e-12
    # max point-to-chord distance within the group
    maxd2 = np.zeros(n - g)
    for j in range(1, g):
        q = p[j : n - g + j] - head
        cross = np.cross(q, chord)
        d2 = (cross * cross).sum(-1) / chord_len2
        maxd2 = np.maximum(maxd2, d2)
    rng2 = (head * head).sum(-1)
    same_ring = r[: n - g] == r[g:]
    thr = (disA * np.sqrt(rng2) + disB) ** 2
    planar = (maxd2 * p2l_ratio < chord_len2) & (maxd2 < thr) & same_ring
    km = np.zeros(n, bool)
    for j in range(g):
        km[j : n - g + j][planar] = True
    keep[order] = km
    keep &= (pts * pts).sum(-1) > blind * blind
    return keep


def extract_edge_features(pts: np.ndarray, offs: np.ndarray,
                          ring: np.ndarray = None, blind: float = 0.8,
                          inf_bound: float = 10.0, edgea: float = 2.0,
                          edgeb: float = 0.1):
    """LOAM-style edge/jump corner selection, vectorized (the reference's
    Edge_Jump classification in give_feature, preprocess.cpp:858-915 +
    edge_jump_judge :1099-1126; default-off like the surf path — the LIO
    filter consumes surf points only, corners exist for tooling parity).

    Behavior captured: each in-ring point classifies both neighbors by
    the cosine between its own ray and the neighbor chord — near 180°
    means the neighbor jumps toward the sensor, near 0° away; a point is
    an edge when one side is a regular surface and the other jumps (or
    leaves the ring past `inf_bound`), the jump gap dominates the local
    spacing (>0.15 m and 4x the far-side spacing), the two chords are not
    collinear (occlusion check, >cos160°), and the two spacings *behind*
    the regular side are mutually consistent (d1 <= edgea*d2 and
    d1-d2 <= edgeb — a real corner sits on a clean scan line, not noise).

    Returns a boolean edge mask over pts.
    """
    n = len(pts)
    if n < 7:
        return np.zeros(n, bool)
    if ring is None:
        ring = np.zeros(n, np.int32)
    order = np.lexsort((offs, ring))
    p = pts[order].astype(np.float64)
    r = ring[order]
    rng = np.linalg.norm(p, axis=-1)

    # consecutive spacing^2 dista[i] = |p[i+1]-p[i]|^2 (invalid across rings)
    dista = np.full(n, np.inf)
    dd = p[1:] - p[:-1]
    dista[:-1] = (dd * dd).sum(-1)
    dista[:-1][r[1:] != r[:-1]] = np.inf

    def shift(a, k, fill):
        out = np.full(a.shape, fill, dtype=a.dtype if a.dtype != bool else bool)
        if k > 0:
            out[k:] = a[:-k]
        elif k < 0:
            out[:k] = a[-k:]
        else:
            out = a.copy()
        return out

    NOR, ZERO, N180, INF, BLIND = 0, 1, 2, 3, 4
    cos170 = np.cos(np.deg2rad(170.0))
    cos8 = np.cos(np.deg2rad(8.0))
    cos160 = np.cos(np.deg2rad(160.0))

    def classify(m):  # m = -1 (Prev) or +1 (Next)
        q = shift(p, -m, 0.0) if m > 0 else shift(p, 1, 0.0)
        same = shift(r, -m, -1) == r
        vec = q - p
        nv = np.linalg.norm(vec, axis=-1)
        cosang = (p * vec).sum(-1) / np.maximum(rng * nv, 1e-12)
        nb_rng = np.linalg.norm(q, axis=-1)
        cls = np.full(n, NOR, np.int32)
        cls[cosang < cos170] = N180
        cls[cosang > cos8] = ZERO
        nb_blind = (nb_rng < blind) | ~same
        cls[nb_blind & (rng > inf_bound)] = INF
        cls[nb_blind & (rng <= inf_bound)] = BLIND
        return cls, vec

    cprev, vprev = classify(-1)
    cnext, vnext = classify(+1)
    inter = (vprev * vnext).sum(-1) / np.maximum(
        np.linalg.norm(vprev, axis=-1) * np.linalg.norm(vnext, axis=-1), 1e-12
    )

    d_im2, d_im1 = shift(dista, 2, np.inf), shift(dista, 1, np.inf)
    d_i, d_ip1 = dista, shift(dista, -1, np.inf)
    r_ok = rng >= blind

    def judge(nor_dir):
        """edge_jump_judge: the two spacings behind the regular side must
        be mutually consistent."""
        if nor_dir == 0:  # Prev side regular
            ok = (shift(rng, 1, 0.0) >= blind) & (shift(rng, 2, 0.0) >= blind)
            a, b = d_im1, d_im2
        else:  # Next side regular
            ok = (shift(rng, -1, 0.0) >= blind) & (shift(rng, -2, 0.0) >= blind)
            a, b = d_i, d_ip1
        d1 = np.sqrt(np.minimum(np.maximum(a, b), 1e18))
        d2 = np.sqrt(np.minimum(np.minimum(a, b), 1e18))
        fin = np.isfinite(a) & np.isfinite(b)
        return ok & fin & (d1 <= edgea * d2) & (d1 - d2 <= edgeb)

    jp, jn = judge(0), judge(1)
    edge = (
        ((cprev == NOR) & (cnext == ZERO) & (d_i > 0.0225)
         & (d_i > 4 * d_im1) & (inter > cos160) & jp)
        | ((cprev == ZERO) & (cnext == NOR) & (d_im1 > 0.0225)
           & (d_im1 > 4 * d_i) & (inter > cos160) & jn)
        | ((cprev == NOR) & (cnext == INF) & jp)
        | ((cprev == INF) & (cnext == NOR) & jn)
    ) & r_ok
    # ring boundaries (first/last 3 per ring) are never edges
    for k in (1, 2, 3):
        edge &= (shift(r, k, -1) == r) & (shift(r, -k, -1) == r)
    out = np.zeros(n, bool)
    out[order] = edge
    return out
