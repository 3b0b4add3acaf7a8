"""Synthetic LIVO sequence generator (host-side numpy).

Stands in for the reference's rosbag replay datasets (SURVEY.md §4:
verification there is dataset replay + trajectory ATE; no bags ship with
this environment). Generates a textured box room, an analytic smooth
trajectory through it, and exact sensor streams:

- IMU: exact angular rate / specific force from the trajectory derivative
  (finite differences at high rate), plus bias + white noise;
- LiDAR: ray-plane intersections from poses interpolated *within* each
  scan (so motion distortion is real and undistortion is exercised), with
  range noise;
- Camera: ray-traced plane intersections shaded by a smooth procedural
  texture, with per-frame exposure variation if requested.

Ground-truth poses come back alongside for ATE computation.
"""

from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np


@dataclass
class Plane:
    point: np.ndarray  # a point on the plane
    normal: np.ndarray  # unit normal (pointing into the room)
    u_axis: np.ndarray  # texture axes
    v_axis: np.ndarray
    tex_seed: int = 0


def default_room(half: float = 6.0, height: float = 3.0) -> List[Plane]:
    z0, z1 = -1.5, height - 1.5
    e = np.eye(3)
    return [
        Plane(np.array([0, 0, z0]), e[2], e[0], e[1], 1),     # floor
        Plane(np.array([0, 0, z1]), -e[2], e[0], e[1], 2),    # ceiling
        Plane(np.array([half, 0, 0]), -e[0], e[1], e[2], 3),  # +x wall
        Plane(np.array([-half, 0, 0]), e[0], e[1], e[2], 4),  # -x wall
        Plane(np.array([0, half, 0]), -e[1], e[0], e[2], 5),  # +y wall
        Plane(np.array([0, -half, 0]), e[1], e[0], e[2], 6),  # -y wall
    ]


def texture(u: np.ndarray, v: np.ndarray, seed: int) -> np.ndarray:
    """Smooth procedural intensity in [30, 225]; band-limited so bilinear
    sampling and image gradients behave like a natural image."""
    rng = np.random.default_rng(seed)
    val = np.zeros_like(u)
    for k in range(6):
        fu, fv = rng.uniform(0.3, 3.0, 2)
        ph_u, ph_v = rng.uniform(0, 2 * np.pi, 2)
        amp = rng.uniform(0.3, 1.0)
        val = val + amp * np.sin(fu * u * 2 * np.pi + ph_u) * np.sin(fv * v * 2 * np.pi + ph_v)
    return 128.0 + 40.0 * val / 2.2


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def _exp(w):
    th = np.linalg.norm(w)
    K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if th < 1e-12:
        return np.eye(3) + K
    return np.eye(3) + np.sin(th) / th * K + (1 - np.cos(th)) / th**2 * (K @ K)


@dataclass
class Trajectory:
    """Smooth analytic trajectory: sinusoidal translation + yaw sweep with
    small roll/pitch oscillation."""

    pos_amp: np.ndarray = field(default_factory=lambda: np.array([1.5, 1.2, 0.3]))
    pos_freq: np.ndarray = field(default_factory=lambda: np.array([0.25, 0.17, 0.4]))
    yaw_rate: float = 0.25  # rad/s mean yaw sweep
    rp_amp: float = 0.06

    def pose(self, t: float):
        w = 2 * np.pi * self.pos_freq
        p = self.pos_amp * np.sin(w * t)
        yaw = self.yaw_rate * t + 0.2 * np.sin(0.7 * t)
        roll = self.rp_amp * np.sin(1.1 * t)
        pitch = self.rp_amp * np.sin(0.9 * t + 1.0)
        R = _rotz(yaw) @ _exp(np.array([roll, pitch, 0.0]))
        return R, p

    def vel(self, t: float, eps=1e-4):
        _, p0 = self.pose(t - eps)
        _, p1 = self.pose(t + eps)
        return (p1 - p0) / (2 * eps)


GRAVITY = 9.81


def imu_stream(traj: Trajectory, t0: float, t1: float, hz: float, rng,
               gyr_noise=1e-3, acc_noise=1e-2, bias_g=None, bias_a=None):
    """Exact IMU from trajectory finite differences (body frame)."""
    bias_g = np.zeros(3) if bias_g is None else bias_g
    bias_a = np.zeros(3) if bias_a is None else bias_a
    stamps = np.arange(t0, t1, 1.0 / hz)
    eps = 1e-4
    gyr, acc = [], []
    g_w = np.array([0, 0, -GRAVITY])
    for t in stamps:
        R, _ = self_pose = traj.pose(t)
        Rm, _ = traj.pose(t - eps)
        Rp, _ = traj.pose(t + eps)
        dR = R.T @ (Rp - Rm) / (2 * eps)  # R^T Ṙ = [w]_x
        w = np.array([dR[2, 1] - dR[1, 2], dR[0, 2] - dR[2, 0], dR[1, 0] - dR[0, 1]]) / 2
        a_w = (traj.vel(t + eps) - traj.vel(t - eps)) / (2 * eps)
        f_b = R.T @ (a_w - g_w)
        gyr.append(w + bias_g + rng.normal(size=3) * gyr_noise)
        acc.append(f_b + bias_a + rng.normal(size=3) * acc_noise)
    return stamps, np.array(gyr), np.array(acc)


def ray_hits(origins: np.ndarray, dirs: np.ndarray, planes: List[Plane]):
    """Nearest positive ray-plane hit. origins/dirs (N, 3). Returns
    (t (N,), plane_idx (N,), hit mask)."""
    n = origins.shape[0]
    best_t = np.full(n, np.inf)
    best_i = np.full(n, -1, np.int32)
    for i, pl in enumerate(planes):
        denom = dirs @ pl.normal
        num = (pl.point - origins) @ pl.normal
        with np.errstate(divide="ignore", invalid="ignore"):
            t = num / denom
        ok = (denom < -1e-9) & (t > 0.05) & (t < best_t)
        best_t = np.where(ok, t, best_t)
        best_i = np.where(ok, i, best_i)
    hit = best_i >= 0
    return np.where(hit, best_t, 0.0), best_i, hit


def lidar_scan(traj: Trajectory, planes, t_begin: float, period: float,
               n_lines: int, n_per_line: int, rng, range_noise=0.01,
               fov_deg=70.0):
    """One motion-distorted scan: ray directions sweep azimuth over the
    scan period from poses at each point's own timestamp. Returns
    (points_body (N, 3), t_offs (N,) seconds from t_begin)."""
    n = n_lines * n_per_line
    frac = np.tile(np.linspace(0, 1, n_per_line, endpoint=False), n_lines)
    az = (frac - 0.5) * np.deg2rad(fov_deg)
    el = np.repeat(np.linspace(-0.35, 0.35, n_lines), n_per_line)
    d_body = np.stack(
        [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)], axis=-1
    )
    t_offs = frac * period
    # Pose per point (chunked by unique offsets for speed)
    pts_body = np.zeros((n, 3))
    hit_all = np.zeros(n, bool)
    for f in np.unique(t_offs):
        m = t_offs == f
        R, p = traj.pose(t_begin + f)
        o = np.broadcast_to(p, (m.sum(), 3))
        dirs = d_body[m] @ R.T
        t, pi, hit = ray_hits(o, dirs, planes)
        pw = o + dirs * t[:, None]
        r = t + rng.normal(size=t.shape) * range_noise
        pb = (d_body[m] * r[:, None])
        pts_body[m] = pb
        hit_all[m] = hit
    return pts_body[hit_all].astype(np.float32), t_offs[hit_all].astype(np.float32)


def render_image(traj: Trajectory, planes, t: float, cam, exposure: float = 1.0,
                 R_ci=None, P_ci=None):
    """Ray-traced grayscale image (H, W) float32 from the camera pose at
    time t (camera extrinsics R_ci/P_ci: x_cam = R_ci x_imu + P_ci)."""
    R_ci = np.eye(3) if R_ci is None else R_ci
    P_ci = np.zeros(3) if P_ci is None else P_ci
    R_wi, p_wi = traj.pose(t)
    # camera-from-world: x_c = R_ci (R_wi^T (x_w - p)) + P_ci
    R_cw = R_ci @ R_wi.T
    t_cw = -R_cw @ p_wi + P_ci
    R_wc = R_cw.T
    cam_origin = -R_wc @ t_cw

    ys, xs = np.meshgrid(np.arange(cam.height), np.arange(cam.width), indexing="ij")
    u = (xs - cam.cx) / cam.fx
    v = (ys - cam.cy) / cam.fy
    d_cam = np.stack([u, v, np.ones_like(u)], axis=-1).reshape(-1, 3)
    d_cam /= np.linalg.norm(d_cam, axis=-1, keepdims=True)
    d_w = d_cam @ R_wc.T
    o = np.broadcast_to(cam_origin, d_w.shape)
    tt, pi, hit = ray_hits(o, d_w, planes)
    pw = o + d_w * tt[:, None]
    img = np.full(d_w.shape[0], 90.0)
    for i, pl in enumerate(planes):
        m = hit & (pi == i)
        if not m.any():
            continue
        rel = pw[m] - pl.point
        img[m] = texture(rel @ pl.u_axis, rel @ pl.v_axis, pl.tex_seed)
    img = img * exposure
    return np.clip(img, 0, 255).reshape(cam.height, cam.width).astype(np.float32)


@dataclass
class SyntheticSequence:
    imu_stamps: np.ndarray
    imu_gyr: np.ndarray
    imu_acc: np.ndarray
    scans: List[Tuple[float, np.ndarray, np.ndarray]]  # (t_begin, pts, offs)
    images: List[Tuple[float, np.ndarray]]  # (t, img)
    gt: List[Tuple[float, np.ndarray, np.ndarray]]  # (t, R, p)


# Forward-looking camera mount (camera z = body x, x = -body y,
# y = -body z), the standard optical-frame convention the avia config's
# Rcl approximates (config/avia.yaml Rcl).
R_CI_FORWARD = np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])


def make_sequence(duration=5.0, lidar_hz=10.0, img_hz=10.0, imu_hz=200.0,
                  cam=None, seed=0, n_lines=16, n_per_line=800,
                  still_time=0.6, planes=None, traj=None,
                  render=True, fov_deg=70.0, R_ci=None,
                  P_ci=None, exposure_fn=None) -> SyntheticSequence:
    """Build a full synthetic LIVO sequence. The first `still_time`
    seconds are stationary for IMU static initialization (the reference
    requires imu_int_frame frames of static data, IMU_Processing.cpp:104).
    """
    rng = np.random.default_rng(seed)
    planes = default_room() if planes is None else planes
    traj = Trajectory() if traj is None else traj

    class _Shifted:
        """Trajectory re-parameterized by a C¹ time warp: frozen before
        `still_time`, then a quadratic ramp into unit time rate (so
        velocity is continuous at motion onset — a hard jump would be an
        unbounded acceleration spike that no IMU stream can represent)."""

        RAMP = 1.0

        def _warp(self, t):
            dt = t - still_time
            if dt <= 0:
                return 0.0
            if dt < self.RAMP:
                return dt * dt / (2 * self.RAMP)
            return dt - self.RAMP / 2

        def pose(self, t):
            return traj.pose(self._warp(t))

        def vel(self, t, eps=1e-4):
            _, p0 = self.pose(t - eps)
            _, p1 = self.pose(t + eps)
            return (p1 - p0) / (2 * eps)

    sh = _Shifted()
    stamps, gyr, acc = imu_stream(sh, 0.0, duration, imu_hz, rng)
    # The reference scales raw acc by G/|mean_acc| — emit acc in m/s^2 so
    # mean_acc_norm ≈ G and the scaling is identity.

    scans = []
    t = 0.05
    while t + 1.0 / lidar_hz < duration:
        pts, offs = lidar_scan(sh, planes, t, 1.0 / lidar_hz, n_lines,
                               n_per_line, rng, fov_deg=fov_deg)
        scans.append((t, pts, offs))
        t += 1.0 / lidar_hz

    images = []
    if render and cam is not None:
        R_ci_ = R_CI_FORWARD if R_ci is None else R_ci
        P_ci_ = np.zeros(3) if P_ci is None else P_ci
        t = 0.1
        while t < duration:
            expo = exposure_fn(t) if exposure_fn is not None else 1.0
            images.append((t, render_image(sh, planes, t, cam, exposure=expo,
                                           R_ci=R_ci_, P_ci=P_ci_)))
            t += 1.0 / img_hz

    gt = []
    for t in np.arange(0.0, duration, 0.02):
        R, p = sh.pose(t)
        gt.append((t, R, p))
    return SyntheticSequence(
        imu_stamps=stamps, imu_gyr=gyr, imu_acc=acc, scans=scans,
        images=images, gt=gt,
    )


def ate_rmse(est: List[Tuple[float, np.ndarray]], gt: List[Tuple[float, np.ndarray, np.ndarray]]):
    """ATE RMSE (m) of estimated positions vs interpolated ground truth,
    after aligning the first pose (the sequences share a world frame up to
    the initial-gravity yaw, which the shared still-start fixes)."""
    gt_t = np.array([g[0] for g in gt])
    gt_p = np.array([g[2] for g in gt])
    errs = []
    for t, p in est:
        i = np.clip(np.searchsorted(gt_t, t), 1, len(gt_t) - 1)
        w = (t - gt_t[i - 1]) / max(gt_t[i] - gt_t[i - 1], 1e-9)
        p_gt = gt_p[i - 1] * (1 - w) + gt_p[i] * w
        errs.append(p - p_gt)
    errs = np.array(errs)
    return float(np.sqrt(np.mean(np.sum(errs**2, axis=-1))))
