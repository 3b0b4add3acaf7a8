"""Distributed sliding-window map/pose refinement (new capability).

The reference is strictly causal: each scan is matched once against the
incremental map and never revisited (SURVEY.md §5: no checkpoint, no
backend). This module adds the north-star batch backend: a window of K
keyframes (pose + downsampled body-frame scan) is refined by alternating

  (1) map rebuild: all keyframes' world points accumulated into a fresh
      voxel plane map (one batched update_map over the flattened window);
  (2) pose refinement: per-keyframe 6-DoF Gauss-Newton against the shared
      map (vmapped over keyframes, each iteration one match_planes +
      6x6 solve).

The coupling between keyframes flows through the shared map, so step (2)
is embarrassingly parallel over keyframes — the distribution axis. On a
device mesh, shard the keyframe axis: step (2) runs fully parallel, and
step (1)'s scatter-adds into the replicated map become the only
cross-device reduction (inserted by XLA's SPMD partitioner — the
scaling-book recipe, see parallel/sharding.py). Scaling efficiency is
then bounded by the map-rebuild reduction, which is O(map), not O(window).

Use cases: trajectory smoothing after a run, loop-region polish, and
multi-host map building from partitioned sequences.
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import voxel_map as vm
from ..core.lio import calc_body_cov
from ..ops import so3
from ..ops.precision import hi_precision


class Window(NamedTuple):
    """K keyframes with fixed-size downsampled scans."""

    rot: jnp.ndarray  # (K, 3, 3) world-from-body
    pos: jnp.ndarray  # (K, 3)
    scans: jnp.ndarray  # (K, N, 3) body-frame points
    valid: jnp.ndarray  # (K, N)


def _world_points(window: Window):
    pts_w = jnp.einsum("kij,knj->kni", window.rot, window.scans) + window.pos[:, None, :]
    return pts_w


@hi_precision
def _refine_pose_one(rot, pos, scan, valid, vmap_state, map_cfg: vm.VoxelMapConfig,
                     iters: int, dept_err: float, beam_err: float):
    """Per-keyframe 6-DoF Gauss-Newton against the shared plane map."""
    body_cov6 = vm.sym6(calc_body_cov(scan, dept_err, beam_err))

    def gn(carry, _):
        rot, pos = carry
        pts_w = scan @ rot.T + pos
        var_w6 = body_cov6  # pose-uncertainty-free weighting for the batch pass
        match = vm.match_planes(vmap_state, pts_w, var_w6, valid, map_cfg)
        use = match.valid & valid
        n = match.normal
        # r = n·(Exp(δθ) R p + t + δt) + d: dr/dδθ = ((R p) × n),
        # dr/dδt = n (left/world-frame perturbation).
        Jr = jnp.cross(pts_w - pos, n)  # (R p) x n
        H = jnp.concatenate([Jr, n], axis=-1)  # (N, 6)
        w = jnp.where(use, 1.0 / (1e-3 + match.sigma_plane + vm.quad6(body_cov6, n)), 0.0)
        HtH = jnp.einsum("ni,n,nj->ij", H, w, H) + jnp.eye(6) * 1e-6
        Htz = jnp.einsum("ni,n,n->i", H, w, -match.dist)
        sol = jnp.linalg.solve(HtH, Htz)
        rot = so3.exp(sol[0:3]) @ rot  # left perturbation (world frame)
        pos = pos + sol[3:6]
        return (rot, pos), jnp.sum(use)

    (rot, pos), n_used = jax.lax.scan(gn, (rot, pos), None, length=iters)
    return rot, pos, n_used[-1]


def refine_window(window: Window, map_cfg: vm.VoxelMapConfig,
                  outer_iters: int = 2, gn_iters: int = 3,
                  dept_err: float = 0.02, beam_err: float = 0.05,
                  mesh=None):
    """Alternate map rebuild / pose refinement. Returns (window, n_used
    (K,)). Shard `window` arrays on the leading K axis over a mesh for
    multi-device execution (see tests/test_ba.py)."""
    K, N, _ = window.scans.shape

    n_used = jnp.zeros((K,), jnp.int32)
    for _ in range(outer_iters):
        pts_w = _world_points(window).reshape(K * N, 3)
        body6 = vm.sym6(
            calc_body_cov(window.scans.reshape(K * N, 3), dept_err, beam_err)
        )
        m = vm.make_map(map_cfg)
        m = vm.update_map(m, pts_w, body6, window.valid.reshape(K * N),
                          map_cfg, mesh=mesh)

        rot, pos, n_used = jax.vmap(
            lambda r, p, s, v: _refine_pose_one(
                r, p, s, v, m, map_cfg, gn_iters, dept_err, beam_err
            )
        )(window.rot, window.pos, window.scans, window.valid)
        rot = so3.normalize_rotation(rot)
        window = window._replace(rot=rot, pos=pos)
    return window, n_used


def _is_ready(arr) -> bool:
    """True when a device array's computation has completed (async
    dispatch future). Falls back to True where the runtime lacks
    is_ready (then the consumer's np.asarray blocks, which is still
    correct, just synchronous)."""
    try:
        return arr.is_ready()
    except AttributeError:
        return True


class OnlineRefiner:
    """Sliding-window refinement running BEHIND the causal front-end
    (SURVEY §2.3 north star; the reference has no backend at all).

    submit() dispatches the whole refine_window program chain
    asynchronously — the device executes it in the idle gaps between
    frame programs (single chip) or on its own mesh devices (sharded), and
    the host never blocks on it. poll() hands back the refined poses
    only once the device has actually finished them, so the front-end's
    frame cadence is never stalled by the backend. The pipeline consumes
    results double-buffered: refine window k while the filter runs
    frames of window k+1, then feed the newest keyframe's pose delta
    back (LIVOPipeline._consume_refine)."""

    def __init__(self, map_cfg: vm.VoxelMapConfig, outer_iters: int = 2,
                 gn_iters: int = 2, dept_err: float = 0.02,
                 beam_err: float = 0.05, mesh=None):
        self.map_cfg = map_cfg
        self.outer_iters = outer_iters
        self.gn_iters = gn_iters
        self.dept_err = dept_err
        self.beam_err = beam_err
        self.mesh = mesh
        self._pending: Optional[Tuple] = None  # (meta, refined Window)
        # ONE dispatch per submit: eager refine_window would issue its
        # whole GN chain op-by-op on the submitting frame's host thread
        # (~1 ms per dispatch on the remote relay — the opposite of
        # "never stalls the front-end").
        self._refine_jit = jax.jit(lambda w: refine_window(
            w, map_cfg, outer_iters=outer_iters, gn_iters=gn_iters,
            dept_err=dept_err, beam_err=beam_err, mesh=mesh))

    @property
    def busy(self) -> bool:
        return self._pending is not None

    def submit(self, window: Window, meta=None) -> bool:
        """Dispatch one window refinement (non-blocking). Returns False
        while a previous refinement is pending — in flight OR completed
        but not yet poll()ed (overwriting a completed result would lose
        it; poll first). Dropped submissions are fine: the next stride
        covers these keyframes too."""
        if self._pending is not None:
            return False
        refined, _ = self._refine_jit(window)
        self._pending = (meta, refined)
        return True

    def poll(self, force: bool = False):
        """(meta, rot (K,3,3) np, pos (K,3) np) once the refinement has
        completed on device; None while still running (or idle).
        force=True blocks for the result (end of stream)."""
        if self._pending is None:
            return None
        meta, refined = self._pending
        if not force and not _is_ready(refined.pos):
            return None
        self._pending = None
        return meta, np.asarray(refined.rot), np.asarray(refined.pos)
