"""Batched multi-sequence replay: vmap the whole frame step over B
sequences (SURVEY.md §7 Stage 5).

The causal filter cannot batch across time, but a mapping/serving fleet
processes many *independent* sequences — and one TPU chip runs B of them
in lockstep for nearly the cost of one: every per-frame program (IMU
scan, undistortion, downsample, both ESIKFs, map scatters) is
shape-uniform, so `jax.vmap` lifts it to a (B, ...) batch that fills the
chip. Aggregate frames/sec/chip is the throughput metric this enables
(the reference, one ROS process per sequence, has no equivalent).

Constraints: all sequences share the engine config and a common frame
schedule (same packet count per step — true for fixed-rate sensor rigs),
and IMU noise scaling is shared (static init averaged across the batch).
"""

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..core import imu as imu_mod
from ..core import vio as vio_mod
from ..core import voxel_map as vmap_mod
from ..core.pipeline import LIVOPipeline
from ..core.state import init_cov, init_state, pack_state
from ..utils.config import LIVOConfig


class BatchedPipeline:
    """Run B sequences in lockstep on one chip."""

    def __init__(self, cfg: LIVOConfig, batch: int, slam_mode: str = "livo"):
        self.B = batch
        self.proto = LIVOPipeline(cfg, slam_mode=slam_mode)
        self.cfg = cfg
        self.slam_mode = slam_mode

        def one(packed, mkeys, mrec, mstats, point, obs, obs_patch,
                alloc, imgs, ids, imu_pack, pts_pack, img, fid, first, use_vio):
            vm = vmap_mod.VoxelMap(keys=mkeys, rec=mrec, stats=mstats)
            pool = vio_mod.VisualPool(point=point, obs=obs,
                                      obs_patch=obs_patch, alloc=alloc)
            ring = vio_mod.FrameRing(imgs=imgs, ids=ids)
            out = self.proto._frame_step(
                packed, vm, pool, ring, imu_pack, pts_pack, img, fid,
                first=first, use_vio=use_vio,
            )
            packed, vm, pool, ring, diag = out
            return (packed, vm.keys, vm.rec, vm.stats, pool.point,
                    pool.obs, pool.obs_patch, pool.alloc, ring.imgs, ring.ids,
                    diag)

        self._vstep = jax.jit(
            jax.vmap(one, in_axes=(0,) * 14 + (None, None),
                     out_axes=0),
            static_argnums=(14, 15),
            donate_argnums=tuple(range(1, 10)),
        )

        B = batch

        def tile(x):
            return jnp.broadcast_to(x, (B,) + x.shape).copy()

        self.packed = tile(pack_state(init_state(), init_cov()))
        m = vmap_mod.make_map(self.proto.map_cfg)
        self.mkeys = tile(m.keys)
        self.mrec, self.mstats = tile(m.rec), tile(m.stats)
        p = vio_mod.make_pool(self.proto.vio_cfg)
        self.point, self.obs = tile(p.point), tile(p.obs)
        self.obs_patch, self.alloc = tile(p.obs_patch), tile(p.alloc)
        r = vio_mod.make_ring(self.proto.vio_cfg, self.proto.cam)
        self.imgs, self.ids = tile(r.imgs), tile(r.ids)

    def process(self, seqs: List, max_frames=None, block_each=False):
        """Lockstep replay of B sequences (same event schedule). Returns
        per-sequence trajectories [[(t, R, p), ...] x B]."""
        assert len(seqs) == self.B
        pipes = [LIVOPipeline(self.cfg, slam_mode=self.slam_mode)
                 for _ in range(self.B)]
        # host-side sync bookkeeping per sequence via the single pipeline's
        # helpers; device state stays here, batched.
        for p, s in zip(pipes, seqs):
            for t_begin, pts, offs in s.scans:
                p.pending.append((pts, t_begin + offs))
            p.pending.sort(key=lambda x: x[1][0] if len(x[1]) else 1e18)

        use_images = self.slam_mode == "livo" and len(seqs[0].images) > 0
        events = ([t for t, _ in seqs[0].images] if use_images
                  else [t + offs[-1] if len(offs) else t
                        for t, pts, offs in seqs[0].scans])
        # shared IMU init from the first sequence's still phase
        t0_ev = None
        for t_ev in events:
            if pipes[0]._init_imu(seqs[0], t_ev):
                t0_ev = t_ev
                break
        assert t0_ev is not None, "IMU init failed"
        self.proto.noise = pipes[0].noise
        init_packed = pipes[0].packed
        self.packed = jnp.broadcast_to(
            init_packed, (self.B,) + init_packed.shape
        ).copy()
        for p in pipes:
            p.noise = pipes[0].noise
            p.last_update_time = t0_ev
            p.pending = [(pt[tt > t0_ev], tt[tt > t0_ev]) for pt, tt in p.pending]

        trajs = [[] for _ in range(self.B)]
        frame_id = 0
        first = True
        dummy = jnp.zeros((self.proto.cam.height, self.proto.cam.width),
                          jnp.float32)
        n_done = 0
        times = []
        import time as _time

        for ev_i, t_ev in enumerate(events):
            if t_ev <= t0_ev:
                continue
            if max_frames is not None and n_done >= max_frames:
                break
            t_f0 = _time.perf_counter()
            imu_b, pts_b, img_b = [], [], []
            for p, s in zip(pipes, seqs):
                ip, pp = p._prepare_packet(t_ev, s)
                imu_b.append(ip)
                pts_b.append(pp)
            if use_images and not first:
                img_b = jnp.stack([
                    jnp.asarray(s.images[ev_i][1]) for s in seqs
                ])
                use_vio = True
            else:
                img_b = jnp.broadcast_to(dummy, (self.B,) + dummy.shape)
                use_vio = False
            out = self._vstep(
                self.packed, self.mkeys, self.mrec, self.mstats,
                self.point, self.obs, self.obs_patch, self.alloc, self.imgs,
                self.ids, jnp.stack(imu_b), jnp.stack(pts_b), img_b,
                jnp.full((self.B,), frame_id, jnp.int32), first, use_vio,
            )
            (self.packed, self.mkeys, self.mrec, self.mstats,
             self.point, self.obs, self.obs_patch, self.alloc, self.imgs,
             self.ids, diag) = out
            if block_each:
                jax.block_until_ready(self.packed)
            times.append(_time.perf_counter() - t_f0)
            for b in range(self.B):
                trajs[b].append((t_ev, self.packed[b]))
            first = False
            frame_id += 1
            n_done += 1

        # one batched conversion
        stacked = np.asarray(jnp.stack(
            [jnp.stack([v[0:12] for _, v in tr]) for tr in trajs]
        ))
        out_trajs = []
        for b in range(self.B):
            out_trajs.append([
                (t, stacked[b, i, 0:9].reshape(3, 3), stacked[b, i, 9:12])
                for i, (t, _) in enumerate(trajs[b])
            ])
        self.frame_times = times
        return out_trajs
