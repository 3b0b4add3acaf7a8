"""Engine checkpoint / resume.

A capability the reference lacks entirely (SURVEY.md §5: "Checkpoint /
resume: none — recovery = restart from scratch"). The whole engine state
— filter state + covariance, the voxel plane map, the visual point pool,
and the frame ring — is a pytree of arrays, so a checkpoint is one
compressed npz with a flattened-keypath manifest, and resume is exact:
a restarted pipeline continues from the same map and state.
"""

import json
from typing import Any, Tuple

import jax
import numpy as np


def _flatten(tree) -> Tuple[dict, str]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    return arrays, str(treedef)


def save(path: str, pipeline) -> None:
    """Snapshot a LIVOPipeline's device state + host scalars."""
    tree = {
        "packed": pipeline.packed,
        "vmap": pipeline.vmap_state,
        "pool": pipeline.pool,
        "ring": pipeline.ring,
        "noise": pipeline.noise,
    }
    arrays, treedef = _flatten(tree)
    meta = {
        "treedef": treedef,
        "frame_id": int(pipeline.frame_id),
        "last_update_time": (
            None if pipeline.last_update_time is None
            else float(pipeline.last_update_time)
        ),
        "imu_inited": bool(pipeline.imu_inited),
        "map_inited": bool(pipeline.map_inited),
        "n_pending": len(pipeline.pending),
        "n_scan_events": len(pipeline._scan_events),
        "packet_t0": (None if pipeline._packet_t0 is None
                      else float(pipeline._packet_t0)),
        "prefetch_t": (None if pipeline._prefetch is None
                       else float(pipeline._prefetch[0])),
        "version": 5,  # v5: VoxelMap = (keys, stats, rec-cache)
    }
    # v3: the one-ahead packet prefetch (pipeline._prefetch_next) has
    # already destructively consumed `pending` for the next event — a
    # snapshot that ignored it would resume that event with an
    # empty/partial scan packet. Persist the built packet itself (and the
    # packet cursor) so resume is exact mid-prefetch too.
    if pipeline._prefetch is not None:
        _, (imu_pack, pts_pack) = pipeline._prefetch
        arrays["prefetch_imu"] = np.asarray(imu_pack)
        if isinstance(pts_pack, tuple):  # pre-v5 wire_q16 (q, meta)
            arrays["prefetch_pts"] = np.asarray(pts_pack[0])
            arrays["prefetch_pts_meta"] = np.asarray(pts_pack[1])
        else:
            arrays["prefetch_pts"] = np.asarray(pts_pack)
    # v4: sliding-window backend state — collected keyframes (pose +
    # undistorted body scan) and refined poses, so a resumed pipeline's
    # online refinement continues with its history instead of restarting
    # cold. A refinement in flight at save time is simply lost (it will
    # be re-submitted at the next stride).
    if pipeline._keyframes:
        arrays["kf_t"] = np.array([k[0] for k in pipeline._keyframes])
        arrays["kf_packed"] = np.stack(
            [np.asarray(k[1]) for k in pipeline._keyframes])
        arrays["kf_scan"] = np.stack(
            [np.asarray(k[2]) for k in pipeline._keyframes])
        meta["last_refine_k"] = int(pipeline._last_refine_k)
    if pipeline.refined_keyframes:
        rts = sorted(pipeline.refined_keyframes)
        arrays["refined_t"] = np.array(rts)
        arrays["refined_R"] = np.stack(
            [pipeline.refined_keyframes[t][0] for t in rts])
        arrays["refined_p"] = np.stack(
            [pipeline.refined_keyframes[t][1] for t in rts])
    # Streaming ingestion state (v2): undelivered scan points + IMU
    # buffer + queued scan events, so a mid-stream pipeline resumes
    # exactly (image queues hold device arrays and are intentionally
    # not persisted — re-push images after resume).
    arrays["stream_imu_t"] = pipeline._imu_t
    arrays["stream_imu_gyr"] = pipeline._imu_gyr
    arrays["stream_imu_acc"] = pipeline._imu_acc
    arrays["stream_scan_events"] = np.asarray(pipeline._scan_events,
                                              np.float64)
    for i, (pts, t_abs) in enumerate(pipeline.pending):
        arrays[f"pend_pts_{i}"] = pts
        arrays[f"pend_t_{i}"] = t_abs
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load(path: str, pipeline) -> None:
    """Restore a snapshot into a freshly-constructed LIVOPipeline (same
    config — shapes must match)."""
    import jax.numpy as jnp

    from ..core import imu as imu_mod

    if pipeline.noise is None:
        # placeholder with the right pytree structure; overwritten below
        pipeline.noise = imu_mod.make_noise()
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    if meta.get("version", 1) < 5:
        raise ValueError(
            "checkpoint predates the r5 voxel-map layout (keys, stats, "
            "rec-cache); re-run the producing session to regenerate")
    tree = {
        "packed": pipeline.packed,
        "vmap": pipeline.vmap_state,
        "pool": pipeline.pool,
        "ring": pipeline.ring,
        "noise": pipeline.noise,
    }
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    new_leaves = []
    for i, old in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        assert arr.shape == np.asarray(old).shape, (
            f"checkpoint shape mismatch at leaf {i}: {arr.shape} vs "
            f"{np.asarray(old).shape} (config changed?)"
        )
        new_leaves.append(jnp.asarray(arr))
    restored = jax.tree_util.tree_unflatten(treedef, new_leaves)
    pipeline.packed = restored["packed"]
    pipeline.vmap_state = restored["vmap"]
    pipeline.pool = restored["pool"]
    pipeline.ring = restored["ring"]
    pipeline.noise = restored["noise"]
    pipeline.frame_id = meta["frame_id"]
    pipeline.last_update_time = meta["last_update_time"]
    pipeline.imu_inited = meta["imu_inited"]
    pipeline.map_inited = meta["map_inited"]
    pipeline._packet_t0 = meta.get("packet_t0")
    pipeline._prefetch = None
    if meta.get("prefetch_t") is not None:
        pts = jnp.asarray(data["prefetch_pts"])
        if "prefetch_pts_meta" in data:
            pts = (pts, jnp.asarray(data["prefetch_pts_meta"]))
        pipeline._prefetch = (
            meta["prefetch_t"],
            (jnp.asarray(data["prefetch_imu"]), pts),
        )
    if meta.get("version", 1) >= 2:
        pipeline._imu_t = data["stream_imu_t"]
        pipeline._imu_gyr = data["stream_imu_gyr"]
        pipeline._imu_acc = data["stream_imu_acc"]
        pipeline._scan_events = list(data["stream_scan_events"])
        pipeline.pending = [
            (data[f"pend_pts_{i}"], data[f"pend_t_{i}"])
            for i in range(meta.get("n_pending", 0))
        ]
    if "kf_t" in data:  # v4 backend state
        # photometric captures (r5) are refinement aids and are not
        # persisted — resumed keyframes carry photo=None until fresh
        # keyframes arrive.
        pipeline._keyframes = [
            (float(t), jnp.asarray(data["kf_packed"][i]),
             jnp.asarray(data["kf_scan"][i]), None)
            for i, t in enumerate(data["kf_t"])
        ]
        pipeline._last_refine_k = int(meta.get("last_refine_k", 0))
    if "refined_t" in data:
        pipeline.refined_keyframes = {
            float(t): (data["refined_R"][i], data["refined_p"][i])
            for i, t in enumerate(data["refined_t"])
        }
