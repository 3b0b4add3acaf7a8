"""fast_livo2_tpu — a TPU-native LiDAR-Inertial-Visual Odometry engine.

A from-scratch re-design of the capabilities of FAST-LIVO2 (reference:
hku-mars/FAST-LIVO2, surveyed in SURVEY.md) as batched array programs for
TPU under JAX/XLA/Pallas:

- 19-dim error-state iterated Kalman filter (rot, pos, inv_expo, vel,
  bias_g, bias_a, gravity) fusing LiDAR point-to-plane and sparse-direct
  photometric residuals  (reference: include/common_lib.h:126-223,
  src/voxel_map.cpp:338-511, src/vio.cpp:1520-1688).
- IMU propagation + scan undistortion as lax.scan / batched gathers
  (reference: src/IMU_Processing.cpp:237-541).
- Voxel plane map as fixed-capacity open-addressing hash tables of running
  plane statistics (replaces the pointer-based octree of
  src/voxel_map.cpp:55-335) so per-frame updates are fixed-shape scatters.
- Visual sparse map as fixed-capacity point/feature pools with a frame
  ring buffer (replaces the unordered_map of VisualPoint* in
  src/vio.cpp:227-250).

Layout:
  core/      state, filter math, the LIO/VIO/LIVO per-frame step functions
  ops/       SO(3) numerics, hash/scatter primitives, Pallas kernels
  models/    sensor models: cameras (pinhole/equidistant), LiDAR decoders
  parallel/  device-mesh sharding of the per-frame measurement fan-in
  io/        dataset readers/writers (npz sequences, TUM/PCD/COLMAP export)
  utils/     config (YAML schema-compatible with the reference), timing
"""

__version__ = "0.1.0"


def enable_compile_cache(path: str = "/tmp/jax_cache",
                         min_compile_secs: float = 0.0) -> None:
    """Turn on JAX's persistent compilation cache via jax.config.

    Must be jax.config.update, not the env var: this environment's
    sitecustomize initializes JAX config at interpreter start, after
    which JAX_COMPILATION_CACHE_DIR is ignored (same failure mode as
    JAX_PLATFORMS here). Measured impact: every LIVOPipeline instance
    owns its own jax.jit wrappers, so WITHOUT the persistent cache each
    instance recompiles the frame programs (~47 s on the TPU relay,
    ~10 s on CPU) — with it, instance 2+ and later processes load in
    ~0.03 s. Entry points (bench.py, tests/conftest.py,
    __graft_entry__.py, scripts/) call this; library code never sets
    global config silently.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
