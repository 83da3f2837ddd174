"""limovelo_tpu — a TPU-native LiDAR-inertial odometry (SLAM) engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Huguet57/LIMO-Velo (see SURVEY.md): continuous-time variable-window
localization at up to 100 Hz, per-point motion deskew against an
IMU-upsampled state path, an iterated error-state Kalman filter on the
compound manifold ℝ³×SO(3)²×ℝ⁹×S², and an incremental voxel hash-grid map
with batched KNN — everything a fixed-shape, jit-compiled tensor program.
"""

import jax as _jax

# SLAM numerics need true f32 matmuls: TPU MXU defaults to bfloat16 inputs,
# which is ~1e-2 absolute error on SO(3) products — far beyond what a
# centimeter-level estimator tolerates.  Hot kernels that can tolerate bf16
# opt back in locally via `precision=` / `preferred_element_type=`.
_jax.config.update("jax_default_matmul_precision", "highest")

from .config import DEFAULT, KITTI, OUSTER, XALOC, Config, InitializationParams

__version__ = "0.1.0"

__all__ = [
    "Config",
    "InitializationParams",
    "DEFAULT",
    "KITTI",
    "OUSTER",
    "XALOC",
    "__version__",
]
