"""Filter state pytree and the 23-dim error-state chart.

TPU-native replacement for IKFoM's `state_ikfom` compound manifold
(SURVEY.md §2.10) and the reference's `State` value object
(`/root/reference/src/Objects/State.cpp`, `include/Headers/Objects.hpp:97-137`).

Error-state layout (must match the covariance indices the reference pokes in
`Localizator.cpp:146-150`):

    [ 0: 3)  pos        ℝ³
    [ 3: 6)  rot        SO(3)   (right perturbation: R ⊞ δ = R·Exp(δ))
    [ 6: 9)  extr_R     SO(3)   (LiDAR→IMU rotation offset)
    [ 9:12)  extr_t     ℝ³      (LiDAR→IMU translation offset)
    [12:15)  vel        ℝ³
    [15:18)  bg         ℝ³      gyro bias
    [18:21)  ba         ℝ³      accel bias
    [21:23)  grav       S²      (2-dim tangent, fixed ‖g‖)

Total error dim = 23.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import s2, se3, so3

ERROR_DIM = 23
POS, ROT, EXT_R, EXT_T, VEL, BG, BA, GRAV = 0, 3, 6, 9, 12, 15, 18, 21


class NavState(NamedTuple):
    """Nominal state — a pytree of arrays (all float32 on TPU).

    Compared to the reference `State`, the `a`/`w` last-control fields used by
    the deskew path live in the deskew path arrays instead (deskew/path.py),
    keeping the estimator state pure.
    """

    R: jnp.ndarray       # (3,3) body→world
    p: jnp.ndarray       # (3,)
    v: jnp.ndarray       # (3,)
    bg: jnp.ndarray      # (3,)
    ba: jnp.ndarray      # (3,)
    g: jnp.ndarray       # (3,)  gravity vector, ‖g‖ fixed; dynamics v̇=R(a−ba)+g
    R_LI: jnp.ndarray    # (3,3) LiDAR→IMU rotation  (reference RLI / offset_R_L_I)
    t_LI: jnp.ndarray    # (3,)  LiDAR→IMU translation


def make_initial(config, R0=None, dtype=jnp.float32) -> NavState:
    """Seed state as in `Localizator::init_IKFoM_state` (Localizator.cpp:135-146):
    orientation from the first IMU quaternion (R0), gravity = −initial_gravity,
    extrinsics from config."""
    R0 = jnp.eye(3, dtype=dtype) if R0 is None else jnp.asarray(R0, dtype)
    # reference reads the row-major YAML with an Eigen::Map (column-major) and
    # transposes for State (State.cpp:23) — net effect: the YAML rows are the
    # rows of the LiDAR→IMU rotation used as offset_R_L_I.
    R_LI = jnp.asarray(np.array(config.I_Rotation_L, np.float64).reshape(3, 3), dtype)
    return NavState(
        R=R0,
        p=jnp.zeros(3, dtype),
        v=jnp.zeros(3, dtype),
        bg=jnp.zeros(3, dtype),
        ba=jnp.zeros(3, dtype),
        g=jnp.asarray(config.gravity_vec, dtype),
        R_LI=R_LI,
        t_LI=jnp.asarray(config.I_Translation_L, dtype),
    )


def initial_covariance(config=None, dtype=jnp.float32) -> jnp.ndarray:
    """Initial P, matching `init_IKFoM_state` (Localizator.cpp:148-156).

    The extrinsic blocks default to the reference's 1e-5 (σ≈0.18° / 3 mm —
    a *refinement* prior: it assumes the config extrinsics are already
    nearly right).  Online calibration from a coarse guess needs a wider
    prior or the 7σ-off truth is unreachable — set
    `config.initial_cov_extrinsic_rot/trans` accordingly."""
    diag = np.ones(ERROR_DIM, np.float64)
    # scalar or per-axis (roll, pitch, yaw) in the LiDAR-frame tangent — the
    # anisotropic form pins the gauge-degenerate extrinsic yaw while freeing
    # the gravity-observable roll/pitch (Config.initial_cov_extrinsic_rot)
    rot_prior = getattr(config, "initial_cov_extrinsic_rot", 1e-5) if config else 1e-5
    diag[EXT_R:EXT_R + 3] = np.asarray(rot_prior, np.float64)
    diag[EXT_T:EXT_T + 3] = getattr(config, "initial_cov_extrinsic_trans", 1e-5) if config else 1e-5
    diag[BG:BG + 3] = 1e-4
    diag[BA:BA + 3] = 1e-3
    diag[GRAV:GRAV + 2] = 1e-5
    return jnp.asarray(np.diag(diag), dtype)


def boxplus(x: NavState, dx: jnp.ndarray) -> NavState:
    """x ⊞ dx over the compound manifold (dx: (23,))."""
    return NavState(
        R=so3.boxplus(x.R, dx[ROT:ROT + 3]),
        p=x.p + dx[POS:POS + 3],
        v=x.v + dx[VEL:VEL + 3],
        bg=x.bg + dx[BG:BG + 3],
        ba=x.ba + dx[BA:BA + 3],
        g=s2.boxplus(x.g, dx[GRAV:GRAV + 2]),
        R_LI=so3.boxplus(x.R_LI, dx[EXT_R:EXT_R + 3]),
        t_LI=x.t_LI + dx[EXT_T:EXT_T + 3],
    )


def boxminus(x1: NavState, x2: NavState) -> jnp.ndarray:
    """x1 ⊟ x2 → (23,) error vector."""
    return jnp.concatenate(
        [
            x1.p - x2.p,
            so3.boxminus(x1.R, x2.R),
            so3.boxminus(x1.R_LI, x2.R_LI),
            x1.t_LI - x2.t_LI,
            x1.v - x2.v,
            x1.bg - x2.bg,
            x1.ba - x2.ba,
            s2.boxminus(x1.g, x2.g),
        ]
    )


def lidar_to_imu(x: NavState) -> se3.RigidTransform:
    """I_Rt_L — LiDAR frame → IMU frame (State.cpp:64-69)."""
    return se3.RigidTransform(x.R_LI, x.t_LI)


def body_to_world(x: NavState) -> se3.RigidTransform:
    return se3.RigidTransform(x.R, x.p)


def lidar_to_world(x: NavState) -> se3.RigidTransform:
    """X · I_Rt_L — transforms LiDAR-frame points to the world/map frame
    (the `X * X.I_Rt_L() * p` pattern, main.cpp:91-92, Mapper.cpp:50)."""
    return se3.compose(body_to_world(x), lidar_to_imu(x))
