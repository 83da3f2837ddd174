"""IMU process model and covariance propagation (the `predict` path).

TPU-native replacement for IKFoM's `get_f/df_dx/df_dw` + `esekf::predict`
(SURVEY.md §2.10) and `Localizator::propagate/propagate_to`
(`/root/reference/src/Modules/Localizator.cpp:59-75,159-173`).

The reference replays IMU samples one by one through a 23-dim covariance
propagation (hot loop #3, SURVEY.md §3.5).  Here the whole IMU window is a
fixed-shape array and the replay is one `lax.scan` — a single fused XLA loop
with no per-sample dispatch.

Continuous dynamics (right-perturbation error state, noise order
(ng, na, nbg, nba) as in `Localizator::propagate` Q layout,
Localizator.cpp:164-171):

    ṗ = v            Ṙ = R·hat(w−bg)         v̇ = R(a−ba) + g
    ḃg = nbg         ḃa = nba                ġ = 0   (S², ‖g‖ fixed)
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry import s2, so3
from ..geometry.state import (
    BA,
    BG,
    ERROR_DIM,
    EXT_R,
    EXT_T,
    GRAV,
    NavState,
    POS,
    ROT,
    VEL,
)

NOISE_DIM = 12  # (gyro, acc, bias-gyro, bias-acc), Localizator.cpp:164-168

#: largest IMU window the filter replay fully unrolls (no loop primitive in
#: the compiled program); covers every production imu_bucket — see the
#: policy note in `predict_window`
UNROLL_MAX = 64


class ImuWindow(NamedTuple):
    """Padded IMU batch covering (last_integrated, t2]; newest last.

    `t` holds the *target* integration times: sample i advances the state
    from t[i-1] (or t0 for i=0) to t[i] using controls (a[i], w[i]).  The
    final entry replays the last IMU extrapolated to t2, matching
    `propagate_to` (Localizator.cpp:69-74).
    """

    t: jnp.ndarray      # (M,)
    a: jnp.ndarray      # (M, 3)
    w: jnp.ndarray      # (M, 3)
    mask: jnp.ndarray   # (M,) bool — False entries are padding (dt forced 0)


def process_noise_Q(config, dtype=jnp.float32) -> jnp.ndarray:
    """12×12 block-diagonal Q (Localizator.cpp:164-168)."""
    import numpy as np

    q = np.concatenate(
        [
            np.full(3, config.covariance_gyroscope),
            np.full(3, config.covariance_acceleration),
            np.full(3, config.covariance_bias_gyroscope),
            np.full(3, config.covariance_bias_acceleration),
        ]
    )
    return jnp.asarray(np.diag(q), dtype)


def nominal_step(x: NavState, a, w, dt) -> NavState:
    """x ⊞ f(x,u)·dt — exact Exp for rotation, Euler elsewhere.

    Matches `State::propagate_f` (State.cpp:94-110) with g stored negated
    (see config.gravity_vec)."""
    acc_w = (x.R @ (a - x.ba)) + x.g
    return x._replace(
        R=x.R @ so3.exp((w - x.bg) * dt),
        p=x.p + x.v * dt + 0.5 * acc_w * dt * dt,
        v=x.v + acc_w * dt,
    )


def error_jacobians(x: NavState, a, w, dt) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Discrete error-state Jacobians (Fx: 23×23, Fw: 23×12), first order.

    Right-perturbation convention (R ⊞ δ = R Exp(δ)); mirrors IKFoM's
    df_dx/df_dw contract for the state layout in geometry/state.py.
    """
    dtype = x.p.dtype
    I3 = jnp.eye(3, dtype=dtype)
    Fx = jnp.eye(ERROR_DIM, dtype=dtype)

    wb = (w - x.bg) * dt
    # δθ_{k+1} = Exp(−ŵdt) δθ − J_r(ŵdt)... first-order: (I − hat(wb)) δθ − I dt δbg
    Fx = Fx.at[ROT:ROT + 3, ROT:ROT + 3].set(so3.exp(-wb))
    Fx = Fx.at[ROT:ROT + 3, BG:BG + 3].set(-I3 * dt)

    # δv_{k+1} += (−R hat(a−ba) δθ − R δba + B(g)... ) dt
    Ra = x.R @ so3.hat(a - x.ba)
    Fx = Fx.at[VEL:VEL + 3, ROT:ROT + 3].set(-Ra * dt)
    Fx = Fx.at[VEL:VEL + 3, BA:BA + 3].set(-x.R * dt)
    Fx = Fx.at[VEL:VEL + 3, GRAV:GRAV + 2].set(s2.dexp_dg(x.g) * dt)

    # δp_{k+1} += δv dt
    Fx = Fx.at[POS:POS + 3, VEL:VEL + 3].set(I3 * dt)

    Fw = jnp.zeros((ERROR_DIM, NOISE_DIM), dtype=dtype)
    Fw = Fw.at[ROT:ROT + 3, 0:3].set(-I3 * dt)       # gyro noise → rotation
    Fw = Fw.at[VEL:VEL + 3, 3:6].set(-x.R * dt)      # accel noise → velocity
    Fw = Fw.at[BG:BG + 3, 6:9].set(I3 * dt)          # bias random walks
    Fw = Fw.at[BA:BA + 3, 9:12].set(I3 * dt)
    return Fx, Fw


def predict_window(
    x: NavState,
    P: jnp.ndarray,
    imus: ImuWindow,
    t0,
    Q: jnp.ndarray,
):
    """Propagate (x, P) through every IMU sample in the window via lax.scan.

    Equivalent to the reference's per-IMU `esekf.predict(dt, Q, in)` replay
    (`Localizator::propagate_to`, Localizator.cpp:59-75), including the final
    extrapolation entry to t2 (the caller appends it to the window).

    Returns (x_t2, P_t2).
    """

    def step(carry, inp):
        x, P, t_prev = carry
        t, a, w, valid = inp
        dt = jnp.where(valid, jnp.maximum(t - t_prev, 0.0), 0.0)
        Fx, Fw = error_jacobians(x, a, w, dt)
        x_new = nominal_step(x, a, w, dt)
        # IKFoM discretization: F_w already carries dt, Q enters unscaled
        P_new = Fx @ P @ Fx.T + Fw @ Q @ Fw.T
        # masked entries are identity updates
        x = jax.tree.map(lambda n, o: jnp.where(valid, n, o), x_new, x)
        P = jnp.where(valid, P_new, P)
        t_next = jnp.where(valid, t, t_prev)
        return (x, P, t_next), None

    M = int(imus.t.shape[0])
    carry = (x, P, jnp.asarray(t0, x.p.dtype))
    # UNROLL_MAX policy (ADVICE r3): the production configs bucket filter
    # windows at ≤64 IMUs (Config.imu_buckets default; at 200 Hz IMU and the
    # 100 Hz/10 Hz localization cadences a window holds 2-25 samples, and
    # 64 covers the slowest KITTI offline windows), so the unrolled form IS
    # the production path.  Larger buckets are the explicit opt-out for
    # non-real-time replays: they fall back to lax.scan and accept the flat
    # per-loop-primitive penalty on pathological host-driven runtimes
    # (BENCH.md r03) in exchange for bounded trace/compile time — a 256-step
    # unroll of the 23×23 chain compiles for minutes.
    if M <= UNROLL_MAX:
        # python-unrolled replay: identical trace to the lax.scan below, but
        # with no loop primitive in the program — some host-driven runtimes
        # execute loop constructs with a flat ~25 ms penalty (BENCH.md r03),
        # and at these sizes (M tiny 23×23 matmul chains) XLA fuses the
        # unrolled form just as well on a healthy runtime.
        for i in range(M):
            carry, _ = step(carry, (imus.t[i], imus.a[i], imus.w[i], imus.mask[i]))
    else:
        carry, _ = jax.lax.scan(
            step, carry, (imus.t, imus.a, imus.w, imus.mask)
        )
    x, P, _ = carry
    return x, P
