"""SO(3) operations.

TPU-native replacement for the reference's `SO3Math::Exp` Rodrigues helper
(`/root/reference/include/Headers/Utils.hpp:30-52`) and the manifold ⊞/⊟
machinery inside the vendored IKFoM/MTK templates (SURVEY.md §2.10).

All functions are pure, batched via standard broadcasting / `vmap`, and safe
under `jit` (Taylor fallbacks near θ→0 keep gradients finite).
Rotations are 3×3 matrices in the array's trailing two dims; float32 by
default (f64 under `jax.config.update('jax_enable_x64', True)` for oracles).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """Skew-symmetric matrix: hat(w) @ v == cross(w, v). Batched over leading dims."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def exp(w):
    """Matrix exponential of hat(w) via Rodrigues, Taylor-safe at 0.

    Equivalent to `SO3Math::Exp(ang)` (`Utils.hpp:30-41`).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    W = hat(w)
    W2 = W @ W
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallback
    small = theta < 1e-4
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    b = jnp.where(
        small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2)
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def _to_quat(R):
    """Rotation matrix → quaternion (w, x, y, z), branchless (select on the
    largest of the four squared components for stability at every angle)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tw = 1.0 + m00 + m11 + m22   # 4w²
    tx = 1.0 + m00 - m11 - m22   # 4x²
    ty = 1.0 - m00 + m11 - m22   # 4y²
    tz = 1.0 - m00 - m11 + m22   # 4z²

    sw = jnp.sqrt(jnp.clip(tw, 1e-12, None))
    qw = jnp.stack([sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw], axis=-1)
    sx = jnp.sqrt(jnp.clip(tx, 1e-12, None))
    qx = jnp.stack([(m21 - m12) / sx, sx, (m01 + m10) / sx, (m02 + m20) / sx], axis=-1)
    sy = jnp.sqrt(jnp.clip(ty, 1e-12, None))
    qy = jnp.stack([(m02 - m20) / sy, (m01 + m10) / sy, sy, (m12 + m21) / sy], axis=-1)
    sz = jnp.sqrt(jnp.clip(tz, 1e-12, None))
    qz = jnp.stack([(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, sz], axis=-1)

    cases = jnp.stack([qw, qx, qy, qz], axis=-2)                 # (...,4,4)
    which = jnp.argmax(jnp.stack([tw, tx, ty, tz], axis=-1), axis=-1)
    q = jnp.take_along_axis(cases, which[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q * 0.5
    # canonicalize w ≥ 0
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def log(R):
    """Rotation-matrix logarithm → axis-angle; stable at 0 and π (via quat)."""
    q = _to_quat(R)
    w, v = q[..., 0], q[..., 1:]
    nv = jnp.linalg.norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(nv, w)
    small = nv < 1e-6
    scale = jnp.where(small, 2.0 / jnp.clip(w, 1e-6, None), angle / jnp.where(small, 1.0, nv))
    return v * scale[..., None]


def left_jacobian(w):
    """Left Jacobian J_l of SO(3): Exp(w+dw) ≈ Exp(J_l dw) Exp(w)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    W = hat(w)
    W2 = W @ W
    small = theta < 1e-4
    b = jnp.where(
        small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2)
    )
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / jnp.where(small, 1.0, theta2 * theta),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def left_jacobian_inv(w):
    """Inverse left Jacobian of SO(3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    W = hat(w)
    W2 = W @ W
    small = theta < 1e-4
    half_theta = theta * 0.5
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / jnp.where(small, 1.0, jnp.sin(half_theta)))
        / jnp.where(small, 1.0, theta2),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_term[..., None, None] * W2


def boxplus(R, dw):
    """R ⊞ dw = R · Exp(dw) (right perturbation, IKFoM/MTK convention)."""
    return R @ exp(dw)


def boxminus(R1, R2):
    """R1 ⊟ R2 = Log(R2ᵀ R1), the right-perturbation error."""
    return log(jnp.swapaxes(R2, -1, -2) @ R1)


def normalize(R):
    """Project a near-rotation matrix back onto SO(3) (SVD-free, 1 Newton step)."""
    # R (3 I - Rᵀ R)/2 is a first-order orthogonalization; iterate twice
    for _ in range(2):
        RtR = jnp.swapaxes(R, -1, -2) @ R
        R = R @ (1.5 * jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), RtR.shape) - 0.5 * RtR)
    return R
