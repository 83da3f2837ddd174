"""Rigid transforms (R, t) — TPU-native analog of the reference's `RotTransl`
(`/root/reference/src/Objects/RotTransl.cpp:29-54`).

A transform is just a pair of arrays (R: …×3×3, t: …×3); functions broadcast
over leading dims and over point batches, so one call transforms a whole
(N,3) window at once (replacing the per-point `operator*` loops).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RigidTransform(NamedTuple):
    R: jnp.ndarray  # (..., 3, 3)
    t: jnp.ndarray  # (..., 3)


def identity(dtype=jnp.float32) -> RigidTransform:
    return RigidTransform(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype))


def compose(a: RigidTransform, b: RigidTransform) -> RigidTransform:
    """a * b (apply b first). RotTransl.cpp operator*(RT, RT)."""
    return RigidTransform(a.R @ b.R, (a.R @ b.t[..., None])[..., 0] + a.t)


def inverse(a: RigidTransform) -> RigidTransform:
    """RotTransl::inv — (Rᵀ, −Rᵀ t)."""
    Rt = jnp.swapaxes(a.R, -1, -2)
    return RigidTransform(Rt, -(Rt @ a.t[..., None])[..., 0])


def apply(a: RigidTransform, pts: jnp.ndarray) -> jnp.ndarray:
    """Transform points (..., N, 3) or (..., 3) by a."""
    if pts.ndim == a.R.ndim - 1:  # single point per transform
        return (a.R @ pts[..., None])[..., 0] + a.t
    return pts @ jnp.swapaxes(a.R, -1, -2) + a.t[..., None, :]
