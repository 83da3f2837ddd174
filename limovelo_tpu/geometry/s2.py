"""S² (2-sphere) manifold for the gravity state.

TPU-native replacement for IKFoM/MTK's `S2` type (SURVEY.md §2.10): gravity
lives on a sphere of fixed radius ‖g‖, so its error state is 2-dimensional.
The reference seeds it as `S2(-initial_gravity)` (`Localizator.cpp:139`).

Parametrization: g ⊞ δ = Exp(B(g) δ) · g, with B(g) ∈ ℝ^{3×2} an orthonormal
basis of the tangent plane at g.  This matches MTK's S2 boxplus up to the
(irrelevant) choice of basis, which we make deterministic and smooth away from
the ±e_z poles.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import so3


def basis(g):
    """Orthonormal tangent basis B(g) ∈ ℝ^{…,3,2} at g (g need not be unit)."""
    n = g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-30)
    # pick the axis least aligned with n to build a stable frame
    ax = jnp.abs(n)
    ref = jnp.where(
        (ax[..., 2:3] <= ax[..., 0:1]) & (ax[..., 2:3] <= ax[..., 1:2]),
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], n.dtype), n.shape),
        jnp.where(
            (ax[..., 0:1] <= ax[..., 1:2]),
            jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape),
            jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype), n.shape),
        ),
    )
    b1 = jnp.cross(n, ref)
    b1 = b1 / (jnp.linalg.norm(b1, axis=-1, keepdims=True) + 1e-30)
    b2 = jnp.cross(n, b1)
    return jnp.stack([b1, b2], axis=-1)


def boxplus(g, delta):
    """g ⊞ δ = Exp(B(g) δ) g;  δ ∈ ℝ²."""
    w = (basis(g) @ delta[..., None])[..., 0]
    return (so3.exp(w) @ g[..., None])[..., 0]


def boxminus(g1, g2):
    """g1 ⊟ g2 ∈ ℝ²: the tangent vector at g2 rotating g2 onto g1.

    Uses the geodesic rotation between the two directions; assumes equal norms
    (true for gravity states by construction).
    """
    n1 = g1 / (jnp.linalg.norm(g1, axis=-1, keepdims=True) + 1e-30)
    n2 = g2 / (jnp.linalg.norm(g2, axis=-1, keepdims=True) + 1e-30)
    axis = jnp.cross(n2, n1)
    s = jnp.linalg.norm(axis, axis=-1)
    c = jnp.clip(jnp.sum(n1 * n2, axis=-1), -1.0, 1.0)
    theta = jnp.arctan2(s, c)
    small = s < 1e-12
    # θ/s → 1 as the directions coincide (θ ≈ s); guarding with 0 would kink
    # the value AND zero the jvp at coincident points (the chart-transport
    # Jacobian in filter/update.py differentiates through here at δ=0)
    w = axis * jnp.where(small, 1.0, theta / jnp.where(small, 1.0, s))[..., None]
    # express in the tangent basis at g2
    return (jnp.swapaxes(basis(g2), -1, -2) @ w[..., None])[..., 0]


def dexp_dg(g):
    """∂(g ⊞ δ)/∂δ at δ=0:  ∂[Exp(Bδ)g]/∂δ = −hat(g)·B(g)  ∈ ℝ^{…,3,2}."""
    return -so3.hat(g) @ basis(g)
