"""Pose-graph optimization on device.

Beyond-reference subsystem (SURVEY.md §7 step 9 / BASELINE.json north star):
the reference has no loop closure and its drift is unbounded.  Here keyframes
form an SE(3) pose graph — odometry edges from the LIO chain, loop edges from
loop_closure.py — optimized by batched Gauss-Newton entirely on device:

- Residual per edge (i, j) with measured relative pose (R̄, p̄), decoupled form:
      r_rot   = Log(R̄ᵀ Rᵢᵀ Rⱼ)
      r_trans = R̄ᵀ (Rᵢᵀ (pⱼ − pᵢ) − p̄)   … 6-dim
- All edge residuals/Jacobians are built in one batch (vmap-style tensor ops),
  scatter-added into the dense 6K×6K normal matrix, and solved with Cholesky.
  For K ≤ a few thousand keyframes the dense solve is microseconds on the MXU
  and removes every sparse-bookkeeping headache.
- Gauge freedom fixed by a strong prior on pose 0.
- The edge set is embarrassingly shardable (sum over edges → `psum`) for the
  distributed-BA path (parallel/), mirroring the point-sharded GN reductions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry import so3


@dataclass
class PoseGraph:
    """Host-side edge container; arrays are built on demand for the solver."""

    edges_i: List[int] = field(default_factory=list)
    edges_j: List[int] = field(default_factory=list)
    rel_R: List[np.ndarray] = field(default_factory=list)
    rel_p: List[np.ndarray] = field(default_factory=list)
    weights: List[float] = field(default_factory=list)

    def add_edge(self, i: int, j: int, R_ij: np.ndarray, p_ij: np.ndarray, weight: float = 1.0):
        self.edges_i.append(int(i))
        self.edges_j.append(int(j))
        self.rel_R.append(np.asarray(R_ij, np.float32))
        self.rel_p.append(np.asarray(p_ij, np.float32))
        self.weights.append(float(weight))

    def add_odometry_chain(self, Rs: np.ndarray, ps: np.ndarray, weight: float = 1.0):
        """Consecutive edges from an odometry trajectory (K,3,3),(K,3)."""
        for k in range(len(ps) - 1):
            R_ij = Rs[k].T @ Rs[k + 1]
            p_ij = Rs[k].T @ (ps[k + 1] - ps[k])
            self.add_edge(k, k + 1, R_ij, p_ij, weight)

    def arrays(self):
        return (
            jnp.asarray(np.asarray(self.edges_i, np.int32)),
            jnp.asarray(np.asarray(self.edges_j, np.int32)),
            jnp.asarray(np.stack(self.rel_R)),
            jnp.asarray(np.stack(self.rel_p)),
            jnp.asarray(np.asarray(self.weights, np.float32)),
        )


def _edge_residuals_jacobians(Rs, ps, ei, ej, rel_R, rel_p):
    """Batched residuals (E,6) + Jacobian blocks (E,6,6) for i and j.

    Error convention: R ⊞ δθ = R·Exp(δθ), p ⊞ δp = p + δp.
    First-order Jacobians (exact at r→0, standard for pose-graph GN).
    """
    Ri, Rj = Rs[ei], Rs[ej]                       # (E,3,3)
    pi, pj = ps[ei], ps[ej]
    RiT = jnp.swapaxes(Ri, -1, -2)
    RbT = jnp.swapaxes(rel_R, -1, -2)

    R_err = RbT @ (RiT @ Rj)
    r_rot = so3.log(R_err)                        # (E,3)
    d = jnp.einsum("eij,ej->ei", RiT, pj - pi)    # Rᵢᵀ(pⱼ−pᵢ)
    r_tr = jnp.einsum("eij,ej->ei", RbT, d - rel_p)

    E = ei.shape[0]
    Z = jnp.zeros((E, 3, 3), Rs.dtype)

    # Rⱼ ← RⱼExp(δ):  r = Log(R_err·Exp(δ))       ⇒ ∂r/∂δθⱼ = Jr⁻¹(r)
    # Rᵢ ← RᵢExp(δ):  r = Log(R_err·Exp(−(RᵢᵀRⱼ)ᵀδ)) ⇒ ∂r/∂δθᵢ = −Jr⁻¹(r)(RᵢᵀRⱼ)ᵀ
    Jr_inv = so3.left_jacobian_inv(-r_rot)        # right-Jacobian inverse at r
    J_rot_j = Jr_inv
    J_rot_i = -Jr_inv @ jnp.swapaxes(RiT @ Rj, -1, -2)

    # δp is additive in world frame ⇒ ∂r_tr/∂δpⱼ = R̄ᵀRᵢᵀ, ∂/∂δpᵢ = −R̄ᵀRᵢᵀ
    A = RbT @ RiT                                 # (E,3,3)
    J_tr_pj = A
    J_tr_pi = -A
    # ∂r_tr/∂δθ_i: d(Rᵢᵀ)(pⱼ−pᵢ) = −δθ×(Rᵢᵀ(pⱼ−pᵢ)) ⇒ R̄ᵀ·hat(d)
    J_tr_ti = RbT @ so3.hat(d)

    # assemble (E,6,6): state order per pose = [δp(3), δθ(3)]
    Ji = jnp.concatenate(
        [
            jnp.concatenate([J_tr_pi, J_tr_ti], axis=-1),
            jnp.concatenate([Z, J_rot_i], axis=-1),
        ],
        axis=-2,
    )
    Jj = jnp.concatenate(
        [
            jnp.concatenate([J_tr_pj, Z], axis=-1),
            jnp.concatenate([Z, J_rot_j], axis=-1),
        ],
        axis=-2,
    )
    r = jnp.concatenate([r_tr, r_rot], axis=-1)   # (E,6)
    return r, Ji, Jj


def _build_normal_equations(Rs, ps, ei, ej, rel_R, rel_p, w, K: int):
    """Dense GN normal equations from an edge batch: (Hd (6K,6K), bd (6K),
    cost ()).  An exact sum over edges — the shardable reduction of the
    distributed-BA path (edge shards psum their contributions)."""
    r, Ji, Jj = _edge_residuals_jacobians(Rs, ps, ei, ej, rel_R, rel_p)
    wJi = Ji * w[:, None, None]
    wJj = Jj * w[:, None, None]

    H = jnp.zeros((K, K, 6, 6), Rs.dtype)
    b = jnp.zeros((K, 6), Rs.dtype)
    JiTJi = jnp.einsum("eki,ekj->eij", wJi, Ji)
    JjTJj = jnp.einsum("eki,ekj->eij", wJj, Jj)
    JiTJj = jnp.einsum("eki,ekj->eij", wJi, Jj)
    H = H.at[ei, ei].add(JiTJi)
    H = H.at[ej, ej].add(JjTJj)
    H = H.at[ei, ej].add(JiTJj)
    H = H.at[ej, ei].add(jnp.swapaxes(JiTJj, -1, -2))
    b = b.at[ei].add(jnp.einsum("eki,ek->ei", wJi, r))
    b = b.at[ej].add(jnp.einsum("eki,ek->ei", wJj, r))

    Hd = H.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
    bd = b.reshape(6 * K)
    cost = jnp.sum(r * r * w[:, None])
    return Hd, bd, cost


def _apply_gn_step(Rs, ps, Hd, bd, K: int):
    """Gauge prior on pose 0 + Levenberg damping, dense solve, manifold ⊞."""
    prior = jnp.zeros(6 * K, Rs.dtype).at[:6].set(1e6) + 1e-6
    delta = -jnp.linalg.solve(Hd + jnp.diag(prior), bd).reshape(K, 6)
    ps_new = ps + delta[:, :3]
    Rs_new = Rs @ so3.exp(delta[:, 3:])
    return Rs_new, ps_new


@partial(jax.jit, static_argnames=("num_poses", "iters"))
def _solve_graph(Rs, ps, ei, ej, rel_R, rel_p, w, num_poses: int, iters: int = 10):
    K = num_poses

    def gn(carry, _):
        Rs, ps = carry
        Hd, bd, cost = _build_normal_equations(Rs, ps, ei, ej, rel_R, rel_p, w, K)
        return _apply_gn_step(Rs, ps, Hd, bd, K), cost

    (Rs, ps), costs = jax.lax.scan(gn, (Rs, ps), None, length=iters)
    return Rs, ps, costs


def optimize_pose_graph(
    graph: PoseGraph, Rs0: np.ndarray, ps0: np.ndarray, iters: int = 10
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Optimize poses given initial guesses; returns (Rs, ps, cost_history)."""
    ei, ej, rel_R, rel_p, w = graph.arrays()
    Rs, ps, costs = _solve_graph(
        jnp.asarray(Rs0, jnp.float32), jnp.asarray(ps0, jnp.float32),
        ei, ej, rel_R, rel_p, w, num_poses=len(ps0), iters=iters,
    )
    return np.asarray(Rs), np.asarray(ps), np.asarray(costs)


# ---------------------------------------------------------------------------
# distributed BA: edge-sharded Gauss-Newton over a device mesh
# ---------------------------------------------------------------------------


def make_sharded_solver(mesh, num_poses: int, iters: int = 10):
    """Edge-sharded pose-graph GN: edges partitioned over the mesh, each
    device builds its shard's normal-equation contribution, `psum` reduces
    (the sum over edges is exact — lossless, bit-comparable to one device),
    and the dense 6K×6K solve runs replicated.

    This is the distributed-BA axis of SURVEY.md §2's parallelism table
    ("keyframe sharding ... Schur-complement reduction via collectives"):
    with landmark-free pose-graph edges the Schur complement degenerates to
    the plain psum'd normal equations implemented here.
    """
    from jax.sharding import PartitionSpec as P

    AXIS = mesh.axis_names[0]
    K = num_poses

    def body(Rs, ps, ei, ej, rel_R, rel_p, w):
        def gn(carry, _):
            Rs, ps = carry
            Hd, bd, cost = _build_normal_equations(Rs, ps, ei, ej, rel_R, rel_p, w, K)
            Hd = jax.lax.psum(Hd, AXIS)
            bd = jax.lax.psum(bd, AXIS)
            cost = jax.lax.psum(cost, AXIS)
            return _apply_gn_step(Rs, ps, Hd, bd, K), cost

        (Rs, ps), costs = jax.lax.scan(gn, (Rs, ps), None, length=iters)
        return Rs, ps, costs

    e, rep = P(AXIS), P()
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(rep, rep, e, e, e, e, e),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(f)


def optimize_pose_graph_sharded(
    graph: PoseGraph, Rs0: np.ndarray, ps0: np.ndarray, mesh, iters: int = 10
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distributed-BA entry point: pads the edge set to the mesh size (zero-
    weight identity edges are exact no-ops in the psum) and solves."""
    ei, ej, rel_R, rel_p, w = (np.asarray(a) for a in graph.arrays())
    D = int(mesh.devices.size)
    E = len(w)
    pad = (-E) % D
    if pad:
        ei = np.concatenate([ei, np.zeros(pad, np.int32)])
        ej = np.concatenate([ej, np.zeros(pad, np.int32)])
        rel_R = np.concatenate([rel_R, np.broadcast_to(np.eye(3, dtype=np.float32), (pad, 3, 3))])
        rel_p = np.concatenate([rel_p, np.zeros((pad, 3), np.float32)])
        w = np.concatenate([w, np.zeros(pad, np.float32)])

    solver = make_sharded_solver(mesh, num_poses=len(ps0), iters=iters)
    Rs, ps, costs = solver(
        jnp.asarray(Rs0, jnp.float32), jnp.asarray(ps0, jnp.float32),
        jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(rel_R),
        jnp.asarray(rel_p), jnp.asarray(w),
    )
    return np.asarray(Rs), np.asarray(ps), np.asarray(costs)
