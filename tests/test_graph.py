"""Pose graph / keyframes / loop closure."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsc

from limovelo_tpu.graph import (
    KeyframeSelector,
    KeyframeStore,
    PoseGraph,
    detect_loop_candidates,
    optimize_pose_graph,
    register_scan_to_map,
)


def circle_poses(K=40, radius=10.0):
    th = np.linspace(0, 2 * np.pi, K)
    ps = np.stack([radius * np.cos(th), radius * np.sin(th), np.zeros(K)], 1)
    Rs = np.stack([Rsc.from_euler("z", t + np.pi / 2).as_matrix() for t in th])
    return Rs.astype(np.float32), ps.astype(np.float32)


class TestKeyframes:
    def test_selector_gates_by_distance(self):
        sel = KeyframeSelector(min_translation=2.0, min_rotation_deg=360)
        assert sel.should_add(np.eye(3), np.zeros(3))
        assert not sel.should_add(np.eye(3), np.array([1.0, 0, 0]))
        assert sel.should_add(np.eye(3), np.array([2.5, 0, 0]))

    def test_selector_gates_by_rotation(self):
        sel = KeyframeSelector(min_translation=1e9, min_rotation_deg=10)
        assert sel.should_add(np.eye(3), np.zeros(3))
        R5 = Rsc.from_euler("z", 5, degrees=True).as_matrix()
        R20 = Rsc.from_euler("z", 20, degrees=True).as_matrix()
        assert not sel.should_add(R5, np.zeros(3))
        assert sel.should_add(R20, np.zeros(3))

    def test_store(self, rng):
        store = KeyframeStore(KeyframeSelector(min_translation=1.0))
        for i in range(10):
            store.maybe_add(float(i), np.eye(3), np.array([i * 0.6, 0, 0]),
                            rng.normal(size=(10, 3)).astype(np.float32))
        assert 4 <= len(store) <= 7  # every ~2nd pose at 0.6m steps, 1m gate


class TestPoseGraph:
    def test_perfect_graph_zero_cost(self):
        Rs, ps = circle_poses(20)
        g = PoseGraph()
        g.add_odometry_chain(Rs, ps)
        Rs2, ps2, costs = optimize_pose_graph(g, Rs, ps, iters=3)
        assert costs[-1] < 1e-6
        np.testing.assert_allclose(ps2, ps, atol=1e-4)

    def test_loop_closure_corrects_drift(self):
        """Drifted odometry + one perfect loop edge → endpoints reconciled."""
        Rs, ps = circle_poses(30)
        # corrupt odometry: add systematic drift to positions
        drift = np.linspace(0, 1.0, 30)[:, None] * np.array([0.5, 0.3, 0.0])
        ps_bad = (ps + drift).astype(np.float32)

        g = PoseGraph()
        g.add_odometry_chain(Rs, ps_bad)          # drifted relative measurements
        # ground-truth loop edge between last and first
        R_ij = Rs[0].T @ Rs[-1]
        p_ij = Rs[0].T @ (ps[-1] - ps[0])
        g.add_edge(0, len(ps) - 1, R_ij, p_ij, weight=100.0)

        Rs2, ps2, costs = optimize_pose_graph(g, Rs, ps_bad, iters=10)
        # closure error before: ~drift magnitude; after: small
        gap_before = np.linalg.norm((ps_bad[-1] - ps_bad[0]) - (ps[-1] - ps[0]))
        est_rel = Rs2[0].T @ (ps2[-1] - ps2[0])
        true_rel = Rs[0].T @ (ps[-1] - ps[0])
        gap_after = np.linalg.norm(est_rel - true_rel)
        assert gap_before > 0.5
        assert gap_after < 0.05, f"loop not closed: {gap_after:.3f}"
        assert costs[-1] < costs[0]

    def test_detect_candidates(self):
        Rs, ps = circle_poses(50)  # ends where it starts
        cands = detect_loop_candidates(ps, min_index_gap=20, max_distance=3.0)
        assert any(i > 40 and j < 5 for i, j in cands)


class TestRegistration:
    def test_recovers_known_offset(self, rng):
        # planar-ish world points
        target = np.concatenate([
            np.stack([rng.uniform(-8, 8, 2000), rng.uniform(-8, 8, 2000),
                      np.full(2000, -1.2)], 1),
            np.stack([rng.uniform(-8, 8, 1000), np.full(1000, 5.0),
                      rng.uniform(-1, 3, 1000)], 1),
            np.stack([np.full(1000, 6.0), rng.uniform(-8, 8, 1000),
                      rng.uniform(-1, 3, 1000)], 1),
        ]).astype(np.float32)
        # source scan = target points seen from a pose offset
        R_true = Rsc.from_euler("z", 4, degrees=True).as_matrix().astype(np.float32)
        p_true = np.array([0.3, -0.2, 0.1], np.float32)
        idx = rng.choice(len(target), 1500, replace=False)
        scan = ((target[idx] - p_true) @ R_true).astype(np.float32)

        R, p, rms, n = register_scan_to_map(
            scan, target, np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        )
        assert n > 500
        np.testing.assert_allclose(p, p_true, atol=0.03)
        rot_err = np.linalg.norm(Rsc.from_matrix(R_true.T @ R).as_rotvec())
        assert rot_err < 0.01
        assert rms < 0.05
