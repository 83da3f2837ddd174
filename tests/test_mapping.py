"""Hash-grid map: insert/KNN vs brute-force oracle (SURVEY.md §7 hard-parts)."""

import numpy as np
import pytest

import jax.numpy as jnp

from limovelo_tpu.mapping import GridParams, insert, knn, make_map

GRID = GridParams(table_size=1 << 12, coarse_factor=4, voxel_size=0.2, probe_length=8)


def brute_knn(map_pts, queries, k):
    d2 = ((queries[:, None, :] - map_pts[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    return np.take_along_axis(d2, idx, axis=1), idx


def insert_np(rng, n=500, scale=5.0):
    return (rng.uniform(-scale, scale, size=(n, 3))).astype(np.float32)


class TestInsert:
    def test_empty_map(self):
        m = make_map(GRID)
        assert int(m.num_points) == 0
        assert int(m.num_buckets) == 0

    def test_insert_counts(self, rng):
        pts = insert_np(rng, 200, scale=3.0)
        m = make_map(GRID)
        m = insert(m, jnp.asarray(pts), jnp.ones(200, bool), GRID)
        n = int(m.num_points)
        # at most one point per 0.2m fine voxel
        vox = np.unique(np.floor(pts / 0.2).astype(np.int64), axis=0)
        assert n == len(vox)

    def test_downsample_semantics(self):
        # two points in the same fine voxel: keep the one nearer the center
        m = make_map(GRID)
        pts = jnp.asarray([[0.11, 0.11, 0.11], [0.19, 0.19, 0.19]], jnp.float32)
        m = insert(m, pts, jnp.ones(2, bool), GRID)
        assert int(m.num_points) == 1
        stored = np.asarray(m.pts).reshape(-1, 3)
        d2 = np.asarray(m.cell_d2).ravel()
        kept = stored[np.isfinite(d2)]
        np.testing.assert_allclose(kept[0], [0.11, 0.11, 0.11], atol=1e-6)

    def test_incremental_insert_keeps_existing_nearer(self):
        m = make_map(GRID)
        first = jnp.asarray([[0.10, 0.10, 0.10]], jnp.float32)  # at center
        m = insert(m, first, jnp.ones(1, bool), GRID)
        second = jnp.asarray([[0.19, 0.19, 0.19]], jnp.float32)  # same cell, worse
        m = insert(m, second, jnp.ones(1, bool), GRID)
        assert int(m.num_points) == 1
        stored = np.asarray(m.pts).reshape(-1, 3)
        d2 = np.asarray(m.cell_d2).ravel()
        kept = stored[np.isfinite(d2)]
        np.testing.assert_allclose(kept[0], [0.10, 0.10, 0.10], atol=1e-6)

    def test_mask_respected(self, rng):
        pts = insert_np(rng, 100)
        mask = np.zeros(100, bool)
        mask[:10] = True
        m = make_map(GRID)
        m = insert(m, jnp.asarray(pts), jnp.asarray(mask), GRID)
        vox = np.unique(np.floor(pts[:10] / 0.2).astype(np.int64), axis=0)
        assert int(m.num_points) == len(vox)

    def test_many_collisions_same_bucket(self):
        # 200 points inside ONE coarse voxel → heavy same-key traffic
        rng = np.random.default_rng(7)
        pts = rng.uniform(0.0, 0.79, size=(200, 3)).astype(np.float32)
        m = make_map(GRID)
        m = insert(m, jnp.asarray(pts), jnp.ones(200, bool), GRID)
        vox = np.unique(np.floor(pts / 0.2).astype(np.int64), axis=0)
        assert int(m.num_points) == len(vox)
        assert int(m.num_buckets) == 1


class TestPrune:
    def test_prune_drops_far_keeps_near(self, rng):
        from limovelo_tpu.mapping import prune

        near = rng.uniform(-2, 2, size=(200, 3)).astype(np.float32)
        far = rng.uniform(20, 24, size=(200, 3)).astype(np.float32)
        m = make_map(GRID)
        m = insert(m, jnp.asarray(np.concatenate([near, far])), jnp.ones(400, bool), GRID)
        n_before = int(m.num_points)
        m = prune(m, jnp.zeros(3, jnp.float32), 10.0, GRID)
        n_after = int(m.num_points)
        assert n_after < n_before
        # near points still queryable
        q = rng.uniform(-1, 1, size=(16, 3)).astype(np.float32)
        _, _, valid = knn(m, jnp.asarray(q), GRID, k=5)
        assert np.asarray(valid).any()
        # far region gone
        qf = np.full((4, 3), 22.0, np.float32)
        _, _, validf = knn(m, jnp.asarray(qf), GRID, k=5)
        assert not np.asarray(validf).any()

    def test_reinsert_after_prune(self, rng):
        from limovelo_tpu.mapping import prune

        pts = rng.uniform(-3, 3, size=(300, 3)).astype(np.float32)
        m = make_map(GRID)
        m = insert(m, jnp.asarray(pts), jnp.ones(300, bool), GRID)
        m = prune(m, jnp.zeros(3, jnp.float32), 0.0, GRID)  # drop everything
        assert int(m.num_points) == 0
        # tombstoned table must accept fresh inserts and stay queryable
        m = insert(m, jnp.asarray(pts), jnp.ones(300, bool), GRID)
        vox = np.unique(np.floor(pts / 0.2).astype(np.int64), axis=0)
        assert int(m.num_points) == len(vox)
        q = pts[:16]
        _, sq, valid = knn(m, jnp.asarray(q), GRID, k=1)
        assert np.asarray(valid).all()
        np.testing.assert_allclose(np.asarray(sq)[:, 0], 0.0, atol=1e-9)


class TestKNN:
    def test_vs_bruteforce_dense(self, rng):
        """Dense map: hash-grid KNN must equal exact KNN (all NNs well within
        the guaranteed 0.8m radius)."""
        pts = rng.uniform(-4, 4, size=(3000, 3)).astype(np.float32)
        m = make_map(GRID)
        m = insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool), GRID)
        stored = np.asarray(m.pts).reshape(-1, 3)
        occ = np.isfinite(np.asarray(m.cell_d2).ravel())
        map_pts = stored[occ]

        queries = rng.uniform(-3, 3, size=(64, 3)).astype(np.float32)
        nb, sq, valid = knn(m, jnp.asarray(queries), GRID, k=5)
        sq = np.asarray(sq)
        oracle_sq, _ = brute_knn(map_pts, queries, 5)

        assert np.asarray(valid).all()
        np.testing.assert_allclose(np.sort(sq, axis=1), oracle_sq, rtol=1e-4, atol=1e-5)

    def test_neighbors_are_actual_points(self, rng):
        pts = rng.uniform(-2, 2, size=(500, 3)).astype(np.float32)
        m = make_map(GRID)
        m = insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool), GRID)
        queries = rng.uniform(-1, 1, size=(16, 3)).astype(np.float32)
        nb, sq, valid = knn(m, jnp.asarray(queries), GRID, k=5)
        nb, valid = np.asarray(nb), np.asarray(valid)
        stored = np.asarray(m.pts).reshape(-1, 3)
        occ = np.isfinite(np.asarray(m.cell_d2).ravel())
        map_pts = stored[occ]
        for i in range(16):
            for j in range(5):
                if valid[i, j]:
                    d = np.min(((map_pts - nb[i, j]) ** 2).sum(-1))
                    assert d < 1e-10

    def test_empty_map_returns_invalid(self, rng):
        m = make_map(GRID)
        queries = rng.uniform(-1, 1, size=(8, 3)).astype(np.float32)
        _, sq, valid = knn(m, jnp.asarray(queries), GRID, k=5)
        assert not np.asarray(valid).any()
        assert np.isinf(np.asarray(sq)).all()

    def test_query_far_from_map(self, rng):
        pts = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
        m = make_map(GRID)
        m = insert(m, jnp.asarray(pts), jnp.ones(100, bool), GRID)
        queries = np.full((4, 3), 50.0, np.float32)
        _, _, valid = knn(m, jnp.asarray(queries), GRID, k=5)
        assert not np.asarray(valid).any()


@pytest.mark.slow
class TestPrunePolicy:
    def test_pipeline_prune_bounds_map(self):
        """map_prune_radius wired into the pipeline: a long corridor run
        keeps `num_buckets` bounded instead of growing with distance
        traveled (SURVEY.md §5 long-context row — the reference's ikd-Tree
        grows without bound)."""
        from limovelo_tpu import Config
        from limovelo_tpu.io.simulate import (corridor_trajectory,
                                              corridor_world, replay_into,
                                              simulate)
        from limovelo_tpu.runtime.pipeline import LioPipeline

        base = dict(
            real_time=False, mapping_online=True, min_dist=0.5,
            downsample_prec=0.3, full_rotation_time=0.1, imu_rate=200.0,
            real_time_delay=0.1, empty_lidar_time=0.5,
            degeneracy_threshold=0.0,
            point_buckets=(2048, 4096, 8192), ds_buckets=(1024, 2048),
            imu_buckets=(64,), map_table_size=1 << 16,
        )
        cfg = Config(**base)
        grid = GridParams(table_size=1 << 16, coarse_factor=4,
                          voxel_size=0.2, probe_length=8)
        traj = corridor_trajectory(speed=8.0)
        world = corridor_world(length=120.0, width=8.0, pillar_every=6.0)
        sim = simulate(world, traj, cfg, duration=10.0, lidar_lines=8,
                       pts_per_line=128, imu_rate=200.0, seed=13,
                       max_range=40.0)

        buckets = {}
        for radius in (0.0, 25.0):
            pipe = LioPipeline(cfg.replace(map_prune_radius=radius,
                                           map_prune_every=0.5), grid=grid)
            replay_into(pipe, sim)
            pipe.flush()
            recs = pipe.result.records
            assert len(recs) > 40
            buckets[radius] = np.array([r.map_buckets for r in recs])

        unbounded = buckets[0.0]
        bounded = buckets[25.0]
        # unbounded grows monotonically with distance; bounded plateaus
        assert unbounded[-1] > 1.5 * bounded[-1], (
            f"prune had no effect: {unbounded[-1]} vs {bounded[-1]} buckets"
        )
        tail = bounded[len(bounded) // 2:]
        assert tail.max() < 1.3 * tail.min() + 50, (
            "pruned map still grows on the tail of the run"
        )
