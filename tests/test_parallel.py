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
