"""Multi-host helpers on a single-process 8-device CPU mesh.

Single process is the degenerate case of the multi-host path: the same
`make_array_from_process_local_data` / replication / sharded-step code runs,
just with process_count()==1 (SURVEY.md §4: multi-host tests on CPU meshes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from limovelo_tpu.parallel import multihost as mh
from limovelo_tpu.parallel.sharding import AXIS, make_sharded_step


@pytest.fixture(scope="module")
def mesh():
    return mh.global_mesh()


def test_global_mesh_covers_all_devices(mesh):
    assert mesh.size == len(jax.devices())
    assert mesh.axis_names == (AXIS,)


def test_window_from_local_shards_points(mesh, rng):
    n = 64 * mesh.size
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    ts = rng.uniform(0, 0.01, n).astype(np.float32)
    msk = np.ones(n, bool)
    gp, gt, gm = mh.window_from_local(mesh, pts, ts, msk)
    assert gp.shape == (n, 3)
    # sharded over AXIS: each device owns a contiguous row block
    assert len(gp.addressable_shards) == mesh.size
    np.testing.assert_array_equal(np.asarray(gp), pts)
    np.testing.assert_array_equal(np.asarray(gt), ts)


def test_replicate_places_every_device(mesh):
    x = {"a": jnp.arange(12.0).reshape(3, 4), "b": jnp.float32(3.0)}
    r = mh.replicate(mesh, x)
    assert len(r["a"].addressable_shards) == mesh.size
    for s in r["a"].addressable_shards:
        np.testing.assert_array_equal(np.asarray(s.data), np.asarray(x["a"]))


def test_local_point_budget(mesh):
    assert mh.local_point_budget(mesh, 64 * mesh.size) == 64 * mesh.size


def test_sharded_step_from_local_feed(mesh, rng):
    """Feed a sharded step via window_from_local; result must equal the
    single-device step bit-for-bit (the psum'd normal equations are exact)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _make_example
    from limovelo_tpu.mapping import GridParams, make_map
    from limovelo_tpu.step import lio_step

    n_pts = 128 * mesh.size
    inp, m, config, grid = _make_example(n_pts=n_pts, n_imu=8)
    config = config.replace(map_table_size=1 << 10)
    grid = GridParams.from_config(config)
    m = make_map(grid)

    # single-device reference
    out_ref = lio_step(inp, m, config.static(), grid)

    # multi-host-style feed: local rows -> global sharded arrays
    gp, gt, gm = mh.window_from_local(
        mesh, np.asarray(inp.pts), np.asarray(inp.pts_t), np.asarray(inp.pts_mask)
    )
    inp_sh = inp._replace(pts=gp, pts_t=gt, pts_mask=gm)
    m2 = make_map(grid)
    step = make_sharded_step(mesh, config, grid)
    out_sh = step(inp_sh, m2)

    np.testing.assert_allclose(
        np.asarray(out_ref.x.p), np.asarray(out_sh.x.p), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_ref.x.R), np.asarray(out_sh.x.R), atol=1e-5
    )
    assert int(out_ref.diag.num_matches) == int(out_sh.diag.num_matches)
