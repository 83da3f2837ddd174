"""Pallas grouped-KNN kernel vs the XLA `mapping.knn` oracle.

Runs the kernel in interpret mode (CPU backend, see conftest); the same code
path Mosaic-compiles and matches on real TPU (validated on v5e — see the
STATUS note in `ops/pallas/knn.py` for measured numbers).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from limovelo_tpu.mapping.hashgrid import GridParams, insert, knn, make_map
from limovelo_tpu.ops.pallas.knn import GROUP_CAP, group_queries, knn_grouped


@pytest.fixture
def params():
    return GridParams(table_size=1 << 12)


def _populated_map(rng, params, n=4096, center=(150.0, 80.0, 5.0)):
    """Scan-like world (ground disc + walls) far from the origin, so the
    kernel's recentered distance expansion is actually exercised."""
    ang = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(2, 25, n)
    x = center[0] + r * np.cos(ang)
    y = center[1] + r * np.sin(ang)
    z = center[2] + np.where(
        rng.random(n) < 0.3, rng.uniform(0, 3, n), rng.normal(0, 0.05, n)
    )
    pts = np.stack([x, y, z], -1).astype(np.float32)
    m = make_map(params)
    m = insert(m, jnp.asarray(pts), jnp.ones(n, bool), params)
    return m, pts


def test_matches_xla_oracle(rng, params):
    m, world = _populated_map(rng, params)
    q = jnp.asarray(
        (world[rng.choice(len(world), 512, replace=False)]
         + rng.normal(0, 0.05, (512, 3))).astype(np.float32)
    )
    nb0, sq0, v0 = knn(m, q, params, k=5, rings=1)
    nb1, sq1, v1 = knn_grouped(m, q, params, k=5, g_max=512, interpret=True)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    v = np.asarray(v0)
    np.testing.assert_allclose(
        np.asarray(sq0)[v], np.asarray(sq1)[v], rtol=0, atol=1e-5
    )
    # winning neighbor coordinates must be bit-identical (gathered from the
    # same table rows)
    np.testing.assert_allclose(
        np.asarray(nb0)[v], np.asarray(nb1)[v], rtol=0, atol=1e-6
    )


def test_group_overflow_marks_invalid(rng, params):
    m, world = _populated_map(rng, params)
    q = jnp.asarray(world[:256])
    g_max = 8  # far fewer groups than distinct coarse voxels
    _, _, rank_of, _, _ = group_queries(m, q, params, g_max)
    nb, sq, valid = knn_grouped(m, q, params, k=5, g_max=g_max, interpret=True)
    valid = np.asarray(valid)
    # overflowed queries report no matches rather than garbage
    assert not valid.all()
    assert np.all(np.isinf(np.asarray(sq)[~valid]))


def test_group_capacity_split(rng, params):
    # >GROUP_CAP queries in one coarse voxel must split across groups and all
    # still resolve
    m, world = _populated_map(rng, params)
    base = world[0]
    q = jnp.asarray(
        (base + rng.uniform(-0.3, 0.3, (GROUP_CAP + 40, 3))).astype(np.float32)
    )
    nb0, sq0, v0 = knn(m, q, params, k=5, rings=1)
    nb1, sq1, v1 = knn_grouped(m, q, params, k=5, g_max=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    v = np.asarray(v0)
    np.testing.assert_allclose(
        np.asarray(sq0)[v], np.asarray(sq1)[v], rtol=0, atol=1e-5
    )


def test_empty_map_all_invalid(rng, params):
    m = make_map(params)
    q = jnp.asarray(rng.uniform(-5, 5, (128, 3)).astype(np.float32))
    nb, sq, valid = knn_grouped(m, q, params, k=5, g_max=128, interpret=True)
    assert not np.asarray(valid).any()


def test_tiered_rings3_recall_vs_exact(rng, params):
    """Production envelope (rings=3, max_buckets=32) on a SPARSE map where
    1-ring misses true neighbors: the group-tiered kernel must reach the
    same ≥99.5% recall bar as the XLA tiered path (tests/test_knn_fidelity
    standard)."""
    n = 1500
    world = np.stack([
        rng.uniform(-40, 40, n), rng.uniform(-40, 40, n),
        rng.normal(0, 1.0, n),
    ], -1).astype(np.float32)
    m = make_map(params)
    m = insert(m, jnp.asarray(world), jnp.ones(n, bool), params)
    nq = 256
    q = np.stack([
        rng.uniform(-30, 30, nq), rng.uniform(-30, 30, nq),
        rng.normal(0, 1.0, nq),
    ], -1).astype(np.float32)

    gate = 2.0  # MAX_DIST_PLANE
    nb1, sq1, v1 = knn_grouped(m, jnp.asarray(q), params, k=5, g_max=256,
                               rings=3, max_buckets=32, interpret=True)
    # exact oracle
    d2 = ((q[:, None, :] - world[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :5]
    od2 = np.take_along_axis(d2, idx, axis=1)
    want = od2[od2 <= gate * gate]
    got = np.asarray(sq1)
    gv = np.asarray(v1) & (got <= gate * gate)
    hits = 0
    for i in range(nq):
        g = np.sort(got[i][gv[i]])
        w = np.sort(od2[i][od2[i] <= gate * gate])
        j = 0
        for wv in w:
            while j < len(g) and g[j] < wv - 1e-4:
                j += 1
            if j < len(g) and abs(g[j] - wv) <= 1e-4:
                hits += 1
                j += 1
    recall = hits / max(len(want), 1)
    assert recall >= 0.995, f"tiered rings=3 recall {recall:.4f}"


def test_tiered_matches_xla_on_dense(rng, params):
    """On the dense scan-like map the tiered rings=3 kernel must agree with
    the XLA tiered path for every valid pair (same budget semantics)."""
    m, world = _populated_map(rng, params)
    q = jnp.asarray(
        (world[rng.choice(len(world), 256, replace=False)]
         + rng.normal(0, 0.05, (256, 3))).astype(np.float32)
    )
    nb0, sq0, v0 = knn(m, q, params, k=5, rings=3, max_buckets=32)
    nb1, sq1, v1 = knn_grouped(m, q, params, k=5, g_max=256, rings=3,
                               max_buckets=32, interpret=True)
    # the tier bases differ (per-query vs per-group): compare distances of
    # the agreed-valid pairs — the k-NN sets must match to the gate on this
    # dense scene, where both budgets are effectively exhaustive locally
    v = np.asarray(v0) & np.asarray(v1)
    np.testing.assert_allclose(
        np.asarray(sq0)[v], np.asarray(sq1)[v], rtol=0, atol=1e-4
    )
    assert v.mean() > 0.95
