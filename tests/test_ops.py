"""Plane fit + voxel downsample vs numpy oracles."""

import numpy as np

import jax.numpy as jnp

from limovelo_tpu.ops import fit_planes, point_plane_distance, voxel_downsample


def make_plane_neighbors(rng, n, k=5, noise=0.0):
    """Random planes with k points on each; returns neighbors + true (n, d)."""
    normals = rng.normal(size=(n, 3))
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    ds = rng.uniform(0.5, 3.0, size=n)
    # build tangent bases
    ref = np.where(np.abs(normals[:, 2:3]) < 0.9, [[0, 0, 1.0]], [[1.0, 0, 0]])
    b1 = np.cross(normals, ref)
    b1 /= np.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = np.cross(normals, b1)
    uv = rng.uniform(-0.3, 0.3, size=(n, k, 2))
    pts = (
        -ds[:, None, None] * normals[:, None, :]
        + uv[..., 0:1] * b1[:, None, :]
        + uv[..., 1:2] * b2[:, None, :]
    )
    pts += rng.normal(size=pts.shape) * noise
    return pts.astype(np.float32), normals.astype(np.float32), ds.astype(np.float32)


class TestPlaneFit:
    def test_exact_planes(self, rng):
        pts, normals, ds = make_plane_neighbors(rng, 64)
        sq = np.sum(pts**2, axis=-1)  # irrelevant magnitude, just small enough
        sq = np.sort(np.full((64, 5), 0.01, np.float32), axis=1)
        # linearity gate off: 5 uniform samples occasionally land near a line
        # by chance, which the production gate rightly rejects — here we only
        # check the exactness of the fit itself
        fit = fit_planes(jnp.asarray(pts), jnp.asarray(sq), jnp.ones((64, 5), bool),
                         2.0, 0.1, linearity=0.0)
        got_n = np.asarray(fit.normal)
        # normal defined up to scaling by 1/d: reference normalizes with D=1/|v|>0,
        # so got_n ~ ±normals with d>0
        dots = np.abs(np.sum(got_n * normals, axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-3)
        assert np.asarray(fit.valid).all()

    def test_residual_gate_rejects_nonplanar(self, rng):
        pts = rng.uniform(-1, 1, size=(32, 5, 3)).astype(np.float32)  # random blobs
        sq = np.full((32, 5), 0.01, np.float32)
        fit = fit_planes(jnp.asarray(pts), jnp.asarray(sq), jnp.ones((32, 5), bool), 2.0, 0.05)
        # nearly all random 5-point sets are not planar within 5cm
        assert np.asarray(fit.valid).sum() < 4

    def test_distance_gate(self, rng):
        pts, _, _ = make_plane_neighbors(rng, 8)
        sq = np.full((8, 5), 25.0, np.float32)  # farther than MAX_DIST_PLANE=2 → 4.0
        fit = fit_planes(jnp.asarray(pts), jnp.asarray(sq), jnp.ones((8, 5), bool), 2.0, 0.1)
        assert not np.asarray(fit.valid).any()

    def test_neighbor_count_gate(self, rng):
        pts, _, _ = make_plane_neighbors(rng, 8)
        sq = np.full((8, 5), 0.01, np.float32)
        nb_valid = np.ones((8, 5), bool)
        nb_valid[:, -1] = False  # only 4 of 5 neighbors
        fit = fit_planes(jnp.asarray(pts), jnp.asarray(sq), jnp.asarray(nb_valid), 2.0, 0.1)
        assert not np.asarray(fit.valid).any()

    def test_signed_distance(self, rng):
        pts, normals, ds = make_plane_neighbors(rng, 16)
        sq = np.full((16, 5), 0.01, np.float32)
        fit = fit_planes(jnp.asarray(pts), jnp.asarray(sq), jnp.ones((16, 5), bool), 2.0, 0.1)
        # a point ON the plane has distance 0
        on_plane = pts[:, 0, :]
        d = np.asarray(point_plane_distance(jnp.asarray(on_plane), fit))
        np.testing.assert_allclose(d, 0.0, atol=1e-3)
        # offsetting along the fitted normal changes distance by that amount
        off = on_plane + np.asarray(fit.normal) * 0.25
        d2 = np.asarray(point_plane_distance(jnp.asarray(off), fit))
        np.testing.assert_allclose(d2, 0.25, atol=1e-3)


class TestVoxelDownsample:
    def test_medoid_representatives(self, rng):
        pts = rng.uniform(0, 2, size=(200, 3)).astype(np.float32)
        out = voxel_downsample(jnp.asarray(pts), jnp.ones(200, bool), 0.5)
        vox = np.floor(pts / 0.5).astype(np.int64)
        uniq = np.unique(vox, axis=0)
        assert int(out.count) == len(uniq)
        got = np.asarray(out.pts)[np.asarray(out.mask)]
        # every output must be the INPUT point nearest its voxel centroid
        # (not the centroid itself — see ops/voxel.py module docstring)
        want = []
        for u in uniq:
            members = pts[(vox == u).all(-1)]
            c = members.mean(0)
            want.append(members[np.argmin(((members - c) ** 2).sum(-1))])
        want = np.array(want)
        got_sorted = got[np.lexsort(got.T)]
        want_sorted = want[np.lexsort(want.T)]
        np.testing.assert_allclose(got_sorted, want_sorted, atol=1e-5)

    def test_mask_and_padding(self, rng):
        pts = rng.uniform(0, 1, size=(64, 3)).astype(np.float32)
        mask = np.zeros(64, bool)
        mask[:5] = True
        out = voxel_downsample(jnp.asarray(pts), jnp.asarray(mask), 10.0)
        assert int(out.count) == 1  # all 5 in one huge voxel
        c = pts[:5].mean(0)
        want = pts[:5][np.argmin(((pts[:5] - c) ** 2).sum(-1))]
        np.testing.assert_allclose(np.asarray(out.pts)[0], want, atol=1e-5)
        assert not np.asarray(out.mask)[1:].any()

    def test_all_masked(self):
        pts = np.zeros((16, 3), np.float32)
        out = voxel_downsample(jnp.asarray(pts), jnp.zeros(16, bool), 0.5)
        assert int(out.count) == 0
        assert not np.asarray(out.mask).any()

    def test_negative_coords(self, rng):
        pts = rng.uniform(-3, -1, size=(50, 3)).astype(np.float32)
        out = voxel_downsample(jnp.asarray(pts), jnp.ones(50, bool), 0.5)
        vox = np.unique(np.floor(pts / 0.5).astype(np.int64), axis=0)
        assert int(out.count) == len(vox)


class TestOnionDownsample:
    def _oracle(self, pts, mask, rate):
        """Direct transcription of the reference's banded decimation
        (Compensator.cpp:165-181) as a per-point loop."""
        bands = [(0, 4, 256), (4, 6, 64), (6, 9, 32), (9, 12, 16),
                 (12, 22, 8), (22, 30, 4), (30, 50, 2)]
        keep = []
        for i, p in enumerate(pts):
            if not mask[i]:
                continue
            r = np.linalg.norm(p)
            kept = r > 50
            for lo, hi, div in bands:
                step = div // rate
                if lo < r < hi and (step <= 1 or i % step == 0):
                    kept = True
            if kept:
                keep.append(i)
        return np.array(keep, int)

    def test_matches_reference_semantics(self, rng):
        from limovelo_tpu.ops.voxel import onion_downsample

        n = 1024
        dirs = rng.normal(size=(n, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        pts = (dirs * rng.uniform(0.5, 60, (n, 1))).astype(np.float32)
        mask = rng.random(n) < 0.9
        for rate in (1, 4, 32):
            want = self._oracle(pts, mask, rate)
            ds = onion_downsample(jnp.asarray(pts), jnp.asarray(mask), rate)
            got_n = int(ds.count)
            assert got_n == len(want)
            np.testing.assert_allclose(
                np.asarray(ds.pts)[: got_n], pts[want], atol=0
            )
            # order preserved, dense prefix
            assert np.asarray(ds.mask)[:got_n].all()
            assert not np.asarray(ds.mask)[got_n:].any()

    def test_far_points_always_kept(self, rng):
        from limovelo_tpu.ops.voxel import onion_downsample

        pts = (rng.normal(size=(64, 3)).astype(np.float32)) * 0.01
        pts[:, 0] += 60.0  # all beyond 50 m
        ds = onion_downsample(jnp.asarray(pts), jnp.ones(64, bool), 32)
        assert int(ds.count) == 64
