"""Fault injection: drop / duplicate / reorder sensor packets.

SURVEY.md §5 failure-detection plan: the reference has almost no failure
handling (a never-called stream-death detector, a missing-timestamp fallback).
Here every transport fault the plan names is exercised against the full
pipeline on a static platform, where the correct answer (stay put) is known.
"""

import numpy as np
import pytest

from limovelo_tpu import Config
from limovelo_tpu.io.simulate import Trajectory, room_world, simulate
from limovelo_tpu.mapping import GridParams
from limovelo_tpu.runtime.accumulator import Accumulator
from limovelo_tpu.runtime.pipeline import LioPipeline


def _config(**kw):
    base = dict(
        real_time=False, mapping_online=True, min_dist=0.5,
        downsample_prec=0.3, full_rotation_time=0.1, imu_rate=200.0,
        real_time_delay=0.1, empty_lidar_time=0.5, degeneracy_threshold=0.0,
        point_buckets=(2048, 4096), ds_buckets=(1024, 2048),
        imu_buckets=(64,), map_table_size=1 << 14,
    )
    base.update(kw)
    return Config(**base)


def _static_sim(config, duration=2.5, seed=1):
    traj = Trajectory(lambda t: np.array([0.0, 0.0, 1.5]), lambda t: 0.0)
    return simulate(room_world(size=16.0), traj, config, duration=duration,
                    lidar_lines=8, pts_per_line=128, imu_rate=200.0, seed=seed)


def _replay(pipe, sim, imu_filter=None, scan_filter=None):
    """replay_into with per-packet hooks. imu_filter(i, t, a, w) and
    scan_filter(k, scan) return a list of (possibly modified) packets."""
    ii, m = 0, len(sim.imu_t)
    for k, scan in enumerate(sim.scans):
        scan_end = scan.t[-1] if len(scan.t) else scan.stamp
        while ii < m and sim.imu_t[ii] <= scan_end:
            pkts = [(sim.imu_t[ii], sim.imu_a[ii], sim.imu_w[ii])]
            if imu_filter is not None:
                pkts = imu_filter(ii, *pkts[0])
            for (t, a, w) in pkts:
                pipe.add_imu(t, a, w)
            ii += 1
        scans = [scan] if scan_filter is None else scan_filter(k, scan)
        for s in scans:
            pipe.add_scan(s.pts, s.t)
        pipe.spin()
    pipe.spin()


def _assert_stayed_put(pipe, tol=0.08, min_updates=5):
    assert len(pipe.result.records) >= min_updates
    pos = pipe.result.positions
    assert np.isfinite(pos).all(), "NaN/inf positions under fault"
    drift = np.linalg.norm(pos, axis=-1).max()
    assert drift < tol, f"drift {drift:.3f} m under fault"


@pytest.mark.slow
class TestTransportFaults:
    def test_clean_baseline(self):
        config = _config()
        pipe = LioPipeline(config, grid=GridParams(table_size=1 << 14))
        _replay(pipe, _static_sim(config))
        _assert_stayed_put(pipe)

    def test_dropped_scans(self):
        """A 0.5 s LiDAR blackout mid-run: prediction carries through, the
        estimator re-locks when data returns (window guards, main.cpp:71,81)."""
        config = _config()
        pipe = LioPipeline(config, grid=GridParams(table_size=1 << 14))
        sim = _static_sim(config)
        n = len(sim.scans)

        def drop_mid(k, scan):
            return [] if n // 3 <= k < n // 3 + 5 else [scan]

        _replay(pipe, sim, scan_filter=drop_mid)
        _assert_stayed_put(pipe)
        # updates resumed after the blackout
        assert pipe.result.times.max() > sim.scans[n // 3 + 5].stamp

    def test_duplicate_imu_packets(self):
        """Every 5th IMU delivered twice (dt=0 repeats must be no-ops)."""
        config = _config()
        pipe = LioPipeline(config, grid=GridParams(table_size=1 << 14))

        def dup(i, t, a, w):
            return [(t, a, w)] * (2 if i % 5 == 0 else 1)

        _replay(pipe, _static_sim(config), imu_filter=dup)
        _assert_stayed_put(pipe)

    def test_reordered_imu_packets(self):
        """Adjacent IMU pairs swapped at the transport: the accumulator must
        re-sort so window queries stay correct."""
        config = _config()
        pipe = LioPipeline(config, grid=GridParams(table_size=1 << 14))
        sim = _static_sim(config)

        held = []

        def swap(i, t, a, w):
            # hold even packets, release after the following odd one
            if i % 2 == 0:
                held.append((t, a, w))
                return []
            out = [(t, a, w)] + held[:]
            held.clear()
            return out

        _replay(pipe, sim, imu_filter=swap)
        assert np.all(np.diff(pipe.accum._imu_t) >= 0)
        _assert_stayed_put(pipe)


class TestDetectors:
    def test_stream_death_detector(self):
        config = _config()
        acc = Accumulator(config)
        for i in range(80):
            acc.add_imu(i * 0.005, np.zeros(3), np.zeros(3))
        assert acc.ready()
        t_end = 80 * 0.005
        assert not acc.ended(t_end)
        # 4 s of silence afterwards → dead
        assert acc.ended(t_end + 4.0)

    def test_missing_point_times_fallback(self):
        """All-zero per-point stamps → delta pinned to full_rotation_time
        (Accumulator.cpp:178-201), warned once, never mutates the config."""
        from limovelo_tpu.config import InitializationParams

        # schedule whose deltas differ from full_rotation_time, so the
        # fallback is observable
        config = _config(
            Initialization=InitializationParams(times=(), deltas=(0.02,))
        )
        acc = Accumulator(config)
        acc.add_scan(np.ones((64, 3), np.float32), np.zeros(64))
        assert acc.missing_point_times
        for _ in range(60):
            acc.add_imu(len(acc._imu_t) * 0.005, np.zeros(3), np.zeros(3))
        acc.ready()
        assert acc.update_delta(10.0) == config.full_rotation_time
        assert config.Initialization.deltas[-1] != config.full_rotation_time


@pytest.mark.slow
class TestStreamDeathConsumed:
    def test_spin_stops_on_dead_stream(self):
        """`ended()` is WIRED into the loop (unlike the reference, where
        Accumulator::ended is dead code, Accumulator.cpp:117-122): when the
        sensor stream dies, spin() stops cleanly instead of spinning on the
        stale buffers forever, and flags `stream_dead`."""
        cfg = _config(real_time=True)
        sim = _static_sim(cfg, duration=4.0)
        pipe = LioPipeline(cfg, grid=GridParams(table_size=1 << 14,
                                                coarse_factor=4,
                                                voxel_size=0.2,
                                                probe_length=8))
        # feed only the first 0.8 s of IMU, then ALL remaining scans with no
        # IMU — the stream is dead from the estimator's point of view
        cut = 0.8
        ii = 0
        for scan in sim.scans:
            scan_end = scan.t[-1] if len(scan.t) else scan.stamp
            while ii < len(sim.imu_t) and sim.imu_t[ii] <= scan_end:
                if sim.imu_t[ii] <= cut:
                    pipe.add_imu(sim.imu_t[ii], sim.imu_a[ii], sim.imu_w[ii])
                ii += 1
            pipe.add_scan(scan.pts, scan.t)
            pipe.spin()
        steps = pipe.spin()
        assert pipe.stream_dead, "dead stream never detected"
        assert steps == 0, "spin kept processing a dead stream"
