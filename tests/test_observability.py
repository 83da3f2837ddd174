"""Observability: map-saturation counters, degeneracy eigenvalues, online
extrinsics, and TF packets must reach the host telemetry / JSONL metrics.

Round-1 VERDICT items: silent probe-exhaustion drops (`hashgrid.insert`),
missing `print_degeneracy_values` / `print_extrinsics` analogs
(`/root/reference/src/main.cpp:96,156`), and no TF packet
(`Publishers.hpp:118-135`).
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from limovelo_tpu import Config
from limovelo_tpu.io.simulate import (
    circle_trajectory,
    replay_into,
    room_world,
    simulate,
)
from limovelo_tpu.mapping import GridParams, insert, make_map
from limovelo_tpu.runtime.pipeline import LioPipeline
from limovelo_tpu.runtime.publishers import Publisher


def _cfg(**kw):
    base = dict(
        real_time=False,
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


class TestSaturationCounter:
    def test_insert_counts_probe_exhaustion(self, rng):
        """A deliberately tiny table must report dropped inserts, not lose
        them silently (hashgrid probe-chain exhaustion)."""
        grid = GridParams(table_size=8, coarse_factor=2, voxel_size=0.2,
                          probe_length=2)
        m = make_map(grid)
        # hundreds of distinct coarse buckets into an 8-row table
        pts = rng.uniform(-40, 40, size=(2048, 3)).astype(np.float32)
        m = insert(m, jnp.asarray(pts), jnp.ones(2048, bool), grid)
        assert int(m.dropped) > 0, "saturated insert reported zero drops"
        # conservation: every deduped candidate either landed or was counted
        assert int(m.num_points) > 0

    def test_no_drops_on_roomy_table(self, rng):
        grid = GridParams(table_size=1 << 14, coarse_factor=4, voxel_size=0.2,
                          probe_length=8)
        m = make_map(grid)
        pts = rng.uniform(-20, 20, size=(2048, 3)).astype(np.float32)
        m = insert(m, jnp.asarray(pts), jnp.ones(2048, bool), grid)
        assert int(m.dropped) == 0

    def test_prune_preserves_counter(self, rng):
        from limovelo_tpu.mapping import prune

        grid = GridParams(table_size=8, coarse_factor=2, voxel_size=0.2,
                          probe_length=2)
        m = make_map(grid)
        pts = rng.uniform(-40, 40, size=(1024, 3)).astype(np.float32)
        m = insert(m, jnp.asarray(pts), jnp.ones(1024, bool), grid)
        before = int(m.dropped)
        m = prune(m, jnp.zeros(3), jnp.float32(5.0), grid)
        assert int(m.dropped) == before


@pytest.mark.slow
class TestPipelineObservability:
    @pytest.fixture(scope="class")
    def sim(self):
        traj = circle_trajectory(radius=4.0, omega=0.4)
        world = room_world(size=24.0, n_boxes=10)
        return simulate(world, traj, _cfg(), duration=3.0, lidar_lines=10,
                        pts_per_line=150, imu_rate=200.0, seed=11)

    def test_saturated_run_reports_drops(self, sim, tmp_path):
        """A run against a too-small map table surfaces drops in StepRecord
        AND the JSONL metrics stream."""
        metrics = tmp_path / "metrics.jsonl"
        pub = Publisher(metrics_path=str(metrics))
        tiny = GridParams(table_size=64, coarse_factor=4, voxel_size=0.2,
                          probe_length=4)
        pipe = LioPipeline(_cfg(map_table_size=64, map_probe_length=4),
                           grid=tiny, publisher=pub)
        replay_into(pipe, sim)
        pipe.flush()
        recs = pipe.result.records
        assert recs
        assert recs[-1].map_dropped > 0, "saturated run reported zero drops"
        rows = [json.loads(l) for l in metrics.read_text().splitlines()]
        assert any(r.get("map_dropped", 0) > 0 for r in rows)

    def test_degeneracy_and_extrinsics_in_metrics(self, sim, tmp_path):
        """print_degeneracy_values / print_extrinsics analogs: eigenvalues and
        extrinsics land in the JSONL when enabled, extrinsics packets fire."""
        metrics = tmp_path / "metrics.jsonl"
        pub = Publisher(metrics_path=str(metrics), log_degeneracy=True,
                        log_extrinsics=True)
        ext_pkts = []
        pub.on_extrinsics.append(ext_pkts.append)
        cfg = _cfg(print_extrinsics=True, print_degeneracy_values=True)
        grid = GridParams(table_size=1 << 14, coarse_factor=4, voxel_size=0.2,
                          probe_length=8)
        pipe = LioPipeline(cfg, grid=grid, publisher=pub)
        replay_into(pipe, sim)
        pipe.flush()
        recs = pipe.result.records
        assert recs
        # eigenvalues must be real diagnostics: finite, non-negative, and not
        # all zero once the map has content
        eig = recs[-1].eigenvalues
        assert eig.shape == (12,)
        assert np.all(np.isfinite(eig)) and eig.max() > 0
        # extrinsics: config has identity extrinsics; with estimation off the
        # telemetry must reproduce it exactly
        np.testing.assert_allclose(recs[-1].extr_rotvec, 0.0, atol=1e-5)
        np.testing.assert_allclose(recs[-1].extr_t, 0.0, atol=1e-5)
        assert ext_pkts, "extrinsics packets never fired"
        rows = [json.loads(l) for l in metrics.read_text().splitlines()]
        assert "eigenvalues" in rows[-1] and len(rows[-1]["eigenvalues"]) == 12
        assert "extr_rotvec" in rows[-1]

    def test_tf_packets(self, sim):
        """TF broadcast analog: one map→body transform per state update,
        consistent with the StatePacket pose."""
        pub = Publisher()
        tfs, states = [], []
        pub.on_tf.append(tfs.append)
        pub.on_state.append(states.append)
        grid = GridParams(table_size=1 << 14, coarse_factor=4, voxel_size=0.2,
                          probe_length=8)
        pipe = LioPipeline(_cfg(), grid=grid, publisher=pub)
        replay_into(pipe, sim)
        pipe.flush()
        assert len(tfs) == len(states) > 0
        for tf, st in zip(tfs, states):
            assert tf.parent == "map" and tf.child == "body"
            np.testing.assert_allclose(tf.translation, st.p)
            np.testing.assert_allclose(tf.quaternion, st.q)


class TestProfiling:
    def test_stage_timers(self):
        from limovelo_tpu.runtime.profiling import StageTimers

        t = StageTimers()
        for _ in range(5):
            with t("deskew"):
                pass
            with t("update"):
                pass
        s = t.summary()
        assert s["deskew"]["n"] == 5 and s["update"]["n"] == 5
        assert "p95_ms" in s["deskew"]
        assert "deskew" in t.report()

    def test_trace_capture(self, tmp_path):
        """jax.profiler trace context produces a trace directory
        (SURVEY.md §5 tracing row — the reference's MicroTimer is dead
        code; our profiler captures real device/host spans)."""
        import os

        import jax.numpy as jnp

        from limovelo_tpu.runtime.profiling import annotate, trace

        logdir = str(tmp_path / "trace")
        with trace(logdir):
            with annotate("test-span"):
                x = jnp.ones((64, 64))
                (x @ x).block_until_ready()
        found = []
        for root, _, files in os.walk(logdir):
            found += files
        assert found, "profiler produced no trace files"
