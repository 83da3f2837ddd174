"""Checkpoint / resume equivalence (VERDICT r2 #8).

The reference has NO persistence (SURVEY.md §5 checkpoint row); our
checkpoints claim *exact* resume, so prove it: run A straight through; run B
feeds the same stream but checkpoints mid-run, loads into a FRESH pipeline,
and continues — the post-resume trajectory must match A's step for step.
Covers both mapping modes (online inserts per window; offline re-deskews
full rotations from the `_anchors` history, which round 2 forgot to
persist).
"""

import numpy as np
import pytest

from limovelo_tpu import Config
from limovelo_tpu.io.simulate import (
    circle_trajectory,
    room_world,
    simulate,
)
from limovelo_tpu.mapping import GridParams
from limovelo_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint
from limovelo_tpu.runtime.pipeline import LioPipeline

GRID = GridParams(table_size=1 << 14, coarse_factor=4, voxel_size=0.2, probe_length=8)


def _cfg(**kw):
    base = dict(
        real_time=False, mapping_online=True, min_dist=0.5,
        downsample_prec=0.3, full_rotation_time=0.1, imu_rate=200.0,
        real_time_delay=0.1, empty_lidar_time=0.5, degeneracy_threshold=0.0,
        point_buckets=(2048, 4096, 8192), ds_buckets=(1024, 2048),
        imu_buckets=(64,), map_table_size=1 << 14,
    )
    base.update(kw)
    return Config(**base)


def _feed(pipe, sim, t_stop=None, t_start=None):
    """Stream [t_start, t_stop) of the sim into the pipeline, spinning as
    data arrives (same interleaving as replay_into)."""
    ii = 0
    m = len(sim.imu_t)
    for scan in sim.scans:
        scan_end = scan.t[-1] if len(scan.t) else scan.stamp
        if t_start is not None and scan_end < t_start:
            # skip data already fed before the checkpoint
            while ii < m and sim.imu_t[ii] <= scan_end:
                ii += 1
            continue
        if t_stop is not None and scan_end >= t_stop:
            break
        while ii < m and sim.imu_t[ii] <= scan_end:
            if t_start is None or sim.imu_t[ii] >= t_start:
                pipe.add_imu(sim.imu_t[ii], sim.imu_a[ii], sim.imu_w[ii])
            ii += 1
        pipe.add_scan(scan.pts, scan.t)
        pipe.spin()
    if t_stop is not None:
        # the IMUs between the last fed scan and the cut belong to the
        # pre-checkpoint half: run A gets them with the next scan's batch,
        # so run B must buffer them before checkpointing or the resumed
        # propagation integrates a gap
        while ii < m and sim.imu_t[ii] < t_stop:
            pipe.add_imu(sim.imu_t[ii], sim.imu_a[ii], sim.imu_w[ii])
            ii += 1
        pipe.spin()
    pipe.flush()


@pytest.mark.slow
class TestResumeEquivalence:
    @pytest.mark.parametrize("mapping_online", [True, False])
    def test_resume_matches_uninterrupted(self, tmp_path, mapping_online):
        cfg = _cfg(mapping_online=mapping_online)
        traj = circle_trajectory(radius=4.0, omega=0.4)
        world = room_world(size=24.0, n_boxes=10)
        sim = simulate(world, traj, cfg, duration=5.0, lidar_lines=12,
                       pts_per_line=180, imu_rate=200.0, seed=7)
        t_cut = 2.55   # between scans

        # run A: uninterrupted
        pa = LioPipeline(cfg, grid=GRID)
        _feed(pa, sim)
        res_a = pa.result

        # run B: feed to t_cut, checkpoint, load into a FRESH pipeline,
        # feed the rest
        pb1 = LioPipeline(cfg, grid=GRID)
        _feed(pb1, sim, t_stop=t_cut)
        ck = str(tmp_path / f"ck_{mapping_online}.npz")
        save_checkpoint(ck, pb1)

        pb2 = LioPipeline(cfg, grid=GRID)
        load_checkpoint(ck, pb2)
        _feed(pb2, sim, t_start=t_cut)
        res_b = pb2.result

        # align the post-resume records of B with A's records at those times
        tb = res_b.times
        ta = res_a.times
        post = tb > t_cut
        assert post.sum() > 10, "no post-resume updates"
        # every post-resume update time must appear in A (same schedule)
        for i in np.nonzero(post)[0]:
            j = np.argmin(np.abs(ta - tb[i]))
            assert abs(ta[j] - tb[i]) < 1e-6, (
                f"resume diverged in window schedule at t={tb[i]:.4f}"
            )
            np.testing.assert_allclose(
                res_b.positions[i], res_a.positions[j], atol=2e-3,
                err_msg=f"trajectory diverged after resume at t={tb[i]:.3f}",
            )


class TestCheckpointRoundtrip:
    def test_fields_roundtrip(self, tmp_path):
        """Fast smoke: every persisted field survives save→load, including
        the round-2 gaps (_anchors, last_map_time, accumulator tail)."""
        cfg = _cfg()
        traj = circle_trajectory(radius=4.0, omega=0.4)
        world = room_world(size=20.0, n_boxes=6)
        sim = simulate(world, traj, cfg, duration=1.2, lidar_lines=8,
                       pts_per_line=96, imu_rate=200.0, seed=3)
        pipe = LioPipeline(cfg, grid=GRID)
        _feed(pipe, sim)
        assert pipe._anchors, "no anchors accumulated"
        ck = str(tmp_path / "ck.npz")
        save_checkpoint(ck, pipe)

        fresh = LioPipeline(cfg, grid=GRID)
        load_checkpoint(ck, fresh)
        assert len(fresh._anchors) == len(pipe._anchors)
        np.testing.assert_allclose(
            np.asarray(fresh._anchors[-1][1].p),
            np.asarray(pipe._anchors[-1][1].p),
        )
        assert fresh.last_map_time == pipe.last_map_time
        assert fresh._last_processed_t2 == pipe._last_processed_t2
        assert len(fresh.accum._imu_t) == len(pipe.accum._imu_t)
        got_pts = np.concatenate(fresh.accum._pts) if fresh.accum._pts else np.zeros((0, 3))
        want_pts = np.concatenate(pipe.accum._pts) if pipe.accum._pts else np.zeros((0, 3))
        assert len(got_pts) == len(want_pts)
        np.testing.assert_allclose(fresh.accum.initial_time, pipe.accum.initial_time)
