"""Publisher surface: planes / pose-array packets and pipeline wiring.

Covers the /limovelo/planes and /limovelo/states analogs
(`/root/reference/include/Headers/Publishers.hpp:47-116`)."""

import numpy as np
import pytest

from limovelo_tpu import Config
from limovelo_tpu.io.simulate import Trajectory, replay_into, room_world, simulate
from limovelo_tpu.mapping import GridParams
from limovelo_tpu.runtime.pipeline import LioPipeline
from limovelo_tpu.runtime.publishers import PlanesPacket, Publisher

from scipy.spatial.transform import Rotation as Rsc


class TestPlanesPacket:
    def test_quaternion_rotates_x_onto_normal(self, rng):
        n = rng.normal(size=(128, 3))
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        pkt = PlanesPacket(t=0.0, centroids=np.zeros((128, 3)), normals=n)
        q = pkt.quaternions()
        np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-6)
        got = Rsc.from_quat(q).apply(np.tile([1.0, 0, 0], (128, 1)))
        np.testing.assert_allclose(got, n, atol=1e-5)

    def test_antipodal_normal(self):
        pkt = PlanesPacket(
            t=0.0, centroids=np.zeros((1, 3)), normals=np.array([[-1.0, 0, 0]])
        )
        q = pkt.quaternions()
        got = Rsc.from_quat(q).apply([[1.0, 0, 0]])
        np.testing.assert_allclose(got, [[-1.0, 0, 0]], atol=1e-6)


@pytest.mark.slow
class TestPipelinePublishing:
    def test_planes_and_states_streams(self, rng):
        config = Config(
            real_time=False, mapping_online=True, min_dist=0.5,
            downsample_prec=0.3, full_rotation_time=0.1, imu_rate=200.0,
            real_time_delay=0.1, empty_lidar_time=0.5,
            degeneracy_threshold=0.0,
            point_buckets=(2048, 4096), ds_buckets=(1024, 2048),
            imu_buckets=(64,), map_table_size=1 << 14,
        )
        grid = GridParams(table_size=1 << 14)
        traj = Trajectory(lambda t: np.array([0.0, 0.0, 1.5]), lambda t: 0.0)
        sim = simulate(room_world(size=16.0), traj, config, duration=1.5,
                       lidar_lines=8, pts_per_line=128, imu_rate=200.0, seed=3)

        pub = Publisher()
        planes_seen, states_seen = [], []
        pub.on_planes.append(planes_seen.append)
        pub.on_states.append(states_seen.append)
        pipe = LioPipeline(config, grid=grid, publisher=pub)
        replay_into(pipe, sim)

        assert len(pipe.result.records) > 3
        assert planes_seen and states_seen
        pkt = planes_seen[-1]
        # normals are unit, centroids near the matched geometry (finite, in
        # room bounds), counts match the step's match count
        assert len(pkt.normals) == pipe.result.records[-1].num_matches
        np.testing.assert_allclose(
            np.linalg.norm(pkt.normals, axis=-1), 1.0, atol=1e-4
        )
        assert np.isfinite(pkt.centroids).all()
        assert np.abs(pkt.centroids).max() < 20.0
        spkt = states_seen[-1]
        assert len(spkt.positions) == len(spkt.times) == len(spkt.quaternions)
        assert np.abs(spkt.positions).max() < 1.0  # static platform


class TestIntensityChannel:
    def test_intensity_flows_to_published_clouds(self):
        """Per-point intensity rides decode → accumulator → window →
        published clouds (Point.cpp:172-175 carries intensity end to end;
        VERDICT r2 #10).  The ds cloud's channel is gathered through the
        medoid selection, so every value must be one of the input values."""
        import numpy as np

        from limovelo_tpu import Config
        from limovelo_tpu.io.simulate import (circle_trajectory, replay_into,
                                              room_world, simulate)
        from limovelo_tpu.mapping import GridParams
        from limovelo_tpu.runtime.pipeline import LioPipeline
        from limovelo_tpu.runtime.publishers import Publisher

        cfg = Config(
            real_time=False, mapping_online=True, min_dist=0.5,
            downsample_prec=0.3, full_rotation_time=0.1, imu_rate=200.0,
            real_time_delay=0.1, empty_lidar_time=0.5,
            degeneracy_threshold=0.0,
            point_buckets=(2048, 4096), ds_buckets=(1024, 2048),
            imu_buckets=(64,), map_table_size=1 << 14,
        )
        sim = simulate(room_world(size=20.0, n_boxes=6),
                       circle_trajectory(radius=3.0, omega=0.4), cfg,
                       duration=1.5, lidar_lines=8, pts_per_line=96,
                       imu_rate=200.0, seed=3)
        assert sim.scans[0].intensity is not None
        assert sim.scans[0].intensity.max() > 0

        pub = Publisher()
        got = []
        pub.on_cloud.append(lambda pts, t, intensity: got.append((pts, intensity)))
        legacy = []
        pub.on_cloud.append(lambda pts, t: legacy.append(len(pts)))  # 2-arg OK
        grid = GridParams(table_size=1 << 14, coarse_factor=4,
                          voxel_size=0.2, probe_length=8)
        pipe = LioPipeline(cfg, grid=grid, publisher=pub)
        replay_into(pipe, sim)
        pipe.flush()
        assert got and legacy
        pts, inten = got[-1]
        assert inten is not None and len(inten) == len(pts)
        assert inten.max() > 0, "intensity lost on the way to the publisher"
        # every published value must be a genuine input intensity
        all_in = np.concatenate([s.intensity for s in sim.scans])
        assert np.isin(np.round(inten, 5), np.round(all_in, 5)).mean() > 0.99

    def test_intensity_colors(self):
        import numpy as np

        from limovelo_tpu.viz.export import intensity_colors

        c = intensity_colors(np.linspace(0, 1, 100))
        assert c.shape == (100, 3) and c.dtype == np.uint8
        assert c[-1, 0] > c[0, 0]
