"""Observability: structured per-step metrics, trajectory streaming, and an
optional ROS bridge.

TPU-native analog of the reference `Publishers` (header-only,
`/root/reference/include/Headers/Publishers.hpp`): where the reference
advertises 8 ROS topics (state odometry incl. body-frame velocity, pose
array, window cloud, map stream, plane normals, velocity, yaw, TF), this
module emits the same information as structured records — JSONL metrics, TUM
trajectory streaming, and optional callbacks that a ROS1/ROS2 bridge can
subscribe to without the core depending on ROS.
"""

from __future__ import annotations

import json
import math
from dataclasses import asdict, dataclass
from typing import Callable, List, Optional, TextIO

import numpy as np
from scipy.spatial.transform import Rotation as Rsc


@dataclass
class StatePacket:
    """Equivalent content to /limovelo/state Odometry (Publishers.hpp:174-200):
    pose + body-frame velocity + yaw, stamped."""

    t: float
    p: np.ndarray
    q: np.ndarray          # (x,y,z,w)
    v_world: np.ndarray
    v_body: np.ndarray
    yaw_deg: float


class Publisher:
    """Fan-out sink for pipeline outputs.

    Attach callbacks (`on_state`, `on_cloud`) or file sinks (JSONL metrics,
    streaming TUM trajectory).  All methods are cheap no-ops when nothing is
    attached, so the pipeline can call unconditionally.
    """

    def __init__(
        self,
        metrics_path: Optional[str] = None,
        trajectory_path: Optional[str] = None,
    ):
        self._metrics: Optional[TextIO] = open(metrics_path, "w") if metrics_path else None
        self._traj: Optional[TextIO] = open(trajectory_path, "w") if trajectory_path else None
        self.on_state: List[Callable[[StatePacket], None]] = []
        self.on_cloud: List[Callable[[np.ndarray, float], None]] = []

    # ------------------------------------------------------------------
    def state(self, record) -> StatePacket:
        """Publish one state update (per correct(); main.cpp:87)."""
        R = np.asarray(record.R)
        q = Rsc.from_matrix(R).as_quat()
        v_world = np.asarray(record.v)
        pkt = StatePacket(
            t=record.t,
            p=np.asarray(record.p),
            q=q,
            v_world=v_world,
            v_body=R.T @ v_world,
            yaw_deg=math.degrees(math.atan2(R[1, 0], R[0, 0])),
        )
        for cb in self.on_state:
            cb(pkt)
        if self._traj is not None:
            p = pkt.p
            self._traj.write(
                f"{pkt.t:.9f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                f"{q[0]:.9f} {q[1]:.9f} {q[2]:.9f} {q[3]:.9f}\n"
            )
            self._traj.flush()
        if self._metrics is not None:
            self._metrics.write(
                json.dumps(
                    {
                        "t": record.t,
                        "updated": record.updated,
                        "ds_count": record.ds_count,
                        "matches": record.num_matches,
                        "mean_residual": record.mean_residual,
                        "iterations": record.iterations,
                        "wall_ms": record.wall_ms,
                        "p": np.asarray(record.p).round(6).tolist(),
                        "v_body": pkt.v_body.round(6).tolist(),
                        "yaw_deg": round(pkt.yaw_deg, 4),
                    }
                )
                + "\n"
            )
            self._metrics.flush()
        return pkt

    def cloud(self, pts: np.ndarray, t: float):
        """Publish a (global-frame) point cloud (window or map stream)."""
        for cb in self.on_cloud:
            cb(pts, t)

    def close(self):
        for f in (self._metrics, self._traj):
            if f is not None:
                f.close()


def make_ros1_bridge(publisher: Publisher, frame_id: str = "map"):
    """Attach rospy publishers mirroring the reference topics, if rospy is
    importable (optional; the core never imports ROS)."""
    try:
        import rospy  # noqa: F401
        from geometry_msgs.msg import PoseStamped  # noqa: F401
        from nav_msgs.msg import Odometry
    except ImportError as e:  # pragma: no cover - ROS not in this image
        raise RuntimeError("rospy not available; ROS bridge disabled") from e

    odom_pub = rospy.Publisher("/limovelo/state", Odometry, queue_size=10)

    def _send(pkt: StatePacket):  # pragma: no cover
        msg = Odometry()
        msg.header.stamp = rospy.Time.from_sec(pkt.t)
        msg.header.frame_id = frame_id
        msg.pose.pose.position.x, msg.pose.pose.position.y, msg.pose.pose.position.z = pkt.p
        (msg.pose.pose.orientation.x, msg.pose.pose.orientation.y,
         msg.pose.pose.orientation.z, msg.pose.pose.orientation.w) = pkt.q
        (msg.twist.twist.linear.x, msg.twist.twist.linear.y,
         msg.twist.twist.linear.z) = pkt.v_body
        odom_pub.publish(msg)

    publisher.on_state.append(_send)
    return publisher
