"""Observer interface for poses, keyframes, depth maps and system status.

TPU-native equivalent of the reference's Output3DWrapper
(src/dso/IOWrapper/Output3DWrapper.h:144-246): consumers (viewers, loggers,
frame-skipping strategies, evaluation sinks) subscribe to pipeline events.
The FullSystem publishes through a list of these — the same observer-chain
pattern the reference uses — with numpy payloads so consumers never touch
device state.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

# SystemStatus (Output3DWrapper.h:46)
VISUAL_INIT, VISUAL_ONLY, VISUAL_INERTIAL, RESETTING = 0, 1, 2, 3


class Output3DWrapper:
    """Base observer: override any subset of the callbacks."""

    def publish_cam_pose(self, frame_id: int, timestamp: float,
                         R_cw: np.ndarray, t_cw: np.ndarray) -> None:
        """Tracked pose of every frame (publishCamPose)."""

    def publish_keyframes(self, kf_poses: Dict[int, tuple]) -> None:
        """Current window keyframe poses after BA (publishKeyframes)."""

    def publish_graph(self, connectivity: Dict[int, List[int]]) -> None:
        """Keyframe co-observation connectivity (publishGraph)."""

    def push_live_frame(self, image: np.ndarray) -> None:
        """The raw tracked frame (pushLiveFrame)."""

    def push_depth_image(self, frame_id: int, u: np.ndarray, v: np.ndarray,
                         idepth: np.ndarray, img=None) -> None:
        """Sparse inverse-depth map of the newest KF (pushDepthImage);
        `img` is the KF's level-0 image when available. Only published
        when a subscribed wrapper sets wants_depth_images (saves one
        device fetch per keyframe otherwise)."""

    def publish_system_status(self, status: int) -> None:
        """VISUAL_INIT / VISUAL_ONLY / VISUAL_INERTIAL / RESETTING
        (publishSystemStatus)."""

    def publish_transform_dso_to_imu(self, s: float,
                                     g2: np.ndarray) -> None:
        """Current metric transform (publishTransformDSOToIMU)."""

    def join(self) -> None:
        """Block until the consumer finished (join)."""

    def reset(self) -> None:
        """System reset notification."""


class TrajectoryLogger(Output3DWrapper):
    """Sample consumer: records every published pose (SampleOutputWrapper
    parity) — useful in tests and as a template."""

    def __init__(self):
        self.poses = []
        self.statuses = []
        self.transforms = []

    def publish_cam_pose(self, frame_id, timestamp, R_cw, t_cw):
        self.poses.append((frame_id, timestamp, R_cw, t_cw))

    def publish_system_status(self, status):
        self.statuses.append(status)

    def publish_transform_dso_to_imu(self, s, g2):
        self.transforms.append((s, np.asarray(g2)))
