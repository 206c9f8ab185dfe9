"""Headless viewer + PNG writer (IOWrapper visualization parity,
PangolinDSOViewer/KeyFrameDisplay re-imagined as artifact rendering)."""

import os

import numpy as np


def test_png_roundtrip(tmp_path):
    from dmvio_tpu.io import image_rw

    rng = np.random.default_rng(0)
    gray = rng.integers(0, 255, (37, 53), dtype=np.uint8)
    p = str(tmp_path / "g.png")
    image_rw.write_png(p, gray)
    back = image_rw.read_png_gray(p)
    assert back.shape == (37, 53)
    assert np.abs(back - gray.astype(np.float32)).max() < 1e-3

    rgb = rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)
    p2 = str(tmp_path / "c.png")
    image_rw.write_png(p2, rgb)
    assert os.path.getsize(p2) > 0


def test_headless_viewer_artifacts(tmp_path):
    from dmvio_tpu.io.viewer import HeadlessViewer

    v = HeadlessViewer(str(tmp_path / "viz"))
    rng = np.random.default_rng(1)
    R = np.eye(3)
    for k in range(30):
        t = np.array([0.02 * k, 0.001 * k * k, 0.01 * k])
        v.publish_cam_pose(k, 0.05 * k, R, t)
    v.publish_keyframes({0: (R, np.zeros(3)),
                         10: (R, np.array([0.2, 0.1, 0.1]))})
    v.publish_system_status(1)
    v.publish_transform_dso_to_imu(1.4, np.zeros(2))
    img = rng.integers(0, 255, (48, 64)).astype(np.float32)
    u = rng.uniform(2, 62, 100)
    w = rng.uniform(2, 46, 100)
    d = rng.uniform(0.3, 3.0, 100)
    v.push_depth_image(10, u, w, d, img=img)
    v.join()
    out = tmp_path / "viz"
    assert (out / "index.html").exists()
    assert (out / "trajectory.png").exists()
    assert (out / "depth_kf000010.png").exists()


def test_full_system_publishes_depth(tmp_path):
    """End-to-end: a wants_depth_images wrapper receives depth maps."""
    import jax.numpy as jnp

    from dmvio_tpu.io.output_wrapper import Output3DWrapper
    from dmvio_tpu.models import full_system, window
    from dmvio_tpu.utils import lie, synthetic
    from dmvio_tpu.utils.camera import Calib

    H, W = 96, 128
    calib = Calib.create(80.0, 80.0, W / 2 - 0.5, H / 2 - 0.5)
    scene = synthetic.default_scene(depth=2.0)

    class DepthSink(Output3DWrapper):
        wants_depth_images = True

        def __init__(self):
            self.depths = []
            self.graphs = []

        def push_depth_image(self, frame_id, u, v, idepth, img=None):
            self.depths.append((frame_id, len(u), img is not None))

        def publish_graph(self, conn):
            self.graphs.append(conn)

    cfg = window.Config(f_max=5, p_max=256, i_max=256, max_frames=4,
                        levels=3, ba_iters=3)
    fs = full_system.FullSystem(calib, H, W, cfg)
    sink = DepthSink()
    fs.output_wrappers.append(sink)
    for i in range(26):
        c = np.array([0.05 * i, 0.012 * i, 0.006 * i])
        w_vec = np.array([0.004 * i, -0.006 * i, 0.002 * i])
        R = np.asarray(lie.so3_exp(jnp.asarray(w_vec)))
        img = synthetic.render(scene, jnp.asarray(R),
                               jnp.asarray(-R @ c), calib, H, W)
        fs.add_frame(jnp.asarray(img), 0.05 * i)
    assert fs.initialized
    assert len(sink.depths) > 0
    fid, npts, has_img = sink.depths[-1]
    assert npts > 20 and has_img
    assert len(sink.graphs) > 0 and len(sink.graphs[-1]) >= 2


def test_live_viewer_serves_state():
    """LiveViewer (io/live_viewer.py): the HTTP equivalent of the
    reference's live Pangolin observer — serves the page, the state JSON
    and the depth JPEG while events stream in."""
    import json
    import urllib.request

    import numpy as np

    from dmvio_tpu.io.live_viewer import LiveViewer
    from dmvio_tpu.io import output_wrapper as ow

    v = LiveViewer(port=0)
    try:
        base = f"http://127.0.0.1:{v.port}"
        # Feed observer events like the pipeline would.
        for i in range(5):
            R = np.eye(3)
            v.publish_cam_pose(i, 0.05 * i, R, np.array([0.01 * i, 0, 0]))
        v.publish_keyframes({0: (np.eye(3), np.zeros(3)),
                             3: (np.eye(3), np.array([0.03, 0, 0]))})
        v.publish_system_status(ow.VISUAL_INERTIAL)
        v.publish_transform_dso_to_imu(0.42, np.zeros(2))
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (48, 64)).astype(np.float32)
        v.push_depth_image(3, np.array([5, 10, 20]), np.array([7, 14, 28]),
                           np.array([0.5, 1.0, 2.0]), img=img)

        page = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"dmvio_tpu live" in page
        st = json.loads(urllib.request.urlopen(
            base + "/state.json", timeout=10).read())
        assert st["frame"] == 4 and len(st["traj"]) == 5
        assert st["n_kfs"] == 2 and st["status"] == ow.VISUAL_INERTIAL
        assert abs(st["scale"] - 0.42) < 1e-9
        jpg = urllib.request.urlopen(base + "/depth.jpg", timeout=10).read()
        assert jpg[:2] == b"\xff\xd8"   # JPEG magic
    finally:
        v.close()
