"""Value-level unit tests for auxiliary pipeline math.

Covers the pieces VERDICT r1 flagged as untested at value level:
  * network_gui loopback (SIBR protocol framing, train.py:52-66 peer),
  * Stereo.get_occlusion_mask on constructed occlusion cases
    (stereo_utils.py:149-179 semantics),
  * compute_baseline 360 median-radius (x2 DTU) and sphere-fit paths
    (renderer_utils.py:154-170).
"""

import json
import socket
import threading

import numpy as np
import pytest

from gs2mesh_tpu.pipeline.renderer_stage import compute_baseline
from gs2mesh_tpu.pipeline.stereo_stage import Stereo


class _Args:
    def __init__(self, **kw):
        self.renderer_baseline_absolute = None
        self.renderer_baseline_percentage = 7.0
        self.renderer_scene_360 = True
        self.dataset_name = "custom"
        self.__dict__.update(kw)


def test_baseline_360_median_radius():
    R = 3.0
    th = np.linspace(0, 2 * np.pi, 40, endpoint=False)  # mean == center
    center = np.array([1.0, -2.0, 0.5])
    locs = center + R * np.stack([np.cos(th), np.sin(th), np.zeros_like(th)],
                                 axis=1)
    b = compute_baseline(locs, _Args())
    assert b == pytest.approx(R * 0.07, rel=1e-6)
    # DTU back-compat doubles the radius (renderer_utils.py:160-161).
    b_dtu = compute_baseline(locs, _Args(dataset_name="DTU"))
    assert b_dtu == pytest.approx(2 * R * 0.07, rel=1e-6)


def test_baseline_sphere_fit():
    rng = np.random.default_rng(1)
    R = 4.0
    center = np.array([0.3, 0.1, -1.0])
    v = rng.normal(size=(60, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    locs = center + R * v
    b = compute_baseline(locs, _Args(renderer_scene_360=False))
    assert b == pytest.approx(R * 0.07, rel=1e-4)


def test_baseline_absolute_override():
    locs = np.zeros((5, 3))
    b = compute_baseline(locs, _Args(renderer_baseline_absolute=0.123))
    assert b == 0.123


def test_occlusion_mask_consistent_disparity_visible():
    H, W, d = 8, 32, 4
    L2R = np.full((H, W), float(d))
    R2L = np.full((H, W), float(d))
    vis = Stereo.get_occlusion_mask(L2R, R2L, occlusion_threshold=1.0)
    # x - d < 0 for x < d: out of frame -> occluded; everything else
    # reprojects exactly (x - d + d == x) -> visible.
    assert (~vis[:, :d]).all()
    assert vis[:, d:].all()


def test_occlusion_mask_inconsistent_region_occluded():
    H, W, d = 8, 64, 4
    L2R = np.full((H, W), float(d))
    R2L = np.full((H, W), float(d))
    # Make the right image's disparity disagree for source columns 20..30:
    # L->R lands at x-d, so corrupt R2L at those landing columns.
    R2L[:, 20 - d:30 - d] = d + 7.0
    vis = Stereo.get_occlusion_mask(L2R, R2L, occlusion_threshold=1.0)
    assert (~vis[:, 20:30]).all()
    assert vis[:, 40:].all()


def test_network_gui_loopback():
    from gs2mesh_tpu.train.network_gui import NetworkGUI, serve_step

    gui = NetworkGUI(host="127.0.0.1", port=0)
    port = gui.listener.getsockname()[1]
    W, H = 16, 8
    view = np.eye(4, dtype=np.float32)
    view[3, 2] = 3.0
    proj = np.eye(4, dtype=np.float32)

    result = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port), timeout=10)
        msg = dict(resolution_x=W, resolution_y=H,
                   train=True, keep_alive=False, scaling_modifier=1.0,
                   view_matrix=view.reshape(-1).tolist(),
                   view_projection_matrix=proj.reshape(-1).tolist(),
                   fov_x=1.0, fov_y=0.8, z_near=0.01, z_far=100.0)
        payload = json.dumps(msg).encode("utf-8")
        s.sendall(len(payload).to_bytes(4, "little"))
        s.sendall(payload)
        img = b""
        want = W * H * 3
        while len(img) < want:
            img += s.recv(want - len(img))
        vlen = int.from_bytes(s.recv(4), "little")
        verify = s.recv(vlen).decode("ascii")
        result["image"] = img
        result["verify"] = verify
        s.close()

    t = threading.Thread(target=client)
    t.start()

    calls = {}

    def render_fn(cam, scaling):
        calls["cam"] = cam
        calls["scaling"] = scaling
        return np.full((3, cam.height, cam.width), 0.5, np.float32)

    # Poll until the client connection is accepted, then serve one message.
    keep = False
    for _ in range(200):
        gui.try_connect()
        if gui.conn is not None:
            keep = serve_step(gui, render_fn, iteration=10, total=100,
                              source_path="/tmp/src")
            break
        t.join(timeout=0.01)
    t.join(timeout=10)
    gui.disconnect()
    gui.listener.close()

    assert keep is True                      # train=True mid-run
    assert result["verify"] == "/tmp/src"
    assert len(result["image"]) == W * H * 3
    assert result["image"][0] == 127         # 0.5 * 255
    assert calls["cam"].width == W and calls["cam"].height == H
    # SIBR->GS convention flip applied to the view matrix columns 1, 2.
    wv = np.asarray(calls["cam"].world_view)
    assert wv[3, 2] == -3.0


class _Ev:
    def __init__(self, x, y, button=1):
        self.xdata, self.ydata, self.button = x, y, button
        self.inaxes = None


def test_interactive_seeder_semantics():
    """Reference click/drag seeding semantics (masker_utils.py:184-267):
    clicks add labeled points, drags draw the box, middle-click removes."""
    from gs2mesh_tpu.pipeline.masker_ui import InteractiveSeeder

    previews = []

    def preview(img, pts, lbl, box):
        previews.append((None if pts is None else pts.copy(),
                         None if lbl is None else lbl.copy(),
                         None if box is None else box.copy()))
        return np.zeros(img.shape[:2], bool)

    s = InteractiveSeeder(np.zeros((32, 48, 3), np.uint8),
                          preview_fn=preview)

    def click(x, y, button=1):
        s.on_click(_Ev(x, y, button))
        s.on_release(_Ev(x, y, button))

    def drag(x0, y0, x1, y1):
        s.on_click(_Ev(x0, y0, 1))
        s.on_release(_Ev(x1, y1, 1))

    click(10, 10)                  # positive point
    click(20, 5, button=3)         # negative point
    pts, lbl, box = s.seeds()
    assert pts.shape == (2, 2) and lbl.tolist() == [1, 0] and box is None

    drag(5, 5, 40, 28)             # box
    _, _, box = s.seeds()
    assert np.allclose(box, [5, 5, 40, 28])

    drag(6, 6, 30, 20)             # re-drag replaces the box
    _, _, box = s.seeds()
    assert np.allclose(box, [6, 6, 30, 20])

    click(29, 12, button=2)        # middle near box edge -> removes box
    pts, lbl, box = s.seeds()
    assert box is None and pts.shape == (2, 2)

    click(19, 6, button=2)         # middle far from any box -> nearest point
    pts, lbl, _ = s.seeds()
    assert pts.shape == (1, 2) and lbl.tolist() == [1]

    # A sub-threshold drag is a click (drag_threshold), per the reference.
    s.on_click(_Ev(12, 12, 1))
    s.on_release(_Ev(13, 13, 1))
    pts, _, box = s.seeds()
    assert pts.shape == (2, 2) and box is None

    assert len(previews) > 0       # preview redraw ran on every edit
