"""Viewer server: HTTP endpoints render real frames through the rasterizer."""

import io
import json
import urllib.request

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from gs2mesh_tpu.models.gaussians import GaussianModel
from gs2mesh_tpu.viewer import ViewerServer, orbit_camera


@pytest.fixture(scope="module")
def server():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(400, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    model = GaussianModel.from_point_cloud(
        v.astype(np.float32), rng.uniform(0.2, 0.9, (400, 3)),
        max_sh_degree=0)
    srv = ViewerServer(model, width=96, height=64, pair_capacity=1 << 14,
                       port=0)
    port = srv.start()
    yield srv, port
    srv.stop()


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=120) as r:
        return r.read(), r.headers.get("Content-Type")


def test_orbit_camera_looks_at_target():
    cam = orbit_camera((0.1, -0.2, 0.3), 2.0, 33.0, 21.0, 60.0, 96, 64)
    center = np.asarray(cam.cam_center)
    assert abs(np.linalg.norm(center - np.array([0.1, -0.2, 0.3])) - 2.0) < 1e-4
    # The target projects to view-space (0, 0, +radius).
    tview = np.array([0.1, -0.2, 0.3, 1.0]) @ np.asarray(cam.world_view)
    np.testing.assert_allclose(tview[:2], 0.0, atol=1e-5)
    assert abs(tview[2] - 2.0) < 1e-4


def test_viewer_endpoints(server):
    srv, port = server
    page, ctype = _get(port, "/")
    assert ctype.startswith("text/html") and b"gs2mesh_tpu viewer" in page

    info, _ = _get(port, "/info")
    info = json.loads(info)
    assert info["width"] == 96 and info["height"] == 64

    png, ctype = _get(port, "/render?az=30&el=10")
    assert ctype == "image/png"
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    from PIL import Image
    img = np.asarray(Image.open(io.BytesIO(png)))
    assert img.shape == (64, 96, 3)
    assert img.max() > 0                       # splats actually rendered

    # A different pose renders a different frame.
    png2, _ = _get(port, "/render?az=120&el=-20")
    img2 = np.asarray(Image.open(io.BytesIO(png2)))
    assert not np.array_equal(img, img2)
