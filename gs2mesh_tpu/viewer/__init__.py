"""Interactive Gaussian-splat viewer (browser-based).

TPU-native counterpart of the reference's SIBR gaussian viewer
(third_party/gaussian-splatting/SIBR_viewers — a ~54k-LoC OpenGL desktop
app): instead of a native GL rasterizer, every frame is rendered by THIS
framework's differentiable rasterizer on the accelerator and streamed as
PNG to a zero-dependency browser UI (orbit/pan/dolly controls). The
training-time remote-view protocol peer lives separately in
gs2mesh_tpu/train/network_gui.py (SIBR socket protocol).
"""

from gs2mesh_tpu.viewer.server import ViewerServer, orbit_camera

__all__ = ["ViewerServer", "orbit_camera"]
