from gs2mesh_tpu.core.camera import Camera, world_to_view, projection_matrix, fov2focal, focal2fov
from gs2mesh_tpu.core import transforms, sh, ply, colmap_io
