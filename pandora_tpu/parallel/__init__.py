from .mesh import make_mesh  # noqa: F401
from .tiling import tiled_stereo_pipeline  # noqa: F401
