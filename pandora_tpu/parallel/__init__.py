from . import distributed  # noqa: F401
from .mesh import make_mesh, make_mesh2d  # noqa: F401
from .scene import SceneRunner  # noqa: F401
from .sgm_exchange import exchange_tiled_stereo_pipeline  # noqa: F401
from .tiling import halo_width, row_halo_width, tiled_stereo_pipeline  # noqa: F401
