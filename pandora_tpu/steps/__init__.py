"""Pipeline step library.

Every step family mirrors a reference subpackage (matching_cost/,
aggregation/, optimization/, disparity/, filter/, refinement/, validation/,
cost_volume_confidence/, multiscale/, semantic_segmentation/) and keeps the
same registry/factory extension point: a step family + method string maps to
an implementation class, so external plugins can register additional methods
exactly like the reference's ``pandora.plugin`` entry points.
"""

from .base import STEP_FAMILIES, Step, make_step  # noqa: F401
from . import matching_cost  # noqa: F401
from . import aggregation  # noqa: F401
from . import disparity  # noqa: F401
from . import refinement  # noqa: F401
from . import optimization  # noqa: F401
from . import filter  # noqa: F401
from . import validation  # noqa: F401
from . import confidence  # noqa: F401
from . import multiscale  # noqa: F401
from . import segmentation  # noqa: F401
