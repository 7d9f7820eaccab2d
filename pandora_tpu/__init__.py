"""pandora_tpu — a TPU-native dense stereo matching engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of CNES/Pandora:
configurable cost-volume pipelines (census/SAD/SSD/ZNCC/MC-CNN matching cost,
CBCA aggregation, SGM optimization, WTA + subpixel refinement, filtering,
cross-checking validation, confidence measures, multiscale), scaled over TPU
device meshes with disparity-aware halo exchange.
"""

__version__ = "0.1.0"

from . import constants  # noqa: F401
from .api import (  # noqa: F401
    check_datasets,
    create_image_from_inputs,
    get_metadata,
    images_from_config,
    main,
    run,
)
from .config import check_conf, read_config_file  # noqa: F401
from .datamodel import CostVolume, DisparityMap, Image, make_image  # noqa: F401
from .margins import GlobalMargins, Margins  # noqa: F401
from .pipeline import MachineError, Pipeline  # noqa: F401


def import_plugin() -> None:
    """Load every package registered under the ``pandora_tpu.plugin``
    entry-point group (reference: pandora.plugin loading,
    src/pandora/__init__.py:141-148).  Loading a plugin module is expected
    to register new :class:`~pandora_tpu.steps.base.Step` subclasses via
    ``Step.register`` (or monkey-free extension of other registries), after
    which its methods are addressable from JSON pipeline configs."""
    from importlib.metadata import entry_points

    for entry_point in entry_points(group="pandora_tpu.plugin"):
        entry_point.load()
