from .raster import read_raster, write_geotiff, read_image_input  # noqa: F401
