"""Validity-mask bit constants.

Bit-for-bit mirror of the reference's per-pixel validity bitmask so that
downstream consumers (CARS-style tilers, mask GeoTIFFs) can switch engines
without re-interpreting masks (reference: src/pandora/constants.py:26-55).

The mask is a uint16 per pixel; a pixel is *invalid* (no disparity computed)
iff any bit of ``PANDORA_MSK_PIXEL_INVALID`` is set.  All other bits are
informative.
"""

# Pixel invalid: border of the left image or nodata in the left image
PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER = 1 << 0
# Pixel invalid: right disparity range entirely missing (outside right image
# or all nodata in the right image)
PANDORA_MSK_PIXEL_RIGHT_NODATA_OR_DISPARITY_RANGE_MISSING = 1 << 1
# Information: right disparity range only partially usable
PANDORA_MSK_PIXEL_RIGHT_INCOMPLETE_DISPARITY_RANGE = 1 << 2
# Information: subpixel interpolation stopped (local extremum / invalid cost)
PANDORA_MSK_PIXEL_STOPPED_INTERPOLATION = 1 << 3
# Information: occlusion that has been filled by interpolation
PANDORA_MSK_PIXEL_FILLED_OCCLUSION = 1 << 4
# Information: mismatch that has been filled by interpolation
PANDORA_MSK_PIXEL_FILLED_MISMATCH = 1 << 5
# Pixel invalid: masked by the left input mask
PANDORA_MSK_PIXEL_IN_VALIDITY_MASK_LEFT = 1 << 6
# Pixel invalid: whole right disparity range masked by the right input mask
PANDORA_MSK_PIXEL_IN_VALIDITY_MASK_RIGHT = 1 << 7
# Pixel invalid: detected as occlusion by cross-checking
PANDORA_MSK_PIXEL_OCCLUSION = 1 << 8
# Pixel invalid: detected as mismatch by cross-checking
PANDORA_MSK_PIXEL_MISMATCH = 1 << 9
# Information: nodata pixel filled during pyramid construction
PANDORA_MSK_PIXEL_FILLED_NODATA = 1 << 10
# Information: confidence interval regularized by the graph pass
PANDORA_MSK_PIXEL_INTERVAL_REGULARIZED = 1 << 11
# Information: variable (per-pixel grid) disparity range only partially usable
PANDORA_MSK_PIXEL_INCOMPLETE_VARIABLE_DISPARITY_RANGE = 1 << 12

# Aggregate invalidity predicate (same composition as the reference)
PANDORA_MSK_PIXEL_INVALID = (
    PANDORA_MSK_PIXEL_LEFT_NODATA_OR_BORDER
    | PANDORA_MSK_PIXEL_RIGHT_NODATA_OR_DISPARITY_RANGE_MISSING
    | PANDORA_MSK_PIXEL_IN_VALIDITY_MASK_LEFT
    | PANDORA_MSK_PIXEL_IN_VALIDITY_MASK_RIGHT
    | PANDORA_MSK_PIXEL_OCCLUSION
    | PANDORA_MSK_PIXEL_MISMATCH
)

assert PANDORA_MSK_PIXEL_INVALID == 0b01111000011

# Default value written into image rasters where the input had nodata
DEFAULT_NODATA_IMG = -9999
