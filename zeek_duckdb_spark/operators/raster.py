"""Shared raster helpers for the pure-Python codec family.

``nn_resample`` is THE nearest-neighbour index-sampling convention
(``src_index = floor(dst_index * src / dst)``) used by
``multimodal.phash_value``'s 32x32 shrink and by every codec resize
path (``png_resize`` / ``jpeg_resize`` / ``gif_resize``).  It lives in
one place because the docstring promise "an upscale round-trips to the
identical pHash" holds only while all of them sample identically — a
drift in one copy would silently break cross-format pHash stability.
"""

from __future__ import annotations

__all__ = ["nn_resample"]


def nn_resample(img, width: int, height: int):
    """2-D array -> (height x width) nearest-neighbour resample,
    row/col index = floor(i * src / dst)."""
    import numpy as np

    ry = (np.arange(height) * img.shape[0]) // height
    rx = (np.arange(width) * img.shape[1]) // width
    return img[np.ix_(ry, rx)]
