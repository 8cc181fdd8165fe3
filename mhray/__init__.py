"""mhray — a Ray-Data-native near-duplicate detection + clustering engine.

A from-scratch reimplementation of the capabilities of marbl/MHAP
(MinHash sketch -> LSH candidate generation -> positional verify),
retargeted at near-duplicate detection and clustering over tables of
image + caption pairs, expressed as ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches.

Reference semantics are documented per-module with ``path:line``
citations into the reference repo (read-only, not copied).
"""

from mhray.config import MhapConfig, PRESETS

__all__ = ["MhapConfig", "PRESETS"]
__version__ = "0.1.0"
