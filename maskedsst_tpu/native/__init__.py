"""Native tier: packed tile store (C++ reader, ctypes binding).

``PackedTileStore`` serves batches from a single memory-mapped binary file
with parallel native gathers (optionally fused band-standardization and
cropping), replacing the reference's per-tile GeoTIFF reads
(src/data_enmap.py:241-249) on the host side of the input pipeline.

The shared library builds on first use with g++ (cached next to the source);
every entry point has a pure-numpy fallback so the store works without a
toolchain.
"""

from maskedsst_tpu.native.tilestore import (  # noqa: F401
    PackedTileStore,
    native_available,
    pack_tiles,
)
