from seal_tpu.index.fm_index import FMIndex, SHIFT
from seal_tpu.index.suffix_array import build_suffix_array

__all__ = ["FMIndex", "SHIFT", "build_suffix_array"]
