from codegraph_tpu.index.flat import FlatIndex
from codegraph_tpu.index.int8_flat import Int8FlatIndex
from codegraph_tpu.index.ivf import IVFIndex
from codegraph_tpu.index.ivfpq import IVFPQIndex
from codegraph_tpu.index.segments import SegmentedIndex
from codegraph_tpu.index.snapshot import load_arrays, save_arrays

__all__ = [
    "FlatIndex",
    "Int8FlatIndex",
    "IVFIndex",
    "IVFPQIndex",
    "SegmentedIndex",
    "save_arrays",
    "load_arrays",
]
