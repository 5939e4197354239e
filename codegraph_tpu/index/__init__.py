from codegraph_tpu.index.flat import FlatIndex
from codegraph_tpu.index.int8_flat import Int8FlatIndex
from codegraph_tpu.index.ivf import IVFIndex

__all__ = ["FlatIndex", "Int8FlatIndex", "IVFIndex"]
