from codegraph_tpu.index.flat import FlatIndex

__all__ = ["FlatIndex"]
