import numpy as np
import pytest

from codegraph_tpu.core.types import (
    CodeChunk,
    CodeNode,
    Language,
    Location,
    NodeType,
)
from codegraph_tpu.graph.store import GraphStore
from codegraph_tpu.index.flat import FlatIndex
from codegraph_tpu.indexer.writer import JobKind, WriterHandle
from codegraph_tpu.models.providers import HashProvider


def mk_node(name, file="a.py"):
    return CodeNode.make("p", name, NodeType.FUNCTION, Language.PYTHON,
                         Location(file, 1, 3), content=f"def {name}(): ...")


def test_writer_applies_jobs_in_order():
    store = GraphStore()
    index = FlatIndex(32, tile_n=128, backend="xla")
    w = WriterHandle(store, index)
    provider = HashProvider(32)
    nodes = [mk_node("alpha"), mk_node("beta")]
    chunks = [CodeChunk.make(n.id, n.content, 0, 1) for n in nodes]
    embs = provider.embed_texts([c.text for c in chunks])

    w.enqueue_nodes(nodes)
    w.enqueue_chunk_embeddings(chunks, embs)
    w.enqueue_file_metadata("a.py", "h1")
    errors = w.flush()
    assert errors == []
    assert store.stats()["nodes"] == 2 and store.stats()["chunks"] == 2
    assert len(index) == 2
    assert store.file_metadata["a.py"] == "h1"
    assert w.stats.applied == 3 and w.stats.failed == 0

    # delete-file job tombstones index rows too
    w.enqueue_delete_file("a.py")
    w.flush()
    assert store.stats()["nodes"] == 0
    assert len(index) == 0
    w.close()


def test_writer_resilient_to_bad_jobs():
    store = GraphStore()

    class ExplodingIndex:
        def add(self, e):
            raise RuntimeError("index down")

        def delete(self, rows):
            pass

        def __len__(self):
            return 0

    w = WriterHandle(store, ExplodingIndex())
    n = mk_node("gamma")
    chunk = CodeChunk.make(n.id, "text", 0, 1)
    w.enqueue_nodes([n])
    w.enqueue_chunk_embeddings([chunk], np.zeros((1, 8), np.float32))
    w.enqueue_nodes([mk_node("delta", file="b.py")])  # continues after failure
    errors = w.flush()
    assert len(errors) == 1 and "index down" in errors[0]
    assert w.stats.failed == 1
    assert store.stats()["nodes"] == 2  # both node jobs applied
    w.close()
