import textwrap

import pytest

from codegraph_tpu.core.config import CodeGraphConfig
from codegraph_tpu.graph.queries import GraphQueries
from codegraph_tpu.indexer.indexer import ProjectIndexer
from codegraph_tpu.rag.insights import InsightsGenerator
from codegraph_tpu.rag.query_processor import QueryProcessor, QueryType
from codegraph_tpu.rag.ranker import ResultRanker
from codegraph_tpu.rag.retriever import RetrievalMethod
from codegraph_tpu.rag.system import RAGConfig, RAGSystem


@pytest.fixture(scope="module")
def indexed(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("ragproj")
    (tmp_path / "billing.py").write_text(textwrap.dedent('''
        def compute_invoice(items):
            """Computes the invoice total with tax."""
            total = 0
            for item in items:
                if item.taxable:
                    total += apply_tax(item.price)
                else:
                    total += item.price
            return total

        def apply_tax(price):
            return price * 1.2
    '''))
    cfg = CodeGraphConfig()
    cfg.project_root = str(tmp_path)
    cfg.embedding.provider = "hash"
    cfg.embedding.dimension = 64
    indexer = ProjectIndexer(cfg)
    indexer.index_project(str(tmp_path))
    return indexer


def test_query_processor_classification():
    qp = QueryProcessor()
    assert qp.process("where is the invoice computed?").query_type == QueryType.CODE_SEARCH
    assert qp.process("explain how tax is applied").query_type == QueryType.EXPLANATION
    assert qp.process("fix the crash in apply_tax").query_type == QueryType.DEBUGGING
    assert qp.process("overview of the module structure").query_type == QueryType.ARCHITECTURE
    pq = qp.process("find compute_invoice() usage")
    assert "compute_invoice()" in pq.entities
    assert pq.keywords


def test_query_expansion():
    pq = QueryProcessor().process("find the config function")
    assert any(t in pq.expanded_terms for t in ("configuration", "settings",
                                                "method", "fn", "func"))


def test_rag_end_to_end(indexed):
    rag = RAGSystem(indexed.search, indexed.store)
    answer = rag.process_query("how is the invoice total computed?")
    assert answer.response.valid
    assert "compute_invoice" in answer.response.answer
    assert answer.latency_ms < 5000
    assert set(answer.stage_ms) == {"analyze", "retrieve", "rank", "generate"}
    assert answer.response.sources


def test_rag_keyword_method(indexed):
    rag = RAGSystem(indexed.search, indexed.store,
                    config=RAGConfig(method=RetrievalMethod.KEYWORD))
    answer = rag.process_query("apply tax price")
    assert any(s["name"] == "apply_tax" for s in answer.response.sources)


def test_rag_latency_degradation(indexed):
    class SlowLLM:
        def is_available(self):
            return True

        def complete(self, prompt):
            raise AssertionError("LLM must be skipped when over budget")

    rag = RAGSystem(indexed.search, indexed.store, llm=SlowLLM(),
                    config=RAGConfig(latency_budget_ms=0.0))
    answer = rag.process_query("invoice")
    assert answer.degraded
    assert not answer.response.used_llm


def test_ranker_popularity_feedback(indexed):
    ranker = ResultRanker()
    results = indexed.search.search_text("tax", limit=3)
    assert len(results) >= 2
    loser = results[-1]
    for _ in range(10):
        ranker.record_usage(loser.node_id)
    ranked = ranker.rank(results)
    breakdown = dict((r.node_id, bd) for r, bd in ranked)
    assert breakdown[loser.node_id].popularity == 1.0


def test_insights_generator(indexed):
    gen = InsightsGenerator(indexed.search, GraphQueries(indexed.store))
    insights = gen.generate("invoice computation")
    kinds = {i.kind for i in insights}
    assert "relevant_code" in kinds
    assert all(isinstance(i.to_dict(), dict) for i in insights)
