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


def _mk_result(name="compute_invoice", score=0.9, file="billing.py",
               snippet="def compute_invoice(items): ..."):
    from codegraph_tpu.core.types import SearchResult

    return SearchResult(node_id="n1", chunk_id="c1", score=score, name=name,
                        node_type="function", file_path=file, start_line=3,
                        snippet=snippet)


def test_generator_synthesis_ladder():
    """Intent templates fire on pattern queries; extractive otherwise;
    quoting when extractive is disabled (response_generator.rs:246-264)."""
    from codegraph_tpu.rag.generator import (
        GenerationConfig,
        GenerationMethod,
        ResponseGenerator,
    )

    qp = QueryProcessor()
    results = [_mk_result(), _mk_result(name="apply_tax", score=0.7)]
    gen = ResponseGenerator()

    r = gen.generate(qp.process("how is the invoice computed?"), results)
    assert r.method == GenerationMethod.TEMPLATE
    assert "compute_invoice" in r.answer and "billing.py:3" in r.answer
    assert "apply_tax" in r.answer  # related items attached
    assert r.valid and r.confidence > 0.3
    assert r.sources[0]["node_id"] == "n1"

    r2 = gen.generate(qp.process("invoice computation paths"), results)
    assert r2.method == GenerationMethod.EXTRACTIVE

    gen_q = ResponseGenerator(
        config=GenerationConfig(use_extractive_synthesis=False))
    r3 = gen_q.generate(qp.process("invoice computation paths"), results)
    assert r3.method == GenerationMethod.QUOTE
    assert '"' in r3.answer


def test_generator_low_confidence_and_validation():
    from codegraph_tpu.rag.generator import (
        GenerationMethod,
        ResponseGenerator,
    )

    qp = QueryProcessor()
    gen = ResponseGenerator()
    # all scores below the 0.3 threshold -> degraded-but-listed answer
    weak = [_mk_result(score=0.1), _mk_result(name="apply_tax", score=0.05)]
    r = gen.generate(qp.process("how is the invoice computed?"), weak)
    assert r.method == GenerationMethod.DEGRADED
    assert r.validation.get("low_confidence")
    assert "compute_invoice" in r.answer  # still surfaces what was found

    # validation: per-check detail on a strong answer
    r2 = gen.generate(qp.process("how is the invoice computed?"),
                      [_mk_result()])
    assert r2.validation["nonempty"] and r2.validation["cites_source"]
    assert r2.validation["query_overlap"] and r2.validation["grounded"]

    # no results at all
    r3 = gen.generate(qp.process("quantum flux capacitor"), [])
    assert not r3.valid


def test_generator_from_contexts():
    """generate_from_contexts scores context relevance first and drops
    irrelevant ones (response_generator.rs:146-218,508-545)."""
    from codegraph_tpu.rag.generator import ResponseGenerator

    gen = ResponseGenerator()
    r = gen.generate_from_contexts(
        "invoice tax calculation",
        ["the invoice tax calculation multiplies price by the rate",
         "completely unrelated text about weather patterns"],
    )
    assert r.valid
    assert "invoice" in r.answer
    assert len(r.sources) == 1  # the weather context was dropped
    assert r.confidence > 0.3

    r2 = gen.generate_from_contexts("invoice", [])
    assert not r2.valid


def test_generator_truncation():
    from codegraph_tpu.rag.generator import GenerationConfig, ResponseGenerator

    gen = ResponseGenerator(config=GenerationConfig(max_response_length=80))
    qp = QueryProcessor()
    r = gen.generate(qp.process("how is the invoice computed?"),
                     [_mk_result(snippet="x" * 500)])
    assert len(r.answer) <= 80
    assert r.answer.endswith("...")
