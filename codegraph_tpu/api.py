"""High-level facade: one object that owns the whole stack.

The reference's users interact through the `codegraph` CLI and MCP
server; library users get this instead — open a project, index it,
search it, ask questions, run graph analytics:

    from codegraph_tpu.api import CodeGraph

    cg = CodeGraph.open("/path/to/repo")
    cg.index()
    hits = cg.search("where is the config loaded")
    answer = cg.ask("how does indexing work?")
    deps = cg.graph.transitive_dependencies("load_config")
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

from codegraph_tpu.core.config import CodeGraphConfig, load_config
from codegraph_tpu.core.types import SearchResult
from codegraph_tpu.graph.queries import GraphQueries
from codegraph_tpu.indexer.indexer import IndexStats, ProjectIndexer


class CodeGraph:
    def __init__(self, config: CodeGraphConfig):
        self.config = config
        self.indexer = ProjectIndexer(config)
        self._rag = None
        data_dir = config.resolved_data_dir()
        if (data_dir / "store_meta.json").exists():
            self.indexer.load(str(data_dir))

    # -- construction ------------------------------------------------------

    @classmethod
    def open(
        cls,
        project_root: str,
        config: Optional[CodeGraphConfig] = None,
        auto_tune: bool = True,
        **overrides: Any,
    ) -> "CodeGraph":
        cfg = config or load_config(overrides=overrides or None)
        cfg.project_root = os.path.abspath(project_root)
        if auto_tune and cfg.index.kind == "flat" and cfg.index.capacity:
            from codegraph_tpu.utils.tuning import apply_plan, plan_index

            apply_plan(cfg, plan_index(cfg.index.capacity,
                                       cfg.embedding.dimension))
        return cls(cfg)

    # -- lifecycle ---------------------------------------------------------

    def index(self, force: bool = False) -> IndexStats:
        stats = self.indexer.index_project(self.config.project_root, force=force)
        self.indexer.save()
        return stats

    def update_file(self, path: str) -> Optional[IndexStats]:
        stats = self.indexer.index_single_file(path)
        self.indexer.save()
        return stats

    # -- queries -----------------------------------------------------------

    def search(self, query: str, limit: int = 10) -> List[SearchResult]:
        return self.indexer.search.search_text(query, limit)

    def ask(self, question: str) -> Dict[str, Any]:
        """RAG answer with sources (no LLM unless configured)."""
        if self._rag is None:
            from codegraph_tpu.mcp.llm import create_llm
            from codegraph_tpu.rag.system import RAGSystem

            llm = create_llm(self.config)
            self._rag = RAGSystem(
                self.indexer.search, self.indexer.store,
                llm=llm if llm.is_available() else None,
            )
        answer = self._rag.process_query(question)
        return {
            "answer": answer.response.answer,
            "sources": answer.response.sources,
            "query_type": answer.query_type,
            "latency_ms": round(answer.latency_ms, 1),
        }

    @property
    def graph(self) -> GraphQueries:
        return GraphQueries(self.indexer.store)

    def insights(self, topic: str) -> List[Dict[str, Any]]:
        from codegraph_tpu.rag.insights import InsightsGenerator

        gen = InsightsGenerator(self.indexer.search, self.graph)
        return [i.to_dict() for i in gen.generate(topic)]

    def stats(self) -> Dict[str, Any]:
        return {
            "store": self.indexer.store.stats(),
            "index_live": len(self.indexer.index),
            "cache": self.indexer.search.cache.stats(),
            "search_perf": self.indexer.search.monitor.report(),
        }

    # -- serving -----------------------------------------------------------

    def serve(self, transport: str = "stdio") -> None:
        from codegraph_tpu.mcp.server import MCPServer
        from codegraph_tpu.mcp.tools import GraphToolExecutor
        from codegraph_tpu.search.reranker import make_reranker_pipeline

        # shared construction with the CLI (cli._make_server): the
        # previously-duplicated builds diverged twice (dropped
        # cross_encoder wiring; random-init scorer without the shipped
        # checkpoint)
        tools = GraphToolExecutor(
            self.graph, self.indexer.search,
            make_reranker_pipeline(self.indexer.provider,
                                   self.config.search),
            rerank_default=self.config.search.rerank,
        )
        server = MCPServer(tools, self.config)
        if transport == "http":
            server.serve_http(self.config.server.http_host,
                              self.config.server.http_port)
        else:
            server.serve_stdio()


__all__ = ["CodeGraph"]
