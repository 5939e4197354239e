"""Cross-repo encoder quality eval (round-1 VERDICT weak item 4).

Harvests (code, description) pairs from a DIFFERENT repository than the
encoder was trained on — the reference's Rust crates, via the new
scope scanners — and measures desc->code retrieval recall. This is the
non-self-referential quality number round 1 lacked.

Usage: JAX_PLATFORMS=cpu python benchmarks/crossrepo_eval.py
Writes .bench/crossrepo_eval.json
"""

import json
import os
import pathlib
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def harvest_rust_pairs(root: str, max_pairs: int = 512):
    """(code, description) from /// doc-comments above fns (Rust)."""
    from codegraph_tpu.core.types import Language, NodeType
    from codegraph_tpu.parser.extractors import extract_file
    from codegraph_tpu.search.bm25 import tokenize

    pairs = []
    for p in sorted(pathlib.Path(root).rglob("*.rs")):
        try:
            text = p.read_text(errors="replace")
        except Exception:
            continue
        lines = text.splitlines()
        r = extract_file("ref", str(p), text, Language.RUST)
        for node in r.nodes:
            if node.node_type not in (NodeType.FUNCTION, NodeType.METHOD):
                continue
            # doc comment: /// lines directly above the decl
            start = node.location.start_line - 1  # 0-based decl line
            doc = []
            i = start - 1
            while i >= 0 and re.match(r"\s*///", lines[i]):
                doc.append(re.sub(r"\s*///\s?", "", lines[i]))
                i -= 1
            doc.reverse()
            desc = " ".join(doc).strip()
            if len(desc.split()) < 4:
                continue
            name_words = " ".join(tokenize(node.name))
            pairs.append((node.content[:400], f"{name_words}. {desc[:200]}"))
            if len(pairs) >= max_pairs:
                return pairs
    return pairs


def eval_provider(provider, pairs, name, results):
    codes = [c for c, _ in pairs]
    descs = [d for _, d in pairs]
    ec = provider.embed_texts(codes)
    ed = provider.embed_texts(descs)
    ec = ec / np.maximum(np.linalg.norm(ec, axis=1, keepdims=True), 1e-9)
    ed = ed / np.maximum(np.linalg.norm(ed, axis=1, keepdims=True), 1e-9)
    sims = ed @ ec.T  # desc query -> code corpus
    order = np.argsort(-sims, axis=1)
    n = len(pairs)
    r1 = float((order[:, 0] == np.arange(n)).mean())
    r10 = float((order[:, :10] == np.arange(n)[:, None]).any(axis=1).mean())
    results[name] = {"recall@1": round(r1, 4), "recall@10": round(r10, 4),
                     "n_pairs": n}
    print(f"{name}: recall@1={r1:.3f} recall@10={r10:.3f} (n={n})")


def main():
    from codegraph_tpu.models.providers import (
        EncoderProvider,
        HashProvider,
        _default_checkpoint,
    )

    pairs = harvest_rust_pairs("/root/reference/crates")
    print(f"{len(pairs)} cross-repo (code, doc) pairs")
    results = {"n_pairs": len(pairs), "source": "reference crates (Rust)"}

    eval_provider(HashProvider(384), pairs, "hash_384", results)
    ckpt = _default_checkpoint()
    if ckpt:
        eval_provider(EncoderProvider(checkpoint=ckpt), pairs,
                      f"encoder_{os.path.basename(ckpt)}", results)
        from codegraph_tpu.models.providers import EnsembleProvider

        # sweep the mix: the right weight moves with encoder quality
        # (round 2's weak encoder wanted 0.3; a hash-beating encoder
        # wants most of the mass)
        for w in (0.3, 0.5, 0.7, 0.9):
            eval_provider(
                EnsembleProvider(dimension=768, checkpoint=ckpt, w_enc=w),
                pairs, f"ensemble_w{w}", results)
    extra = sys.argv[1] if len(sys.argv) > 1 else None
    if extra and os.path.exists(extra):
        from codegraph_tpu.models.bpe import BPETokenizer

        tok = None
        tokpath = "/root/repo/checkpoints/bpe_code_8k.json"
        if os.path.exists(tokpath):
            tok = BPETokenizer.load(tokpath)
        eval_provider(
            EncoderProvider(checkpoint=extra, tokenizer=tok), pairs,
            f"encoder_{os.path.basename(extra)}", results)

    os.makedirs(".bench", exist_ok=True)
    with open(".bench/crossrepo_eval.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
