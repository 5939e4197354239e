"""Per-language encoder eval (round-3 VERDICT item 8).

The committed cross-repo number is Rust-only (crossrepo_eval.py, 512
pairs); the training corpus is 62% Python — so per-language transfer is
unmeasured. This harness scores desc->code retrieval per language on
UNSEEN corpora available in this egress-free environment:

  rust        reference crates /// doc-comments (same 512-pair protocol
              as crossrepo_eval.py)
  python      THIS repository's own code (codegraph_tpu/ + tests/ +
              benchmarks/) — absent from the r3 training harvest
              (site-packages + /usr/include + synthetics); the docstring
              is stripped from the code side so the query text never
              appears in the corpus row
  javascript  real (non-minified) JSDoc'd files under /opt/venv
              (matplotlib web backend, werkzeug debugger, jupyter
              extensions) — JS appears in training only as synthetics
  c_cpp       /usr/include doc-comment pairs — IN-DOMAIN caveat: the
              training harvest drew from the same header population, so
              this row measures in-distribution quality, not transfer

For each language: hash baseline vs shipped encoder vs ensemble,
recall@1/@10 (truth = the paired row). Pass criterion (VERDICT): no
language below hash parity.

Usage: python benchmarks/perlang_eval_r4.py   (TPU or JAX_PLATFORMS=cpu)
Writes .bench/perlang_eval_r4.json
"""

from __future__ import annotations

import ast
import json
import os
import pathlib
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".bench", "perlang_eval_r4.json")
MAX_PAIRS = 512


def _name_words(name: str):
    from codegraph_tpu.search.bm25 import tokenize

    return " ".join(tokenize(name))


def harvest_python_pairs(roots, max_pairs=MAX_PAIRS):
    """(code-without-docstring, name words + docstring) from real defs."""
    pairs = []
    files = []
    for root in roots:
        files.extend(sorted(pathlib.Path(root).rglob("*.py")))
    for p in files:
        try:
            text = p.read_text(errors="replace")
            tree = ast.parse(text)
        except (OSError, SyntaxError):
            continue
        lines = text.splitlines()
        for node in ast.walk(tree):
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            doc = ast.get_docstring(node)
            if not doc or len(doc.split()) < 6:
                continue
            body = lines[node.lineno - 1:node.end_lineno]
            code = "\n".join(body)
            # strip the docstring text from the code side so the query
            # is never a substring of the corpus row
            first = doc.splitlines()[0]
            code = code.replace(doc, "").replace(first, "")
            if len(code.split()) < 5:
                continue
            pairs.append((code[:400],
                          f"{_name_words(node.name)}. {doc[:200]}"))
            if len(pairs) >= max_pairs:
                return pairs
    return pairs


_JSDOC_RE = re.compile(
    r"/\*\*(?P<doc>(?:[^*]|\*(?!/))*)\*/\s*\n(?P<decl>[^\n]*\{)",
    re.MULTILINE,
)


def _js_name(decl: str) -> str:
    for pat in (r"function\s+(\w+)", r"(\w+)\s*[:=]\s*(?:async\s+)?function",
                r"(?:const|let|var)\s+(\w+)", r"(\w+)\s*\("):
        m = re.search(pat, decl)
        if m:
            return m.group(1)
    return ""


def harvest_js_pairs(max_pairs=MAX_PAIRS):
    """JSDoc -> following function, from real (non-minified) JS files."""
    import subprocess

    try:
        out = subprocess.run(
            ["find", "/opt/venv", "-name", "*.js"],
            capture_output=True, text=True, timeout=60).stdout.splitlines()
    except Exception:
        out = []
    files = [f for f in out
             if "/static/" not in f and ".min.js" not in f
             and "/themes/" not in f]
    pairs = []
    for f in sorted(files):
        try:
            text = pathlib.Path(f).read_text(errors="replace")
        except OSError:
            continue
        if text.count("\n") < 20 or max(
                (len(ln) for ln in text.splitlines()[:50]), default=0) > 800:
            continue  # minified
        for m in _JSDOC_RE.finditer(text):
            doc = re.sub(r"^\s*\*\s?", "", m.group("doc"),
                         flags=re.MULTILINE).strip()
            doc = re.sub(r"@\w+.*", "", doc, flags=re.DOTALL).strip()
            if len(doc.split()) < 6:
                continue
            name = _js_name(m.group("decl"))
            code = text[m.start("decl"):m.start("decl") + 400]
            pairs.append((code, f"{_name_words(name)}. {doc[:200]}"))
            if len(pairs) >= max_pairs:
                return pairs
    return pairs


_C_DOC_RE = re.compile(
    r"/\*\*?(?P<doc>(?:[^*]|\*(?!/))*)\*/\s*\n"
    r"(?P<decl>[\w\s\*]+?(?P<name>\w+)\s*\([^;{]*\)\s*[;{])",
    re.MULTILINE,
)


def harvest_c_pairs(max_pairs=MAX_PAIRS):
    """Doc-comment -> declaration from /usr/include (in-domain caveat)."""
    pairs = []
    for p in sorted(pathlib.Path("/usr/include").rglob("*.h")):
        try:
            text = p.read_text(errors="replace")
        except OSError:
            continue
        for m in _C_DOC_RE.finditer(text):
            doc = re.sub(r"^\s*\*\s?", "", m.group("doc"),
                         flags=re.MULTILINE).strip()
            doc = re.sub(r"@\w+.*", "", doc, flags=re.DOTALL).strip()
            if len(doc.split()) < 6:
                continue
            pairs.append((m.group("decl")[:400],
                          f"{_name_words(m.group('name'))}. {doc[:200]}"))
            if len(pairs) >= max_pairs:
                return pairs
    return pairs


def dedupe(pairs):
    """Drop pairs whose desc text repeats — an identical doc on another
    row makes recall@1 structurally unreachable for both."""
    seen, out = set(), []
    for code, desc in pairs:
        if desc in seen:
            continue
        seen.add(desc)
        out.append((code, desc))
    return out


def main():
    from crossrepo_eval import eval_provider, harvest_rust_pairs

    from codegraph_tpu.models.providers import (
        EncoderProvider,
        EnsembleProvider,
        HashProvider,
        _default_checkpoint,
    )

    ckpt = _default_checkpoint()
    langs = {
        "rust": dedupe(harvest_rust_pairs("/root/reference/crates")),
        "python": dedupe(harvest_python_pairs(
            [os.path.join(REPO, "codegraph_tpu"),
             os.path.join(REPO, "tests"),
             os.path.join(REPO, "benchmarks")])),
        "javascript": dedupe(harvest_js_pairs()),
        "c_cpp": dedupe(harvest_c_pairs()),
    }
    results = {"checkpoint": os.path.basename(ckpt or ""),
               "caveats": {
                   "python": "this repo's own code; unseen by training",
                   "javascript": "real venv JS; JS in training was "
                                 "synthetic-only",
                   "c_cpp": "IN-DOMAIN: /usr/include overlaps the "
                            "training harvest population",
               }}
    # reuse ONE provider instance per arch across languages (compile once)
    hashp = HashProvider(384)
    encp = EncoderProvider(checkpoint=ckpt) if ckpt else None
    ensp = EnsembleProvider(dimension=768, checkpoint=ckpt) if ckpt else None
    for lang, pairs in langs.items():
        print(f"--- {lang}: {len(pairs)} pairs", flush=True)
        if len(pairs) < 24:
            results[lang] = {"n_pairs": len(pairs), "status": "too_few"}
            continue
        block = {"n_pairs": len(pairs)}
        eval_provider(hashp, pairs, "hash", block)
        if encp is not None:
            eval_provider(encp, pairs, "encoder", block)
        if ensp is not None:
            eval_provider(ensp, pairs, "ensemble", block)
        block["beats_hash"] = (
            block.get("ensemble", block.get("hash"))["recall@1"]
            >= block["hash"]["recall@1"])
        results[lang] = block
        print(lang, json.dumps(block), flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
