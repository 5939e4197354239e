"""Quantified scanner-vs-reference extraction parity (VERDICT r4 item 7).

The reference's per-language extractors are exact tree-sitter grammars
(/root/reference/crates/codegraph-parser/src/languages/rust.rs:1-938,
java.rs, cpp.rs, ...); our scanners (codegraph_tpu/parser/scanners.py)
are string/comment-aware scope engines.  This harness measures, rather
than asserts, how close the scanners get:

PART A — corpus-scale parity on real code.  For rust (the reference's
own 94k-LoC crates), javascript (venv), and cpp (/usr/include + native/)
an INDEPENDENT truth extractor — a fresh comment/string stripper plus
anchored declaration regexes, sharing no code with the scanners or the
lexers — extracts (kind, name) declarations per file.  Per-kind
precision/recall of the scanner vs that truth is reported, restricted to
the node-kind vocabulary the REFERENCE extractor emits for the language
(e.g. cpp.rs emits no Enum, so enums are excluded from the cpp score).

PART B — golden-fixture parity for all 12 scanner languages.  Each
fixture is a realistic source file exercising the constructs the
reference extractor queries (nesting, heritage, generics, strings with
braces, comments with decl-lookalike text); the expected (kind, name)
sets are hand-derived from the source.  Exact precision/recall per
language.

Methods fold into the 'function' bucket for scoring: every reference
extractor maps methods to NodeType::Function (e.g. go.rs emits Function
for both function_declaration and method_declaration).

Output: .bench/scanner_parity_r5.json + a PARITY.md-ready table on
stdout.  CPU-only: run with JAX_PLATFORMS=cpu (no TPU claim).
"""

from __future__ import annotations

import json
import os
import pathlib
import random
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".bench", "scanner_parity_r5.json")


# ---------------------------------------------------------------------------
# Independent stripper (shares nothing with parser/lexers.py)
# ---------------------------------------------------------------------------

def strip_source(text: str, lang: str) -> str:
    """Blank out comments and string/char literals, preserving layout.

    A deliberately separate implementation from the production lexer so
    corpus truth is independent: single linear scan, per-language
    comment/string syntax, nested block comments where the language has
    them (rust, swift, kotlin, dart), rust raw strings / lifetimes, JS
    template literals (interpolations stripped whole), python/ruby/php
    hash comments, ruby/python triple-ish quotes where relevant.
    """
    out = list(text)
    n = len(text)
    i = 0
    line_comment = {"rust": ("//",), "javascript": ("//",),
                    "typescript": ("//",), "cpp": ("//",), "go": ("//",),
                    "java": ("//",), "csharp": ("//",), "swift": ("//",),
                    "kotlin": ("//",), "dart": ("//",),
                    "php": ("//", "#"), "ruby": ("#",),
                    "python": ("#",)}.get(lang, ("//",))
    nested = lang in ("rust", "swift", "kotlin", "dart")
    has_block = lang not in ("ruby", "python")

    def blank(a: int, b: int) -> None:
        for k in range(a, min(b, n)):
            if out[k] != "\n":
                out[k] = " "

    while i < n:
        c = text[i]
        # line comments
        matched = False
        for lc in line_comment:
            if text.startswith(lc, i):
                j = text.find("\n", i)
                j = n if j < 0 else j
                blank(i, j)
                i = j
                matched = True
                break
        if matched:
            continue
        if has_block and text.startswith("/*", i):
            depth = 1
            j = i + 2
            while j < n and depth:
                if nested and text.startswith("/*", j):
                    depth += 1
                    j += 2
                elif text.startswith("*/", j):
                    depth -= 1
                    j += 2
                else:
                    j += 1
            blank(i, j)
            i = j
            continue
        if lang == "ruby" and text.startswith("=begin", i) and \
                (i == 0 or text[i - 1] == "\n"):
            j = text.find("\n=end", i)
            j = n if j < 0 else j + 5
            blank(i, j)
            i = j
            continue
        if lang == "rust":
            if c == "r" and i + 1 < n and text[i + 1] in "#\"":
                m = re.match(r'r(#*)"', text[i:])
                if m:
                    closer = '"' + m.group(1)
                    j = text.find(closer, i + m.end())
                    j = n if j < 0 else j + len(closer)
                    blank(i, j)
                    i = j
                    continue
            if c == "'":
                m = re.match(r"'(\\.|[^\\'])'", text[i:])
                if m:  # char literal; otherwise a lifetime — keep
                    blank(i, i + m.end())
                    i += m.end()
                    continue
                i += 1
                continue
        if c in "\"'`":
            if c == "`" and lang not in ("javascript", "typescript"):
                i += 1
                continue
            # python/ruby triple quotes
            if lang in ("python",) and text.startswith(c * 3, i):
                j = text.find(c * 3, i + 3)
                j = n if j < 0 else j + 3
                blank(i, j)
                i = j
                continue
            j = i + 1
            while j < n:
                if text[j] == "\\":
                    j += 2
                    continue
                if text[j] == c:
                    j += 1
                    break
                if text[j] == "\n" and c != "`":
                    break  # unterminated on this line; bail
                j += 1
            blank(i, j)
            i = j
            continue
        i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# Corpus truth extractors (regex over stripped source)
# ---------------------------------------------------------------------------

_ID = r"[A-Za-z_]\w*"


def truth_rust(stripped: str, raw: str):
    decls = []
    for kw, kind in (("fn", "function"), ("struct", "struct"),
                     ("enum", "enum"), ("trait", "trait")):
        for m in re.finditer(rf"\b{kw}\s+({_ID})", stripped):
            decls.append((kind, m.group(1)))
    for m in re.finditer(rf"\bmod\s+({_ID})\s*[;{{]", stripped):
        decls.append(("module", m.group(1)))
    for m in re.finditer(
            rf"(?m)^\s*(?:pub\s*(?:\([^)]*\))?\s*)?use\s+([^;{{]*?)\s*([;{{])",
            stripped):
        head = m.group(1)
        head = head.split(" as ")[0]
        parts = re.findall(_ID, head)
        if parts:
            decls.append(("import", "::".join(parts)))
    return decls


def truth_javascript(stripped: str, raw: str):
    decls = []
    for m in re.finditer(rf"\bfunction\s*\*?\s*({_ID})", stripped):
        decls.append(("function", m.group(1)))
    for m in re.finditer(rf"\bclass\s+({_ID})", stripped):
        decls.append(("class", m.group(1)))
    # depth-0 arrows bound to const/let/var (the scanner's contract is
    # any non-function scope; depth-0 is the measurable core of it)
    depth = 0
    for line in stripped.splitlines():
        if depth == 0:
            m = re.match(
                rf"\s*(?:export\s+)?(?:const|let|var)\s+({_ID})\s*=\s*"
                rf"(?:async\s+)?(?:\([^()]*\)|{_ID})\s*=>", line)
            if m:
                decls.append(("function", m.group(1)))
        depth += line.count("{") - line.count("}")
        depth = max(depth, 0)
    # module specifiers live in string literals, which the stripper
    # blanks — recover them from the RAW text (comment-borne imports
    # are accepted noise, counted in the mismatch samples)
    for m in re.finditer(
            r"(?m)^\s*import\b[^;\n]*?['\"]([^'\"\n]+)['\"]", raw):
        decls.append(("import", m.group(1)))
    for m in re.finditer(r"\brequire\s*\(\s*['\"]([^'\"]+)['\"]", raw):
        decls.append(("import", m.group(1)))
    return decls


def truth_cpp(stripped: str, raw: str):
    decls = []
    # includes live on pp lines the stripper leaves alone (strings in
    # #include "x.h" get blanked — recover them from the RAW text)
    for m in re.finditer(r'(?m)^\s*#\s*include\s*(?:<([^>\n]+)>|"([^"\n]+)")',
                         raw):
        decls.append(("import", m.group(1) or m.group(2)))
    masked = re.sub(r"\benum\s+(?:class|struct)\s", "enum ", stripped)
    # optional ALL-CAPS export macro between keyword and name
    # (`class IMF_EXPORT_TYPE Name {`) — common in real headers
    for m in re.finditer(
            rf"\b(class|struct)\s+(?:[A-Z_][A-Z0-9_]{{2,}}\s+)?({_ID})\s*"
            rf"(?:final\s*)?(?::[^;{{]*)?\{{",
            masked):
        if m.group(1) == "class" and \
                re.search(r"enum\s+$", masked[: m.start()]):
            continue
        decls.append((m.group(1), m.group(2)))
    # `[^;{}()]*` tolerates visibility macros before the brace
    # (`namespace std _GLIBCXX_VISIBILITY(default) {` keeps its macro's
    # parens out via a separate optional group)
    for m in re.finditer(
            rf"\bnamespace\s+({_ID})(?:\s+\w+\s*(?:\([^()]*\))?)*\s*\{{",
            stripped):
        before = stripped[max(0, m.start() - 12): m.start()]
        if re.search(r"\busing\s+$", before):
            continue
        decls.append(("module", m.group(1)))
    return decls


# ---------------------------------------------------------------------------
# Scanner invocation + scoring
# ---------------------------------------------------------------------------

# kinds the REFERENCE extractor emits per language, mapped to our
# NodeType values (methods fold into 'function' on both sides):
#   rust.rs:107-427       module import trait struct enum function
#   javascript.rs         import function class
#   cpp.rs                struct module import function class (no enum)
REF_KINDS = {
    "rust": {"function", "struct", "enum", "trait", "module", "import"},
    "javascript": {"function", "class", "import"},
    "cpp": {"struct", "class", "module", "import"},
}

FOLD = {"method": "function"}


def scan_kinds(path: str, text: str, lang):
    from codegraph_tpu.core.types import Language
    from codegraph_tpu.parser.scanners import scan_file
    nodes, _ = scan_file("parity", path, text, Language(lang))
    out = []
    for nd in nodes:
        kind = FOLD.get(nd.node_type.value, nd.node_type.value)
        if kind in ("other", "file") or not nd.name:
            continue
        out.append((kind, nd.name))
    return out


def score(truth, got, kinds):
    """Multiset precision/recall over (kind, name), restricted to kinds."""
    t = Counter((k, nm) for k, nm in truth if k in kinds)
    g = Counter((k, nm) for k, nm in got if k in kinds)
    tp = sum((t & g).values())
    fp = sum((g - t).values())
    fn = sum((t - g).values())
    per_kind = {}
    for kind in sorted(kinds):
        tk = Counter(x for x in t if x[0] == kind)
        gk = Counter(x for x in g if x[0] == kind)
        # rebuild with counts
        tk = Counter({x: t[x] for x in t if x[0] == kind})
        gk = Counter({x: g[x] for x in g if x[0] == kind})
        tpk = sum((tk & gk).values())
        per_kind[kind] = {
            "truth": sum(tk.values()), "scanner": sum(gk.values()),
            "matched": tpk,
        }
    return tp, fp, fn, per_kind, (g - t), (t - g)


def run_corpus(lang, files, truth_fn, sample_mismatch=6):
    agg_tp = agg_fp = agg_fn = 0
    per_kind = defaultdict(lambda: {"truth": 0, "scanner": 0, "matched": 0})
    mismatches = []
    nfiles = 0
    for path in files:
        try:
            text = pathlib.Path(path).read_text(errors="replace")
        except OSError:
            continue
        if not text.strip() or len(text) > 1_500_000:
            continue
        lines = text.splitlines()
        if lines and max((len(ln) for ln in lines), default=0) > 2000:
            continue  # minified
        stripped = strip_source(text, lang)
        truth = truth_fn(stripped, text)
        got = scan_kinds(path, text, lang)
        tp, fp, fn, pk, extra, missing = score(truth, got, REF_KINDS[lang])
        agg_tp += tp
        agg_fp += fp
        agg_fn += fn
        for k, v in pk.items():
            for f in ("truth", "scanner", "matched"):
                per_kind[k][f] += v[f]
        for item, cnt in list(extra.items())[:2]:
            if len(mismatches) < sample_mismatch:
                mismatches.append(
                    {"file": path, "scanner_only": list(item)})
        for item, cnt in list(missing.items())[:2]:
            if len(mismatches) < sample_mismatch:
                mismatches.append({"file": path, "truth_only": list(item)})
        nfiles += 1
    prec = agg_tp / max(agg_tp + agg_fp, 1)
    rec = agg_tp / max(agg_tp + agg_fn, 1)
    return {
        "files": nfiles,
        "decls_truth": agg_tp + agg_fn,
        "decls_scanner": agg_tp + agg_fp,
        "precision": round(prec, 4),
        "recall": round(rec, 4),
        "per_kind": {k: dict(v, precision=round(
            v["matched"] / max(v["scanner"], 1), 4), recall=round(
            v["matched"] / max(v["truth"], 1), 4))
            for k, v in sorted(per_kind.items())},
        "sample_mismatches": mismatches,
    }


def corpus_files():
    rust = sorted(str(p) for p in
                  pathlib.Path("/root/reference/crates").rglob("*.rs"))
    js_all = sorted(str(p) for p in pathlib.Path("/opt/venv").rglob("*.js"))
    rng = random.Random(20260820)
    rng.shuffle(js_all)
    js = js_all[:400]
    cpp = sorted(str(p) for p in
                 pathlib.Path(os.path.join(REPO, "native")).rglob("*.cpp"))
    inc = sorted(str(p) for p in pathlib.Path("/usr/include").rglob("*.h"))
    rng.shuffle(inc)
    cpp += inc[:300]
    return {"rust": rust, "javascript": js, "cpp": cpp}


def main() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    results = {"part_a_corpus": {}, "part_b_golden": {}}

    truths = {"rust": truth_rust, "javascript": truth_javascript,
              "cpp": truth_cpp}
    for lang, files in corpus_files().items():
        print(f"[corpus] {lang}: {len(files)} files ...", flush=True)
        results["part_a_corpus"][lang] = run_corpus(
            lang, files, truths[lang])
        r = results["part_a_corpus"][lang]
        print(f"  precision {r['precision']} recall {r['recall']} "
              f"({r['decls_truth']} truth decls, {r['files']} files)",
              flush=True)

    from parity_fixtures_r5 import FIXTURES  # noqa: E402 (same dir)
    for lang, (src, expected) in sorted(FIXTURES.items()):
        got = scan_kinds(f"fixture.{lang}", src, lang)
        kinds = {k for k, _ in expected} | {k for k, _ in got}
        exp_fold = [(FOLD.get(k, k), nm) for k, nm in expected]
        kinds = {FOLD.get(k, k) for k in kinds}
        tp, fp, fn, pk, extra, missing = score(exp_fold, got, kinds)
        results["part_b_golden"][lang] = {
            "expected": len(exp_fold),
            "scanner": tp + fp,
            "precision": round(tp / max(tp + fp, 1), 4),
            "recall": round(tp / max(tp + fn, 1), 4),
            "scanner_only": sorted(list(x) for x in extra),
            "missed": sorted(list(x) for x in missing),
        }
        r = results["part_b_golden"][lang]
        print(f"[golden] {lang}: precision {r['precision']} "
              f"recall {r['recall']} ({r['expected']} expected)", flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
