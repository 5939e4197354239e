"""Round-3 encoder training: beat lexical hashing cross-domain.

VERDICT r2 item 4 exit criteria: encoder-alone cross-repo recall@1
>= 0.375 (hash parity), ensemble >= 0.55. The round-2 encoder lost
cross-domain (0.23 vs 0.375) because its 15k training pairs were
Python-only while the eval is Rust. This round attacks the domain gap:

  1. 5-10x MORE pairs: every installed site-packages Python package
     (not 5), plus C/C++ doc-comment pairs from /usr/include (a real
     curly-brace systems language — the closest offline stand-in for
     Rust), plus much richer multi-language template synthetics covering
     the 12 scanner languages (incl. Rust syntax).
  2. BPE retrained on the multi-language corpus (16k merges) so Rust
     tokens (fn, ::, ->, &mut, <'a>) segment sanely.
  3. In-batch HARD negatives: half of every batch shares a name verb
     or noun with another pair in the batch, so InfoNCE can't win on
     topic words alone.
  4. Bigger model (6L/512 default) with remat, cosine LR decay.

NO pairs come from /root/reference (the held-out eval repo).

Usage (TPU): python benchmarks/train_encoder_r3.py --steps 6000
Writes checkpoints/encoder_r3_512.npz + .bench/train_r3.json.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import random
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# --------------------------------------------------------------------------
# Harvesting
# --------------------------------------------------------------------------

SITE = "/opt/venv/lib/python3.12/site-packages"


def python_roots(max_roots: int = 400):
    roots = []
    for p in sorted(pathlib.Path(SITE).iterdir()):
        if p.is_dir() and not p.name.endswith((".dist-info", "__pycache__")):
            roots.append(str(p))
    rng = random.Random(7)
    rng.shuffle(roots)
    return roots[:max_roots]


_C_FN = re.compile(
    r"(/\*\*?(?P<block>(?:[^*]|\*(?!/))*)\*/\s*|(?P<dox>(?:^[ \t]*///[^\n]*\n)+)|(?P<lines>(?:^[ \t]*//[^\n]*\n){2,}))"
    r"^[ \t]*(?:template\s*<[^>\n]*>\s*\n)?[ \t]*"
    r"(?P<sig>[A-Za-z_][\w \t\*&:<>,~=\[\]]*?\b(?P<name>[A-Za-z_]\w+)\s*\([^;{)]*\)[^;{]*)(?P<term>[;{])",
    re.M,
)


def harvest_c_pairs(roots, max_pairs=25000):
    """(decl+body-head, comment) pairs from C/C++ headers/sources —
    doc-comment blocks or runs of // lines directly above a function
    definition."""
    from codegraph_tpu.search.bm25 import tokenize

    pairs = []
    files = []
    for root in roots:
        for ext in ("*.h", "*.hpp", "*.hh", "*.c", "*.cc", "*.cpp"):
            files.extend(pathlib.Path(root).rglob(ext))
    rng = random.Random(1)
    files = sorted(set(files))
    rng.shuffle(files)
    for p in files:
        try:
            text = p.read_text(errors="replace")
        except Exception:
            continue
        n_here = 0
        for m in _C_FN.finditer(text):
            doc = m.group("block") or ""
            if not doc and (m.group("dox") or m.group("lines")):
                doc = re.sub(r"^[ \t]*//+ ?", "",
                             m.group("dox") or m.group("lines"), flags=re.M)
            doc = re.sub(r"^[ \t]*\*+ ?", "", doc, flags=re.M)
            doc = " ".join(doc.split())
            if len(doc.split()) < 5 or doc.lower().startswith(("copyright",
                                                               "license")):
                continue
            name = m.group("name")
            if name in ("if", "for", "while", "switch", "sizeof", "return"):
                continue
            # signature (+ up to ~8 lines of body for definitions;
            # declarations end at the ';' — headers mostly declare)
            start = m.start("sig")
            end = (m.end("term") if m.group("term") == ";"
                   else start + 600)
            body = text[start:end]
            body = "\n".join(body.splitlines()[:10])
            desc = " ".join(tokenize(name)) + ". " + doc[:200]
            pairs.append((body, desc))
            n_here += 1
            if n_here >= 12:
                break
        if len(pairs) >= max_pairs:
            break
    return pairs


VERBS = ["parse", "render", "compute", "validate", "serialize", "fetch",
         "cache", "merge", "encode", "decode", "route", "schedule",
         "compress", "filter", "sort", "hash", "index", "train", "search",
         "resolve", "upload", "download", "retry", "batch", "scan", "emit",
         "flush", "spawn", "attach", "detach", "publish", "subscribe",
         "allocate", "release", "clone", "diff", "apply", "revert", "lock",
         "signal", "poll", "drain", "split", "join", "pad", "clamp"]
NOUNS = ["config", "request", "invoice", "token", "graph", "payload",
         "session", "metric", "snapshot", "index", "template", "batch",
         "record", "packet", "schema", "bucket", "vector", "document",
         "queue", "cache", "header", "response", "chunk", "embedding",
         "socket", "buffer", "cursor", "ledger", "manifest", "segment",
         "shard", "tensor", "channel", "worker", "registry", "mutex",
         "journal", "replica", "quota", "lease", "digest", "cipher"]
ADJS = ["", "stale ", "pending ", "remote ", "sparse ", "atomic ",
        "cached ", "signed ", "nested ", "rolling "]

TEMPLATES = [
    ("def {v}_{o}(data):\n    out = impl.{v}(data.{o})\n    return out",
     "python"),
    ("pub fn {v}_{o}(data: &mut Data) -> Result<{O}, Error> {{\n"
     "    let out = impl::{v}(&data.{o})?;\n    Ok(out)\n}}", "rust"),
    ("fn {v}_{o}<'a>(items: &'a [{O}]) -> Vec<&'a {O}> {{\n"
     "    items.iter().filter(|x| x.{o}_ok()).collect()\n}}", "rust"),
    ("impl {O}Manager {{\n    pub fn {v}(&self, id: u64) -> Option<{O}> {{\n"
     "        self.{o}s.get(&id).cloned()\n    }}\n}}", "rust"),
    ("function {v}{O}(data) {{\n  const out = impl.{v}(data.{o});\n"
     "  return out;\n}}", "javascript"),
    ("func {V}{O}(data Data) ({O}, error) {{\n"
     "    out, err := impl.{V}(data.{O})\n    return out, err\n}}", "go"),
    ("public {O} {v}{O}({O}Request req) {{\n"
     "    return service.{v}(req.get{O}());\n}}", "java"),
    ("{O}* {v}_{o}(const Data& data) {{\n"
     "    return impl::{v}(data.{o}());\n}}", "cpp"),
    ("def {v}_{o}(data)\n  impl.{v}(data.{o})\nend", "ruby"),
    ("public function {v}{O}($data) {{\n"
     "    return $this->impl->{v}($data->{o});\n}}", "php"),
    ("func {v}{O}(_ data: Data) -> {O} {{\n"
     "    return impl.{v}(data.{o})\n}}", "swift"),
    ("fun {v}{O}(data: Data): {O} {{\n"
     "    return impl.{v}(data.{o})\n}}", "kotlin"),
]
DESCS = ["{v}s the {a}{o}", "{v} a {a}{o} record", "apply {v} to each {a}{o}",
         "helper that {v}s the {a}{o} before returning it",
         "{v}s every {a}{o} in the collection",
         "returns the {a}{o} after running {v} on it"]


def synth_pairs_v2(n: int, rng: random.Random):
    out, seen = [], set()
    attempts = 0
    while len(out) < n and attempts < n * 20:
        attempts += 1
        v, o = rng.choice(VERBS), rng.choice(NOUNS)
        a = rng.choice(ADJS)
        tmpl, _lang = rng.choice(TEMPLATES)
        d = rng.choice(DESCS)
        key = (v, o, a, tmpl, d)
        if key in seen:
            continue
        seen.add(key)
        code = tmpl.format(v=v, o=o, V=v.capitalize(), O=o.capitalize())
        out.append((code, d.format(v=v, o=o, a=a)))
    return out


def name_tokens(desc: str):
    """First sentence of the description = tokenized name words."""
    return tuple(desc.split(".")[0].split()[:3])


# --------------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--max-len", type=int, default=192)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--py-pairs", type=int, default=80000)
    ap.add_argument("--c-pairs", type=int, default=25000)
    ap.add_argument("--synth-pairs", type=int, default=40000)
    ap.add_argument("--vocab", type=int, default=16384)
    ap.add_argument("--hard-frac", type=float, default=0.5)
    ap.add_argument("--out", default="checkpoints/encoder_r3_512.npz")
    ap.add_argument("--bpe-out", default="checkpoints/bpe_code_16k.json")
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--harvest-only", action="store_true")
    ap.add_argument("--mine", action="store_true",
                    help="hard in-batch companions mined from the "
                         "shipped encoder's own top-k retrievals")
    ap.add_argument("--schedule", default="const",
                    choices=("const", "cosine"))
    ap.add_argument("--pairs-cache", default=".bench/pairs_r3.jsonl.gz")
    args = ap.parse_args()

    import gzip

    rng = random.Random(0)
    if os.path.exists(args.pairs_cache):
        with gzip.open(args.pairs_cache, "rt") as f:
            rec = json.load(f)
        py, cc, sy = rec["python"], rec["c_cpp"], rec["synthetic"]
        print(f"loaded pair cache: {len(py)} py / {len(cc)} c / "
              f"{len(sy)} synth", flush=True)
    else:
        from train_bpe_encoder import harvest_python_pairs

        t0 = time.time()
        py = harvest_python_pairs(python_roots(), max_pairs=args.py_pairs,
                                  max_per_file=12)
        print(f"python pairs: {len(py)} ({time.time()-t0:.0f}s)", flush=True)
        t0 = time.time()
        cc = harvest_c_pairs(["/usr/include"], max_pairs=args.c_pairs)
        print(f"c/c++ pairs: {len(cc)} ({time.time()-t0:.0f}s)", flush=True)
        sy = synth_pairs_v2(args.synth_pairs, rng)
        print(f"synthetic pairs: {len(sy)}", flush=True)
        os.makedirs(os.path.dirname(args.pairs_cache), exist_ok=True)
        with gzip.open(args.pairs_cache, "wt") as f:
            json.dump({"python": py, "c_cpp": cc, "synthetic": sy}, f)
    pairs = [tuple(p) for p in py + cc + sy]
    rng.shuffle(pairs)
    held = pairs[:512]
    train = pairs[512:]
    print(f"total: {len(train)} train / {len(held)} held", flush=True)

    # ---- tokenizer: multi-language BPE ----
    from codegraph_tpu.models.bpe import BPETokenizer, train_bpe

    if os.path.exists(args.bpe_out):
        tok = BPETokenizer.load(args.bpe_out, max_len=args.max_len)
        print(f"loaded {args.bpe_out} (vocab {tok.vocab_size})", flush=True)
    else:
        t0 = time.time()
        sample = [c for c, _ in train[:40000]] + [d for _, d in train[:40000]]
        tok = train_bpe(sample, n_merges=args.vocab, max_len=args.max_len)
        tok.save(args.bpe_out)
        print(f"BPE trained: vocab {tok.vocab_size} "
              f"({time.time()-t0:.0f}s)", flush=True)
    if args.harvest_only:
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    from codegraph_tpu.models.encoder import EncoderConfig, encode_jit
    from codegraph_tpu.models.providers import save_encoder_checkpoint
    from codegraph_tpu.models.training import (
        TrainConfig,
        make_sharded_train_step,
    )
    from codegraph_tpu.parallel.mesh import make_mesh
    from crossrepo_eval import harvest_rust_pairs

    t0 = time.time()
    tr_c_ids, tr_c_mask = tok.encode_batch([c for c, _ in train],
                                           max_len=args.max_len)
    tr_d_ids, tr_d_mask = tok.encode_batch([d for _, d in train],
                                           max_len=args.max_len)
    he_c = tok.encode_batch([c for c, _ in held], max_len=args.max_len)
    he_d = tok.encode_batch([d for _, d in held], max_len=args.max_len)
    xr = harvest_rust_pairs("/root/reference/crates")
    xr_c = tok.encode_batch([c for c, _ in xr], max_len=args.max_len)
    xr_d = tok.encode_batch([d for _, d in xr], max_len=args.max_len)
    print(f"tokenized in {time.time()-t0:.0f}s; {len(xr)} cross-repo pairs",
          flush=True)

    # hard-negative buckets: pairs sharing a name verb/noun token
    buckets = {}
    for i, (_, d) in enumerate(train):
        for t in name_tokens(d):
            buckets.setdefault(t, []).append(i)
    buckets = {k: v for k, v in buckets.items() if len(v) >= 8}
    bucket_keys = list(buckets.keys())
    print(f"{len(bucket_keys)} hard-negative buckets", flush=True)

    mined_tr = None
    if args.mine:
        # retriever-mined batch-mates: each training pair's top-k
        # retrieved codes under the CURRENT shipped encoder become its
        # in-batch companions, so InfoNCE's denominators carry the
        # confusions the previous model actually made (static mining —
        # one pass with the shipped checkpoint before training starts)
        from train_cross_encoder_r3 import mine_retriever_negatives

        rows_c = [list(ids[m]) for ids, m in zip(tr_c_ids, tr_c_mask)]
        rows_d = [list(ids[m]) for ids, m in zip(tr_d_ids, tr_d_mask)]
        mined_tr = mine_retriever_negatives(
            rows_c, rows_d, list(range(len(rows_c))))

    cfg = EncoderConfig(
        vocab_size=tok.vocab_size, hidden=args.hidden, n_layers=args.layers,
        n_heads=next(h for h in (16, 12, 8, 4, 2, 1)
                     if args.hidden % h == 0),
        max_len=args.max_len, dtype=jnp.bfloat16, remat=True,
    )
    mesh = make_mesh((1, 1), ("dp", "tp"))
    step_fn, init_fn = make_sharded_train_step(
        mesh, cfg, TrainConfig(learning_rate=args.lr, temperature=0.05,
                               schedule=args.schedule,
                               total_steps=args.steps))
    params, opt_state = init_fn(jax.random.PRNGKey(0))

    def eval_recall(params, ce, de, bs=256):
        (ci, cm), (di, dm) = ce, de
        zc, zd = [], []
        for a in range(0, len(ci), bs):
            zc.append(np.asarray(encode_jit(
                params, jnp.asarray(ci[a:a+bs]), jnp.asarray(cm[a:a+bs]),
                cfg)))
            zd.append(np.asarray(encode_jit(
                params, jnp.asarray(di[a:a+bs]), jnp.asarray(dm[a:a+bs]),
                cfg)))
        zc, zd = np.concatenate(zc), np.concatenate(zd)
        order = np.argsort(-(zd @ zc.T), axis=1)
        n = len(ci)
        return {
            "recall@1": round(float((order[:, 0] == np.arange(n)).mean()), 3),
            "recall@10": round(float(
                (order[:, :10] == np.arange(n)[:, None]).any(1).mean()), 3),
        }

    np_rng = np.random.default_rng(0)
    n_train = len(tr_c_ids)
    n_hard = int(args.batch * args.hard_frac)
    losses, evals = [], []
    t0 = time.time()
    for step in range(args.steps):
        # easy half: uniform; hard half: a few buckets' members together
        # (or, with --mine, retriever-confusable clusters)
        sel = list(np_rng.choice(n_train, args.batch - n_hard,
                                 replace=False))
        seen = set(sel)  # duplicate rows would be false negatives of
        while len(sel) < args.batch:  # their own positives under InfoNCE
            if mined_tr is not None:
                s = int(np_rng.integers(n_train))
                group = [s] + [int(m) for m in mined_tr[s] if int(m) != s][:7]
            else:
                b = buckets[bucket_keys[np_rng.integers(len(bucket_keys))]]
                group = list(np_rng.choice(b, min(8, len(b)),
                                           replace=False))
            for g in group:
                if g not in seen and len(sel) < args.batch:
                    seen.add(g)
                    sel.append(g)
        sel = np.asarray(sel[:args.batch])
        out = step_fn(params, opt_state, {
            "anchor_ids": tr_c_ids[sel], "anchor_mask": tr_c_mask[sel],
            "positive_ids": tr_d_ids[sel], "positive_mask": tr_d_mask[sel],
        })
        params, opt_state, metrics = out
        if (step + 1) % 100 == 0:
            losses.append(round(float(metrics["loss"]), 4))
            print(f"step {step+1}: loss {losses[-1]} "
                  f"({(time.time()-t0)/(step+1):.2f}s/step)", flush=True)
        if (step + 1) % args.eval_every == 0 or step + 1 == args.steps:
            xr_m = eval_recall(params, xr_c, xr_d)
            evals.append({"step": step + 1, **xr_m})
            print(f"  cross-repo @step {step+1}: {xr_m}", flush=True)
            save_encoder_checkpoint(
                args.out,
                jax.tree.map(lambda a: np.asarray(a, np.float16),
                             jax.device_get(params)),
                cfg=cfg, tokenizer_file=args.bpe_out)
    train_s = time.time() - t0

    held_m = eval_recall(params, he_c, he_d)
    xr_m = eval_recall(params, xr_c, xr_d)
    print("held-out:", held_m, flush=True)
    print("CROSS-REPO (reference Rust):", xr_m, flush=True)

    save_encoder_checkpoint(
        args.out,
        jax.tree.map(lambda a: np.asarray(a, np.float16),
                     jax.device_get(params)),
        cfg=cfg, tokenizer_file=args.bpe_out)
    os.makedirs(".bench", exist_ok=True)
    with open(".bench/train_r3.json", "w") as f:
        json.dump({
            "pairs": {"python": len(py), "c_cpp": len(cc),
                      "synthetic": len(sy), "train": len(train)},
            "steps": args.steps, "train_s": round(train_s, 1),
            "losses": losses, "eval_curve": evals,
            "heldout": held_m, "crossrepo_rust": xr_m,
            "config": {"hidden": args.hidden, "layers": args.layers,
                       "max_len": args.max_len, "vocab": tok.vocab_size,
                       "batch": args.batch, "hard_frac": args.hard_frac,
                       "mined": bool(args.mine),
                       "schedule": args.schedule},
            "out": args.out,
            "size_mb": round(os.path.getsize(args.out) / 1e6, 1),
        }, f, indent=1)
    print("wrote .bench/train_r3.json", flush=True)


if __name__ == "__main__":
    main()
