"""Train the BPE-vocab encoder on a large out-of-domain corpus and eval
cross-repo (round-1 VERDICT item 4 exit criteria).

Training pairs: (code-without-docstring, docstring+name) harvested from
installed site-packages Python sources (jax/numpy/optax/...: tens of
thousands of documented functions, all public code) plus this repo and
multi-language template synthetics. The EVAL repo (/root/reference,
Rust) contributes ZERO training pairs — its doc-comment pairs are the
held-out different-repo benchmark (benchmarks/crossrepo_eval.py).

Usage (TPU): python benchmarks/train_bpe_encoder.py --steps 1200
Writes checkpoints/encoder_bpe_384.npz (+ .bench/train_bpe.json)
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import pathlib
import random
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def harvest_python_pairs(roots, max_pairs=30000, max_per_file=20):
    """(code-sans-docstring, name words + docstring 1st lines) pairs."""
    from codegraph_tpu.search.bm25 import tokenize

    pairs = []
    files = []
    for root in roots:
        files.extend(sorted(pathlib.Path(root).rglob("*.py")))
    rng = random.Random(0)
    rng.shuffle(files)
    for p in files:
        try:
            text = p.read_text(errors="replace")
            tree = ast.parse(text)
        except Exception:
            continue
        lines = text.splitlines()
        n_here = 0
        for node in ast.walk(tree):
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            doc = ast.get_docstring(node)
            if not doc or len(doc.split()) < 4:
                continue
            body = "\n".join(
                lines[node.lineno - 1:getattr(node, "end_lineno", node.lineno)]
            )
            # strip the docstring so the model can't string-match it
            for q in ('"""', "'''"):
                if q in body:
                    a, _, rest = body.partition(q)
                    _, _, after = rest.partition(q)
                    body = a + after
                    break
            desc = " ".join(tokenize(node.name)) + ". " + \
                " ".join(doc.split("\n\n")[0].split())[:200]
            pairs.append((body[:500], desc))
            n_here += 1
            if n_here >= max_per_file:
                break
        if len(pairs) >= max_pairs:
            break
    return pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=384)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--max-len", type=int, default=192)
    ap.add_argument("--max-pairs", type=int, default=30000)
    ap.add_argument("--out", default="checkpoints/encoder_bpe_384.npz")
    ap.add_argument("--tokenizer", default="checkpoints/bpe_code_8k.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from codegraph_tpu.models.bpe import BPETokenizer
    from codegraph_tpu.models.encoder import EncoderConfig, encode_jit
    from codegraph_tpu.models.providers import save_encoder_checkpoint
    from codegraph_tpu.models.training import TrainConfig, make_sharded_train_step
    from codegraph_tpu.parallel.mesh import make_mesh

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from crossrepo_eval import harvest_rust_pairs
    from train_on_repo import synth_pairs

    tok = BPETokenizer.load(args.tokenizer, max_len=args.max_len)

    t0 = time.time()
    roots = ["/opt/venv/lib/python3.12/site-packages/jax",
             "/opt/venv/lib/python3.12/site-packages/numpy",
             "/opt/venv/lib/python3.12/site-packages/optax",
             "/opt/venv/lib/python3.12/site-packages/transformers",
             "/opt/venv/lib/python3.12/site-packages/chex",
             "/root/repo/codegraph_tpu"]
    pairs = harvest_python_pairs(roots, max_pairs=args.max_pairs)
    rng = random.Random(0)
    pairs += [(c, d) for c, d, *_ in
              (p if len(p) == 2 else p[:2] for p in synth_pairs(2000, rng))]
    rng.shuffle(pairs)
    held = pairs[:256]
    train = pairs[256:]
    print(f"harvested {len(train)} train / {len(held)} held pairs "
          f"in {time.time()-t0:.0f}s", flush=True)

    # pre-tokenize everything once (host BPE is the slow part)
    t0 = time.time()

    def tok_all(texts):
        return tok.encode_batch(texts, max_len=args.max_len)

    tr_c_ids, tr_c_mask = tok_all([c for c, _ in train])
    tr_d_ids, tr_d_mask = tok_all([d for _, d in train])
    he_c_ids, he_c_mask = tok_all([c for c, _ in held])
    he_d_ids, he_d_mask = tok_all([d for _, d in held])
    xr = harvest_rust_pairs("/root/reference/crates")
    xr_c_ids, xr_c_mask = tok_all([c for c, _ in xr])
    xr_d_ids, xr_d_mask = tok_all([d for _, d in xr])
    print(f"tokenized in {time.time()-t0:.0f}s; {len(xr)} cross-repo pairs",
          flush=True)

    cfg = EncoderConfig(
        vocab_size=tok.vocab_size, hidden=args.hidden, n_layers=args.layers,
        n_heads=next(h for h in (12, 8, 4, 2, 1) if args.hidden % h == 0),
        max_len=args.max_len, dtype=jnp.bfloat16,
        remat=True,  # two towers x 4 layers of [B, L, H] + attn probs
                     # blew 26G HBM at B=256 without rematerialization
    )
    mesh = make_mesh((1, 1), ("dp", "tp"))
    step_fn, init_fn = make_sharded_train_step(
        mesh, cfg, TrainConfig(learning_rate=7e-4, temperature=0.07))
    params, opt_state = init_fn(jax.random.PRNGKey(0))

    def eval_recall(params, ci, cm, di, dm, bs=256):
        zc, zd = [], []
        for a in range(0, len(ci), bs):
            zc.append(np.asarray(encode_jit(
                params, jnp.asarray(ci[a:a+bs]), jnp.asarray(cm[a:a+bs]), cfg)))
            zd.append(np.asarray(encode_jit(
                params, jnp.asarray(di[a:a+bs]), jnp.asarray(dm[a:a+bs]), cfg)))
        zc, zd = np.concatenate(zc), np.concatenate(zd)
        order = np.argsort(-(zd @ zc.T), axis=1)
        n = len(ci)
        r1 = float((order[:, 0] == np.arange(n)).mean())
        r10 = float((order[:, :10] == np.arange(n)[:, None]).any(1).mean())
        return {"recall@1": round(r1, 3), "recall@10": round(r10, 3)}

    np_rng = np.random.default_rng(0)
    losses = []
    t0 = time.time()
    n_train = len(tr_c_ids)
    for step in range(args.steps):
        sel = np_rng.choice(n_train, args.batch, replace=False)
        _, opt_state2, metrics = out = step_fn(params, opt_state, {
            "anchor_ids": tr_c_ids[sel], "anchor_mask": tr_c_mask[sel],
            "positive_ids": tr_d_ids[sel], "positive_mask": tr_d_mask[sel],
        })
        params, opt_state = out[0], opt_state2
        if (step + 1) % 100 == 0:
            losses.append(round(float(metrics["loss"]), 4))
            print(f"step {step+1}: loss {losses[-1]} "
                  f"({(time.time()-t0)/(step+1):.2f}s/step)", flush=True)
    train_s = time.time() - t0

    held_m = eval_recall(params, he_c_ids, he_c_mask, he_d_ids, he_d_mask)
    xr_m = eval_recall(params, xr_c_ids, xr_c_mask, xr_d_ids, xr_d_mask)
    print("held-out (same distribution):", held_m)
    print("CROSS-REPO (reference Rust):", xr_m)

    # f16 halves the checkpoint; inference runs bf16 anyway
    params_f16 = jax.tree.map(
        lambda a: np.asarray(a, np.float16), jax.device_get(params))
    save_encoder_checkpoint(args.out, params_f16, cfg=cfg,
                            tokenizer_file=args.tokenizer)
    os.makedirs(".bench", exist_ok=True)
    rec = {
        "pairs_train": len(train), "steps": args.steps,
        "train_s": round(train_s, 1), "losses": losses,
        "heldout": held_m, "crossrepo_rust": xr_m,
        "config": {"hidden": args.hidden, "layers": args.layers,
                   "max_len": args.max_len, "vocab": tok.vocab_size},
        "out": args.out,
        "size_mb": round(os.path.getsize(args.out) / 1e6, 1),
    }
    with open(".bench/train_bpe.json", "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
