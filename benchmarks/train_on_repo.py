"""Train a seed encoder on real (code, description) pairs from a repo.

Builds training pairs from docstrings/names found by the parser (plus
template synthetics for vocabulary coverage), fine-tunes the byte-level
encoder contrastively, evaluates held-out desc->code retrieval, and
saves a checkpoint usable via EncoderProvider(checkpoint=...).

Usage: python benchmarks/train_on_repo.py [--root .] [--steps 150]
       [--out checkpoints/encoder_seed.npz]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import time


def harvest_pairs(root: str, max_pairs: int = 2000):
    """(code, description) pairs from functions with docstrings; the
    description is the docstring + humanized name."""
    from codegraph_tpu.core.types import NodeType
    from codegraph_tpu.parser.parser import SourceParser
    from codegraph_tpu.search.bm25 import tokenize

    parser = SourceParser(project=root, workers=2)
    parses, _ = parser.parse_directory(root)
    pairs = []
    for fp in parses:
        for node in fp.result.nodes:
            if node.node_type not in (NodeType.FUNCTION, NodeType.METHOD):
                continue
            body = node.content
            desc_parts = [" ".join(tokenize(node.name))]
            if '"""' in body:
                doc = body.split('"""')
                if len(doc) >= 2 and doc[1].strip():
                    desc_parts.append(doc[1].strip().split("\n")[0][:120])
            pairs.append((body[:400], ". ".join(desc_parts)))
            if len(pairs) >= max_pairs:
                return pairs
    return pairs


def synth_pairs(n: int, rng) -> list:
    """Template synthetics for vocabulary coverage beyond one repo."""
    verbs = ["parse", "render", "compute", "validate", "serialize", "fetch",
             "cache", "merge", "encode", "decode", "route", "schedule",
             "compress", "filter", "sort", "hash", "index", "train",
             "search", "resolve", "upload", "download", "retry", "batch"]
    nouns = ["config", "request", "invoice", "token", "graph", "payload",
             "session", "metric", "snapshot", "index", "template", "batch",
             "record", "packet", "schema", "bucket", "vector", "document",
             "queue", "cache", "header", "response", "chunk", "embedding"]
    langs = [
        ("def {v}_{o}(data):\n    return impl.{v}(data.{o})", "python"),
        ("pub fn {v}_{o}(data: &Data) -> Result<{O}> {{ impl::{v}(&data.{o}) }}", "rust"),
        ("function {v}{O}(data) {{ return impl.{v}(data.{o}); }}", "javascript"),
        ("func {V}{O}(data Data) {O} {{ return impl.{V}(data.{O}) }}", "go"),
    ]
    descs = ["{v}s the {o}", "{v} a {o} record", "apply {v} to the {o}",
             "helper that {v}s each {o}"]
    out, seen = [], set()
    while len(out) < n:
        v, o = rng.choice(verbs), rng.choice(nouns)
        tmpl, _ = rng.choice(langs)
        d = rng.choice(descs)
        key = (v, o, tmpl, d)
        if key in seen:
            continue
        seen.add(key)
        code = tmpl.format(v=v, o=o, V=v.capitalize(), O=o.capitalize())
        out.append((code, d.format(v=v, o=o)))
        if len(seen) >= len(verbs) * len(nouns) * len(langs) * len(descs):
            break
    return out


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default=".")
    parser.add_argument("--synth", type=int, default=0,
                        help="add N template-synthetic pairs")
    parser.add_argument("--steps", type=int, default=150)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--hidden", type=int, default=256)
    parser.add_argument("--layers", type=int, default=2)
    parser.add_argument("--max-len", type=int, default=128)
    parser.add_argument("--out", default="checkpoints/encoder_seed.npz")
    parser.add_argument("--holdout", type=int, default=64)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from codegraph_tpu.models.encoder import EncoderConfig
    from codegraph_tpu.models.providers import save_encoder_checkpoint
    from codegraph_tpu.models.tokenizer import VOCAB_SIZE, ByteTokenizer
    from codegraph_tpu.models.training import TrainConfig, make_sharded_train_step
    from codegraph_tpu.parallel.mesh import default_mesh_shape, make_mesh

    rng = random.Random(0)
    pairs = harvest_pairs(args.root)
    if args.synth:
        pairs += synth_pairs(args.synth, rng)
    rng.shuffle(pairs)
    print(f"harvested {len(pairs)} pairs", flush=True)
    held = pairs[: args.holdout]
    train = pairs[args.holdout:]

    tok = ByteTokenizer(max_len=args.max_len)
    cfg = EncoderConfig(
        vocab_size=VOCAB_SIZE, hidden=args.hidden, n_layers=args.layers,
        n_heads=next(h for h in (8, 4, 2, 1) if args.hidden % h == 0),
        max_len=args.max_len, dtype=jnp.float32,
    )
    n_dev = len(jax.devices())
    dp, tp = default_mesh_shape(min(n_dev, 8), n_axes=2)
    mesh = make_mesh((dp, tp), ("dp", "tp"))
    step_fn, init_fn = make_sharded_train_step(
        mesh, cfg, TrainConfig(learning_rate=1e-3, temperature=0.07)
    )
    params, opt_state = init_fn(jax.random.PRNGKey(0))

    def eval_recall(params):
        from codegraph_tpu.models.encoder import encode_jit

        codes = [c for c, _ in held]
        descs = [d for _, d in held]
        ci, cm = tok.encode_batch(codes)
        di, dm = tok.encode_batch(descs)
        zc = np.asarray(encode_jit(params, jnp.asarray(ci), jnp.asarray(cm), cfg))
        zd = np.asarray(encode_jit(params, jnp.asarray(di), jnp.asarray(dm), cfg))
        order = np.argsort(-(zd @ zc.T), axis=1)
        r1 = sum(1 for i in range(len(held)) if order[i, 0] == i) / len(held)
        r5 = sum(1 for i in range(len(held)) if i in order[i, :5]) / len(held)
        return {"recall@1": round(r1, 3), "recall@5": round(r5, 3)}

    before = eval_recall(params)
    t0 = time.perf_counter()
    losses = []
    for step in range(args.steps):
        batch_pairs = rng.sample(train, min(args.batch, len(train)))
        a_ids, a_mask = tok.encode_batch([c for c, _ in batch_pairs])
        p_ids, p_mask = tok.encode_batch([d for _, d in batch_pairs])
        params, opt_state, metrics = step_fn(params, opt_state, {
            "anchor_ids": a_ids, "anchor_mask": a_mask,
            "positive_ids": p_ids, "positive_mask": p_mask,
        })
        losses.append(float(metrics["loss"]))
        if (step + 1) % 25 == 0:
            print(f"step {step+1}: loss {losses[-1]:.4f}", flush=True)
    train_s = time.perf_counter() - t0
    after = eval_recall(params)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_encoder_checkpoint(args.out, params)
    size_mb = os.path.getsize(args.out) / 1e6
    print(json.dumps({
        "pairs_train": len(train), "pairs_held": len(held),
        "steps": args.steps, "train_s": round(train_s, 1),
        "loss_first": round(losses[0], 3), "loss_last": round(losses[-1], 3),
        "heldout_before": before, "heldout_after": after,
        "checkpoint": args.out, "size_mb": round(size_mb, 1),
        "config": {"hidden": args.hidden, "layers": args.layers,
                   "max_len": args.max_len},
    }, indent=2))


if __name__ == "__main__":
    main()
