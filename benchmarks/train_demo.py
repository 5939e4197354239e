"""Encoder fine-tune demo: contrastive training lifts retrieval quality.

End-to-end validation of the training story (models/training.py):
synthesizes (code, description) pairs, fine-tunes the randomly
initialized byte-level encoder with InfoNCE on a dp x tp mesh, and
measures description -> code retrieval recall@1/@5 before vs after.

Usage: python benchmarks/train_demo.py [--steps 60] [--pairs 256]
(CPU-runnable; uses the virtual device mesh.)
"""

from __future__ import annotations

import argparse
import json
import random
import time


VERBS = ["parse", "render", "compute", "validate", "serialize", "fetch",
         "cache", "merge", "encode", "route", "schedule", "compress",
         "filter", "sort", "hash", "index"]
NOUNS = ["config", "request", "invoice", "token", "graph", "payload",
         "session", "metric", "snapshot", "index", "template", "batch",
         "record", "packet", "schema", "bucket"]


def make_pairs(n, rng):
    pairs = []
    seen = set()
    while len(pairs) < n:
        v, o = rng.choice(VERBS), rng.choice(NOUNS)
        if (v, o) in seen:
            continue
        seen.add((v, o))
        code = (f"def {v}_{o}(data):\n"
                f"    result = backend.{v}(data.{o})\n"
                f"    return result")
        desc = f"{v}s the {o} using the backend"
        pairs.append((code, desc))
        if len(seen) == len(VERBS) * len(NOUNS):
            break
    return pairs


def recall(params, cfg, tok, codes, descs, ks=(1, 5)):
    import jax.numpy as jnp
    import numpy as np

    from codegraph_tpu.models.encoder import encode_jit

    c_ids, c_mask = tok.encode_batch(codes)
    d_ids, d_mask = tok.encode_batch(descs)
    zc = np.asarray(encode_jit(params, jnp.asarray(c_ids), jnp.asarray(c_mask), cfg))
    zd = np.asarray(encode_jit(params, jnp.asarray(d_ids), jnp.asarray(d_mask), cfg))
    sims = zd @ zc.T
    order = np.argsort(-sims, axis=1)
    out = {}
    for k in ks:
        hits = sum(1 for i in range(len(descs)) if i in order[i, :k])
        out[f"recall@{k}"] = round(hits / len(descs), 3)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=60)
    parser.add_argument("--pairs", type=int, default=128)
    parser.add_argument("--batch", type=int, default=32)
    args = parser.parse_args()

    import jax

    from codegraph_tpu.models.encoder import EncoderConfig
    from codegraph_tpu.models.tokenizer import VOCAB_SIZE, ByteTokenizer
    from codegraph_tpu.models.training import TrainConfig, make_sharded_train_step
    from codegraph_tpu.parallel.mesh import default_mesh_shape, make_mesh

    rng = random.Random(0)
    pairs = make_pairs(args.pairs, rng)
    codes = [c for c, _ in pairs]
    descs = [d for _, d in pairs]
    tok = ByteTokenizer(max_len=64)

    import jax.numpy as jnp

    cfg = EncoderConfig(vocab_size=VOCAB_SIZE, hidden=128, n_layers=2,
                        n_heads=4, max_len=64, dtype=jnp.float32)
    n_dev = len(jax.devices())
    dp, tp = default_mesh_shape(min(n_dev, 8), n_axes=2)
    mesh = make_mesh((dp, tp), ("dp", "tp"))
    tcfg = TrainConfig(learning_rate=1e-3, temperature=0.07)
    step_fn, init_fn = make_sharded_train_step(mesh, cfg, tcfg)
    params, opt_state = init_fn(jax.random.PRNGKey(0))

    before = recall(params, cfg, tok, codes, descs)

    t0 = time.perf_counter()
    losses = []
    for step in range(args.steps):
        batch_idx = rng.sample(range(len(pairs)), min(args.batch, len(pairs)))
        a_ids, a_mask = tok.encode_batch([codes[i] for i in batch_idx])
        p_ids, p_mask = tok.encode_batch([descs[i] for i in batch_idx])
        params, opt_state, metrics = step_fn(params, opt_state, {
            "anchor_ids": a_ids, "anchor_mask": a_mask,
            "positive_ids": p_ids, "positive_mask": p_mask,
        })
        losses.append(float(metrics["loss"]))
    train_s = time.perf_counter() - t0

    after = recall(params, cfg, tok, codes, descs)
    print(json.dumps({
        "pairs": len(pairs), "steps": args.steps,
        "mesh": f"dp{dp}xtp{tp}",
        "loss_first": round(losses[0], 4), "loss_last": round(losses[-1], 4),
        "train_s": round(train_s, 1),
        "before": before, "after": after,
    }, indent=2))


if __name__ == "__main__":
    main()
