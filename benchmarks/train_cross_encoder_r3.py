"""Round-3 cross-encoder reranker training.

The rerank pipeline's stage 2 (search/reranker.py, reference
reranker.rs:170 CrossEncoderReRanker) shipped untrained in rounds 1-2 —
a random-init CrossEncoder scores noise, so the pipeline fell back to
the lexical-overlap scorer. This trains a real one on the round-3 pair
corpus (.bench/pairs_r3.jsonl.gz, built by train_encoder_r3.py — NO
pairs from /root/reference, the held-out eval repo):

  batch = Q queries x (1 positive + K negatives), LISTWISE softmax-CE
  over each candidate group (models/training.py cross_encoder_loss
  group_size=1+K — the first round-3 run used pointwise sigmoid BCE,
  whose "accuracy" an all-negative predictor passes at (G-1)/G; that
  checkpoint ranked no better than random). Negatives mix HARD (code
  sharing a name verb/noun with the query's positive — forces reading
  past topic words, the failure mode a reranker exists to fix) and
  random. Pairs are assembled at the TOKEN-ID level
  ([CLS] desc [SEP] code [SEP]) from pre-tokenized halves, so the
  per-step host cost is numpy concatenation, not BPE re-encoding.
  A held-out split (never trained on) is ranked at every eval point:
  each held query scores its positive among 15 random held codes, so
  the printed held_rank@1 is true ranking skill (chance 1/16).

Eval: cross-repo (reference Rust doc->code, crossrepo_eval.harvest) —
retrieve top-20 with the shipped bi-encoder ensemble, rerank with the
cross-encoder, report recall@1/@10 lift.

Usage (TPU): python benchmarks/train_cross_encoder_r3.py --steps 3000
Writes checkpoints/cross_encoder_r3.npz + .bench/train_cross_r3.json
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def assemble_pairs(tok, d_ids, c_ids, pairs_idx, L, Lq):
    """[CLS] desc[:Lq] [SEP] code[:rest] [SEP] -> (ids, mask) [n, L]."""
    n = len(pairs_idx)
    ids = np.full((n, L), tok.pad_id, np.int32)
    mask = np.zeros((n, L), np.bool_)
    for r, (qi, ci) in enumerate(pairs_idx):
        d = d_ids[qi][:Lq]
        c = c_ids[ci][: L - len(d) - 3]
        seq = [tok.cls_id, *d, tok.sep_id, *c, tok.sep_id]
        ids[r, : len(seq)] = seq
        mask[r, : len(seq)] = True
    return ids, mask


def mine_retriever_negatives(c_ids, d_ids, train_idx, k=8, batch=512):
    """Hard negatives = the serving retriever's own top-k confusions.

    The name-bucket negatives teach the model to read past shared topic
    words, but at serving time the reranker sees the BI-ENCODER's top
    candidates — so the strongest training negatives are exactly those:
    encode the train code/desc halves with the shipped dense encoder
    (the retrieval half of the serving ensemble), retrieve each desc's
    top-k codes with the repo's own ops.topk.streaming_topk, and train
    against the non-positive hits. Returns [n_train, k] int32 of LOCAL
    train positions (the positive may appear; callers filter it).

    Token ids are reused from the trainer's pre-tokenized halves
    (BPETokenizer.ids does ~8k texts/s; the provider's text path
    re-tokenizes and is ~100x slower for long code)."""
    import jax
    import jax.numpy as jnp

    from codegraph_tpu.models.encoder import encode_jit
    from codegraph_tpu.models.providers import (
        EncoderProvider,
        _default_checkpoint,
    )
    from codegraph_tpu.ops.topk import streaming_topk

    prov = EncoderProvider(checkpoint=_default_checkpoint())
    params, cfg = prov.params, prov.cfg
    pad_id = prov.tokenizer.pad_id
    L = cfg.max_len

    def embed_ids(rows):
        n = len(rows)
        out = np.zeros((n, cfg.hidden), np.float32)
        for a in range(0, n, batch):
            chunk = rows[a:a + batch]
            ids = np.full((batch, L), pad_id, np.int32)  # fixed shape:
            mask = np.zeros((batch, L), np.bool_)        # one compile
            for r, ts in enumerate(chunk):
                ts = ts[:L]
                ids[r, : len(ts)] = ts
                mask[r, : len(ts)] = True
            z = np.asarray(encode_jit(params, jnp.asarray(ids),
                                      jnp.asarray(mask), cfg))
            out[a:a + len(chunk)] = z[: len(chunk)]
        return out

    t0 = time.time()
    ec = embed_ids([c_ids[i] for i in train_idx])
    ed = embed_ids([d_ids[i] for i in train_idx])
    print(f"mined-embed {len(train_idx)}x2 in {time.time()-t0:.0f}s",
          flush=True)

    n = len(train_idx)
    tile_n = 2048
    n_pad = ((n + tile_n - 1) // tile_n) * tile_n
    x = np.zeros((n_pad, cfg.hidden), np.float32)
    x[:n] = ec
    xj = jnp.asarray(x)
    bias = jnp.zeros((n_pad,), jnp.float32)
    bias = bias.at[n:].set(-jnp.inf)  # padding rows never retrieved
    mined = np.zeros((n, k), np.int32)
    qb = 2048
    t0 = time.time()
    for a in range(0, n, qb):
        q = np.zeros((qb, cfg.hidden), np.float32)
        q[: min(qb, n - a)] = ed[a:a + qb]
        _, ids = streaming_topk(jnp.asarray(q), xj, bias, k, tile_n=tile_n)
        mined[a:a + qb] = np.asarray(ids)[: min(qb, n - a)]
    print(f"mined top-{k} for {n} descs in {time.time()-t0:.0f}s", flush=True)
    return mined


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--queries", type=int, default=48)   # per step
    ap.add_argument("--negs", type=int, default=7)       # per query
    ap.add_argument("--hidden", type=int, default=384)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--max-len", type=int, default=256)
    ap.add_argument("--q-len", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", default="checkpoints/cross_encoder_r3.npz")
    ap.add_argument("--bpe", default="checkpoints/bpe_code_16k.json")
    ap.add_argument("--pairs-cache", default=".bench/pairs_r3.jsonl.gz")
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--mine", action="store_true",
                    help="mine hard negatives from the shipped "
                         "bi-encoder's top-k retrievals")
    ap.add_argument("--mined-per-query", type=int, default=4)
    args = ap.parse_args()

    rng = random.Random(0)
    with gzip.open(args.pairs_cache, "rt") as f:
        rec = json.load(f)
    pairs = [tuple(p) for p in rec["python"] + rec["c_cpp"] + rec["synthetic"]]
    rng.shuffle(pairs)
    # held-out ranking split: never sampled into training batches; the
    # printed held_rank@1 (positive vs 15 random held codes, chance
    # 1/16) is the go/no-go signal before shipping the checkpoint
    n_held = 512
    held_idx = list(range(n_held))
    train_idx = list(range(n_held, len(pairs)))
    print(f"{len(pairs)} (code, desc) pairs "
          f"({len(train_idx)} train / {n_held} held)", flush=True)

    from codegraph_tpu.models.bpe import BPETokenizer

    tok = BPETokenizer.load(args.bpe, max_len=args.max_len)
    t0 = time.time()
    c_ids = [tok.ids(c)[: args.max_len] for c, _ in pairs]
    d_ids = [tok.ids(d)[: args.q_len] for _, d in pairs]
    print(f"tokenized halves in {time.time()-t0:.0f}s", flush=True)

    # hard-negative buckets on name tokens (same as the bi-encoder run)
    from train_encoder_r3 import name_tokens

    buckets = {}
    for i, (_, d) in enumerate(pairs):
        if i < n_held:  # held pairs never appear in training batches
            continue
        for t in name_tokens(d):
            buckets.setdefault(t, []).append(i)
    buckets = {k: v for k, v in buckets.items() if len(v) >= 4}
    pair_bucket = {}
    for k, members in buckets.items():
        for i in members:
            pair_bucket.setdefault(i, []).append(k)
    print(f"{len(buckets)} hard-negative buckets", flush=True)

    import jax
    import jax.numpy as jnp

    from codegraph_tpu.models.cross_encoder import (
        CrossEncoder,
        save_cross_encoder,
    )
    from codegraph_tpu.models.training import (
        TrainConfig,
        make_cross_encoder_train_step,
    )

    ce = CrossEncoder(hidden=args.hidden, n_layers=args.layers,
                      max_len=args.max_len, tokenizer=tok)
    # architecture must match the tokenizer's vocab
    from codegraph_tpu.models.encoder import EncoderConfig, init_encoder_params

    ce.cfg = EncoderConfig(
        vocab_size=tok.vocab_size, hidden=args.hidden,
        n_layers=args.layers,
        n_heads=next(h for h in (8, 4, 2, 1) if args.hidden % h == 0),
        max_len=args.max_len, pooling="cls", dtype=jnp.bfloat16,
        # remat is mandatory at this batch: without it the layer scan
        # saves every layer's f32 [B, H, L, L] attention logits for
        # backward (4 x 3 GB at B=384, L=256 -> 23.9G > 15.75G HBM OOM)
        remat=True,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    ce.params = init_encoder_params(k1, ce.cfg)
    ce.head = {"w": jax.random.normal(k2, (args.hidden,), jnp.float32)
               / jnp.sqrt(args.hidden),
               "b": jnp.zeros((), jnp.float32)}

    step_fn, optimizer = make_cross_encoder_train_step(
        ce.cfg, TrainConfig(learning_rate=args.lr),
        group_size=1 + args.negs)
    state = ((ce.params, ce.head), optimizer.init((ce.params, ce.head)))

    # ---- held-out ranking eval: fixed candidate groups, jitted scorer
    from codegraph_tpu.models.encoder import encode as encode_fn

    @jax.jit
    def score_chunk(params, head, ids, mask):
        cls = encode_fn(params, ids, mask, ce.cfg, normalize=False)
        return cls @ head["w"] + head["b"]

    G_EVAL = 16
    ev_rng = np.random.default_rng(7)
    ev_pidx = []
    for qi in held_idx:
        cands = [qi] + [int(c) for c in ev_rng.choice(held_idx, G_EVAL - 1)
                        if int(c) != qi][: G_EVAL - 1]
        while len(cands) < G_EVAL:
            c = int(ev_rng.choice(held_idx))
            if c != qi:
                cands.append(c)
        ev_pidx.extend((qi, ci) for ci in cands)
    ev_ids, ev_mask = assemble_pairs(tok, d_ids, c_ids, ev_pidx,
                                     args.max_len, args.q_len)

    def held_rank_at1(state):
        (params, head), _ = state
        out = []
        for a in range(0, len(ev_ids), 1024):
            out.append(np.asarray(score_chunk(
                params, head, jnp.asarray(ev_ids[a:a+1024]),
                jnp.asarray(ev_mask[a:a+1024]))))
        sc = np.concatenate(out).reshape(-1, G_EVAL)
        return round(float((sc.argmax(axis=1) == 0).mean()), 4)

    n_train = len(train_idx)
    train_arr = np.asarray(train_idx)
    mined = local_pos = None
    if args.mine:
        mined = mine_retriever_negatives(c_ids, d_ids, train_idx)
        local_pos = {g: l for l, g in enumerate(train_idx)}
    np_rng = np.random.default_rng(0)
    B = args.queries * (1 + args.negs)
    labels_np = np.zeros((args.queries, 1 + args.negs), np.float32)
    labels_np[:, 0] = 1.0
    labels_np = labels_np.reshape(-1)
    losses, evals = [], []
    t0 = time.time()
    for step in range(args.steps):
        qs = train_arr[np_rng.choice(n_train, args.queries, replace=False)]
        pidx = []
        for qi in qs:
            pidx.append((qi, qi))  # positive
            if mined is not None:
                # retriever-mined: the bi-encoder's own top hits for
                # this desc (minus the positive) — the candidates the
                # reranker must actually discriminate at serving time
                row = [int(train_arr[m]) for m in mined[local_pos[int(qi)]]
                       if int(train_arr[m]) != int(qi)]
                for ci in row[: args.mined_per_query]:
                    pidx.append((qi, ci))
            # hard negatives: same-bucket codes (not the positive itself)
            hard = []
            for bk in pair_bucket.get(int(qi), []):
                hard.extend(buckets[bk])
            hard = [h for h in hard if h != qi]
            n_hard = min(len(hard), args.negs // 2,
                         args.negs - (len(pidx) - 1) % (1 + args.negs))
            for h in np_rng.choice(len(hard), n_hard, replace=False) \
                    if n_hard else []:
                pidx.append((qi, hard[int(h)]))
            while len(pidx) % (1 + args.negs) != 0:
                ci = int(train_arr[np_rng.integers(n_train)])
                if ci != qi:
                    pidx.append((qi, ci))
        ids, mask = assemble_pairs(tok, d_ids, c_ids, pidx,
                                   args.max_len, args.q_len)
        state, metrics = step_fn(state, {
            "pair_ids": jnp.asarray(ids), "pair_mask": jnp.asarray(mask),
            "labels": jnp.asarray(labels_np),
        })
        if (step + 1) % 100 == 0:
            losses.append({"step": step + 1,
                           "loss": round(float(metrics["loss"]), 4),
                           "acc": round(float(metrics["accuracy"]), 4)})
            print(f"step {step+1}: loss {losses[-1]['loss']} "
                  f"acc {losses[-1]['acc']} "
                  f"({(time.time()-t0)/(step+1):.2f}s/step)", flush=True)
        if (step + 1) % args.eval_every == 0 or step + 1 == args.steps:
            hr1 = held_rank_at1(state)
            evals.append({"step": step + 1, "held_rank@1": hr1})
            print(f"  held_rank@1 {hr1} (chance {1.0/G_EVAL:.3f})",
                  flush=True)
            (ce.params, ce.head), _ = state
            save_cross_encoder(args.out, ce, tokenizer_file=args.bpe)
    train_s = time.time() - t0
    (ce.params, ce.head), _ = state
    save_cross_encoder(args.out, ce, tokenizer_file=args.bpe)
    print(f"trained {args.steps} steps in {train_s:.0f}s; wrote {args.out}",
          flush=True)

    os.makedirs(".bench", exist_ok=True)
    with open(".bench/train_cross_r3.json", "w") as f:
        json.dump({
            "steps": args.steps, "train_s": round(train_s, 1),
            "losses": losses, "held_rank_evals": evals,
            "objective": f"listwise softmax-CE, group={1 + args.negs}",
            "config": {"hidden": args.hidden, "layers": args.layers,
                       "max_len": args.max_len, "q_len": args.q_len,
                       "queries": args.queries, "negs": args.negs,
                       "batch_pairs": B, "vocab": tok.vocab_size,
                       "mined_negatives": bool(args.mine),
                       "mined_per_query":
                           args.mined_per_query if args.mine else 0},
            "out": args.out,
            "size_mb": round(os.path.getsize(args.out) / 1e6, 1),
        }, f, indent=1)
    print("wrote .bench/train_cross_r3.json", flush=True)


if __name__ == "__main__":
    main()
