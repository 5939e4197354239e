"""Ring attention: true sequence parallelism for long contexts.

The encoder's baseline sequence-parallel mode (models/encoder.py sp_axis)
is Megatron-style: per-token work runs L-sharded, but attention itself
all-gathers the full sequence, so peak activation memory is still O(L)
per device. Ring attention removes that ceiling: Q stays resident on its
sequence shard while K/V blocks rotate around the "sp" ring via
`jax.lax.ppermute`, and a streaming (online-softmax) accumulator merges
each visiting block — the same running (max, denom, output) recurrence
as flash attention, applied across devices. Peak memory per device is
O(L/sp); the K/V transfers ride ICI and overlap with the block matmuls.

This is the TPU-native replacement for scaling context length — where
the reference is capped by single-process memory for its embedding
batches (crates/codegraph-vector/src/local_provider.rs:27-661 pins full
sequences on one device), this shards the sequence itself.

Numerics: logits and the (m, l, o) accumulators are f32; masked keys
carry a -1e30 bias. Blocks seen before any valid key are wiped by the
correction factor exp(m_old - m_new) = 0 once a real key raises m, so
the streaming merge is exact (matches dense softmax to f32 rounding).

Gradients flow through `lax.scan` + `ppermute`, so `sp_ring_encode` is
trainable end-to-end (see tests/test_ring_attention.py).
"""

from __future__ import annotations

import warnings
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map

from codegraph_tpu.models.encoder import (
    EncoderConfig,
    _layer_norm,
    _mlp,
)

_NEG = -1e30


def ring_attention(
    q: jax.Array,        # [B, Ll, nh, hd] — this shard's queries
    k: jax.Array,        # [B, Ll, nh, hd] — this shard's keys
    v: jax.Array,        # [B, Ll, nh, hd] — this shard's values
    kv_mask: jax.Array,  # [B, Ll] bool — valid keys on this shard
    axis_name: str,
    n_shards: int,
) -> jax.Array:
    """Bidirectional ring attention over a sequence-sharded batch.

    Must run inside shard_map with the sequence axis sharded over
    `axis_name` (size `n_shards`). Returns [B, Ll, nh, hd] f32 — the
    exact softmax(QK^T)V for the local queries against the GLOBAL
    sequence, computed in n_shards ring steps.
    """
    B, Ll, nh, hd = q.shape
    qf = q.astype(jnp.float32) / jnp.sqrt(jnp.float32(hd))
    m = jnp.full((B, nh, Ll), _NEG, jnp.float32)        # running max
    l = jnp.zeros((B, nh, Ll), jnp.float32)             # running denom
    o = jnp.zeros((B, Ll, nh, hd), jnp.float32)         # running output
    perm = [(d, (d + 1) % n_shards) for d in range(n_shards)]

    def step(carry, _):
        k, v, kv_mask, m, l, o = carry
        logits = jnp.einsum("bqnd,bknd->bnqk", qf, k.astype(jnp.float32))
        logits = logits + jnp.where(kv_mask[:, None, None, :], 0.0, _NEG)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        p = jnp.exp(logits - m_new[..., None])          # [B, nh, Lq, Lk]
        corr = jnp.exp(m - m_new)                       # [B, nh, Lq]
        l = l * corr + jnp.sum(p, axis=-1)
        o = o * corr.transpose(0, 2, 1)[..., None] + jnp.einsum(
            "bnqk,bknd->bqnd", p, v.astype(jnp.float32)
        )
        # rotate the K/V block (and its mask) to the next stage
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        kv_mask = jax.lax.ppermute(kv_mask, axis_name, perm)
        return (k, v, kv_mask, m_new, l, o), None

    (_, _, _, _, l, o), _ = jax.lax.scan(
        step, (k, v, kv_mask, m, l, o), None, length=n_shards
    )
    return o / jnp.maximum(l.transpose(0, 2, 1)[..., None], 1e-30)


def sp_ring_encode(
    params: Dict[str, Any],
    token_ids: jax.Array,   # [B, L] with L % sp == 0
    mask: jax.Array,        # [B, L] bool
    cfg: EncoderConfig,
    mesh: Mesh,
    sp_axis: str = "sp",
    dp_axis: Optional[str] = None,
    normalize: bool = True,
) -> jax.Array:
    """Encoder forward with ring attention: activations stay sequence-
    sharded through EVERY op (embeds, norms, attention, MLP, pooling) —
    O(L/sp) activation memory per device. Matches models/encoder.py
    `encode` output to f32 rounding.
    """
    sp = mesh.shape[sp_axis]
    B, L = token_ids.shape
    assert L % sp == 0, f"L={L} must divide by sp={sp}"
    dt = cfg.dtype
    nh, hd, H = cfg.n_heads, cfg.head_dim, cfg.hidden

    def fwd(params, ids_l, mask_l):
        sidx = jax.lax.axis_index(sp_axis)
        Bl, Ll = ids_l.shape
        pos = sidx * Ll + jnp.arange(Ll)
        x = jnp.take(params["tok_emb"], ids_l, axis=0)
        x = (x + jnp.take(params["pos_emb"], pos, axis=0)[None]).astype(dt)
        x = _layer_norm(x, params["ln_in_scale"], params["ln_in_bias"], cfg.eps)

        def layer(x, lp):
            h = _layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], cfg.eps)
            qkv = jnp.einsum("blh,hk->blk", h, lp["wqkv"].astype(h.dtype),
                             preferred_element_type=jnp.float32)
            qkv = qkv.astype(dt).reshape(Bl, Ll, 3, nh, hd)
            ctx = ring_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
                                 mask_l, sp_axis, sp)
            ctx = ctx.astype(dt).reshape(Bl, Ll, H)
            attn = jnp.einsum("blh,hk->blk", ctx, lp["wo"].astype(dt),
                              preferred_element_type=jnp.float32).astype(dt)
            x = x + attn
            h = _layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], cfg.eps)
            x = x + _mlp(h, lp["w_up"], lp["b_up"], lp["w_down"], lp["b_down"])
            return x, None

        if cfg.remat:
            layer = jax.checkpoint(layer)
        x, _ = jax.lax.scan(layer, x, params["layers"])
        x = _layer_norm(x, params["ln_out_scale"], params["ln_out_bias"],
                        cfg.eps)

        # masked-mean pool: local partial sums, one psum over the ring
        xf = x.astype(jnp.float32)
        mf = mask_l.astype(jnp.float32)[:, :, None]
        num = jax.lax.psum(jnp.sum(xf * mf, axis=1), sp_axis)
        den = jax.lax.psum(jnp.sum(mf, axis=1), sp_axis)
        pooled = num / jnp.maximum(den, 1.0)
        if normalize:
            sq = jnp.sum(jnp.square(pooled), axis=-1, keepdims=True)
            pooled = pooled * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))
        return pooled

    if cfg.n_experts > 0:
        raise NotImplementedError("ring-sp MoE: compose sp with ep instead")
    if cfg.pooling != "mean":
        raise NotImplementedError("ring-sp pooling: mean only")

    return shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(dp_axis, sp_axis), P(dp_axis, sp_axis)),
        out_specs=P(dp_axis, None),
        check_rep=False,
    )(params, token_ids, mask)


__all__ = ["ring_attention", "sp_ring_encode"]
