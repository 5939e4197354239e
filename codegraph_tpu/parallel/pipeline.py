"""Pipeline-parallel encoder execution (GPipe-style over the layer scan).

The encoder's depth dimension is a stacked-leaf lax.scan
(models/encoder.py), which makes pipeline parallelism a sharding of the
LAYER axis: each "pp" stage holds n_layers/pp contiguous layers, the
batch splits into microbatches, and activations flow stage-to-stage over
ICI via ppermute in a classic GPipe schedule (n_micro + pp - 1 ticks,
bubble fraction (pp-1)/(n_micro+pp-1)).

SPMD realization: every device runs the same tick loop; validity masking
(jnp.where) replaces per-stage control flow, and out-of-window compute is
wasted-but-harmless (the bubble). Gradients flow through ppermute, so
jax.grad of a loss on the output trains all stages.

Composite pp x tp (`pp_tp_encode`): within each pipeline stage the layer
math runs Megatron-style over a second "tp" mesh axis — wq/wk/wv and
w_up column-sharded (each tp device owns n_heads/tp heads / F/tp MLP
columns), wo and w_down row-sharded with an explicit psum over tp after
each row-parallel matmul. The pp ring (ppermute) and the tp reductions
(psum) are orthogonal mesh axes, so K chips split as pp*tp: depth over
pp, per-layer width over tp.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

import warnings

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map

from codegraph_tpu.models.encoder import EncoderConfig, _attention, _layer_norm, _mlp


def pipeline_param_shardings(cfg: EncoderConfig) -> Dict[str, Any]:
    """Layer-stacked leaves shard their leading (depth) axis over "pp";
    embeddings/norms replicate (they run on every stage's activations
    cheaply; stage 0/last could own them exclusively later)."""
    from codegraph_tpu.models.encoder import encoder_param_shardings

    specs = encoder_param_shardings(cfg)

    def relayer(spec):
        return P("pp", *spec[1:])

    specs["layers"] = jax.tree.map(
        relayer, specs["layers"], is_leaf=lambda s: isinstance(s, P)
    )
    # drop tp axis names: this is the pure-pp layout (composite pp x tp
    # runs through pp_encode(tp_axis=...), which manages tp manually)
    def drop_tp(spec):
        return P(*[a if a == "pp" else None for a in spec])

    return jax.tree.map(drop_tp, specs, is_leaf=lambda s: isinstance(s, P))


def _attention_tp(x, wq, wk, wv, wo, attn_bias, cfg, tp_axis):
    """Megatron attention inside shard_map: wq/wk/wv column-sharded over
    tp (this shard computes n_heads/tp heads), wo row-sharded with an
    explicit psum. x: [B, L, H] replicated over tp."""
    B, L, H = x.shape
    hd = cfg.head_dim
    nh_l = wq.shape[1] // hd

    def proj(w):
        y = jnp.einsum("blh,hk->blk", x, w.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        return y.astype(x.dtype).reshape(B, L, nh_l, hd)

    q, k_, v = proj(wq), proj(wk), proj(wv)
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k_,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.float32(hd)) + attn_bias
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v,
                     preferred_element_type=jnp.float32)
    ctx = ctx.astype(x.dtype).reshape(B, L, nh_l * hd)
    out = jnp.einsum("blh,hk->blk", ctx, wo.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    return jax.lax.psum(out, tp_axis).astype(x.dtype)


def _mlp_tp(x, w_up, b_up, w_down, b_down, tp_axis):
    """Megatron MLP inside shard_map: w_up column-sharded (local gelu),
    w_down row-sharded + psum; b_down added once after the reduction."""
    h = jnp.einsum("blh,hf->blf", x, w_up.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h.astype(jnp.float32) + b_up).astype(x.dtype)
    out = jnp.einsum("blf,fh->blh", h, w_down.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    out = jax.lax.psum(out, tp_axis)
    return (out + b_down).astype(x.dtype)


def pp_encode(
    params: Dict[str, Any],
    token_ids: jax.Array,   # [B, L] with B % n_micro == 0
    mask: jax.Array,        # [B, L]
    cfg: EncoderConfig,
    mesh: Mesh,
    n_micro: int,
    pp_axis: str = "pp",
    tp_axis: str | None = None,
    normalize: bool = True,
) -> jax.Array:
    """Pipeline-parallel forward: [B, L] -> [B, H] pooled embeddings.

    cfg.n_layers must divide by the pp mesh size; B by n_micro. With
    tp_axis, each stage's layer math additionally runs Megatron-style
    tensor-parallel over that mesh axis (composite pp x tp).
    """
    pp = mesh.shape[pp_axis]
    assert cfg.n_layers % pp == 0, "n_layers must divide by pipeline stages"
    tp = mesh.shape[tp_axis] if tp_axis else 1
    if tp_axis:
        assert cfg.n_heads % tp == 0 and cfg.mlp_hidden % tp == 0
    B, L = token_ids.shape
    assert B % n_micro == 0
    Bm = B // n_micro
    dt = cfg.dtype

    # embed on host-side of the pipeline (replicated; cheap)
    x = jnp.take(params["tok_emb"], token_ids, axis=0)
    x = (x + params["pos_emb"][:L][None, :, :]).astype(dt)
    x = _layer_norm(x, params["ln_in_scale"], params["ln_in_bias"], cfg.eps)
    attn_bias_all = jnp.where(
        mask[:, None, None, :], 0.0, -1e30
    ).astype(jnp.float32)

    micro_x = x.reshape(n_micro, Bm, L, cfg.hidden)
    micro_ab = attn_bias_all.reshape(n_micro, Bm, 1, 1, L)

    # composite layout: split the fused wqkv into per-projection weights
    # so contiguous tp column shards land on whole heads ((nh, hd) column
    # order), and give every leaf an explicit (pp, tp) spec
    layers = params["layers"]
    if tp_axis:
        nh, hd, H = cfg.n_heads, cfg.head_dim, cfg.hidden
        w3 = layers["wqkv"].reshape(cfg.n_layers, H, 3, nh * hd)
        layers = {k: v for k, v in layers.items() if k != "wqkv"}
        layers["wq"] = w3[:, :, 0]
        layers["wk"] = w3[:, :, 1]
        layers["wv"] = w3[:, :, 2]
        layer_specs = {
            "ln1_scale": P(pp_axis, None), "ln1_bias": P(pp_axis, None),
            "wq": P(pp_axis, None, tp_axis), "wk": P(pp_axis, None, tp_axis),
            "wv": P(pp_axis, None, tp_axis), "wo": P(pp_axis, tp_axis, None),
            "ln2_scale": P(pp_axis, None), "ln2_bias": P(pp_axis, None),
            "w_up": P(pp_axis, None, tp_axis), "b_up": P(pp_axis, tp_axis),
            "w_down": P(pp_axis, tp_axis, None), "b_down": P(pp_axis, None),
        }
    else:
        layer_specs = P(pp_axis)  # prefix: shard every depth axis over pp

    def _stage(local_layers, h, ab):
        """Apply this device's layer slice to one microbatch."""

        def layer(h, lp):
            z = _layer_norm(h, lp["ln1_scale"], lp["ln1_bias"], cfg.eps)
            if tp_axis:
                h = h + _attention_tp(z, lp["wq"], lp["wk"], lp["wv"],
                                      lp["wo"], ab, cfg, tp_axis)
            else:
                h = h + _attention(z, lp["wqkv"], lp["wo"], ab, cfg)
            z = _layer_norm(h, lp["ln2_scale"], lp["ln2_bias"], cfg.eps)
            if tp_axis:
                h = h + _mlp_tp(z, lp["w_up"], lp["b_up"], lp["w_down"],
                                lp["b_down"], tp_axis)
            else:
                h = h + _mlp(z, lp["w_up"], lp["b_up"],
                             lp["w_down"], lp["b_down"])
            return h, None

        h, _ = jax.lax.scan(layer, h, local_layers)
        return h

    def _pipeline(local_layers, micro_x, micro_ab):
        stage = jax.lax.axis_index(pp_axis)
        ticks = n_micro + pp - 1
        buf = jnp.zeros((Bm, L, cfg.hidden), dt)      # activation in flight
        out = jnp.zeros((n_micro, Bm, L, cfg.hidden), dt)

        def tick(t, state):
            buf, out = state
            # the microbatch this stage processes at tick t (clamped junk
            # during bubble ticks; masked out below)
            mb = jnp.clip(t - stage, 0, n_micro - 1)
            # stage 0 ingests its microbatch; others use the received buffer
            h_in = jnp.where(stage == 0, micro_x[mb], buf)
            h_out = _stage(local_layers, h_in, micro_ab[mb])
            # last stage banks finished microbatches (valid window only)
            valid = (t - stage >= 0) & (t - stage < n_micro)
            is_last = stage == pp - 1
            out = jnp.where(
                valid & is_last,
                jax.lax.dynamic_update_index_in_dim(out, h_out, mb, 0),
                out,
            )
            # ship activations to the next stage (ring; last->0 discarded)
            buf = jax.lax.ppermute(
                h_out, pp_axis,
                [(d, (d + 1) % pp) for d in range(pp)],
            )
            return buf, out

        _, out = jax.lax.fori_loop(0, ticks, tick, (buf, out))
        # broadcast finished activations from the last stage to all
        contrib = jnp.where(stage == pp - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(contrib, pp_axis)

    out = shard_map(
        _pipeline, mesh=mesh,
        in_specs=(layer_specs, P(None), P(None)),
        out_specs=P(None),
        check_rep=False,
    )(layers, micro_x, micro_ab)

    x = out.reshape(B, L, cfg.hidden)
    x = _layer_norm(x, params["ln_out_scale"], params["ln_out_bias"], cfg.eps)
    xf = x.astype(jnp.float32)
    mf = mask.astype(jnp.float32)[:, :, None]
    pooled = jnp.sum(xf * mf, axis=1) / jnp.maximum(jnp.sum(mf, axis=1), 1.0)
    if normalize:
        sq = jnp.sum(jnp.square(pooled), axis=-1, keepdims=True)
        pooled = pooled * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))
    return pooled


__all__ = ["pp_encode", "pipeline_param_shardings"]
