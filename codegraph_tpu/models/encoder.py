"""TPU-native transformer text encoder (the framework's flagship model).

Replaces the reference's in-process embedding inference
(crates/codegraph-vector/src/local_provider.rs:27-661 — BERT via Candle,
default all-MiniLM-L6-v2 / 384-d, pooling Cls/Mean/Max at :43-50; and
src/onnx_provider.rs:32-421) with a from-scratch JAX encoder built for the
MXU:

* bf16 activations/weights with f32 accumulation (`preferred_element_type`)
  — matmuls tile straight onto the 128x128 systolic array;
* layer stack runs as one `lax.scan` over stacked per-layer params: one
  compiled layer body regardless of depth, and the natural seam for
  pipeline sharding later;
* static [B, L] shapes; padding handled by an attention mask + masked
  mean pooling;
* tensor-parallel sharding rules (`encoder_param_shardings`): attention
  heads and MLP hidden split over the "tp" mesh axis; XLA inserts the
  all-reduces at wo / w_down (Megatron-style column->row split), which
  ride ICI.

Default config mirrors MiniLM-L6: 6 layers, 384 hidden, 12 heads.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 512        # byte tokenizer: 256 bytes + specials, padded
    hidden: int = 384
    n_layers: int = 6
    n_heads: int = 12
    mlp_ratio: int = 4
    max_len: int = 512
    pooling: str = "mean"        # mean | cls | max (local_provider.rs:43-50)
    n_experts: int = 0           # >0 switches the MLP to a mixture of experts
    moe_top_k: int = 0           # 0: dense dispatch (every expert, every
                                 # token — the sharding-correctness oracle);
                                 # >0: GShard-style top-k routed dispatch
                                 # with capacity-bounded expert buffers
    moe_capacity: float = 2.0    # routed only: expert buffer slots per
                                 # group = ceil(moe_capacity * k * L / E)
    remat: bool = False          # rematerialize layer activations (training
                                 # memory = O(1) layers instead of O(depth))
    norm_style: str = "pre"      # pre (native) | post (BERT-family imports)
    attn_bias: bool = False      # qkv/output projection biases (BERT has them)
    act: str = "gelu_tanh"       # gelu_tanh (native) | gelu_exact (BERT erf)
    dtype: Any = jnp.bfloat16
    eps: float = 1e-6

    def __post_init__(self):
        if self.hidden % self.n_heads != 0:
            raise ValueError(
                f"hidden={self.hidden} not divisible by n_heads={self.n_heads}"
            )

    @property
    def head_dim(self) -> int:
        return self.hidden // self.n_heads

    @property
    def mlp_hidden(self) -> int:
        return self.hidden * self.mlp_ratio


def init_encoder_params(key: jax.Array, cfg: EncoderConfig) -> Params:
    """Initialize parameters as a pytree of stacked per-layer leaves.

    Every layer leaf has leading dim n_layers so the forward pass can
    `lax.scan` over depth.
    """
    H, F, L = cfg.hidden, cfg.mlp_hidden, cfg.n_layers
    k = iter(jax.random.split(key, 16))

    def dense(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) / jnp.sqrt(fan_in)).astype(
            jnp.float32
        )

    layers: Dict[str, Any] = {
        "ln1_scale": jnp.ones((L, H), jnp.float32),
        "ln1_bias": jnp.zeros((L, H), jnp.float32),
        "wqkv": dense(next(k), (L, H, 3 * H), H),
        "wo": dense(next(k), (L, H, H), H),
        "ln2_scale": jnp.ones((L, H), jnp.float32),
        "ln2_bias": jnp.zeros((L, H), jnp.float32),
    }
    if cfg.attn_bias:
        layers["b_qkv"] = jnp.zeros((L, 3 * H), jnp.float32)
        layers["b_o"] = jnp.zeros((L, H), jnp.float32)
    if cfg.n_experts > 0:
        E = cfg.n_experts
        layers.update({
            "gate": dense(next(k), (L, H, E), H),
            "w_up_e": dense(next(k), (L, E, H, F), H),
            "b_up_e": jnp.zeros((L, E, F), jnp.float32),
            "w_down_e": dense(next(k), (L, E, F, H), F),
            "b_down_e": jnp.zeros((L, E, H), jnp.float32),
        })
    else:
        layers.update({
            "w_up": dense(next(k), (L, H, F), H),
            "b_up": jnp.zeros((L, F), jnp.float32),
            "w_down": dense(next(k), (L, F, H), F),
            "b_down": jnp.zeros((L, H), jnp.float32),
        })
    return {
        "tok_emb": dense(next(k), (cfg.vocab_size, H), H),
        "pos_emb": dense(next(k), (cfg.max_len, H), H),
        "ln_in_scale": jnp.ones((H,), jnp.float32),
        "ln_in_bias": jnp.zeros((H,), jnp.float32),
        "layers": layers,
        "ln_out_scale": jnp.ones((H,), jnp.float32),
        "ln_out_bias": jnp.zeros((H,), jnp.float32),
    }


def encoder_param_shardings(cfg: EncoderConfig) -> Params:
    """PartitionSpecs for tensor (+ optional expert) parallelism.

    tp: column-parallel wqkv/w_up (split output features = heads),
    row-parallel wo/w_down (split input features); XLA places the psum
    after wo/w_down. ep (MoE configs): the expert dimension of the
    per-expert MLP weights shards over "ep". With dense dispatch
    (moe_top_k=0) each device computes its expert slice for all tokens
    and XLA reduces the gate-weighted sum over ep; with the routed path
    (moe_top_k>0) the same specs co-shard experts with the ep-constrained
    dispatch buffers of _moe_mlp_routed, and XLA lowers the buffer
    movement to all-to-alls. Embeddings/norms replicated.
    """
    layers: Dict[str, Any] = {
        "ln1_scale": P(None, None),
        "ln1_bias": P(None, None),
        "wqkv": P(None, None, "tp"),
        "wo": P(None, "tp", None),
        "ln2_scale": P(None, None),
        "ln2_bias": P(None, None),
    }
    if cfg.attn_bias:
        layers["b_qkv"] = P(None, "tp")
        layers["b_o"] = P(None, None)
    if cfg.n_experts > 0:
        layers.update({
            "gate": P(None, None, None),
            "w_up_e": P(None, "ep", None, "tp"),
            "b_up_e": P(None, "ep", "tp"),
            "w_down_e": P(None, "ep", "tp", None),
            "b_down_e": P(None, "ep", None),
        })
    else:
        layers.update({
            "w_up": P(None, None, "tp"),
            "b_up": P(None, "tp"),
            "w_down": P(None, "tp", None),
            "b_down": P(None, None),
        })
    return {
        "tok_emb": P(None, None),
        "pos_emb": P(None, None),
        "ln_in_scale": P(None),
        "ln_in_bias": P(None),
        "layers": layers,
        "ln_out_scale": P(None),
        "ln_out_bias": P(None),
    }


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _attention(
    x: jax.Array, wqkv: jax.Array, wo: jax.Array, attn_bias: jax.Array,
    cfg: EncoderConfig, b_qkv=None, b_o=None
) -> jax.Array:
    """Bidirectional multi-head attention. x: [B, L, H]."""
    B, L, H = x.shape
    nh, hd = cfg.n_heads, cfg.head_dim
    qkv = jnp.einsum("blh,hk->blk", x, wqkv.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    if b_qkv is not None:
        qkv = qkv + b_qkv
    qkv = qkv.astype(x.dtype).reshape(B, L, 3, nh, hd)
    q, k_, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, L, nh, hd]
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k_,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.float32(hd)) + attn_bias  # [B, nh, L, L]
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v,
                     preferred_element_type=jnp.float32)
    ctx = ctx.astype(x.dtype).reshape(B, L, H)
    out = jnp.einsum("blh,hk->blk", ctx, wo.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    if b_o is not None:
        out = out + b_o
    return out.astype(x.dtype)


def _mlp(x: jax.Array, w_up, b_up, w_down, b_down, approx: bool = True) -> jax.Array:
    h = jnp.einsum("blh,hf->blf", x, w_up.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h.astype(jnp.float32) + b_up,
                    approximate=approx).astype(x.dtype)
    out = jnp.einsum("blf,fh->blh", h, w_down.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    return (out + b_down).astype(x.dtype)


def _moe_mlp(x: jax.Array, gate, w_up_e, b_up_e, w_down_e, b_down_e) -> jax.Array:
    """Dense-dispatch mixture of experts: every expert computes every
    token and the gate-weighted sum reduces over the expert axis — on an
    "ep"-sharded mesh, each device holds an expert slice and XLA inserts
    the psum over ep (expert parallelism without an all-to-all)."""
    probs = jax.nn.softmax(
        jnp.einsum("blh,he->ble", x.astype(jnp.float32), gate), axis=-1
    ).astype(x.dtype)  # [B, L, E]
    h = jnp.einsum("blh,ehf->belf", x, w_up_e.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h + b_up_e[None, :, None, :]).astype(x.dtype)
    y = jnp.einsum("belf,efh->belh", h, w_down_e.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    y = y + b_down_e[None, :, None, :]
    out = jnp.einsum("ble,belh->blh", probs.astype(jnp.float32), y)
    return out.astype(x.dtype)


def _moe_mlp_routed(
    x: jax.Array, gate, w_up_e, b_up_e, w_down_e, b_down_e,
    top_k: int, capacity_factor: float, cstr=None, ep_spec=None,
) -> jax.Array:
    """GShard-style top-k routed MoE for the GSPMD (jit + sharding
    constraint) encoder path.

    Group = batch row: each sequence routes its L tokens independently
    into per-expert buffers of C = ceil(capacity_factor * k * L / E)
    slots; tokens past capacity drop their expert contribution (Switch
    semantics). Dispatch and combine are one-hot einsums, so when the
    expert buffers are constrained to shard over "ep" while tokens shard
    over dp/sp, XLA lowers the [E, B*C, H] buffer movement to
    all-to-alls over ICI — the GSPMD formulation of expert parallelism,
    usable inside the encoder's lax.scan (shard_map is not; the
    standalone shard_map EP layer lives in parallel/moe.py and is the
    exact-match oracle in tests/test_moe.py at capacity -> inf)."""
    import math

    B, L, H = x.shape
    E = gate.shape[-1]
    xf = x.astype(jnp.float32)
    scores = jnp.einsum("blh,he->ble", xf, gate)
    top_s, top_e = jax.lax.top_k(scores, top_k)            # [B, L, k]
    w = jax.nn.softmax(top_s, axis=-1)
    C = max(1, math.ceil(capacity_factor * top_k * L / E))
    # slot within each expert's buffer: arrival order over (L, k) per row
    oe = jax.nn.one_hot(top_e, E, dtype=jnp.int32)         # [B, L, k, E]
    oe_flat = oe.reshape(B, L * top_k, E)
    pos_all = jnp.cumsum(oe_flat, axis=1) - 1              # [B, L*k, E]
    pos = jnp.sum(pos_all * oe_flat, axis=-1).reshape(B, L, top_k)
    keep = pos < C
    oc = jax.nn.one_hot(jnp.where(keep, pos, 0), C, dtype=jnp.float32)
    wk = jnp.where(keep, w, 0.0)                           # [B, L, k]
    combine = jnp.einsum("blke,blkc,blk->blec",
                         oe.astype(jnp.float32), oc, wk)   # [B, L, E, C]
    # dropped slots have weight exactly 0 (softmax outputs never are), so
    # the boolean of combine doubles as the dispatch mask
    dispatch = (combine > 0).astype(jnp.float32)
    buf = jnp.einsum("blec,blh->bech", dispatch, xf)
    buf = buf.transpose(1, 0, 2, 3).reshape(E, B * C, H).astype(x.dtype)
    if cstr is not None and ep_spec is not None:
        buf = cstr(buf, ep_spec)
    h = jnp.einsum("ech,ehf->ecf", buf, w_up_e.astype(buf.dtype),
                   preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h + b_up_e[:, None, :]).astype(buf.dtype)
    y = jnp.einsum("ecf,efh->ech", h, w_down_e.astype(buf.dtype),
                   preferred_element_type=jnp.float32)
    y = y + b_down_e[:, None, :]
    if cstr is not None and ep_spec is not None:
        y = cstr(y, ep_spec)
    y = y.reshape(E, B, C, H).transpose(1, 0, 2, 3)        # [B, E, C, H]
    out = jnp.einsum("blec,bech->blh", combine, y)
    return out.astype(x.dtype)


def encode(
    params: Params,
    token_ids: jax.Array,
    mask: jax.Array,
    cfg: EncoderConfig,
    normalize: bool = True,
    mesh=None,
    dp_axis: Optional[str] = None,
    sp_axis: Optional[str] = None,
    ep_axis: Optional[str] = None,
) -> jax.Array:
    """Forward pass: [B, L] int32 tokens + [B, L] bool mask -> [B, H] f32.

    Pooled per cfg.pooling (masked mean by default, as the reference's
    default Mean pooling, local_provider.rs:43-50), then L2-normalized.

    sp_axis enables Megatron-style sequence parallelism: per-token work
    (norms, MLP/MoE) runs with activations sharded over L on `sp_axis`;
    sharding constraints around attention make XLA insert the
    all-gather (full L for QK^T) and the re-scatter afterwards — both
    ride ICI.
    """
    B, L = token_ids.shape
    dt = cfg.dtype

    def cstr(v, spec):
        if mesh is None:
            return v
        from jax.sharding import NamedSharding

        return jax.lax.with_sharding_constraint(v, NamedSharding(mesh, spec))

    seq_spec = P(dp_axis, sp_axis, None)   # token-parallel regions
    full_spec = P(dp_axis, None, None)     # attention needs full L

    x = jnp.take(params["tok_emb"], token_ids, axis=0)
    x = (x + params["pos_emb"][:L][None, :, :]).astype(dt)
    x = cstr(x, seq_spec)
    x = _layer_norm(x, params["ln_in_scale"], params["ln_in_bias"], cfg.eps)

    attn_bias = jnp.where(mask[:, None, None, :], 0.0, -1e30).astype(jnp.float32)
    moe = cfg.n_experts > 0
    ep_spec = P(ep_axis, None, None) if ep_axis else None

    def _moe(h, lp):
        if cfg.moe_top_k > 0:
            return _moe_mlp_routed(
                h, lp["gate"], lp["w_up_e"], lp["b_up_e"],
                lp["w_down_e"], lp["b_down_e"],
                cfg.moe_top_k, cfg.moe_capacity,
                cstr=cstr if mesh is not None else None, ep_spec=ep_spec,
            )
        return _moe_mlp(h, lp["gate"], lp["w_up_e"], lp["b_up_e"],
                        lp["w_down_e"], lp["b_down_e"])

    approx = cfg.act != "gelu_exact"

    def layer(x, lp):
        b_qkv = lp.get("b_qkv")
        b_o = lp.get("b_o")
        if cfg.norm_style == "post":
            # BERT-family residual order: LN AFTER each residual add
            h = cstr(x, full_spec)
            x = x + _attention(h, lp["wqkv"], lp["wo"], attn_bias, cfg,
                               b_qkv=b_qkv, b_o=b_o)
            x = cstr(_layer_norm(x, lp["ln1_scale"], lp["ln1_bias"],
                                 cfg.eps), seq_spec)
            if moe:
                y = _moe(x, lp)
            else:
                y = _mlp(x, lp["w_up"], lp["b_up"], lp["w_down"],
                         lp["b_down"], approx=approx)
            x = _layer_norm(x + y, lp["ln2_scale"], lp["ln2_bias"], cfg.eps)
            return cstr(x, seq_spec), None
        h = _layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], cfg.eps)
        h = cstr(h, full_spec)  # gather sequence for attention
        x = cstr(x + _attention(h, lp["wqkv"], lp["wo"], attn_bias, cfg,
                                b_qkv=b_qkv, b_o=b_o),
                 seq_spec)      # scatter back to sequence-parallel
        h = _layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], cfg.eps)
        if moe:
            x = x + _moe(h, lp)
        else:
            x = x + _mlp(h, lp["w_up"], lp["b_up"], lp["w_down"],
                         lp["b_down"], approx=approx)
        return cstr(x, seq_spec), None

    if cfg.remat:
        # recompute layer activations in the backward pass: with the
        # lax.scan depth stack this bounds live activations to one layer
        layer = jax.checkpoint(layer)
    x, _ = jax.lax.scan(layer, x, params["layers"])
    if cfg.norm_style != "post":
        # final norm belongs to the pre-LN architecture only. BERT-family
        # (post) models end with each layer's own LayerNorm and have NO
        # final encoder norm — and a LayerNorm with identity affine still
        # STANDARDIZES, so applying it here deviated 11% from
        # transformers.BertModel on trained (non-identity-LN) weights.
        x = _layer_norm(x, params["ln_out_scale"], params["ln_out_bias"],
                        cfg.eps)

    xf = x.astype(jnp.float32)
    mf = mask.astype(jnp.float32)[:, :, None]
    if cfg.pooling == "cls":
        pooled = xf[:, 0, :]
    elif cfg.pooling == "max":
        pooled = jnp.max(jnp.where(mf > 0, xf, -1e30), axis=1)
    else:  # mean
        pooled = jnp.sum(xf * mf, axis=1) / jnp.maximum(jnp.sum(mf, axis=1), 1.0)
    if normalize:
        sq = jnp.sum(jnp.square(pooled), axis=-1, keepdims=True)
        pooled = pooled * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))
    return pooled


@partial(jax.jit, static_argnames=("cfg", "normalize"))
def encode_jit(params, token_ids, mask, cfg: EncoderConfig, normalize: bool = True):
    return encode(params, token_ids, mask, cfg, normalize)


__all__ = [
    "EncoderConfig",
    "init_encoder_params",
    "encoder_param_shardings",
    "encode",
    "encode_jit",
]
