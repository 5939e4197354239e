"""Encoder fine-tuning: contrastive (InfoNCE) training, mesh-sharded.

Capability parity with the reference's embedding fine-tune scaffolding
(crates/codegraph-vector/src/ml/training.rs, 953 LoC of host-side training
loop skeleton) — here it is a real sharded training step: the global batch
splits over the "dp" mesh axis, encoder weights split over "tp"
(Megatron-style, see models/encoder.py), and the in-batch-negatives logit
matrix `za @ zp.T` is expressed globally so XLA inserts the all-gather of
positives over ICI. Everything compiles to a single pjit'd step.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from codegraph_tpu.models.encoder import (
    EncoderConfig,
    encode,
    encoder_param_shardings,
    init_encoder_params,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 3e-4
    weight_decay: float = 0.01
    temperature: float = 0.05
    grad_clip: float = 1.0
    # "const" | "cosine" (linear warmup -> cosine decay to lr/10; set
    # total_steps for the decay horizon). Long runs on this stack train
    # measurably better with decay; short probe runs keep const.
    schedule: str = "const"
    total_steps: int = 0
    warmup_steps: int = 200


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    if tcfg.schedule == "cosine" and tcfg.total_steps > 0:
        lr = optax.warmup_cosine_decay_schedule(
            init_value=tcfg.learning_rate / 25.0,
            peak_value=tcfg.learning_rate,
            warmup_steps=min(tcfg.warmup_steps, max(1, tcfg.total_steps // 10)),
            decay_steps=tcfg.total_steps,
            end_value=tcfg.learning_rate / 10.0,
        )
    else:
        lr = tcfg.learning_rate
    return optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip),
        optax.adamw(lr, weight_decay=tcfg.weight_decay),
    )


def info_nce_loss(
    params, batch: Dict[str, jax.Array], cfg: EncoderConfig, temperature: float,
    mesh=None, dp_axis=None, sp_axis=None, ep_axis=None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Symmetric InfoNCE over in-batch negatives.

    batch: anchor_ids/anchor_mask/positive_ids/positive_mask, all [B, L].
    """
    kw = dict(mesh=mesh, dp_axis=dp_axis, sp_axis=sp_axis, ep_axis=ep_axis)
    za = encode(params, batch["anchor_ids"], batch["anchor_mask"], cfg, **kw)
    zp = encode(params, batch["positive_ids"], batch["positive_mask"], cfg, **kw)
    logits = (za @ zp.T) / temperature  # [B, B]; XLA all-gathers under dp
    labels = jnp.arange(za.shape[0])
    loss_a = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_p = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    loss = jnp.mean(loss_a + loss_p) * 0.5
    acc = jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
    return loss, {"loss": loss, "accuracy": acc}


def train_step(
    params, opt_state, batch, cfg: EncoderConfig, tcfg: TrainConfig, optimizer,
    mesh=None, dp_axis=None, sp_axis=None, ep_axis=None,
):
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: info_nce_loss(p, batch, cfg, tcfg.temperature,
                                mesh, dp_axis, sp_axis, ep_axis),
        has_aux=True,
    )(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    metrics["grad_norm"] = optax.global_norm(grads)
    return params, opt_state, metrics


def make_sharded_train_step(
    mesh: Mesh,
    cfg: EncoderConfig,
    tcfg: TrainConfig,
    dp_axis: str = "dp",
    sp_axis: Optional[str] = None,
    ep_axis: Optional[str] = None,
):
    """Compile the training step over a (dp, tp[, sp|ep]) mesh.

    Returns (step_fn, init_fn): init_fn(key) places params/opt_state with
    tp (and ep for MoE configs) shardings; step_fn(params, opt_state,
    batch) runs one global step with the batch split over `dp_axis` and,
    when sp_axis is given, activations sequence-sharded between
    attention blocks.
    """
    optimizer = make_optimizer(tcfg)
    pspecs = encoder_param_shardings(cfg)
    # drop mesh axes the caller's mesh doesn't have (e.g. dense model on
    # an ep-less mesh)
    axes = set(mesh.axis_names)

    def _filter(spec):
        return P(*[
            (a if (a is None or a in axes) else None) for a in spec
        ])

    pspecs = jax.tree.map(_filter, pspecs, is_leaf=lambda x: isinstance(x, P))
    param_sh = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), pspecs,
        is_leaf=lambda x: isinstance(x, P),
    )
    batch_sh = NamedSharding(mesh, P(dp_axis, None))

    def init_fn(key):
        params = jax.device_put(init_encoder_params(key, cfg), param_sh)
        # optimizer.init under jit inherits the param shardings for mu/nu
        opt_state = jax.jit(optimizer.init)(params)
        return params, opt_state

    step = jax.jit(
        partial(train_step, cfg=cfg, tcfg=tcfg, optimizer=optimizer,
                mesh=mesh, dp_axis=dp_axis, sp_axis=sp_axis,
                ep_axis=ep_axis),
        donate_argnums=(0, 1),
    )

    def step_fn(params, opt_state, batch):
        batch = {k: jax.device_put(jnp.asarray(v), batch_sh) for k, v in batch.items()}
        return step(params, opt_state, batch)

    return step_fn, init_fn


def cross_encoder_loss(
    params, head, batch: Dict[str, jax.Array], cfg: EncoderConfig,
    group_size: int = 0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Loss for the cross-encoder reranker (models/cross_encoder.py):
    batch carries tokenized (query+doc) pairs and 0/1 relevance labels.

    With group_size G > 0 the batch is G consecutive candidates per
    query (positive first) and the loss is LISTWISE softmax-CE over
    each group — the objective a reranker is actually used under
    (argmax within a candidate list, reranker.rs:170). `accuracy` is
    then group-argmax==positive (chance = 1/G).

    With group_size == 0 it falls back to pointwise sigmoid BCE.
    That objective is miscalibrated for 1-in-G training data: an
    all-negative predictor already scores (G-1)/G "accuracy" (the
    round-3 checkpoint trained this way ranked no better than random
    cross-domain), so groups are the default for the shipped trainer."""
    cls = encode(params, batch["pair_ids"], batch["pair_mask"], cfg,
                 normalize=False)
    logits = cls @ head["w"] + head["b"]
    labels = batch["labels"].astype(jnp.float32)
    if group_size and group_size > 1:
        g = logits.reshape(-1, group_size)
        pos = labels.reshape(-1, group_size).argmax(axis=1)
        logp = jax.nn.log_softmax(g, axis=1)
        loss = -jnp.mean(jnp.take_along_axis(logp, pos[:, None], axis=1))
        acc = jnp.mean((g.argmax(axis=1) == pos).astype(jnp.float32))
    else:
        loss = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))
        acc = jnp.mean(((logits > 0) == (labels > 0.5)).astype(jnp.float32))
    return loss, {"loss": loss, "accuracy": acc}


def make_cross_encoder_train_step(cfg: EncoderConfig, tcfg: TrainConfig,
                                  group_size: int = 0):
    """Single-host train step over (encoder params, head). Returns
    (step_fn, optimizer) — step_fn(state, batch) -> (state, metrics)
    where state = ((params, head), opt_state). group_size > 0 trains
    listwise over groups of G consecutive candidates per query (see
    cross_encoder_loss)."""
    optimizer = make_optimizer(tcfg)

    @jax.jit
    def step(state, batch):
        (params, head), opt_state = state

        def loss_fn(ph):
            return cross_encoder_loss(ph[0], ph[1], batch, cfg,
                                      group_size=group_size)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            (params, head)
        )
        updates, opt_state = optimizer.update(grads, opt_state, (params, head))
        params, head = optax.apply_updates((params, head), updates)
        return ((params, head), opt_state), metrics

    return step, optimizer


def save_train_state(path: str, params, opt_state, step: int) -> None:
    """Checkpoint the full train state (orbax StandardCheckpointer —
    the rebuild's answer to the reference's training persistence,
    ml/training.rs)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        _abs(path), {"params": params, "opt_state": opt_state, "step": step},
        force=True,
    )
    ckptr.wait_until_finished()


def restore_train_state(path: str, template=None):
    """-> (params, opt_state, step). Pass `template` (matching pytree of
    shapes, e.g. a fresh init) to restore with the correct topology."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(_abs(path), template)
    return restored["params"], restored["opt_state"], int(restored["step"])


def _abs(path: str) -> str:
    import os

    return os.path.abspath(path)


__all__ = [
    "TrainConfig",
    "make_optimizer",
    "info_nce_loss",
    "train_step",
    "make_sharded_train_step",
    "save_train_state",
    "restore_train_state",
]
