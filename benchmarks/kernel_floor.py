"""Decompose the flat-scan kernel's time: where do 60 ms go?

Three kernels, identical grid/blocks/dtypes to the headline qmajor scan
(1M x 768 bf16, B=2048, k=10):

  floor      matmul + single per-tile max into the accumulator (the
             matmul + grid + DMA floor — no top-k at all)
  lanepass   matmul + the fused lane-reduce pass (m1/m2/r1) + max store
             (adds the whole-tile VPU pass, no insertion loop)
  full       the shipped lane-merge kernel (adds insertion + fallback)

The deltas attribute time to (grid+MXU+HBM) vs (VPU pass) vs
(insertion while-loop + hidden-candidate fallback). Writes
.bench/kernel_floor.json.
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from codegraph_tpu.ops.topk import (
    NEG_INF,
    _lane_reduce,
    streaming_topk_pallas_qmajor,
)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".bench", "kernel_floor.json")


def _probe_kernel(q_ref, x_ref, bias_ref, out_ref, acc, *, tile_b, mode):
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc[pl.ds(j * tile_b, tile_b), :] = jnp.full(
            (tile_b, 128), NEG_INF, jnp.float32)

    s = jax.lax.dot_general(
        q_ref[:], x_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[:]

    row = pl.ds(j * tile_b, tile_b)
    if mode == "floor":
        m = jnp.max(s, axis=1, keepdims=True)  # [tb, 1]
        acc[row, :] = jnp.maximum(acc[row, :], m)
    else:  # lanepass
        m1, m2, r1, _ = _lane_reduce(s)
        acc[row, :] = jnp.maximum(acc[row, :],
                                  m1 + m2 + r1.astype(jnp.float32) * 0.0)

    n_last = n_i - 1

    @pl.when(i == n_last)
    def _():
        out_ref[:] = acc[row, :]


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_b", "mode"))
def probe(q, x, bias, tile_n, tile_b, mode):
    B, D = q.shape
    N = x.shape[0]
    grid = (N // tile_n, B // tile_b)
    kernel = functools.partial(_probe_kernel, tile_b=tile_b, mode=mode)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, 128), lambda i, j: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, 128), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D,
            bytes_accessed=B * D * 4 + N * D * 4 + N * 4,
            transcendentals=0,
        ),
    )(q, x, bias.reshape(1, N))
    return out


def timed(fn, batches, iters=3):
    np.asarray(fn(batches[-1]))
    best = float("inf")
    for it in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(batches[it]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    N, D, B, K = 999424, 768, 2048, 10
    iters = 3
    key = jax.random.PRNGKey(0)
    kx, kq = jax.random.split(key)
    x = jax.random.normal(kx, (N, D), jnp.float32)
    x = x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True),
                                      1e-12))
    xb = x.astype(jnp.bfloat16)
    qs = jax.random.normal(kq, (iters + 1, B, D), jnp.float32)
    qs = qs * jax.lax.rsqrt(jnp.maximum(jnp.sum(qs * qs, -1, keepdims=True),
                                        1e-12))
    qb = [qs[i].astype(jnp.bfloat16) for i in range(iters + 1)]
    bias = jnp.zeros((N,), jnp.float32)

    results = {}
    for tile_n, tile_b in ((1024, 256), (1024, 512), (512, 512),
                           (2048, 128)):
        for mode in ("floor", "lanepass"):
            name = f"{mode}_tn{tile_n}_tb{tile_b}"
            try:
                dt = timed(lambda qq, tn=tile_n, tb=tile_b, m=mode:
                           probe(qq, xb, bias, tn, tb, m), qb, iters)
                results[name] = {"ms": round(dt * 1e3, 2),
                                 "qps": round(B / dt, 1)}
            except Exception as e:
                results[name] = {"error": str(e)[:160]}
            print(name, results[name], flush=True)
        name = f"full_tn{tile_n}_tb{tile_b}"
        try:
            dt = timed(lambda qq, tn=tile_n, tb=tile_b:
                       streaming_topk_pallas_qmajor(
                           qq, xb, bias, K, tile_n=tn, tile_b=tb)[0],
                       qb, iters)
            results[name] = {"ms": round(dt * 1e3, 2),
                             "qps": round(B / dt, 1)}
        except Exception as e:
            results[name] = {"error": str(e)[:160]}
        print(name, results[name], flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
