"""Probe which tpu.dynamic_gather shapes Mosaic supports on this chip.

The IVF-PQ per-cell-DMA ADC kernel needs an in-VMEM table lookup:
adc[r] = sum_j table[j, codes[r, j]].  Mosaic lowers
jnp.take_along_axis(x, idx, axis) for 2-D x with idx.shape == x.shape
(tpu.dynamic_gather along dim 0 or 1), but the sublane/lane constraints
live in C++ — probe them empirically.

Run ON TPU:  python benchmarks/probe_dynamic_gather.py
Writes results to .bench/dynamic_gather_probe.json
"""

import functools
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_gather_fn(shape, axis, dtype=jnp.float32):
    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=axis)

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    return run


def probe(shape, axis, results, reps=3):
    name = f"gather_axis{axis}_{shape[0]}x{shape[1]}"
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    idx = rng.integers(0, shape[axis], size=shape).astype(np.int32)
    try:
        fn = make_gather_fn(shape, axis)
        out = np.asarray(fn(jnp.asarray(x), jnp.asarray(idx)))
        expect = np.take_along_axis(x, idx, axis=axis)
        ok = np.allclose(out, expect)
        # rough timing with fresh inputs per rep (avoid result cache)
        ts = []
        for r in range(reps):
            idx_r = rng.integers(0, shape[axis], size=shape).astype(np.int32)
            jidx = jnp.asarray(idx_r)
            t0 = time.perf_counter()
            _ = np.asarray(fn(jnp.asarray(x), jidx))
            ts.append(time.perf_counter() - t0)
        results[name] = {"ok": bool(ok), "t_ms": round(min(ts) * 1e3, 3)}
        print(name, "OK" if ok else "WRONG RESULT", f"{min(ts)*1e3:.2f} ms")
    except Exception as e:
        msg = str(e).split("\n")[0][:300]
        results[name] = {"ok": False, "error": msg}
        print(name, "FAIL:", msg)


def probe_uint8_codes(results):
    """The real ADC shape: codes uint8 -> int32 in-kernel, table f32."""
    name = "adc_cell_256rows_m96"
    cap_t, m, ksub = 256, 96, 256
    rng = np.random.default_rng(1)
    table = rng.standard_normal((ksub, m)).astype(np.float32)  # T[c, j]
    codes = rng.integers(0, ksub, size=(cap_t, m)).astype(np.uint8)

    def kernel(t_ref, c_ref, o_ref):
        idx = c_ref[:].astype(jnp.int32)  # [cap_t, m]
        # want out[r, j] = T[codes[r, j], j]; operand/idx shapes must
        # match -> process cap_t == ksub rows at a time
        looked = jnp.take_along_axis(t_ref[:], idx, axis=0)
        o_ref[:] = jnp.sum(looked, axis=1, keepdims=True)

    @jax.jit
    def run(t, c):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((cap_t, 1), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, c)

    try:
        out = np.asarray(run(jnp.asarray(table), jnp.asarray(codes)))[:, 0]
        expect = table[codes.astype(np.int64),
                       np.arange(m)[None, :]].sum(axis=1)
        ok = np.allclose(out, expect, rtol=1e-5, atol=1e-4)
        results[name] = {"ok": bool(ok)}
        print(name, "OK" if ok else "WRONG RESULT")
    except Exception as e:
        msg = str(e).split("\n")[0][:300]
        results[name] = {"ok": False, "error": msg}
        print(name, "FAIL:", msg)


def main():
    print("devices:", jax.devices())
    results = {"platform": jax.devices()[0].platform}
    # axis-0 (sublane) gathers at growing depth
    for d in (8, 16, 32, 64, 128, 256):
        probe((d, 128), 0, results)
    # wider lane dim with axis-0
    probe((256, 256), 0, results)
    # axis-1 (lane) gathers
    probe((8, 128), 1, results)
    probe((96, 128), 1, results)
    probe((96, 256), 1, results)
    probe((128, 256), 1, results)
    # the actual ADC composite
    probe_uint8_codes(results)
    os.makedirs(".bench", exist_ok=True)
    with open(".bench/dynamic_gather_probe.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
