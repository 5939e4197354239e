"""Bisect the on-device IVF-PQ ADC kernel mismatch (interpret mode is
exact; real TPU differs). Tests each kernel component standalone."""

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")

from codegraph_tpu.ops.topk import NEG_INF, _threshold_merge_vids

LANE = 128


def test_adc_select():
    """lo/hi double gather + select on [m, 128] tiles."""
    m, cap = 32, 256
    rng = np.random.default_rng(0)
    tlo = rng.standard_normal((m, LANE)).astype(np.float32)
    thi = rng.standard_normal((m, LANE)).astype(np.float32)
    codes = rng.integers(0, 256, size=(m, cap)).astype(np.uint8)

    def kernel(tlo_ref, thi_ref, c_ref, o_ref):
        parts = []
        for t in range(cap // LANE):
            ct = c_ref[:, t * LANE:(t + 1) * LANE].astype(jnp.int32)
            lo = jnp.take_along_axis(tlo_ref[:], jnp.minimum(ct, LANE - 1),
                                     axis=1)
            hi = jnp.take_along_axis(thi_ref[:], jnp.maximum(ct - LANE, 0),
                                     axis=1)
            val = jnp.where(ct < LANE, lo, hi)
            parts.append(jnp.sum(val, axis=0, keepdims=True))
        o_ref[:] = jnp.concatenate(parts, axis=1)

    out = np.asarray(jax.jit(lambda a, b, c: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, cap), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b, c))(tlo, thi, codes))

    ci = codes.astype(np.int64)
    expect = np.where(
        ci < LANE,
        np.take_along_axis(tlo, np.minimum(ci, LANE - 1), axis=1),
        np.take_along_axis(thi, np.maximum(ci - LANE, 0), axis=1),
    ).sum(axis=0, keepdims=True)
    ok = np.allclose(out, expect, rtol=1e-5, atol=1e-4)
    print("adc_select:", "OK" if ok else "MISMATCH",
          np.max(np.abs(out - expect)))
    return ok


def test_merge_bt1():
    """_threshold_merge_vids with Bt=1 in a kernel."""
    L, k, k_pad = 512, 10, 128
    rng = np.random.default_rng(1)
    s = rng.standard_normal((1, L)).astype(np.float32)
    ids = rng.permutation(10_000)[:L].astype(np.int32).reshape(1, L)

    def kernel(s_ref, i_ref, os_ref, oi_ref):
        accs = jnp.full((1, k_pad), NEG_INF, jnp.float32)
        acci = jnp.full((1, k_pad), -1, jnp.int32)
        ns, ni = _threshold_merge_vids(s_ref[:], i_ref[:], accs, acci,
                                       k, k_pad)
        os_ref[:] = ns
        oi_ref[:] = ni

    os_, oi_ = jax.jit(lambda a, b: pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, k_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, k_pad), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
    )(a, b))(s, ids)
    os_, oi_ = np.asarray(os_)[:, :k], np.asarray(oi_)[:, :k]
    order = np.argsort(-s[0])[:k]
    ok_s = np.allclose(os_[0], s[0][order], atol=1e-5)
    ok_i = (oi_[0] == ids[0][order]).all()
    print("merge_bt1:", "OK" if (ok_s and ok_i) else "MISMATCH",
          os_[0][:4], s[0][order][:4], oi_[0][:4], ids[0][order][:4])
    return ok_s and ok_i


def test_full_small():
    """Full kernel, tiny shapes, vs the XLA path."""
    from codegraph_tpu.index.ivfpq import (
        ivfpq_search_kernel, ivfpq_search_pallas)
    rng = np.random.default_rng(2)
    nlist, cap, m, D, B, nprobe, k = 4, 128, 32, 64, 2, 2, 5
    codes = rng.integers(0, 256, (nlist, m, cap)).astype(np.uint8)
    ids = np.arange(nlist * cap, dtype=np.int32).reshape(nlist, cap)
    bias = np.zeros((nlist, cap), np.float32)
    cents = rng.standard_normal((nlist, D)).astype(np.float32)
    books = (rng.standard_normal((m, 256, D // m)) * 0.1).astype(np.float32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    s_ref, i_ref = ivfpq_search_kernel(
        jnp.asarray(q), jnp.asarray(cents), jnp.asarray(codes),
        jnp.asarray(ids), jnp.asarray(bias), jnp.asarray(books), k, nprobe)
    s_pl, i_pl = ivfpq_search_pallas(
        jnp.asarray(q), jnp.asarray(cents), jnp.asarray(codes),
        jnp.asarray(ids), jnp.asarray(bias), jnp.asarray(books), k, nprobe)
    s_ref, i_ref = np.asarray(s_ref), np.asarray(i_ref)
    s_pl, i_pl = np.asarray(s_pl), np.asarray(i_pl)
    ok = np.allclose(s_pl, s_ref, atol=1e-3) and (i_pl == i_ref).all()
    print("full_small:", "OK" if ok else "MISMATCH")
    print(" ref s:", s_ref[0], "\n pl  s:", s_pl[0])
    print(" ref i:", i_ref[0], "\n pl  i:", i_pl[0])
    return ok


if __name__ == "__main__":
    print("devices:", jax.devices())
    a = test_adc_select()
    b = test_merge_bt1()
    c = test_full_small()
    print("summary:", a, b, c)
