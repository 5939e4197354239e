"""ctypes bindings for the native host library (native/cghost.cpp).

The reference's host runtime is native Rust (zero-copy buffers, rayon
loops); cghost is the C++ equivalent for this rebuild's host hot loops.
Callers use `lib()` and fall back to pure Python when the shared object
is absent; `ensure_built()` compiles it on demand with g++ (the repo
ships source, not binaries).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger("codegraph_tpu.native")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libcghost.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


ABI_VERSION = 2  # must match cg_abi_version() in cghost.cpp


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-B"], check=True,
            capture_output=True, timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except (subprocess.SubprocessError, OSError) as exc:
        logger.warning("native build failed: %s", exc)
        return False


def ensure_built() -> bool:
    """Compile libcghost.so if missing. Returns availability."""
    if os.path.exists(_SO_PATH):
        return True
    return _build()


def lib() -> Optional[ctypes.CDLL]:
    """The loaded library, or None (callers fall back to Python)."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_SO_PATH) and not ensure_built():
        _load_failed = True
        return None
    try:
        cdll = ctypes.CDLL(_SO_PATH)
    except OSError as exc:
        logger.warning("native load failed: %s", exc)
        _load_failed = True
        return None

    # stale-ABI guard: a .so built from older sources would accept the new
    # ctypes arity silently (C ABI) and leave the new outputs untouched
    try:
        cdll.cg_abi_version.restype = ctypes.c_int64
        so_abi = int(cdll.cg_abi_version())
    except AttributeError:
        so_abi = -1
    if so_abi != ABI_VERSION:
        del cdll
        if not _build():
            _load_failed = True
            return None
        # ctypes never dlcloses and glibc dedups by dev/inode, so
        # re-opening _SO_PATH would return the STALE mapping. Load the
        # rebuilt library through a fresh-inode copy instead.
        import shutil
        import tempfile

        fd, fresh = tempfile.mkstemp(dir=_NATIVE_DIR, suffix=".so")
        os.close(fd)
        try:
            shutil.copy2(_SO_PATH, fresh)
            cdll = ctypes.CDLL(fresh)
        finally:
            try:
                os.unlink(fresh)  # mapping survives the unlink on Linux
            except OSError:
                pass
        cdll.cg_abi_version.restype = ctypes.c_int64
        if int(cdll.cg_abi_version()) != ABI_VERSION:
            logger.warning("native ABI mismatch persists after rebuild")
            _load_failed = True
            return None

    _i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    cdll.cg_padded_adjacency.argtypes = [
        ctypes.c_int64,
        _i64p, _i32p, _i16p, _f32p,
        _i64p, _i32p, _i16p, _f32p,
        _i16p, ctypes.c_int64,
        ctypes.c_int64,
        _i32p, _f32p, _i16p, _i8p,
    ]
    cdll.cg_padded_adjacency.restype = None

    cdll.cg_trigram_preselect.argtypes = [
        ctypes.c_char_p, _i64p, ctypes.c_int64,
        ctypes.c_char_p, _i64p, ctypes.c_int64,
        ctypes.c_double, ctypes.c_int64,
        _i32p, _f32p,
    ]
    cdll.cg_trigram_preselect.restype = None

    cdll.cg_bm25_score.argtypes = [
        _i64p, _i32p, _i32p, ctypes.c_int64,
        _i32p, ctypes.c_int64, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_int64,
        _i32p, _f32p,
    ]
    cdll.cg_bm25_score.restype = ctypes.c_int64

    cdll.cg_chunk_boundaries.argtypes = [
        _i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        _i32p, ctypes.c_int64,
    ]
    cdll.cg_chunk_boundaries.restype = ctypes.c_int64

    cdll.cg_ivf_spill_fill.argtypes = [
        _i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        _i64p, _i32p, _i32p,
    ]
    cdll.cg_ivf_spill_fill.restype = None

    _lib = cdll
    return _lib


def available() -> bool:
    return lib() is not None


# -- high-level wrappers ----------------------------------------------------


def padded_adjacency_native(
    n_nodes: int,
    indptr: np.ndarray, indices: np.ndarray,
    etype: np.ndarray, weight: np.ndarray,
    r_indptr: np.ndarray, r_indices: np.ndarray,
    r_etype: np.ndarray, r_weight: np.ndarray,
    keep_etypes: Sequence[int],
    max_deg: int,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    cdll = lib()
    if cdll is None:
        return None
    nbr = np.full((n_nodes, max_deg), -1, np.int32)
    wgt = np.zeros((n_nodes, max_deg), np.float32)
    et = np.full((n_nodes, max_deg), -1, np.int16)
    dirn = np.zeros((n_nodes, max_deg), np.int8)
    keep = np.asarray(list(keep_etypes), np.int16)
    cdll.cg_padded_adjacency(
        n_nodes,
        np.ascontiguousarray(indptr, np.int64),
        np.ascontiguousarray(indices, np.int32),
        np.ascontiguousarray(etype, np.int16),
        np.ascontiguousarray(weight, np.float32),
        np.ascontiguousarray(r_indptr, np.int64),
        np.ascontiguousarray(r_indices, np.int32),
        np.ascontiguousarray(r_etype, np.int16),
        np.ascontiguousarray(r_weight, np.float32),
        keep, len(keep), max_deg, nbr, wgt, et, dirn,
    )
    return nbr, wgt, et, dirn


def _pack_strings(strings: Sequence[str]) -> Tuple[bytes, np.ndarray]:
    offs = np.zeros((len(strings) + 1,), np.int64)
    parts: List[bytes] = []
    total = 0
    for i, s in enumerate(strings):
        b = s.encode("utf-8", errors="replace")
        parts.append(b)
        total += len(b)
        offs[i + 1] = total
    return b"".join(parts), offs


def trigram_preselect_native(
    targets: Sequence[str],
    symbols: Sequence[str],
    threshold: float = 0.3,
    top_j: int = 8,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """-> (idx [n_targets, top_j] into symbols, scores), or None."""
    cdll = lib()
    if cdll is None or not targets or not symbols:
        return None
    tbuf, toff = _pack_strings(targets)
    sbuf, soff = _pack_strings(symbols)
    idx = np.full((len(targets), top_j), -1, np.int32)
    score = np.zeros((len(targets), top_j), np.float32)
    cdll.cg_trigram_preselect(
        tbuf, toff, len(targets), sbuf, soff, len(symbols),
        threshold, top_j, idx, score,
    )
    return idx, score


def bm25_score_native(
    post_off: np.ndarray, post_doc: np.ndarray, post_tf: np.ndarray,
    doc_len: np.ndarray, avg_len: float,
    k1: float, b: float, top_n: int,
    n_docs: Optional[int] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """n_docs: TRUE corpus size for the IDF term. doc_len is only an
    id -> length table sized to the query's max doc id, so using its
    length as n_docs (the old behavior, kept as the default) computes
    log(1 + (max_doc+1-df+0.5)/(df+0.5)) — wildly wrong IDFs whenever
    the query's postings sit in low rows of a big corpus."""
    cdll = lib()
    if cdll is None:
        return None
    out_doc = np.zeros((top_n,), np.int32)
    out_score = np.zeros((top_n,), np.float32)
    n = cdll.cg_bm25_score(
        np.ascontiguousarray(post_off, np.int64),
        np.ascontiguousarray(post_doc, np.int32),
        np.ascontiguousarray(post_tf, np.int32),
        len(post_off) - 1,
        np.ascontiguousarray(doc_len, np.int32),
        int(n_docs) if n_docs is not None else len(doc_len), avg_len,
        k1, b, top_n, out_doc, out_score,
    )
    return out_doc[:n], out_score[:n]


def ivf_spill_fill_native(
    top2: np.ndarray, fill: np.ndarray, cap: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Sequential capacity-bounded cell placement. Mutates `fill`;
    returns (cells [n], pos [n]) or None when the library is absent."""
    cdll = lib()
    if cdll is None:
        return None
    n = top2.shape[0]
    out_cell = np.zeros((n,), np.int32)
    out_pos = np.zeros((n,), np.int32)
    fill64 = np.ascontiguousarray(fill, np.int64)
    cdll.cg_ivf_spill_fill(
        np.ascontiguousarray(top2, np.int32), n, len(fill), cap,
        fill64, out_cell, out_pos,
    )
    if fill64 is not fill:  # conversion copied: propagate mutations back
        fill[:] = fill64
    return out_cell, out_pos


__all__ = [
    "available",
    "ensure_built",
    "lib",
    "padded_adjacency_native",
    "trigram_preselect_native",
    "bm25_score_native",
    "ivf_spill_fill_native",
]
