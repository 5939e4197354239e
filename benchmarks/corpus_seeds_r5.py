"""Harvest + embed REAL code chunks as seeds for the 10M corpus (r5).

The r4 operating-point sweep ran on a sigma=0.25 synthetic around
Gaussian centers; VERDICT r4 item 1 called its near-duplicate geometry
an experiment-design artifact (the whole true top-10 sits in one coarse
cell as an unresolvable ~1000-way near-tie) and asked for a DEFENSIBLE
corpus: chunks of real repositories embedded with the shipped ensemble
provider, tiled/perturbed to 10M.

This script produces the seed matrix that generator consumes:
  1. harvest source chunks from every real code tree in this image
     (venv Python/JS, /usr/include C/C++, the reference's Rust crates,
     this repo) with the PRODUCTION chunker (parser/chunker.py
     split_text, 512-token chunks, 64-token overlap) — chunks are
     exactly the retrieval unit the production index stores;
  2. embed them with the shipped EnsembleProvider (768-d, the
     EmbeddingConfig default) on whatever backend is live (TPU);
  3. save .bench/seeds_r5.npz: emb [S, 768] f32 (normalized) + the
     harvest manifest. ~393MB at S=131k (gitignored; regenerable).

The 10M sweep (ivfpq_operating_point_r5.py) then samples rows around
held-out-query seeds with density-calibrated perturbations.

Run: python benchmarks/corpus_seeds_r5.py [--max-chunks 131072]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import pathlib
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".bench", "seeds_r5.npz")
PARTS_DIR = os.path.join(REPO, ".bench", "seeds_r5_parts")
MAX_PROC_ATTEMPTS = 8
RETRY_WAIT_S = 240.0


def _is_transient(e: BaseException) -> bool:
    msg = str(e).lower()
    return ("unavailable" in msg or "broken pipe" in msg
            or "transport" in msg or "backend" in msg
            or "failed_precondition" in msg or "failedprecondition" in msg
            or "deadline" in msg)


def _reexec() -> None:
    att = int(os.environ.get("SEEDS_R5_ATTEMPT", "1"))
    if att >= MAX_PROC_ATTEMPTS:
        print(f"giving up after {att} process attempts", flush=True)
        sys.exit(1)
    print(f"transport death; re-exec (attempt {att + 1}/"
          f"{MAX_PROC_ATTEMPTS}) after {RETRY_WAIT_S:.0f}s", flush=True)
    time.sleep(RETRY_WAIT_S)
    os.environ["SEEDS_R5_ATTEMPT"] = str(att + 1)
    os.execv(sys.executable, [sys.executable] + sys.argv)

ROOTS = [
    ("/opt/venv", ("*.py", "*.js")),
    ("/usr/include", ("*.h", "*.hpp")),
    ("/root/reference", ("*.rs",)),
    (os.path.join(REPO, "codegraph_tpu"), ("*.py",)),
    (os.path.join(REPO, "native"), ("*.cpp", "*.h")),
]


def harvest(max_chunks: int, max_tokens: int = 512) -> list:
    from codegraph_tpu.parser.chunker import _default_count, split_text

    files = []
    for root, exts in ROOTS:
        for ext in exts:
            files.extend(str(p) for p in pathlib.Path(root).rglob(ext))
    rng = random.Random(20260819)
    files = sorted(set(files))
    rng.shuffle(files)
    chunks, seen = [], set()
    t0 = time.perf_counter()
    for i, f in enumerate(files):
        try:
            text = pathlib.Path(f).read_text(errors="replace")
        except OSError:
            continue
        if not text.strip() or len(text) > 2_000_000:
            continue
        # skip minified bundles (one enormous line) — not code geometry
        lines = text.splitlines()
        if lines and max(len(ln) for ln in lines) > 2000:
            continue
        for ch in split_text(text, max_tokens, 64, _default_count):
            if len(ch.strip()) < 64:
                continue
            h = hashlib.sha1(ch.encode("utf-8", "replace")).digest()[:12]
            if h in seen:
                continue
            seen.add(h)
            chunks.append(ch)
        if len(chunks) >= max_chunks * 2:  # harvest surplus, sample down
            break
        if i % 2000 == 0:
            print(f"  harvested {len(chunks)} chunks from {i + 1} files "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    rng.shuffle(chunks)
    return chunks[:max_chunks]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-chunks", type=int, default=131_072)
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    from codegraph_tpu.core.config import apply_platform_env
    apply_platform_env()

    chunks = harvest(args.max_chunks)
    print(f"harvest: {len(chunks)} chunks", flush=True)

    from codegraph_tpu.models.providers import (
        EnsembleProvider, _default_checkpoint)

    ckpt = _default_checkpoint()
    prov = EnsembleProvider(dimension=768, checkpoint=ckpt)
    # Embed in checkpointed parts: the tunnel drops connections mid-run
    # (FAILED_PRECONDITION on host fetch); each part is flushed to disk
    # so a re-exec'd process (fresh TPU claim) only redoes the tail.
    part_rows = args.batch * 16
    n_parts = (len(chunks) + part_rows - 1) // part_rows
    os.makedirs(PARTS_DIR, exist_ok=True)
    t0 = time.perf_counter()
    for pi in range(n_parts):
        pf = os.path.join(PARTS_DIR, f"part_{pi:04d}.npy")
        if os.path.exists(pf):
            continue
        plo, phi = pi * part_rows, min((pi + 1) * part_rows, len(chunks))
        part = []
        try:
            for lo in range(plo, phi, args.batch):
                part.append(np.asarray(
                    prov.embed_texts(chunks[lo:lo + args.batch]), np.float32))
        except Exception as e:  # noqa: BLE001
            if _is_transient(e):
                print(f"part {pi}: transient {type(e).__name__}: {e}",
                      flush=True)
                _reexec()
            raise
        arr = np.concatenate(part)
        np.save(pf + ".tmp.npy", arr)
        os.replace(pf + ".tmp.npy", pf)
        rate = phi / max(time.perf_counter() - t0, 1e-9)
        print(f"  embedded {phi}/{len(chunks)} ({rate:.0f} chunks/s this "
              "process)", flush=True)
    emb = np.concatenate([
        np.load(os.path.join(PARTS_DIR, f"part_{pi:04d}.npy"))
        for pi in range(n_parts)])[: len(chunks)]
    emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(OUT, emb=emb.astype(np.float32))
    manifest = {
        "n_seeds": int(emb.shape[0]),
        "dim": int(emb.shape[1]),
        "provider": "ensemble",
        "checkpoint": os.path.basename(ckpt or ""),
        "chunker": "split_text max_tokens=512 overlap=64 (production)",
        "roots": [r for r, _ in ROOTS],
        "embed_s": round(time.perf_counter() - t0, 1),
    }
    with open(OUT + ".json", "w") as f:
        json.dump(manifest, f, indent=1)
    print("wrote", OUT, json.dumps(manifest), flush=True)


if __name__ == "__main__":
    main()
