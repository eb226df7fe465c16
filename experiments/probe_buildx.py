#!/usr/bin/env python
"""Microbench of the packed one-hot window-table build (build_packed_x):
attributes the wall to the codes gather vs the one-hot spread, comparing
the selection-matmul formulation against the naive [R, g, alpha] relayout
one. Per-rep rolled inputs defeat the remote content-addressed execution
cache; a 4-byte element pull is the completion barrier (axon's
block_until_ready returns early).

    python experiments/probe_buildx.py --dataset 1.1 --g 8
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DATA = "/root/reference/data"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="1.1")
    ap.add_argument("--g", type=int, default=8)
    ap.add_argument("--m", type=int, default=4)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastsk_tpu.io.fasta import FastaUtility
    from fastsk_tpu.kernel.config import KernelConfig
    from fastsk_tpu.kernel.pairs_engine import PackedPairsEngine
    from fastsk_tpu.ops.encode import encode_sequences
    from fastsk_tpu.utils.observe import enable_compilation_cache

    enable_compilation_cache()
    reader = FastaUtility()
    Xtr, _ = reader.read_data(f"{DATA}/{args.dataset}.train.fasta")
    Xte, _ = reader.read_data(f"{DATA}/{args.dataset}.test.fasta")
    enc = encode_sequences(Xtr, Xte)
    eng = PackedPairsEngine(enc, args.g, args.m, KernelConfig())
    g, alpha, code_min = eng.g, eng.alpha, eng.code_min
    r = int(eng._seq_of.shape[0])
    log(f"{args.dataset}: R={r} g={g} alpha={alpha} F={g * alpha}")
    seq_of, win_of = eng._seq_of, eng._win_of

    def pull(a):
        np.asarray(a[(0,) * a.ndim])
        return a

    @functools.partial(jax.jit, static_argnames=("g",))
    def gather_codes(ids, r, seq_of, win_of, *, g):
        # the roll is fused into each probed jit (see probe_band.py:
        # separate on-device rolls / eager warm-ups hang this platform,
        # host-side rolls charge a per-rep upload to the phase)
        ids = jnp.roll(ids, r, axis=0)
        safe_seq = jnp.maximum(seq_of, 0)
        cols = win_of[:, None] + jnp.arange(g, dtype=jnp.int32)[None, :]
        codes = ids[safe_seq[:, None], cols]
        return jnp.where((seq_of >= 0)[:, None], codes, -1)

    @functools.partial(jax.jit, static_argnames=("g", "alpha"))
    def spread_matmul(codes, *, g, alpha):
        sel = jnp.repeat(jnp.eye(g, dtype=jnp.float32), alpha, axis=1)
        codes_f = jax.lax.dot_general(
            codes.astype(jnp.float32), sel,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        cmp = jnp.tile(jnp.arange(alpha, dtype=jnp.float32), g)
        return (codes_f == cmp[None, :]).astype(jnp.int8)

    @functools.partial(jax.jit, static_argnames=("g", "alpha"))
    def spread_naive(codes, *, g, alpha):
        iota = jnp.arange(alpha, dtype=jnp.int32)
        oh = (codes[..., None] == iota).astype(jnp.int8)
        return oh.reshape(codes.shape[0], g * alpha)

    ids0 = eng._ids
    for rep in range(args.reps):
        rep_dev = jax.device_put(np.int32(rep))
        t0 = time.perf_counter()
        codes = pull(gather_codes(ids0, rep_dev, seq_of, win_of, g=g))
        t_gather = time.perf_counter() - t0
        t0 = time.perf_counter()
        pull(spread_matmul(codes, g=g, alpha=alpha))
        t_mm = time.perf_counter() - t0
        t0 = time.perf_counter()
        pull(spread_naive(codes, g=g, alpha=alpha))
        t_nv = time.perf_counter() - t0
        log(
            f"rep{rep}: gather={t_gather * 1e3:.0f}ms "
            f"spread_matmul={t_mm * 1e3:.0f}ms spread_naive={t_nv * 1e3:.0f}ms"
        )


if __name__ == "__main__":
    main()
