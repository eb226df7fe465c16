#!/usr/bin/env python
"""Variant-attribution probe for the seq-aligned headline kernel.

The round-4 composite bracket blamed the VPU weight chain (9 ops/elt) for
the 2.5 s EP300 wall but the VPU table is only directional-within-2x
(VERDICT r4 weak #2).  This probe replaces the bracket with measurement:
it times the FULL banded dispatch (same launches as
``PairsGkmEngine._pallas_upper_device``) for kernel VARIANTS that differ
only in the per-element weight chain, so the chain's true cost is the
difference between walls:

    noop     -- zero-write only (grid + dispatch overhead)
    matmul   -- D matmul, write a slice (MXU floor, no VPU chain, no sums)
    skeleton -- matmul + stage sums with w = d  (adds the reduction cost)
    current  -- production chain: cast f32, ffact pairing, cast int32
    int32    -- ffact chain natively in int32 (no casts)

    python experiments/probe_pairs.py --variants skeleton,current,int32
"""

from __future__ import annotations

import argparse
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DATA = "/root/reference/data"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_kernel(mode, *, g, k, p_pad, c_ti, c_tj, n_chunks):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from fastsk_tpu.ops.pairs_pallas import ffact_pairing

    def kernel(i0_ref, xi_ref, xj_ref, out_ref, s1_ref):
        i = i0_ref[0] + pl.program_id(0)
        j = pl.program_id(1)
        ti = c_ti * p_pad
        tj = c_tj * p_pad
        chunk = tj // n_chunks
        live = (j + 1) * tj > i * ti

        @pl.when(live)
        def _():
            if mode == "noop":
                out_ref[0, 0] = jnp.zeros((c_ti, c_tj), jnp.int32)
                return
            xi = xi_ref[:]
            for c in range(n_chunks):
                d = jax.lax.dot_general(
                    xi,
                    xj_ref[c * chunk : (c + 1) * chunk, :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                if mode == "matmul":
                    # keep the matmul live with a cheap slice write
                    s1_ref[:, c * chunk : (c + 1) * chunk] = d[
                        :c_ti, :
                    ]
                    continue
                if mode == "skeleton":
                    w = d
                elif mode == "current":
                    w = ffact_pairing(d.astype(jnp.float32), k).astype(
                        jnp.int32
                    )
                elif mode == "int32":
                    # ffact pairing natively in int32 (no casts): for
                    # k even, prod over i of (t + i*(k-1-i)) with
                    # t = d*(d-(k-1)); values < 2^24 so int32-exact
                    t = d * (d - (k - 1))
                    w = t
                    for i2 in range(1, k // 2):
                        w = w * (t + i2 * (k - 1 - i2))
                    if k % 2:
                        w = w * (d - (k - 1) // 2)
                else:
                    raise ValueError(mode)
                s1 = jnp.sum(w.reshape(c_ti, p_pad, chunk), axis=1)
                if mode in ("current", "int32"):
                    s1 = jnp.round(
                        s1.astype(jnp.float32)
                        * (1.0 / float(math.factorial(k)))
                    ).astype(jnp.int32)
                s1_ref[:, c * chunk : (c + 1) * chunk] = s1
            if mode == "matmul":
                out_ref[0, 0] = s1_ref[:, :c_tj]
                return
            s1t = s1_ref[:].T
            out = jnp.sum(s1t.reshape(c_tj, p_pad, c_ti), axis=1)
            out_ref[0, 0] = out.T

        @pl.when(jnp.logical_not(live))
        def _():
            out_ref[0, 0] = jnp.zeros((c_ti, c_tj), jnp.int32)

    return kernel


def main():
    import faulthandler

    faulthandler.dump_traceback_later(240, repeat=True, file=sys.stderr)
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="EP300_47848")
    ap.add_argument("--g", type=int, default=16)
    ap.add_argument("--m", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--variants", default="noop,matmul,skeleton,current,int32"
    )
    ap.add_argument("--csv", default="")
    ap.add_argument("--dcap-mb", type=int, default=5,
                    help="D-tile VMEM cap in MB (chunking knob)")
    ap.add_argument("--ci", type=int, default=0,
                    help="override the engine's c_i (i-tile sequences); "
                         "must divide c_j — used to measure the grid-"
                         "overhead-vs-tile-size tradeoff")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fastsk_tpu.io.fasta import FastaUtility
    from fastsk_tpu.kernel.config import KernelConfig
    from fastsk_tpu.kernel.pairs_engine import PairsGkmEngine
    from fastsk_tpu.ops.encode import encode_sequences
    from fastsk_tpu.utils.observe import enable_compilation_cache

    enable_compilation_cache()
    reader = FastaUtility()
    Xtr, _ = reader.read_data(f"{DATA}/{args.dataset}.train.fasta")
    Xte, _ = reader.read_data(f"{DATA}/{args.dataset}.test.fasta")
    enc = encode_sequences(Xtr, Xte)
    eng = PairsGkmEngine(enc, args.g, args.m, KernelConfig())
    if args.ci:
        assert eng.c_j % args.ci == 0 and eng.n_pad % args.ci == 0
        eng.c_i = args.ci
    g, k = eng.g, eng.k
    log(
        f"{args.dataset}: n_pad={eng.n_pad} p_pad={eng.p_pad} "
        f"c_i={eng.c_i} c_j={eng.c_j} g={g} k={k}"
    )

    x = eng._build_x()
    n_rows, f = x.shape
    ti = eng.c_i * eng.p_pad
    tj = eng.c_j * eng.p_pad
    n_i = n_rows // ti
    n_j = n_rows // tj
    n_chunks = 1
    while ti * (tj // n_chunks) * 4 > args.dcap_mb * 2**20:
        n_chunks *= 2
    while tj % n_chunks:
        n_chunks //= 2
    log(f"n_chunks={n_chunks} chunk={tj//n_chunks}")
    band = max(1, -(-n_i // 12))

    def run_variant(mode):
        kernel = make_kernel(
            mode, g=g, k=k, p_pad=eng.p_pad, c_ti=eng.c_i,
            c_tj=eng.c_j, n_chunks=n_chunks,
        )

        @functools.partial(jax.jit, static_argnames=("nb",))
        def dispatch_band(xb, i0, r, *, nb):
            # per-rep roll fused into the probed jit (content-addressed
            # dispatch layer; see probe_band.py)
            xb = jnp.roll(xb, r, axis=0)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nb, n_j),
                in_specs=[
                    pl.BlockSpec((ti, f), lambda i, j, i0: (i0[0] + i, 0)),
                    pl.BlockSpec((tj, f), lambda i, j, i0: (j, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, 1, eng.c_i, eng.c_j), lambda i, j, i0: (i, j, 0, 0)
                ),
                scratch_shapes=[pltpu.VMEM((eng.c_i, tj), jnp.int32)],
            )
            blocks = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(
                    (nb, n_j, eng.c_i, eng.c_j), jnp.int32
                ),
            )(i0.reshape(1), xb, xb)
            return jnp.sum(blocks, dtype=jnp.int32)

        best = None
        for rep in range(args.reps):
            r = jax.device_put(np.int32(rep))
            t0 = time.perf_counter()
            acc = 0
            for i0 in range(0, n_i, band):
                nb = min(band, n_i - i0)
                acc = acc + dispatch_band(
                    x, jnp.asarray(i0, jnp.int32), r, nb=nb
                )
            val = int(np.asarray(acc))  # 4-byte pull = the barrier
            dt = time.perf_counter() - t0
            log(f"  {mode} rep{rep}: {dt:.3f} s (checksum {val})")
            best = dt if best is None else min(best, dt)
        return best

    results = {}
    for mode in args.variants.split(","):
        mode = mode.strip()
        log(f"variant {mode}:")
        results[mode] = run_variant(mode)

    log("--- best walls ---")
    base = results.get("skeleton")
    for mode, wall in results.items():
        extra = ""
        if base and mode not in ("noop", "matmul", "skeleton"):
            extra = f"  (chain cost vs skeleton: {wall - base:+.3f} s)"
        log(f"{mode}: {wall:.3f} s{extra}")
    if args.csv:
        import csv as _csv

        with open(args.csv, "w", newline="") as fh:
            w = _csv.writer(fh)
            w.writerow(["variant", "best_wall_s"])
            for mode, wall in results.items():
                w.writerow([mode, f"{wall:.3f}"])
        log(f"wrote {args.csv}")


if __name__ == "__main__":
    main()
