#!/usr/bin/env python
"""Phase-attribution probe for the run-aligned sorted/approx pass.

VERDICT r4 weak #4: the AImed sorted pass was improved to ~60 ms but the
remainder was undiagnosed (a flat width/chunk sweep is a negative result,
not an attribution). This applies the probe_band.py discipline: split one
``sorted_theta_pass_batch_sum`` dispatch into cumulative prefixes so each
phase's cost is a wall difference on the real chip:

    phase1   -- hash + ONE lax.sort + run compaction (per theta)
    scatter  -- + the slab fori_loop's chunked scatter-adds building C_s
                (no grams; accumulates sum(C_s) to keep the loop live)
    full     -- + the slab gram matmuls (the production pass)

    python experiments/probe_sorted.py --dataset AImed --g 11 --m 4
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DATA = os.environ.get("FASTSK_DATA", "/root/reference/data")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import faulthandler

    faulthandler.dump_traceback_later(240, repeat=True, file=sys.stderr)
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="AImed")
    ap.add_argument("--g", type=int, default=11)
    ap.add_argument("--m", type=int, default=4)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--csv", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastsk_tpu.io.fasta import FastaUtility
    from fastsk_tpu.kernel.config import KernelConfig
    from fastsk_tpu.kernel.sorted_engine import SortedGkmEngine
    from fastsk_tpu.ops import sorted_theta as st
    from fastsk_tpu.ops.encode import encode_sequences
    from fastsk_tpu.utils.observe import enable_compilation_cache

    enable_compilation_cache()
    reader = FastaUtility()
    Xtr, _ = reader.read_data(f"{DATA}/{args.dataset}.train.fasta")
    Xte, _ = reader.read_data(f"{DATA}/{args.dataset}.test.fasta")
    enc = encode_sequences(Xtr, Xte)
    eng = SortedGkmEngine(enc, args.g, args.m, KernelConfig())
    static = eng._static_kwargs(tri=True)
    log(
        f"{args.dataset}: n={eng.n} p_max={eng.p_max} k={eng.k} "
        f"layout={static['layout']} width={static['run_width']} "
        f"chunk={static['slab']} count_split={static['count_split']} "
        f"n_words={static['n_words']}"
    )
    rng = np.random.default_rng(7)
    k = eng.k

    def fresh_theta(rep):
        return jnp.asarray(
            np.sort(rng.choice(eng.g, size=(1, k), replace=False), axis=1),
            jnp.int32,
        )

    st_nostat = dict(static)
    st_nostat.pop("static_slabs", None)

    @jax.jit
    def f_phase1(thetas):
        lanes, n_slabs, _ = st._batch_phases_runs(
            eng._windows, eng._valid, eng._seq_of, thetas, st_nostat
        )
        # touch every lane so the whole phase lands
        return n_slabs + sum(jnp.take(l.ravel(), 0) for l in lanes)

    @jax.jit
    def f_scatter(thetas):
        lanes, n_slabs, _ = st._batch_phases_runs(
            eng._windows, eng._valid, eng._seq_of, thetas, st_nostat
        )
        pseq, prun, pcount, bnd = lanes
        n, width, chunk = static["n"], static["run_width"], static["slab"]
        nfeat = pseq.shape[1]

        def slab_body(s, acc):
            b0 = jnp.take(bnd[0], s, mode="clip")
            b1 = jnp.take(bnd[0], s + 1, mode="clip")
            r0 = s * width

            def chunk_body(c, cs):
                idx = b0 + c * chunk + jnp.arange(chunk, dtype=jnp.int32)
                live = idx < b1
                idx_c = jnp.clip(idx, 0, nfeat - 1)
                sq = jnp.where(
                    live, jnp.take(pseq[0], idx_c, mode="clip"), n
                )
                rk = jnp.clip(
                    jnp.take(prun[0], idx_c, mode="clip") - r0, 0,
                    width - 1,
                )
                ct = jnp.take(pcount[0], idx_c, mode="clip")
                return cs.at[sq, rk].add(
                    ct.astype(jnp.float32), mode="drop"
                )

            trips = (b1 - b0 + chunk - 1) // chunk
            c_s = jax.lax.fori_loop(
                0, trips, chunk_body, jnp.zeros((n, width), jnp.float32)
            )
            return acc + jnp.sum(c_s)

        return jax.lax.fori_loop(0, n_slabs, slab_body, 0.0)

    @jax.jit
    def f_full(acc, thetas):
        return st.sorted_theta_pass_batch_sum(
            acc, eng._windows, eng._valid, eng._seq_of, thetas, **static
        )

    acc0 = jnp.zeros((eng.n, eng.n), jnp.int32)

    def run(label, fn, *extra):
        best = None
        for rep in range(args.reps):
            th = fresh_theta(rep)
            t0 = time.perf_counter()
            out = fn(*extra, th)
            np.asarray(
                out.ravel()[0] if hasattr(out, "ravel") else out
            )  # transfer = the only barrier on axon
            dt = time.perf_counter() - t0
            log(f"  {label} rep{rep}: {dt * 1e3:.1f} ms")
            best = dt if best is None else min(best, dt)
        return best

    walls = {}
    walls["phase1"] = run("phase1", f_phase1)
    walls["scatter"] = run("scatter", f_scatter)
    walls["full"] = run("full", lambda a, t: f_full(a, t), acc0)

    log("--- attribution (best walls, cumulative prefixes) ---")
    log(f"phase1 (hash+sort+compact): {walls['phase1'] * 1e3:.1f} ms")
    log(
        f"scatter (C_s build):        +{(walls['scatter'] - walls['phase1']) * 1e3:.1f} ms"
    )
    log(
        f"gram (slab matmuls):        +{(walls['full'] - walls['scatter']) * 1e3:.1f} ms"
    )
    log(f"full pass:                  {walls['full'] * 1e3:.1f} ms")
    if args.csv:
        import csv as _csv

        with open(args.csv, "w", newline="") as fh:
            w = _csv.writer(fh)
            w.writerow(["phase", "best_wall_ms"])
            for ph, wall in walls.items():
                w.writerow([ph, f"{wall * 1e3:.1f}"])
        log(f"wrote {args.csv}")


if __name__ == "__main__":
    main()
