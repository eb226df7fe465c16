#!/usr/bin/env python
"""Phase-attribution probe for the packed band kernel (device-only path).

Splits one PackedPairsEngine.exact_device() run into its phases so the
remaining wall is attributable: build_x, the band Pallas dispatch, the
bands->planes assembly, and the combine/mirror/unsort epilogue. Also
prints the roofline MFU of the band dispatch alone.

    python experiments/probe_band.py --dataset 1.1 --g 8 --m 4
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
    import faulthandler

    faulthandler.dump_traceback_later(120, repeat=True, file=sys.stderr)
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="1.1")
    ap.add_argument("--g", type=int, default=8)
    ap.add_argument("--m", type=int, default=4)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastsk_tpu.io.fasta import FastaUtility
    from fastsk_tpu.kernel.config import KernelConfig
    from fastsk_tpu.kernel.pairs_engine import (
        PackedPairsEngine, _build_packed_x_jit,
    )
    from fastsk_tpu.ops.encode import encode_sequences
    from fastsk_tpu.utils import roofline
    from fastsk_tpu.utils.observe import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]

    reader = FastaUtility()
    Xtr, _ = reader.read_data(f"{DATA}/{args.dataset}.train.fasta")
    Xte, _ = reader.read_data(f"{DATA}/{args.dataset}.test.fasta")
    enc = encode_sequences(Xtr, Xte)
    eng = PackedPairsEngine(enc, args.g, args.m, KernelConfig())
    log(
        f"{args.dataset}: N={enc.n} g={args.g} m={args.m} backend="
        f"{eng.backend} tile={eng.tile} strips={eng.n_strips} "
        f"c_pad={eng.c_pad} digits={eng.n_digits} "
        f"total_rows={eng.total_rows} F={eng.g * eng.alpha}"
    )
    n_pad = eng.n + eng.c_pad

    def block(v):
        # axon's block_until_ready returns before remote execution
        # finishes; a 4-byte element pull is the only real barrier
        # (bench.py's force does the same)
        for a in jax.tree_util.tree_leaves(v):
            np.asarray(a[(0,) * a.ndim])
        return v

    # per-rep DIFFERENT input values: the remote-execution layer
    # content-addresses dispatches, so identical buffers shortcut to
    # ~0 ms. A row roll keeps shapes/dtypes/ranges (timing-identical
    # work) while defeating the cache. The roll is FUSED into the
    # build_x jit on the resident ids buffer — a separate on-device
    # roll (or any eager op / standalone warm-up pull on a device_put
    # buffer) hangs this remote platform, and a host-side roll would
    # charge a ~10 MB per-rep upload to the build_x phase that the
    # real engine pays only once at construction.
    from fastsk_tpu.ops.pairs_packed import build_packed_x

    @functools.partial(
        jax.jit, static_argnames=("g", "alpha", "code_min", "dtype")
    )
    def build_x_rolled(ids, r, seq_of, win_of, *, g, alpha, code_min,
                       dtype):
        return build_packed_x(
            jnp.roll(ids, r, axis=0), seq_of, win_of,
            g=g, alpha=alpha, code_min=code_min, dtype=dtype,
        )

    ids0 = eng._ids
    for rep in range(args.reps):
        rep_dev = jax.device_put(np.int32(rep))
        t0 = time.perf_counter()
        x = block(build_x_rolled(
            ids0, rep_dev, eng._seq_of, eng._win_of,
            g=eng.g, alpha=eng.alpha, code_min=eng.code_min,
            dtype=jnp.int8,
        ))
        t_x = time.perf_counter() - t0

        # band dispatch alone (mirrors _band_planes up to the Pallas call)
        t0 = time.perf_counter()
        planes = block(eng._compute_planes(x, n_pad))
        t_planes = time.perf_counter() - t0

        # epilogue: combine + mirror + unsort (exact_device tail)
        from fastsk_tpu.ops import pairs_packed
        pos = np.empty(eng.n, dtype=np.int64)
        pos[eng.order] = np.arange(eng.n)
        t0 = time.perf_counter()
        k32 = pairs_packed.combine_planes_int32(
            tuple(planes), digit_base=eng.digit_base
        )
        full = jnp.triu(k32) + jnp.triu(k32, 1).T
        full = full[: eng.n, : eng.n]
        full = block(
            jnp.take(jnp.take(full, jnp.asarray(pos), axis=0),
                     jnp.asarray(pos), axis=1))
        t_epi = time.perf_counter() - t0
        total = t_x + t_planes + t_epi
        log(
            f"rep{rep}: build_x={t_x * 1e3:.0f}ms planes={t_planes * 1e3:.0f}ms "
            f"epilogue={t_epi * 1e3:.0f}ms total={total * 1e3:.0f}ms"
        )
        best = dict(
            x=min(t_x, best["x"]), planes=min(t_planes, best["planes"]),
            epi=min(t_epi, best["epi"]),
        ) if rep else dict(x=t_x, planes=t_planes, epi=t_epi)
    t_planes = best["planes"]
    log(
        f"best: build_x={best['x'] * 1e3:.0f}ms planes={t_planes * 1e3:.0f}ms "
        f"epilogue={best['epi'] * 1e3:.0f}ms "
        f"total={sum(best.values()) * 1e3:.0f}ms"
    )

    rl = roofline.packed_engine_flops(eng)
    log(roofline.format_mfu_line(
        "band roofline (planes phase)", rl["flops"], t_planes, dev,
        rl["dtype"],
    ))
    log(
        f"AI={rl['ai']:.0f} FLOP/byte, slots={rl['n_slots']}, "
        f"HBM={rl['bytes_hbm'] / 2**20:.0f} MiB"
    )
    comp = roofline.packed_band_composite(eng, dev)
    log(roofline.format_composite_line("band composite", comp, t_planes))


if __name__ == "__main__":
    main()
