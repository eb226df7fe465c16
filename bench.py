#!/usr/bin/env python
"""Headline benchmark: EP300_47848 exact gkm kernel at g=16, m=10.

This is the BASELINE.json north-star workload: all C(16,10) = 8008 exact
counting passes over the 7230-sequence EP300_47848 DNA set (6506 train / 724
test, length 200), against the reference C++ engine's measured single-thread
wall-clock (BASELINE_MEASURED.json: 2.77 s/pass -> 22152 s extrapolated).

Prints ONE JSON line whose primary value is the DEVICE-ONLY wall (the
compute a fit/score workflow pays: exact_device + a 4-byte pull), with the
transfer-inclusive host-pull wall reported alongside in the same object:

    {"metric": ..._device_only_wall, "value": ..., "unit": "s",
     "vs_baseline": ..., "host_pull_wall_s": ..., "host_pull_vs_baseline":
     ..., "mfu_pct": ..., "mfu_dtype": ...}

Rationale (VERDICT r3): the device->host tunnel here moves 5-27 MB/s
depending on the hour, so a host-pull-only headline measures tunnel
weather — ~75-80% of its wall was the 88 MB pull, not compute. Both walls
are now always measured; the compute wall is the headline, the transfer
wall stays visible so regressions in either are attributable.

Usage: python bench.py [--g G] [--m M] [--dataset NAME] [--host-pull-only]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


BASELINE_S = 22152.1  # reference single-thread, see BASELINE_MEASURED.json
DATA = "/root/reference/data"


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="EP300_47848")
    ap.add_argument("--g", type=int, default=16)
    ap.add_argument("--m", type=int, default=10)
    ap.add_argument(
        "--phases", action="store_true",
        help="also report a build/exec/pull phase split per steady run "
             "(attributes wall to device compute vs host transfer)",
    )
    ap.add_argument(
        "--device-only", action="store_true",
        help="measure ONLY the device-resident path (skip the host-pull "
             "secondary measurement)",
    )
    ap.add_argument(
        "--host-pull-only", action="store_true",
        help="measure ONLY the transfer-inclusive exact() path and make "
             "it the primary metric (the pre-round-4 behavior)",
    )
    ap.add_argument(
        "--scale", type=int, default=0, metavar="N",
        help="replace the dataset with the N-sequence synthetic "
             "planted-motif corpus (experiments/run_scale.py) — the "
             "large-N single-chip configuration (device-only implied; "
             "N=30000 fits one v5e)",
    )
    args = ap.parse_args()
    if args.scale:
        args.device_only = True  # the matrix would not fit a host pull budget

    import jax
    import numpy as np

    from fastsk_tpu.io.fasta import FastaUtility
    from fastsk_tpu.kernel.config import KernelConfig
    from fastsk_tpu.kernel.pairs_engine import PairsGkmEngine
    from fastsk_tpu.ops.combinatorics import nchoosek
    from fastsk_tpu.ops.encode import encode_sequences
    from fastsk_tpu.utils.observe import enable_compilation_cache

    # persistent compile cache: the remote compile service varies
    # 20s-10min per program; the second bench invocation must show
    # compile+first-run ~= steady (VERDICT r2 item 4)
    enable_compilation_cache()

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")

    if args.scale:
        import os

        sys.path.insert(
            0,
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "experiments"),
        )
        from run_scale import synth_corpus

        Xtr, _, Xte, _ = synth_corpus(args.scale)
        args.dataset = f"synth{args.scale}"
    else:
        reader = FastaUtility()
        Xtr, _ = reader.read_data(f"{DATA}/{args.dataset}.train.fasta")
        Xte, _ = reader.read_data(f"{DATA}/{args.dataset}.test.fasta")
    enc = encode_sequences(Xtr, Xte)
    g, m = args.g, args.m
    k = g - m
    total_passes = int(nchoosek(g, k))
    log(
        f"{args.dataset}: N={enc.n} (train {enc.n_train}) Lmax={enc.max_len} "
        f"base={enc.hash_base} | g={g} m={m} k={k} passes={total_passes}"
    )

    engine = PairsGkmEngine(enc, g, m, KernelConfig())
    log(
        f"pairs engine: n_pad={engine.n_pad} p_pad={engine.p_pad} "
        f"c_i={engine.c_i} c_j={engine.c_j} strips={engine.n_strips_i}"
    )

    if args.phases:
        phase_split(engine, log)

    pairs = enc.n * (enc.n + 1) / 2 * total_passes

    def measure(run, force, label, fast_cut):
        # first call compiles; report the best of 3-8 steady-state runs
        # (each run rebuilds its device inputs, so remote-execution caches
        # cannot shortcut the measurement; best-of defends against
        # transient contention on shared devices)
        t0 = time.perf_counter()
        counts = force(run())
        log(f"[{label}] compile+first run: {time.perf_counter() - t0:.1f} s")
        walls = []
        t_loop = time.perf_counter()
        for r in range(8):
            t0 = time.perf_counter()
            counts = force(run())
            walls.append(time.perf_counter() - t0)
            log(
                f"[{label}] steady run: {walls[-1]:.2f} s "
                f"({pairs / walls[-1]:.2e} pairs/s)"
            )
            # the shared tunnel/device fluctuates 5-27 MB/s between
            # windows (RESULTS.md transfer characterization): run at
            # least 3, stop early on a plausibly contention-free run,
            # keep retrying contended runs up to a ~10 min budget
            if r >= 2 and (
                min(walls) < fast_cut
                or time.perf_counter() - t_loop > 600
            ):
                break
        wall = min(walls)
        log(
            f"[{label}] best of {len(walls)}: {wall:.2f} s; "
            f"K[0,0]={counts[0, 0]}; pairs/s/chip {pairs / wall:.3e}"
        )
        return wall

    wall_dev = wall_pull = None
    if not args.host_pull_only:
        wall_dev = measure(
            engine.exact_device,
            lambda dc: np.asarray(dc.lo[:1, :1]),
            "device-only",
            fast_cut=3.0,
        )
    if not args.device_only:
        wall_pull = measure(
            engine.exact, lambda k: k, "host-pull", fast_cut=12.0
        )

    # roofline: exact MXU FLOPs of the run vs the chip's dense peak
    from fastsk_tpu.utils import roofline

    rl = roofline.pairs_engine_flops(engine)
    wall_mfu = wall_dev if wall_dev is not None else wall_pull
    log(roofline.format_mfu_line(
        "roofline", rl["flops"], wall_mfu, dev, rl["dtype"]
    ))
    log(
        f"roofline: AI={rl['ai']:.0f} FLOP/HBM-byte, "
        f"{rl['bytes_hbm'] / 2**30:.2f} GiB streamed, "
        f"{rl['live_tiles']} live tiles"
    )
    comp = roofline.pairs_kernel_composite(engine, dev)
    log(roofline.format_composite_line("composite", comp, wall_mfu))
    mfu_frac = roofline.mfu(rl["flops"], wall_mfu, dev, rl["dtype"])

    primary = wall_pull if args.host_pull_only else wall_dev
    suffix = (
        "_exact_kernel_wall" if args.host_pull_only else "_device_only_wall"
    )
    out = {
        "metric": f"{args.dataset}_g{g}_m{m}{suffix}",
        "value": round(primary, 2),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / primary, 1),
    }
    if wall_pull is not None and not args.host_pull_only:
        out["host_pull_wall_s"] = round(wall_pull, 2)
        out["host_pull_vs_baseline"] = round(BASELINE_S / wall_pull, 1)
    if mfu_frac is not None:
        out["mfu_pct"] = round(100 * mfu_frac, 1)
        out["mfu_dtype"] = rl["dtype"]
    if comp.get("bound_s"):
        # bracket: [perfect MXU/VPU overlap, fully serialized chain]
        out["composite_floor_s"] = round(
            max(comp["t_mxu"], comp["t_vpu"]), 2
        )
        out["composite_ceil_s"] = round(comp["bound_s"], 2)
    print(json.dumps(out))


def phase_split(engine, log, reps: int = 3) -> None:
    """Attribute one exact run to build_x / kernel exec / pulls. The
    tunnel is non-stationary (RESULTS.md transfer characterization), so
    the pull share is window-dependent; exec is steady ~2.4 s on v5e."""
    import time as _time

    import jax.numpy as jnp
    import numpy as np

    from fastsk_tpu.ops import pairs_pallas
    from fastsk_tpu.ops.transfer import StreamingTilePuller

    n_i = engine.n_pad // engine.c_i
    n_j = engine.n_pad // engine.c_j
    band = max(1, -(-n_i // 12))
    kwargs = dict(
        g=engine.g, k=engine.k, p_pad=engine.p_pad,
        c_ti=engine.c_i, c_tj=engine.c_j, interpret=False,
    )
    j_lo = (np.arange(n_i) * engine.c_i) // engine.c_j
    for rep in range(reps):
        t0 = _time.perf_counter()
        x = engine._build_x()
        np.asarray(x.ravel()[:1])
        t_bx = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        bandres = []
        for i0 in range(0, n_i, band):
            nb = min(band, n_i - i0)
            bandres.append(
                (i0, nb, pairs_pallas.pairs_kernel_blocks(
                    x, jnp.int32(i0), n_i_band=nb, **kwargs))
            )
        for _, _, b in bandres:
            np.asarray(b[0, -1, 0, :1])
        t_exec = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        puller = StreamingTilePuller()
        handles = []
        for i0, nb, blocks in bandres:
            tiles = blocks.reshape(nb * n_j, engine.c_i, engine.c_j)
            live = np.concatenate(
                [il * n_j + np.arange(j_lo[i0 + il], n_j) for il in range(nb)]
            )
            handles.append(puller.dispatch(tiles, live))
        outs = puller.pull_all(handles)
        t_pull = _time.perf_counter() - t0
        mb = sum(o.nbytes for o in outs) / 2**20
        log(
            f"phases rep{rep}: build_x={t_bx:.2f}s exec={t_exec:.2f}s "
            f"pulls={t_pull:.2f}s ({mb:.0f} MB decoded)"
        )


if __name__ == "__main__":
    main()
