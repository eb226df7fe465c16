"""Pallas TPU kernel for the all-pairs gkm pipeline (ops/pairs.py).

Fuses the three stages — match-count matmul ``D = X_i X_j^T``, the exact
binomial weight ``C(D, k)``, and the window->sequence reduction — inside
VMEM, flash-attention style. The XLA version materializes every [TI, TJ]
D tile (and its weights) in HBM; here only the one-hot window encodings
stream in and a tiny [c_ti, c_tj] int32 partial-kernel block goes out, so
HBM traffic drops by ~p_pad^2 / 1 and the MXU stays busy.

Weight evaluation: the falling factorial d(d-1)...(d-k+1) is computed with
balanced factor pairing — (d-i)(d-(k-1-i)) = t + i(k-1-i) with
t = d^2 - (k-1)d — so it costs ~k/2 multiplies and stays an exact f32
integer whenever g!/(g-k)! < 2^24; one final division by k! (whose true
quotient is the integer C(d, k)) is exact in f32. Larger (g, k) shapes
use the stepwise division form (binom_exact in ops/pairs.py), exact for
every g <= 20.

Exactness of the reductions: weights <= C(20,10) < 2^24 (f32 integers,
converted exactly to int32); both reduction stages run in int32, bounded
by p_pad^2 * C(g,k) < 2^31 — the same bound the engine already guards for
its int32 kernel entries, so every engine-admitted shape is exact here.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def d_chunk(ti: int, tj: int) -> int:
    """Shared D-tile chunking rule for the pairs kernels.

    The [ti, chunk] int32 match-count tile is capped at ~12 MB of VMEM
    with a 384-lane chunk floor: narrower chunks starve the pipeline
    (measured v5e headline, probe_pairs --ci 32: chunk 384 -> 1.36 s,
    chunk 192 -> 1.88 s), wider ones trade VMEM for nothing (chunk 768
    == chunk 384 within noise). The engine's c_i budget loop
    (pairs_engine) uses the same rule so its VMEM estimate matches what
    the kernel actually allocates.
    """
    n_chunks = 1
    while (
        ti * (tj // n_chunks) * 4 > 12 * 2**20
        and (tj // n_chunks) >= 2 * 384
    ):
        n_chunks *= 2
    while tj % n_chunks:
        n_chunks //= 2
    return tj // n_chunks


def ffact_pairing(d: jnp.ndarray, k: int) -> jnp.ndarray:
    """Falling factorial d(d-1)...(d-k+1) with balanced factor pairing."""
    if k == 1:
        return d
    t = d * (d - float(k - 1))
    prod = t
    for i in range(1, k // 2):
        prod = prod * (t + float(i * (k - 1 - i)))
    if k % 2:
        prod = prod * (d - float((k - 1) // 2))
    return prod


def ffact_pairing_i32(d: jnp.ndarray, k: int) -> jnp.ndarray:
    """Falling factorial d(d-1)...(d-k+1) natively in int32.

    Same balanced pairing as :func:`ffact_pairing` but with NO dtype
    casts: ``d`` stays the int32 the int8 MXU produced.  Exact whenever
    the result fits int32 (callers guard ``g!/(g-k)! < 2^24``, far
    inside).  Measured on the v5e headline bench (experiments/
    probe_pairs.py, round 5): the f32 chain (cast + ~k f32 ops + cast)
    costs +1.59 s over the matmul+reduction skeleton; this int32 chain
    costs +0.61 s — a 1.64x kernel-level speedup at identical checksums.
    """
    if k == 1:
        return d
    t = d * (d - (k - 1))
    prod = t
    for i in range(1, k // 2):
        prod = prod * (t + i * (k - 1 - i))
    if k % 2:
        prod = prod * (d - (k - 1) // 2)
    return prod


def binom_weight(d: jnp.ndarray, g: int, k: int) -> jnp.ndarray:
    """Exact C(d, k) for integer-valued f32 d in [0, g].

    The divide-by-k! is a round-multiply: the true quotient is an integer
    <= C(20, 10) < 2^18 and the reciprocal-multiply error is ~1e-7
    relative, far below 1/2, so rounding recovers it exactly — and a
    multiply+round is several times cheaper than an f32 divide on the VPU.
    """
    if math.factorial(g) // math.factorial(g - k) < (1 << 24):
        w = ffact_pairing(d, k) * (1.0 / float(math.factorial(k)))
        return jnp.round(w)
    from .pairs import binom_exact

    return binom_exact(d, k)


def _pairs_kernel(
    i0_ref,  # [1] int32 scalar prefetch: band start (in i-block units)
    xi_ref,  # [TI, F] bf16 or int8
    xj_ref,  # [TJ, F] bf16 or int8
    out_ref,  # [1, 1, c_ti, c_tj] int32
    s1_ref,  # [c_ti, TJ] int32 scratch
    *,
    g: int,
    k: int,
    p_pad: int,
    c_ti: int,
    c_tj: int,
    n_chunks: int,
):
    i = i0_ref[0] + pl.program_id(0)
    j = pl.program_id(1)
    ti = c_ti * p_pad
    tj = c_tj * p_pad
    chunk = tj // n_chunks
    int8_in = xi_ref.dtype == jnp.int8
    # Deferred /k!: land the falling factorial ff = k! * C(d, k) per
    # element and divide once per s1 slice (p_pad times fewer elements)
    # — any sum of ff values is k!-divisible, so the division commutes
    # with stage 1. Drops the per-element reciprocal-multiply + round
    # from the VPU weight chain. Measured NEUTRAL on the v5e headline
    # (2.04 vs 2.03 s — the wall is not purely VPU-op-count-bound);
    # kept because it shortens the per-element dependency chain at zero
    # measured cost and is exactness-tested at the bound
    # (tests/test_overflow_guards.py). Exactness needs
    # (a) ff exact in f32: g!/(g-k)! < 2^24 (same bound as the fast
    # binom path), (b) the int32 stage-1 sum in range:
    # p_pad * g!/(g-k)! < 2^31, and (c) the s1-level round-multiply to
    # recover the exact integer S = s1/k!: cast + reciprocal + product
    # rounding compose to |r - S| < S * 2^-22, so S = p_pad * C(g, k)
    # < 2^21 guarantees error < 0.5 (EP300 headline: 192 * 8008 =
    # 1.54e6 < 2^21).
    ffmax = math.factorial(g) // math.factorial(g - k)
    defer_div = (
        ffmax < (1 << 24)
        and p_pad * ffmax < (1 << 31)
        and p_pad * math.comb(g, k) < (1 << 21)
    )
    # skip tiles strictly below the window-space diagonal (mirrored later)
    live = (j + 1) * tj > i * ti

    @pl.when(live)
    def _():
        xi = xi_ref[:]
        # inner loop over q chunks keeps the D tile bounded in VMEM while
        # the program covers a wide (lane-aligned) span of j sequences
        for c in range(n_chunks):
            d = jax.lax.dot_general(
                xi,
                xj_ref[c * chunk : (c + 1) * chunk, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                # int8 path: 0/1 operands on the int8 MXU (2x bf16 peak),
                # exact int32 match counts <= g
                preferred_element_type=jnp.int32 if int8_in else jnp.float32,
            )  # [TI, chunk] — match counts, exact small integers
            if int8_in and ffmax < (1 << 24):
                # int32-native weight chain: the match counts stay in the
                # int32 the int8 MXU produced, the falling factorial runs
                # in int32 (< 2^24, exact), and the /k! happens either on
                # the s1 slice (defer_div) or per-element via one f32
                # round-multiply (ff < 2^24 is f32-exact; quotient
                # C(g,k) <= C(20,10) < 2^18 so rounding recovers it).
                # Measured (probe_pairs.py, v5e): 2.53 -> 1.55 s headline
                # vs the f32 chain — the two dtype casts plus f32 mul
                # latency were ~60% of the whole kernel wall.
                w = ffact_pairing_i32(d, k)
                if not defer_div:
                    w = jnp.round(
                        w.astype(jnp.float32)
                        * (1.0 / float(math.factorial(k)))
                    ).astype(jnp.int32)
            else:
                if int8_in:
                    d = d.astype(jnp.float32)
                if defer_div:
                    w = ffact_pairing(d, k).astype(jnp.int32)
                else:
                    w = binom_weight(d, g, k).astype(jnp.int32)
            # windows -> sequences, stage 1: sum over the p axis (sublane-
            # group reshape-sum) in int32 — exact to 2^31, covered by the
            # engine's p_pad^2 * C(g,k) < 2^31 guard (defer_div: by the
            # p_pad * ffmax < 2^31 bound above).
            # NEGATIVE RESULT (measured, v5e headline bench): summing in
            # f32 to move the int32 cast onto the p_pad-times-smaller s1
            # slice REGRESSED 2.03 -> 3.75 s — Mosaic's int32 sublane
            # reshape-sum is ~2x faster than the f32 one, and the
            # per-element cast is effectively free next to the weight
            # chain. Keep the cast per element; defer only the /k!.
            s1 = jnp.sum(w.reshape(c_ti, p_pad, chunk), axis=1)
            if defer_div:
                # exact integer recovery per the error bound above
                s1 = jnp.round(
                    s1.astype(jnp.float32)
                    * (1.0 / float(math.factorial(k)))
                ).astype(jnp.int32)
            s1_ref[:, c * chunk : (c + 1) * chunk] = s1
        # stage 2: sum over the q axis in int32; the transpose keeps the
        # group reshape on the sublane dim
        s1t = s1_ref[:].T  # [tj, c_ti]
        out = jnp.sum(s1t.reshape(c_tj, p_pad, c_ti), axis=1)  # [c_tj, c_ti]
        out_ref[0, 0] = out.T

    @pl.when(jnp.logical_not(live))
    def _():
        out_ref[0, 0] = jnp.zeros((c_ti, c_tj), jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("g", "k", "p_pad", "c_ti", "c_tj", "n_i_band", "interpret"),
)
def pairs_kernel_blocks(
    x: jnp.ndarray,  # [n_rows, F] bf16 or int8, n_rows = n_pad * p_pad
    i0: jnp.ndarray = None,  # scalar int32 — band start (i-block units)
    *,
    g: int,
    k: int,
    p_pad: int,
    c_ti: int,
    c_tj: int,
    n_i_band: int = 0,  # 0 = all i blocks in one call
    interpret: bool = False,
) -> jnp.ndarray:
    """Upper-triangular partial kernel blocks ``[n_i_band, n_j, c_ti, c_tj]``
    for the i-block band starting at ``i0``.

    Caller assembles: transpose(0,2,1,3).reshape(rows, n_pad), then
    triu + mirror. Banding lets the engine stream each band's result to
    the host while later bands compute (the full matrix is ~200 MB on the
    headline shapes and the device->host link is the bottleneck).
    """
    n_rows, f = x.shape
    ti = c_ti * p_pad
    tj = c_tj * p_pad
    assert n_rows % ti == 0 and n_rows % tj == 0, (n_rows, ti, tj)
    n_i = n_rows // ti
    n_j = n_rows // tj
    if not n_i_band:
        n_i_band = n_i
    if i0 is None:
        i0 = jnp.int32(0)

    # chunk the q axis inside the kernel (shared rule, see d_chunk)
    n_chunks = tj // d_chunk(ti, tj)

    kernel = functools.partial(
        _pairs_kernel,
        g=g,
        k=k,
        p_pad=p_pad,
        c_ti=c_ti,
        c_tj=c_tj,
        n_chunks=n_chunks,
    )
    flops = 2 * (n_i_band * ti) * n_rows * f // 2  # triangular
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_i_band, n_j),
        in_specs=[
            pl.BlockSpec((ti, f), lambda i, j, i0: (i0[0] + i, 0)),
            pl.BlockSpec((tj, f), lambda i, j, i0: (j, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, c_ti, c_tj), lambda i, j, i0: (i, j, 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((c_ti, tj), jnp.int32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_i_band, n_j, c_ti, c_tj), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * n_rows * f * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(i0, jnp.int32).reshape(1), x, x)
