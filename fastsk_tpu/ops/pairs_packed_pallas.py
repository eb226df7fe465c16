"""Pallas TPU kernel for the packed (ragged) pairs engine's hot stage.

The XLA packed path (ops/pairs_packed.py) materializes every [T, T] f32
match-count tile D in HBM, reads it back for the binomial weight, and
re-reads the weight once per digit plane — on ragged protein/NLP data the
D traffic dominates (16 MB per strip pair at T=2048). This kernel fuses

    D = X_a X_b^T  ->  C(D, k)  ->  base-256 digit split  ->  G_a-matmul

inside VMEM: only the one-hot window strips stream in and the tiny
``[n_digits, c_pad, T]`` stage-1 planes go out (~1 MB per pair), a ~16x
HBM-traffic reduction on the dominant stage. Stage 2 (int32 cumsum +
boundary gather + plane scatter) stays in XLA — its traffic is small and
keeping it unchanged keeps the integer math bit-identical to the XLA
backend and the reference semantics (shared.cpp:268-333).

Exactness (same invariants as the XLA path): D is an exact f32 integer
(0/1 bf16 operands, sums <= g); C(D, k) is exact via binom_weight; digit
extraction is the identical floor/multiply sequence; digits <= 255 ride
the bf16 stage-1 matmul exactly, accumulating to <= T * 255 < 2^24 in f32.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pairs_pallas import binom_weight, ffact_pairing_i32


def land_bits(ga_dtype) -> int:
    """Bits per stage-2 split plane: 8 for the bf16 landing maps, 7 for
    int8 maps (split values must fit the signed int8 MXU operand)."""
    return 7 if ga_dtype == jnp.int8 else 8


def _weights_from_counts(d, g: int, k: int):
    """Exact binomial weights C(d, k) from MXU match counts ``d``.

    int8-MXU path with ff < 2^24 (round 5): the falling factorial runs
    natively in the int32 the MXU produced (no casts — measured 1.64x on
    the seq-aligned headline kernel, experiments/probe_pairs.py), and
    the exact /k! is one f32 round-multiply (ff f32-exact below 2^24,
    quotient C(g,k) <= C(20,10) < 2^18 so rounding recovers it) landing
    back in int32 so _land_stages can digit-split with bit ops.
    Otherwise: the f32 chain via binom_weight.
    """
    ffmax = math.factorial(g) // math.factorial(g - k)
    if d.dtype == jnp.int32 and ffmax < (1 << 24):
        return jnp.round(
            ffact_pairing_i32(d, k).astype(jnp.float32)
            * (1.0 / float(math.factorial(k)))
        ).astype(jnp.int32)
    if d.dtype == jnp.int32:
        d = d.astype(jnp.float32)
    return binom_weight(d, g, k)


def _land_stages(
    part_ref,  # [n_digits, c_pad, c_land] int32 scratch (accumulated)
    rem,  # [T(chunk rows), chunk] f32 — exact integer binomial weights
    ga,  # [c_pad, T] bf16/int8 one-hot
    gb,  # [chunk, c_land] bf16/int8 one-hot
    *,
    n_digits: int,
    digit_base: int,
    n_bytes: int,
):
    """Digit-plane landings for one (a, b) chunk: the base-``digit_base``
    digit split of the weights, stage 1 (rows -> i sequences), and the
    byte-split stage 2 (columns -> j sequences), accumulated into
    ``part_ref`` (int32, exact).

    Two operand modes, keyed by the landing maps' dtype:

    - bf16 (digit_base up to 256): digits <= 255 are bf16-exact, stage
      sums <= T * 255 < 2^24 are f32-exact, and stage 2 splits the
      int32-ranged s1 into 8-bit planes;
    - int8 (digit_base <= 128): digits <= 127 fit the signed int8 MXU
      operand, both stages accumulate exactly in int32 on the int8 MXU
      (2x bf16 peak on v5e), and stage 2 splits s1 into 7-bit planes.
    """
    int8_land = ga.dtype == jnp.int8
    bits = land_bits(ga.dtype)
    op_t = jnp.int8 if int8_land else jnp.bfloat16
    acc_t = jnp.int32 if int8_land else jnp.float32
    i32_rem = rem.dtype == jnp.int32
    if i32_rem:
        # int32 weights (round-5 chain): digit_base is always a power of
        # two (the engine halves down from 256), so the digit split is
        # two VPU bit-ops instead of the floor/multiply f32 sequence
        assert digit_base & (digit_base - 1) == 0, digit_base
        base_shift = digit_base.bit_length() - 1
    for dig in range(n_digits):
        if dig + 1 < n_digits:
            if i32_rem:
                digit = jnp.bitwise_and(rem, digit_base - 1)
                rem = jax.lax.shift_right_logical(rem, base_shift)
            else:
                q = jnp.floor(rem * (1.0 / digit_base))
                digit = rem - q * float(digit_base)
                rem = q
        else:
            digit = rem
        s1 = jax.lax.dot_general(
            ga,
            digit.astype(op_t),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_t,
        ).astype(jnp.int32)  # [c_pad, chunk], exact integers
        for byte in range(n_bytes):
            b_val = jnp.bitwise_and(
                jax.lax.shift_right_logical(s1, bits * byte),
                (1 << bits) - 1,
            )
            m = jax.lax.dot_general(
                b_val.astype(op_t),
                gb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc_t,
            )  # sums <= chunk * (2^bits - 1): f32-exact / int32 native
            part_ref[dig] += (1 << (bits * byte)) * m.astype(jnp.int32)


def _packed_s1_kernel(
    ab_ref,  # [2] int32 scalar prefetch: (a_strip, b_strip)
    xa_ref,  # [T, F] bf16 — strip a rows
    xb_ref,  # [chunk, F] bf16 — strip b column chunk
    ga_ref,  # [c_pad, T] bf16 — one-hot rows -> local i-seq map of strip a
    out_ref,  # [n_digits, c_pad, chunk] f32
    *,
    g: int,
    k: int,
    n_digits: int,
    digit_base: int,
):
    del ab_ref  # consumed by the index maps
    d = jax.lax.dot_general(
        xa_ref[:],
        xb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, chunk] — match counts, exact integers <= g
    rem = binom_weight(d, g, k)  # exact f32 integer C(d, k)
    ga = ga_ref[:]
    for dig in range(n_digits):
        if dig + 1 < n_digits:
            q = jnp.floor(rem * (1.0 / digit_base))
            digit = rem - q * float(digit_base)
            rem = q
        else:
            digit = rem
        # digits <= base-1 <= 255: bf16-exact operands; sums <= T * 255
        # < 2^24: f32-exact accumulation
        out_ref[dig] = jax.lax.dot_general(
            ga,
            digit.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "g", "k", "tile", "c_pad", "n_digits", "digit_base", "interpret"
    ),
)
def packed_s1_pallas(
    x: jnp.ndarray,  # [R, F] bf16 packed one-hot window rows
    ga: jnp.ndarray,  # [c_pad, tile] bf16
    a_strip: jnp.ndarray,  # scalar int32
    b_strip: jnp.ndarray,  # scalar int32
    *,
    g: int,
    k: int,
    tile: int,
    c_pad: int,
    n_digits: int,
    digit_base: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Stage-1 digit planes ``[n_digits, c_pad, tile]`` f32 for one strip
    pair, fused in VMEM. Grid runs over column chunks of strip b."""
    r, f = x.shape
    assert r % tile == 0
    # D chunk tile <= ~4 MB f32 in VMEM
    chunk = tile
    while tile * chunk * 4 > 4 * 2**20:
        chunk //= 2
    chunk = min(max(chunk, 128), tile)
    n_chunks = tile // chunk

    ab = jnp.stack(
        [a_strip.astype(jnp.int32), b_strip.astype(jnp.int32)]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((tile, f), lambda c, ab: (ab[0], 0)),
            pl.BlockSpec(
                (chunk, f), lambda c, ab: (ab[1] * (tile // chunk) + c, 0)
            ),
            pl.BlockSpec((c_pad, tile), lambda c, ab: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (n_digits, c_pad, chunk), lambda c, ab: (0, 0, c)
        ),
    )
    kernel = functools.partial(
        _packed_s1_kernel,
        g=g,
        k=k,
        n_digits=n_digits,
        digit_base=digit_base,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_digits, c_pad, tile), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * tile * tile * f + 2 * n_digits * c_pad * tile * tile,
            bytes_accessed=2 * tile * f * 2 + n_digits * c_pad * tile * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ab, x, x, ga)


# --------------------------------------------------------------------------
# Fully-fused variant: stage 2 moves into the kernel too. The cumsum +
# boundary gather of the XLA path becomes a one-hot matmul against the
# per-row local-j-sequence map, with the int32-ranged s1 split into 8-bit
# byte planes so every matmul operand stays bf16-exact. Output per strip
# pair collapses from [n_digits, c_pad, T] stage-1 planes (~1 MB) to
# [n_digits, c_pad, c_pad] part blocks (~25 KB), and a GROUP of strips b is
# processed per call so the XLA-side dispatch cost amortizes over
# ``group`` pairs — the measured bottleneck of the packed path was op
# dispatch in the per-pair fori, not FLOPs.
#
# Exactness: s1 is an exact f32 integer < tile * (digit_base - 1) + 1
# (stage-1 invariant above); its base-256 bytes are <= 255 (bf16-exact
# operands against a 0/1 one-hot), each byte-matmul accumulates to
# <= tile * 255 < 2^24 (f32-exact), and the byte recombination
# sum_b 256^b * m_b runs in int32 where every term and partial sum is
# bounded by the true part value, itself < 2^31 by the engine's digit-base
# selection (ops/pairs_packed.py).
# --------------------------------------------------------------------------


def _packed_part_kernel(
    ab_ref,  # [2] int32 scalar prefetch: (a_strip, group_idx)
    xa_ref,  # [T, F] bf16 — strip a rows
    xb_ref,  # [chunk, F] bf16 — member strip column chunk
    ga_ref,  # [c_pad, T] bf16 — strip a rows -> local i-seq one-hot
    gb_ref,  # [chunk, c_pad] bf16 — member rows -> local j-seq one-hot
    out_ref,  # [n_digits, 1, c_pad, c_pad] int32 — member's part blocks
    part_ref,  # [n_digits, c_pad, c_pad] int32 scratch
    *,
    g: int,
    k: int,
    n_digits: int,
    digit_base: int,
    n_bytes: int,
    c_pad: int,
    n_chunks: int,
):
    del ab_ref
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        part_ref[...] = jnp.zeros(part_ref.shape, part_ref.dtype)

    d = jax.lax.dot_general(
        xa_ref[:],
        xb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, chunk] — match counts, exact integers <= g
    rem = binom_weight(d, g, k)
    _land_stages(
        part_ref, rem, ga_ref[:], gb_ref[:],
        n_digits=n_digits, digit_base=digit_base, n_bytes=n_bytes,
    )

    @pl.when(c == n_chunks - 1)
    def _():
        for dig in range(n_digits):
            out_ref[dig, 0] = part_ref[dig]


# --------------------------------------------------------------------------
# Pair-list variant: one call sweeps a SLAB of arbitrary (a, b) strip pairs.
# The grouped kernel above still wastes the sub-diagonal members of the
# first group per a strip (up to group-1 pair computations, ~20% on
# mid-size sets) and leaves ``group * n_digits`` per-pair RMW chains to
# XLA. Here a scalar-prefetched pair list (pa, pb) drives the BlockSpec
# index maps directly, so the grid covers exactly the upper-triangle
# pairs, one Pallas dispatch amortizes over the whole slab, and the
# caller lands all part blocks with a single scatter-add
# (ops/pairs_packed.py: packed_pairlist_sweep). The D-matmul additionally
# runs on the int8 MXU (0/1 operands, 2x bf16 peak on v5e) when ``x`` is
# int8 — match counts are exact int32 <= g either way.
#
# Exactness: identical invariants to the grouped kernel (module comment
# above); the int8 path produces exact integer match counts <= g in
# int32, converted exactly to f32 for the binomial weight.
# --------------------------------------------------------------------------


def _packed_pairlist_kernel(
    pa_ref,  # [S] int32 scalar prefetch: a strip per slab slot
    pb_ref,  # [S] int32 scalar prefetch: b strip per slab slot
    xa_ref,  # [T, F] bf16/int8 — strip a rows
    xb_ref,  # [chunk, F] bf16/int8 — strip b column chunk
    ga_ref,  # [1, c_pad, T] bf16 — strip a rows -> local i-seq one-hot
    gb_ref,  # [chunk, c_pad] bf16 — strip b rows -> local j-seq one-hot
    out_ref,  # [1, n_digits, c_pad, c_pad] int32 — this pair's part blocks
    part_ref,  # [n_digits, c_pad, c_pad] int32 scratch
    *,
    g: int,
    k: int,
    n_digits: int,
    digit_base: int,
    n_bytes: int,
    n_chunks: int,
):
    del pa_ref, pb_ref  # consumed by the index maps
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        part_ref[...] = jnp.zeros(part_ref.shape, part_ref.dtype)

    int8_in = xa_ref.dtype == jnp.int8
    d = jax.lax.dot_general(
        xa_ref[:],
        xb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        # int8 path: 0/1 operands on the int8 MXU; exact int32 counts <= g
        preferred_element_type=jnp.int32 if int8_in else jnp.float32,
    )  # [T, chunk] — match counts, exact small integers
    rem = _weights_from_counts(d, g, k)
    _land_stages(
        part_ref, rem, ga_ref[0], gb_ref[:],
        n_digits=n_digits, digit_base=digit_base, n_bytes=n_bytes,
    )

    @pl.when(c == n_chunks - 1)
    def _():
        for dig in range(n_digits):
            out_ref[0, dig] = part_ref[dig]


@functools.partial(
    jax.jit,
    static_argnames=(
        "g", "k", "tile", "c_pad", "n_digits", "digit_base", "interpret"
    ),
)
def packed_pairlist_pallas(
    x: jnp.ndarray,  # [R, F] bf16/int8 packed one-hot window rows
    ga_all: jnp.ndarray,  # [n_strips, c_pad, tile] bf16
    gb_all: jnp.ndarray,  # [R, c_pad] bf16
    pa: jnp.ndarray,  # [S] int32 — a strip per slab slot
    pb: jnp.ndarray,  # [S] int32 — b strip per slab slot
    *,
    g: int,
    k: int,
    tile: int,
    c_pad: int,
    n_digits: int,
    digit_base: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Part blocks ``[S, n_digits, c_pad, c_pad]`` int32 for the strip
    pairs ``(pa[s], pb[s])``, fully fused in VMEM, one dispatch."""
    r, f = x.shape
    assert r % tile == 0, (r, tile)
    (s,) = pa.shape
    import os

    xsz = 1 if x.dtype == jnp.int8 else 2

    def vmem_need(chunk):
        # D tile + double-buffered operands + part scratch + out block
        # + the prefetched pair lists; must fit the 16 MB scoped budget
        return (
            tile * chunk * 4
            + 2 * (tile * f + chunk * f) * xsz
            + 2 * c_pad * tile * 2
            + 2 * chunk * c_pad * 2
            + 3 * n_digits * c_pad * c_pad * 4
            + 2 * s * 4
        )

    cap = int(os.environ.get("FASTSK_VMEM_CAP_MB", "15")) * 2**20
    chunk = tile
    while chunk > 128 and vmem_need(chunk) > cap:
        chunk //= 2
    chunk = min(max(chunk, 128), tile)
    n_chunks = tile // chunk
    bits = land_bits(ga_all.dtype)
    n_bytes = -(-(tile * (digit_base - 1)).bit_length() // bits)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s, n_chunks),
        in_specs=[
            pl.BlockSpec((tile, f), lambda p, c, pa, pb: (pa[p], 0)),
            pl.BlockSpec(
                (chunk, f),
                lambda p, c, pa, pb, _n=n_chunks: (pb[p] * _n + c, 0),
            ),
            pl.BlockSpec((1, c_pad, tile), lambda p, c, pa, pb: (pa[p], 0, 0)),
            pl.BlockSpec(
                (chunk, c_pad),
                lambda p, c, pa, pb, _n=n_chunks: (pb[p] * _n + c, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_digits, c_pad, c_pad), lambda p, c, pa, pb: (p, 0, 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((n_digits, c_pad, c_pad), jnp.int32)],
    )
    kernel = functools.partial(
        _packed_pairlist_kernel,
        g=g,
        k=k,
        n_digits=n_digits,
        digit_base=digit_base,
        n_bytes=n_bytes,
        n_chunks=n_chunks,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (s, n_digits, c_pad, c_pad), jnp.int32
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * tile * tile * f,
            bytes_accessed=s * (2 * tile * f + n_digits * c_pad * c_pad * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(pa, pb, x, x, ga_all, gb_all)


@functools.partial(
    jax.jit,
    static_argnames=(
        "g", "k", "tile", "c_pad", "n_digits", "digit_base", "group",
        "interpret",
    ),
)
def packed_part_pallas(
    x: jnp.ndarray,  # [R, F] bf16 packed one-hot window rows
    ga: jnp.ndarray,  # [c_pad, tile] bf16 — strip a row -> local i-seq map
    gb_all: jnp.ndarray,  # [R, c_pad] bf16 — global row -> local j-seq map
    a_strip: jnp.ndarray,  # scalar int32
    group_idx: jnp.ndarray,  # scalar int32 — which group of b strips
    *,
    g: int,
    k: int,
    tile: int,
    c_pad: int,
    n_digits: int,
    digit_base: int,
    group: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fully-fused part blocks ``[n_digits, group, c_pad, c_pad]`` int32
    for strip a against the ``group`` strips b = group_idx*group + u."""
    r, f = x.shape
    assert r % (tile * group) == 0, (r, tile, group)
    chunk = tile
    while tile * chunk * 4 > 4 * 2**20:
        chunk //= 2
    chunk = min(max(chunk, 128), tile)
    n_chunks = tile // chunk
    # split planes for the stage-1 range: s1 <= tile * (digit_base - 1)
    bits = land_bits(ga.dtype)
    n_bytes = -(-(tile * (digit_base - 1)).bit_length() // bits)

    ab = jnp.stack(
        [a_strip.astype(jnp.int32), group_idx.astype(jnp.int32)]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(group, n_chunks),
        in_specs=[
            pl.BlockSpec((tile, f), lambda u, c, ab: (ab[0], 0)),
            pl.BlockSpec(
                (chunk, f),
                lambda u, c, ab, _n=n_chunks, _g=group: (
                    (ab[1] * _g + u) * _n + c, 0
                ),
            ),
            pl.BlockSpec((c_pad, tile), lambda u, c, ab: (0, 0)),
            pl.BlockSpec(
                (chunk, c_pad),
                lambda u, c, ab, _n=n_chunks, _g=group: (
                    (ab[1] * _g + u) * _n + c, 0
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_digits, 1, c_pad, c_pad), lambda u, c, ab: (0, u, 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((n_digits, c_pad, c_pad), jnp.int32)],
    )
    kernel = functools.partial(
        _packed_part_kernel,
        g=g,
        k=k,
        n_digits=n_digits,
        digit_base=digit_base,
        n_bytes=n_bytes,
        c_pad=c_pad,
        n_chunks=n_chunks,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_digits, group, c_pad, c_pad), jnp.int32
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * group * tile * tile * f,
            bytes_accessed=group * tile * f * 2 + tile * f * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ab, x, x, ga, gb_all)


# --------------------------------------------------------------------------
# Band variant: the pair-list kernel's remaining XLA-side cost is the
# scatter-add of 2S [c_pad, c_pad] part blocks onto the digit planes
# (~0.4 s of protein 1.1's 1.05 s device wall). Here each strip a
# accumulates its ENTIRE plane row band [n_digits, c_pad, W] in VMEM
# across all its (a, b) pairs — the pair list is sorted by a, so the
# band lives in the out block and Pallas's revisit semantics flush it to
# HBM exactly once, when a changes. Two structural wins:
#
# - no scatter: the XLA side lands n_strips dense bands (one
#   dynamic-slice add each) instead of 2S scattered windows;
# - no transpose copies: with sequences packed in order, every window of
#   seq i precedes every window of seq j > i, so the strip pair
#   (strip(u), strip(v)) of any window pair of (i < j) always has
#   a <= b — the upper triangle of the assembled matrix is COMPLETE from
#   the (fa, fb) landings alone, and callers reconstruct the lower
#   triangle by mirroring (which exact_device / _planes_to_host already
#   do; the engine's band path mirrors in its int64 fallback too).
#
# Exactness: the per-pair part arithmetic is the identical D -> binomial
# -> digit -> stage-1 -> byte-split sequence of the pair-list kernel;
# only the landing changed, and int32 adds commute.
# --------------------------------------------------------------------------


def band_vmem_need(
    chunk, *, tile, f, xsz, c_pad, c_land, w, n_digits, slots
):
    """Scoped-memory estimate of one band-kernel step: D tile +
    double-buffered operand blocks + resident band out block + part
    scratch + the prefetched slot lists (3 int32 arrays, SMEM-resident
    but counted against the same scoped budget). ``xsz`` sizes both the
    window rows and the landing maps (int8 or bf16 together)."""
    return (
        tile * chunk * 4
        + 2 * (tile * f + chunk * f) * xsz
        + 2 * c_pad * tile * xsz
        + 2 * chunk * c_land * xsz
        + 2 * n_digits * c_pad * w * 4
        + n_digits * c_pad * c_land * 4
        + 3 * slots * 4
    )


def band_vmem_feasible(
    *, tile, f, xsz, c_pad, c_land, w, n_digits, slots
) -> bool:
    """True when the band kernel fits the scoped budget at SOME chunk —
    the engine falls back to the slabbed pair-list sweep otherwise
    (chunk-independent terms like the band block scale with tile and
    plane width and can exceed the cap on their own)."""
    import os

    cap = int(os.environ.get("FASTSK_VMEM_CAP_MB", "15")) * 2**20
    return band_vmem_need(
        128, tile=tile, f=f, xsz=xsz, c_pad=c_pad, c_land=c_land,
        w=w, n_digits=n_digits, slots=slots,
    ) <= cap


def _packed_band_kernel(
    pa_ref,  # [S] int32 scalar prefetch: a strip per slot (sorted)
    pb_ref,  # [S] int32 scalar prefetch: b strip per slot
    fb_ref,  # [S] int32 scalar prefetch: first_seq[b] // 128 (block index)
    xa_ref,  # [T, F] bf16/int8 — strip a rows
    xb_ref,  # [chunk, F] bf16/int8 — strip b column chunk
    ga_ref,  # [1, c_pad, T] bf16/int8
    gb_ref,  # [chunk, c_land] bf16/int8 — one-hot pre-shifted by fb % 128
    band_ref,  # out [1, n_digits, c_pad, W] int32 — strip a's row band
    part_ref,  # [n_digits, c_pad, c_land] int32 scratch
    *,
    g: int,
    k: int,
    n_digits: int,
    digit_base: int,
    n_bytes: int,
    n_chunks: int,
    c_pad: int,
    c_land: int,
):
    # NOTE: no padding slots — the grid covers exactly the caller's slot
    # list, so every slot is live (the per-slot mask a pairlist-style
    # padded slab needs would cost one VPU multiply over the whole
    # [T, chunk] weight tile per step, ~5% of the kernel's VPU budget).
    p = pl.program_id(0)
    c = pl.program_id(1)
    a_first = (p == 0) | (pa_ref[p] != pa_ref[jnp.maximum(p - 1, 0)])

    @pl.when(a_first & (c == 0))
    def _():
        band_ref[...] = jnp.zeros(band_ref.shape, band_ref.dtype)

    @pl.when(c == 0)
    def _():
        part_ref[...] = jnp.zeros(part_ref.shape, part_ref.dtype)

    int8_in = xa_ref.dtype == jnp.int8
    d = jax.lax.dot_general(
        xa_ref[:],
        xb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32 if int8_in else jnp.float32,
    )  # [T, chunk] — match counts, exact small integers
    rem = _weights_from_counts(d, g, k)
    _land_stages(
        part_ref, rem, ga_ref[0], gb_ref[:],
        n_digits=n_digits, digit_base=digit_base, n_bytes=n_bytes,
    )

    @pl.when(c == n_chunks - 1)
    def _():
        # Mosaic requires lane starts provably 128-aligned: fb_ref holds
        # the landing COLUMN BLOCK (fb // 128) and gb's one-hot columns
        # are pre-shifted by the fb % 128 residue (build_gb_land), so
        # the in-VMEM add starts exactly at a lane-tile boundary.
        col0 = fb_ref[p] * 128
        for dig in range(n_digits):
            band_ref[0, dig, :, pl.ds(col0, c_land)] += part_ref[dig]


@functools.partial(
    jax.jit,
    static_argnames=(
        "g", "k", "tile", "c_pad", "c_land", "w", "n_strips", "n_digits",
        "digit_base", "interpret",
    ),
)
def packed_band_pallas(
    x: jnp.ndarray,  # [R, F] bf16/int8 packed one-hot window rows
    ga_all: jnp.ndarray,  # [n_strips, c_pad, tile] bf16/int8
    gb_all: jnp.ndarray,  # [R, c_land] bf16/int8 (build_gb_land)
    pa: jnp.ndarray,  # [S] int32 — a strip per slot, sorted ascending
    pb: jnp.ndarray,  # [S] int32 — b strip per slot
    fb: jnp.ndarray,  # [S] int32 — first_seq[pb] // 128 (block index)
    *,
    g: int,
    k: int,
    tile: int,
    c_pad: int,
    c_land: int,  # landing window width: round_up(c_pad + 128, 128)
    w: int,  # band width (plane columns), multiple of 128
    n_strips: int,
    n_digits: int,
    digit_base: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Row bands ``[n_strips, n_digits, c_pad, w]`` int32: band a holds
    the (fa, fb)-landed part blocks of every pair (a, b) — the full
    upper-triangle sweep in ONE dispatch, no scatter. Landing maps in
    int8 run both landing stages on the int8 MXU (_land_stages)."""
    import os

    r, f = x.shape
    assert r % tile == 0, (r, tile)
    (s,) = pa.shape
    # conservative: size operands at the wider of x / landing-map dtypes
    xsz = 1 if (x.dtype == jnp.int8 and ga_all.dtype == jnp.int8) else 2
    cap = int(os.environ.get("FASTSK_VMEM_CAP_MB", "15")) * 2**20
    chunk = tile
    while chunk > 128 and band_vmem_need(
        chunk, tile=tile, f=f, xsz=xsz, c_pad=c_pad, c_land=c_land,
        w=w, n_digits=n_digits, slots=s,
    ) > cap:
        chunk //= 2
    chunk = min(max(chunk, 128), tile)
    n_chunks = tile // chunk
    bits = land_bits(ga_all.dtype)
    n_bytes = -(-(tile * (digit_base - 1)).bit_length() // bits)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (tile, f), lambda p, c, pa, pb, fb: (pa[p], 0)
            ),
            pl.BlockSpec(
                (chunk, f),
                lambda p, c, pa, pb, fb, _n=n_chunks: (
                    pb[p] * _n + c, 0
                ),
            ),
            pl.BlockSpec(
                (1, c_pad, tile), lambda p, c, pa, pb, fb: (pa[p], 0, 0)
            ),
            pl.BlockSpec(
                (chunk, c_land),
                lambda p, c, pa, pb, fb, _n=n_chunks: (
                    pb[p] * _n + c, 0
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_digits, c_pad, w),
            lambda p, c, pa, pb, fb: (pa[p], 0, 0, 0),
        ),
        scratch_shapes=[pltpu.VMEM((n_digits, c_pad, c_land), jnp.int32)],
    )
    kernel = functools.partial(
        _packed_band_kernel,
        g=g,
        k=k,
        n_digits=n_digits,
        digit_base=digit_base,
        n_bytes=n_bytes,
        n_chunks=n_chunks,
        c_pad=c_pad,
        c_land=c_land,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_strips, n_digits, c_pad, w), jnp.int32
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * tile * tile * f,
            bytes_accessed=s * 3 * tile * f
            + n_strips * n_digits * c_pad * w * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pa, pb, fb, x, x, ga_all, gb_all)
