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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pairs_pallas import binom_weight


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
    ga = ga_ref[:]  # [c_pad, T]
    gb = gb_ref[:]  # [chunk, c_pad]
    for dig in range(n_digits):
        if dig + 1 < n_digits:
            q = jnp.floor(rem * (1.0 / digit_base))
            digit = rem - q * float(digit_base)
            rem = q
        else:
            digit = rem
        # stage 1: rows -> i sequences; digits <= 255 are bf16-exact and
        # sums <= T * 255 < 2^24 are f32-exact
        s1 = jax.lax.dot_general(
            ga,
            digit.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # [c_pad, chunk], exact integers < 2^24
        # stage 2: columns -> j sequences, byte-split (module comment)
        for byte in range(n_bytes):
            b_val = jnp.bitwise_and(
                jax.lax.shift_right_logical(s1, 8 * byte), 0xFF
            )
            m = jax.lax.dot_general(
                b_val.astype(jnp.bfloat16),
                gb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [c_pad, c_pad] — sums <= chunk * 255 < 2^24, f32-exact
            part_ref[dig] += (1 << (8 * byte)) * m.astype(jnp.int32)

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
    if int8_in:
        d = d.astype(jnp.float32)
    rem = binom_weight(d, g, k)
    ga = ga_ref[0]  # [c_pad, T]
    gb = gb_ref[:]  # [chunk, c_pad]
    for dig in range(n_digits):
        if dig + 1 < n_digits:
            q = jnp.floor(rem * (1.0 / digit_base))
            digit = rem - q * float(digit_base)
            rem = q
        else:
            digit = rem
        # stage 1: rows -> i sequences; digits <= 255 are bf16-exact and
        # sums <= T * 255 < 2^24 are f32-exact
        s1 = jax.lax.dot_general(
            ga,
            digit.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # [c_pad, chunk], exact integers < 2^24
        # stage 2: columns -> j sequences, byte-split (module comment)
        for byte in range(n_bytes):
            b_val = jnp.bitwise_and(
                jax.lax.shift_right_logical(s1, 8 * byte), 0xFF
            )
            m = jax.lax.dot_general(
                b_val.astype(jnp.bfloat16),
                gb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [c_pad, c_pad] — sums <= chunk * 255 < 2^24, f32-exact
            part_ref[dig] += (1 << (8 * byte)) * m.astype(jnp.int32)

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
    chunk = tile
    while tile * chunk * 4 > 4 * 2**20:
        chunk //= 2
    chunk = min(max(chunk, 128), tile)
    n_chunks = tile // chunk
    n_bytes = ((tile * (digit_base - 1)).bit_length() + 7) // 8

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
    # bytes needed for the stage-1 range: s1 <= tile * (digit_base - 1)
    n_bytes = ((tile * (digit_base - 1)).bit_length() + 7) // 8

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
