"""Packed (ragged-aware) all-pairs exact kernel.

The seq-aligned pairs path (ops/pairs.py) pads every sequence to the
longest one's window count — on ragged protein/text data that wastes up
to ~35x of the D-matmul work (SCOP lengths span 16..905). Here windows
pack back to back (each sequence rounded to 8 rows), sequences sorted by
descending length, and the strip machinery works on row tiles that may
split sequences:

- ``D = X_a X_b^T`` over fixed [T, T] row tiles (MXU, exact),
- binomial weights split into 8-bit digit planes so every matmul operand
  stays bf16-exact,
- stage 1 (rows -> i-sequences) is a 0/1 G-matmul built from the packed
  ``seq_of_row`` table,
- stage 2 (columns -> j-sequences) is an int32 cumsum + boundary
  gather (running sums stay < T^2 * 255 < 2^31),
- per-digit int32 kernel planes accumulate on device and combine into
  int64 on the host — there is NO per-pair int32 bound, so shapes the
  seq-aligned engine must refuse (AImed at g=11, 3.25 at g=15) run here.

Symmetry: strip pairs (a, b) with a < b accumulate both P and P^T, the
diagonal pair accumulates its full block once — every ordered row pair
is counted exactly once, including sequences straddling strip borders.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack_windows(lengths: np.ndarray, g: int, tile: int) -> dict:
    """Row layout for the packed table (host side).

    Sequences are assumed pre-sorted by the caller (descending length).
    Each sequence s gets ``ceil(p_s / 8) * 8`` rows starting at
    ``row0[s]``; the total rounds up to a multiple of ``tile``.
    """
    p = np.maximum(lengths - g + 1, 0).astype(np.int64)
    rows = ((p + 7) // 8) * 8
    row0 = np.concatenate([[0], np.cumsum(rows)])
    total = int(row0[-1])
    total_pad = ((total + tile - 1) // tile) * tile
    n_strips = total_pad // tile

    # per-row sequence id (-1 padding) and window position
    seq_of = np.full(total_pad, -1, dtype=np.int32)
    win_of = np.zeros(total_pad, dtype=np.int32)
    for s in range(len(lengths)):
        a, b = int(row0[s]), int(row0[s] + p[s])
        seq_of[a:b] = s
        win_of[a:b] = np.arange(p[s], dtype=np.int32)

    # per-strip: local sequence span + per-local-seq end-row boundaries
    first_seq = np.zeros(n_strips, dtype=np.int32)
    c_strip = np.zeros(n_strips, dtype=np.int32)
    for t in range(n_strips):
        ids = seq_of[t * tile : (t + 1) * tile]
        ids = ids[ids >= 0]
        if len(ids):
            first_seq[t] = ids[0]
            c_strip[t] = ids[-1] - ids[0] + 1
        else:
            first_seq[t] = len(lengths)
    c_max = int(max(c_strip.max(initial=1), 1))
    # bounds[t, c]: 1 + last row index (within the strip) of local seq c —
    # cumsum gathered at bounds-1 gives per-seq prefix totals
    bounds = np.zeros((n_strips, c_max), dtype=np.int32)
    for t in range(n_strips):
        ids = seq_of[t * tile : (t + 1) * tile]
        for c in range(c_max):
            s = first_seq[t] + c
            if c < c_strip[t]:
                bounds[t, c] = int(np.max(np.nonzero(ids == s)[0])) + 1
            else:
                bounds[t, c] = bounds[t, c - 1] if c else 0
    return dict(
        p=p,
        rows=rows,
        row0=row0[:-1],
        total_pad=total_pad,
        n_strips=n_strips,
        seq_of=seq_of,
        win_of=win_of,
        first_seq=first_seq,
        c_max=c_max,
        bounds=bounds,
    )


def build_packed_x(
    ids: jnp.ndarray,  # [N, L] int32
    seq_of: jnp.ndarray,  # [R] int32 (-1 padding)
    win_of: jnp.ndarray,  # [R] int32
    *,
    g: int,
    alpha: int,
    code_min: int,
) -> jnp.ndarray:
    """One-hot packed window table ``[R, g * alpha]`` bf16."""
    safe_seq = jnp.maximum(seq_of, 0)
    # gather each row's g codes: ids[seq, win + j]
    cols = win_of[:, None] + jnp.arange(g, dtype=jnp.int32)[None, :]
    codes = ids[safe_seq[:, None], cols]  # [R, g]
    codes = codes - code_min
    iota = jnp.arange(alpha, dtype=jnp.int32)
    oh = (codes[..., None] == iota).astype(jnp.bfloat16)
    oh = oh * (seq_of >= 0)[:, None, None].astype(jnp.bfloat16)
    r = seq_of.shape[0]
    return oh.reshape(r, g * alpha)


@functools.partial(
    jax.jit,
    static_argnames=(
        "g", "k", "tile", "c_max", "n_strips", "n_digits", "digit_base"
    ),
)
def packed_strip_update(
    planes: Tuple[jnp.ndarray, ...],  # n_digits x [Np, Np] int32
    x: jnp.ndarray,  # [R, gA] bf16
    seq_of: jnp.ndarray,  # [R] int32
    first_seq: jnp.ndarray,  # [n_strips] int32
    bounds: jnp.ndarray,  # [n_strips, c_max] int32
    a_strip: jnp.ndarray,  # scalar int32
    *,
    g: int,
    k: int,
    tile: int,
    c_max: int,
    n_strips: int,
    n_digits: int,
    digit_base: int = 256,
):
    """Accumulate digit planes for strip a against all strips b >= a.

    Plane matrices must be padded to ``N + c_max`` so block scatters never
    clamp (the engine guarantees this).
    """
    from .pairs import binom_exact

    xa = jax.lax.dynamic_slice_in_dim(x, a_strip * tile, tile, axis=0)
    seq_a = jax.lax.dynamic_slice_in_dim(seq_of, a_strip * tile, tile, axis=0)
    fa = first_seq[a_strip]
    # G_a [c_max, tile] one-hot over local seq ids (padding rows match none)
    local_a = jnp.where(seq_a >= 0, seq_a - fa, -1)
    ga = (
        local_a[None, :] == jnp.arange(c_max, dtype=jnp.int32)[:, None]
    ).astype(jnp.bfloat16)

    def body(b, planes):
        xb = jax.lax.dynamic_slice_in_dim(x, b * tile, tile, axis=0)
        fb = first_seq[b]
        bnd = bounds[b]  # [c_max]
        d = jax.lax.dot_general(
            xa, xb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tile, tile] — match counts, exact
        w = binom_exact(d, k)
        not_same = (b != a_strip).astype(jnp.int32)

        out_planes = []
        rem = w
        for dig in range(n_digits):
            if dig + 1 < n_digits:
                q = jnp.floor(rem * (1.0 / digit_base))
                digit = rem - q * float(digit_base)
                rem = q
            else:
                digit = rem
            # stage 1: rows -> i sequences (digit <= 255: bf16-exact matmul;
            # sums <= tile * 255 < 2^24: f32-exact)
            s1 = jax.lax.dot_general(
                ga, digit.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [c_max, tile]
            # stage 2: columns -> j sequences via int32 cumsum + boundary
            # gather (running sums <= tile^2 * 255 < 2^31: int32-exact)
            cum = jnp.cumsum(s1.astype(jnp.int32), axis=1)
            at_bounds = jnp.take(
                cum, jnp.clip(bnd - 1, 0, tile - 1), axis=1
            )  # [c_max, c_max]
            at_bounds = jnp.where((bnd > 0)[None, :], at_bounds, 0)
            prev = jnp.concatenate(
                [jnp.zeros((c_max, 1), jnp.int32), at_bounds[:, :-1]], axis=1
            )
            part = at_bounds - prev  # [c_i, c_j] int32

            # add P at (fa, fb); for a != b also P^T at (fb, fa) so every
            # ordered row pair counts exactly once (incl. strip-straddling
            # sequences). The second read sees the first write, so
            # overlapping regions (adjacent strips sharing a sequence)
            # compose correctly.
            plane = planes[dig]
            blk = jax.lax.dynamic_slice(plane, (fa, fb), (c_max, c_max))
            plane = jax.lax.dynamic_update_slice(plane, blk + part, (fa, fb))
            blk_t = jax.lax.dynamic_slice(plane, (fb, fa), (c_max, c_max))
            plane = jax.lax.dynamic_update_slice(
                plane, blk_t + part.T * not_same, (fb, fa)
            )
            out_planes.append(plane)
        return tuple(out_planes)

    return jax.lax.fori_loop(a_strip, n_strips, body, tuple(planes))
