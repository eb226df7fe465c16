"""The all-pairs exact engine must be bit-identical to the numpy oracle
(and therefore to the theta engine) on every shape class."""

import numpy as np
import pytest

from fastsk_tpu import FastSK, KernelConfig
from fastsk_tpu.kernel.pairs_engine import PairsGkmEngine
from fastsk_tpu.ops.encode import encode_sequences
from fastsk_tpu.ops.pairs import binom_exact

import oracle
from conftest import random_ragged_seqs


@pytest.mark.parametrize(
    "g,m,n,lmin,lmax,alpha",
    [
        (6, 3, 9, 8, 20, 4),  # DNA-like
        (5, 1, 7, 6, 14, 3),
        (8, 4, 12, 10, 22, 4),
        (4, 2, 5, 4, 9, 20),  # protein-sized alphabet
        (6, 5, 8, 7, 15, 30),  # text-sized alphabet, k=1
        (5, 0, 6, 6, 12, 4),  # m=0: exact-match kernel
        (7, 3, 10, 7, 7, 4),  # every sequence exactly length g+... fixed
    ],
)
def test_pairs_matches_oracle(rng, g, m, n, lmin, lmax, alpha):
    X = random_ragged_seqs(rng, n, lmin, lmax, alphabet=alpha)
    K_oracle = oracle.exact_counts(X, g, m)
    eng = PairsGkmEngine(encode_sequences(X), g, m)
    np.testing.assert_array_equal(K_oracle, eng.exact())


def test_pairs_engine_with_duplicate_and_uniform_seqs(rng):
    """Runs of identical windows (repetitive sequences) stress the counting."""
    X = [[1] * 12, [1] * 12, [1, 2] * 6, rng.integers(1, 5, size=12).tolist()]
    K_oracle = oracle.exact_counts(X, 5, 2)
    eng = PairsGkmEngine(encode_sequences(X), 5, 2)
    np.testing.assert_array_equal(K_oracle, eng.exact())


def test_binom_exact_integer_table():
    import math

    import jax.numpy as jnp

    for k in range(1, 11):
        x = jnp.arange(0, 21, dtype=jnp.float32)
        got = np.asarray(binom_exact(x, k))
        want = np.array([math.comb(v, k) for v in range(21)], dtype=np.float64)
        np.testing.assert_array_equal(got, want)


def test_api_routes_exact_to_pairs_engine(rng):
    X = random_ragged_seqs(rng, 10, 9, 16, alphabet=4)
    auto = FastSK(g=6, m=2)
    auto.compute_train(X)
    theta = FastSK(g=6, m=2, config=KernelConfig(exact_engine="theta"))
    theta.compute_train(X)
    forced = FastSK(g=6, m=2, config=KernelConfig(exact_engine="pairs"))
    forced.compute_train(X)
    np.testing.assert_array_equal(auto.kernel_counts, theta.kernel_counts)
    np.testing.assert_array_equal(auto.kernel_counts, forced.kernel_counts)


def test_int32_bound_guard():
    """Shapes whose worst-case per-pair count exceeds int32 must be refused
    by the pairs engine and auto-fall back to the theta engine."""
    X = [[1, 2, 3, 4] * 200 for _ in range(3)]  # len 800 -> huge p_pad
    enc = encode_sequences(X)
    with pytest.raises(ValueError):
        PairsGkmEngine(enc, 16, 10)  # C(16,6) * p_pad^2 >> 2^31
    fsk = FastSK(g=16, m=10)
    engine = fsk._make_exact_engine(enc)
    # the packed engine's digit planes have no per-pair bound
    assert type(engine).__name__ == "PackedPairsEngine"


def test_pallas_kernel_interpret_matches_oracle(rng):
    """The fused Pallas kernel (interpret mode on CPU) must equal the oracle."""
    from fastsk_tpu.kernel.config import KernelConfig

    X = random_ragged_seqs(rng, 11, 9, 18, alphabet=4)
    K_o = oracle.exact_counts(X, 6, 3)
    eng = PairsGkmEngine(
        encode_sequences(X), 6, 3, KernelConfig(pairs_backend="pallas")
    )
    x = eng._build_x()
    upper = eng._exact_pallas(x, interpret=True)[: eng.n, : eng.n]
    K_p = np.triu(upper) + np.triu(upper, 1).T
    np.testing.assert_array_equal(K_o, K_p)


def test_pairs_full_device_single_dispatch_matches_oracle(rng):
    """The fused single-dispatch device-resident path (one jit: full-grid
    Pallas call + block relayout + triu/mirror, pairs_engine.
    _pairs_full_device_jit) must equal the oracle bit for bit."""
    from fastsk_tpu.kernel.config import KernelConfig
    from fastsk_tpu.kernel.pairs_engine import _pairs_full_device_jit

    X = random_ragged_seqs(rng, 11, 9, 18, alphabet=4)
    K_o = oracle.exact_counts(X, 6, 3)
    eng = PairsGkmEngine(
        encode_sequences(X), 6, 3, KernelConfig(pairs_backend="pallas")
    )
    x = eng._build_x()
    full = np.asarray(
        _pairs_full_device_jit(
            x, g=6, k=3, p_pad=eng.p_pad, c_ti=eng.c_i, c_tj=eng.c_j,
            n=eng.n, interpret=True,
        )
    )
    np.testing.assert_array_equal(K_o, full)


def test_pallas_streaming_transfer_matches_oracle(rng):
    """The banded byte-plane streaming path (forced via _small_bytes=0)
    must equal the oracle bit for bit — covers the per-band tile lists,
    min-offset decode, deferred plane gathers, and per-i-row assembly."""
    from fastsk_tpu.kernel.config import KernelConfig

    X = random_ragged_seqs(rng, 13, 9, 18, alphabet=4)
    K_o = oracle.exact_counts(X, 6, 3)
    eng = PairsGkmEngine(
        encode_sequences(X), 6, 3, KernelConfig(pairs_backend="pallas")
    )
    eng._small_bytes = 0  # force the streaming machinery on a tiny matrix
    x = eng._build_x()
    upper = eng._exact_pallas(x, interpret=True)[: eng.n, : eng.n]
    K_p = np.triu(upper) + np.triu(upper, 1).T
    np.testing.assert_array_equal(K_o, K_p)


def test_pallas_int8_band_matches_oracle(rng):
    """int8 MXU path + banded launches (interpret mode) equal the oracle."""
    import jax.numpy as jnp

    from fastsk_tpu.ops import pairs, pairs_pallas
    from fastsk_tpu.ops.encode import encode_sequences

    X = [rng.integers(1, 5, size=24).tolist() for _ in range(8)]
    g, m = 6, 3
    K_o = oracle.exact_counts(X, g, m)
    enc = encode_sequences(X)
    p_pad = -(-(enc.max_len - g + 1) // 8) * 8
    x = pairs.onehot_windows(
        jnp.asarray(enc.ids), jnp.asarray(enc.lengths),
        g=g, alpha=enc.hash_base, code_min=enc.code_min, p_pad=p_pad,
        dtype=jnp.int8,
    ).reshape(8 * p_pad, g * enc.hash_base)
    kwargs = dict(g=g, k=g - m, p_pad=p_pad, c_ti=1, c_tj=2, interpret=True)
    full = np.zeros((8, 8), dtype=np.int64)
    for i0 in range(0, 8, 3):  # bands of 3 i-blocks (last partial)
        nb = min(3, 8 - i0)
        blocks = pairs_pallas.pairs_kernel_blocks(
            x, jnp.int32(i0), n_i_band=nb, **kwargs
        )
        part = np.asarray(blocks, dtype=np.int64).transpose(0, 2, 1, 3)
        full[i0 : i0 + nb] = part.reshape(nb, 8)
    upper = np.triu(full)
    K = upper + np.triu(full, 1).T
    np.testing.assert_array_equal(K_o, K)


def test_d_chunk_rule_invariants():
    """The shared D-chunk rule (pairs_pallas.d_chunk) must always return
    a divisor of tj, keep the D tile under ~12 MB whenever a >=384-lane
    chunk can achieve it, and never go below the 384-lane floor unless
    tj itself is smaller."""
    from fastsk_tpu.ops.pairs_pallas import d_chunk

    for p_pad in (8, 32, 96, 192, 256):
        for c_i in (1, 4, 16, 32):
            for c_j in (32, 128):
                ti, tj = c_i * p_pad, c_j * p_pad
                chunk = d_chunk(ti, tj)
                assert tj % chunk == 0, (ti, tj, chunk)
                if chunk > 384:
                    # could not shrink further only if halving would
                    # cross the floor or stop dividing tj
                    assert (
                        ti * chunk * 4 <= 12 * 2**20
                        or chunk < 2 * 384
                        or tj % (tj // chunk * 2) != 0
                    ), (ti, tj, chunk)
                if tj >= 384:
                    assert chunk >= 384 or ti * 2 * 384 * 4 > 12 * 2**20, (
                        ti, tj, chunk,
                    )
