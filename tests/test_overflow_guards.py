"""Regression tests for the round-1 advisor's int32-overflow findings.

Each test pins a bound that, if violated, silently corrupts exact integer
kernels: the packed engine's stage-2 cumsum (ops/pairs_packed.py), the
count-split theta batch (kernel/engine.py), the Pallas stage-1 sums
(ops/pairs_pallas.py), the checkpoint digest, and the converged flag.
"""

import numpy as np
import pytest

from fastsk_tpu import FastSK, KernelConfig
from fastsk_tpu.kernel.engine import DenseGkmEngine
from fastsk_tpu.kernel.pairs_engine import PackedPairsEngine
from fastsk_tpu.ops.encode import encode_sequences

import oracle
from conftest import random_ragged_seqs


def test_packed_tile_not_widened_for_long_sequences(rng):
    """tile=4096 with base 256 would overflow stage-2 cumsum when a single
    sequence contributes > ~2048 rows to a strip — the engine must keep
    the safe tile for long sequences and may widen only for short ones.

    g=10, m=6: C(10,4) = 210 needs two base-128 planes but one base-256
    plane, so the int8-landing preference does NOT kick in and the
    digit base stays 256 — the configuration where the cumsum bound
    actually binds."""
    # p_max in (2048, 2901]: digit_base stays 256 and a 4096 tile would
    # break the cumsum bound — the engine must keep tile=2048
    X_long = [rng.integers(1, 5, size=2500).tolist() for _ in range(3)]
    eng = PackedPairsEngine(encode_sequences(X_long), 10, 6, KernelConfig())
    assert eng.digit_base == 256
    assert (
        eng.tile * min(eng.tile, -(-int(max(map(len, X_long))) // 8) * 8)
        * (eng.digit_base - 1)
        < 2**31
    )
    assert eng.tile == PackedPairsEngine.TILE  # not widened

    # short DNA still gets the wide tile
    X_short = [rng.integers(1, 5, size=200).tolist() for _ in range(3)]
    eng2 = PackedPairsEngine(encode_sequences(X_short), 10, 6, KernelConfig())
    assert eng2.tile == 2 * PackedPairsEngine.TILE


def test_packed_digit_base_128_preference(rng):
    """C(g, k) <= 127 keeps one plane at base 128, so the engine picks
    the int8-MXU landing base; the cumsum/plane bounds (which only
    loosen with the smaller base) must still hold after any widening."""
    X_long = [rng.integers(1, 5, size=2500).tolist() for _ in range(3)]
    eng = PackedPairsEngine(encode_sequences(X_long), 8, 4, KernelConfig())
    assert eng.digit_base == 128 and eng.n_digits == 1
    p_rows = -(-int(max(map(len, X_long))) // 8) * 8
    assert eng.tile * min(eng.tile, p_rows) * (eng.digit_base - 1) < 2**31
    # base 128 loosens the widening bound: 4096 * 2504 * 127 < 2^31,
    # so the short-sequence wide tile is now legal for long ones too
    assert eng.tile == 2 * PackedPairsEngine.TILE


def test_count_split_theta_batch_capped():
    """p_max > 4095 engages count_split, where theta_batch * p_max^2 must
    stay below 2^31 within a single batch."""
    X = [list(np.random.default_rng(0).integers(1, 5, size=6010)) for _ in range(2)]
    eng = DenseGkmEngine(encode_sequences(X), 6, 2, KernelConfig())
    assert eng.count_split
    assert eng.theta_batch * eng.p_max**2 < 2**31
    assert eng.spill_every_thetas * eng.p_max**2 < 2**31


def test_pallas_interpret_large_binomial_repetitive():
    """g=20, m=10 on all-identical sequences: every window pair matches all
    positions, so stage-1 partial sums reach p_pad * C(20,10) ~ 1.9e7 >
    2^24 — exact only because stage 1 runs in int32 now."""
    from fastsk_tpu.ops import pairs
    from fastsk_tpu.ops.pairs_pallas import pairs_kernel_blocks
    import jax.numpy as jnp
    import math

    g, m = 20, 10
    k = g - m
    L = 115
    X = [[1] * L, [1] * L]
    enc = encode_sequences(X)
    p = L - g + 1  # 96 true windows per sequence
    p_enc = enc.max_len - g + 1
    p_pad = -(-p_enc // 8) * 8
    assert p_pad * math.comb(g, k) > 2**24  # in the formerly-unsafe region
    x = pairs.onehot_windows(
        jnp.asarray(enc.ids), jnp.asarray(enc.lengths),
        g=g, alpha=enc.hash_base, code_min=enc.code_min, p_pad=p_pad,
    ).reshape(2 * p_pad, g * enc.hash_base)
    blocks = pairs_kernel_blocks(
        x, g=g, k=k, p_pad=p_pad, c_ti=1, c_tj=2, interpret=True
    )
    upper = np.asarray(blocks, dtype=np.int64).transpose(0, 2, 1, 3).reshape(2, 2)
    expect = p * p * math.comb(g, k)
    assert upper[0, 0] == expect
    assert upper[0, 1] == expect
    assert upper[1, 1] == expect


def test_pallas_deferred_division_near_bound():
    """The deferred-/k! path (headline shape family) at a worst case
    near its error bound: g=16 m=10 on all-identical sequences drives
    every stage-1 sum to p * C(16,6) ~ 1.48e6 — within 4% of the EP300
    headline's maximum and under the 2^21 guard — where the s1-level
    round-multiply must still recover the exact integer."""
    import math

    import jax.numpy as jnp

    from fastsk_tpu.ops import pairs
    from fastsk_tpu.ops.pairs_pallas import pairs_kernel_blocks

    g, m = 16, 10
    k = g - m
    L = 200
    X = [[1] * L, [1] * L]
    enc = encode_sequences(X)
    p = L - g + 1  # 185 true windows per sequence
    p_pad = -(-(enc.max_len - g + 1) // 8) * 8
    ffmax = math.factorial(g) // math.factorial(g - k)
    assert ffmax < 2**24 and p_pad * ffmax < 2**31
    assert p_pad * math.comb(g, k) < 2**21  # the defer_div region
    x = pairs.onehot_windows(
        jnp.asarray(enc.ids), jnp.asarray(enc.lengths),
        g=g, alpha=enc.hash_base, code_min=enc.code_min, p_pad=p_pad,
    ).reshape(2 * p_pad, g * enc.hash_base)
    blocks = pairs_kernel_blocks(
        x, g=g, k=k, p_pad=p_pad, c_ti=1, c_tj=2, interpret=True
    )
    upper = np.asarray(blocks, dtype=np.int64).transpose(0, 2, 1, 3).reshape(2, 2)
    expect = p * p * math.comb(g, k)
    assert upper[0, 0] == expect
    assert upper[0, 1] == expect
    assert upper[1, 1] == expect


def test_checkpoint_digest_distinguishes_theta_streams(tmp_path, rng):
    """An exact run must not resume a different-ordered (seeded approx)
    run's checkpoint of the same length: digests must differ with order."""
    X = random_ragged_seqs(rng, 6, 10, 20, alphabet=4)
    g, m = 6, 2
    K_o = oracle.exact_counts(X, g, m)

    # seeded shuffled stream, checkpointed every theta
    fsk = FastSK(g=g, m=m, approx=True, skip_variance=True, seed=7,
                 config=KernelConfig(
                     checkpoint_path=str(tmp_path / "k.npz"), checkpoint_every=1,
                     exact_engine="theta"))
    fsk.compute_train(X)
    np.testing.assert_array_equal(fsk.kernel_counts, K_o)

    # exact run over the same problem: same theta count, different order —
    # must compute from scratch and still match the oracle
    fsk2 = FastSK(g=g, m=m, config=KernelConfig(
        checkpoint_path=str(tmp_path / "k.npz"), checkpoint_every=1,
        exact_engine="theta"))
    fsk2.compute_train(X)
    np.testing.assert_array_equal(fsk2.kernel_counts, K_o)

    # and a different seed must also not collide
    fsk3 = FastSK(g=g, m=m, approx=True, skip_variance=True, seed=8,
                  config=KernelConfig(
                      checkpoint_path=str(tmp_path / "k.npz"), checkpoint_every=1,
                      exact_engine="theta"))
    fsk3.compute_train(X)
    np.testing.assert_array_equal(fsk3.kernel_counts, K_o)


def test_converged_false_when_max_iters_hit(rng):
    """Hitting max_iters without statistical convergence must report
    converged=False (the round-1 'or True' bug made it always True)."""
    X = random_ragged_seqs(rng, 8, 12, 24, alphabet=4)
    enc = encode_sequences(X)
    eng = DenseGkmEngine(enc, 8, 4, KernelConfig())
    res = eng.approx(conv_delta=1e-12, max_iters=3)
    assert res.iters == 3
    assert not res.converged
