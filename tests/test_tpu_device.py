"""Real-device correctness (FASTSK_TEST_TPU=1): the compiled Pallas /
Mosaic paths must equal the numpy oracle bit for bit — interpret-mode
coverage in the hermetic suite does not exercise the MXU's bf16-pass
lowering, which is where exactness bugs live (see pairs_pallas.py notes).
"""

import numpy as np
import pytest

from fastsk_tpu import FastSK, KernelConfig
from fastsk_tpu.kernel.pairs_engine import PackedPairsEngine, PairsGkmEngine
from fastsk_tpu.ops.encode import encode_sequences

import oracle
from conftest import random_ragged_seqs

pytestmark = pytest.mark.tpu


def test_pallas_pairs_on_device(rng):
    X = [rng.integers(1, 6, size=200).tolist() for _ in range(140)]
    K_o = oracle.exact_counts(X, 8, 4)
    eng = PairsGkmEngine(
        encode_sequences(X), 8, 4, KernelConfig(pairs_backend="pallas")
    )
    assert eng.backend == "pallas"
    np.testing.assert_array_equal(K_o, eng.exact())


def test_packed_pairs_on_device(rng):
    X = random_ragged_seqs(rng, 30, 20, 300, alphabet=20)
    K_o = oracle.exact_counts(X, 8, 4)
    eng = PackedPairsEngine(encode_sequences(X), 8, 4, KernelConfig())
    np.testing.assert_array_equal(K_o, eng.exact())


def test_dense_theta_on_device(rng):
    X = random_ragged_seqs(rng, 25, 20, 60, alphabet=4)
    fsk = FastSK(g=8, m=4, config=KernelConfig(exact_engine="theta"))
    fsk.compute_train(X)
    np.testing.assert_array_equal(oracle.exact_counts(X, 8, 4), fsk.kernel_counts)


def test_sorted_on_device(rng):
    from fastsk_tpu.kernel.sorted_engine import SortedGkmEngine

    X = random_ragged_seqs(rng, 15, 15, 40, alphabet=25)
    eng = SortedGkmEngine(encode_sequences(X), 8, 2, KernelConfig())
    np.testing.assert_array_equal(oracle.exact_counts(X, 8, 2), eng.exact())


def test_streaming_transfer_on_device(rng):
    """The banded byte-plane streaming path (forced via _small_bytes=0)
    on REAL hardware: exercises the device-side bitcast byte order, the
    live-tile gathers, and the chunked pulls that interpret-mode CPU
    coverage cannot."""
    X = [rng.integers(1, 6, size=64).tolist() for _ in range(60)]
    K_o = oracle.exact_counts(X, 6, 3)
    eng = PairsGkmEngine(
        encode_sequences(X), 6, 3, KernelConfig(pairs_backend="pallas")
    )
    eng._small_bytes = 0
    from fastsk_tpu.ops import transfer

    orig = transfer.CHUNK_BYTES
    transfer.CHUNK_BYTES = 1 << 12  # force multi-chunk device pulls
    try:
        K = eng.exact()
    finally:
        transfer.CHUNK_BYTES = orig
    np.testing.assert_array_equal(K_o, K)


def test_device_resident_on_device(rng):
    """Device-resident counts on REAL hardware equal the numpy oracle bit
    for bit across the pallas pairs, packed, and sorted engines, and
    fit/score runs without materializing the host kernel."""
    from fastsk_tpu.kernel.sorted_engine import SortedGkmEngine

    # pallas pairs (uniform DNA)
    X = [rng.integers(1, 6, size=120).tolist() for _ in range(100)]
    K_o = oracle.exact_counts(X, 8, 4)
    eng = PairsGkmEngine(
        encode_sequences(X), 8, 4, KernelConfig(pairs_backend="pallas")
    )
    assert eng.backend == "pallas"
    np.testing.assert_array_equal(K_o, eng.exact_device().to_host_int64())

    # packed (ragged protein)
    Xp = random_ragged_seqs(rng, 24, 20, 200, alphabet=20)
    K_o = oracle.exact_counts(Xp, 8, 4)
    engp = PackedPairsEngine(encode_sequences(Xp), 8, 4, KernelConfig())
    np.testing.assert_array_equal(K_o, engp.exact_device().to_host_int64())

    # sorted (big alphabet)
    Xs = random_ragged_seqs(rng, 15, 15, 40, alphabet=25)
    engs = SortedGkmEngine(encode_sequences(Xs), 8, 2, KernelConfig())
    np.testing.assert_array_equal(
        oracle.exact_counts(Xs, 8, 2), engs.exact_device().to_host_int64()
    )

    # end-to-end fit/score without a host kernel pull
    Y = [i % 2 for i in range(len(X))]
    f = FastSK(g=8, m=4, config=KernelConfig(device_resident=True))
    f.compute_kernel(X[:80], X[80:], Y[:80], Y[80:])
    f.fit(C=1.0, kernel_type="fastsk")
    acc = f.score("accuracy")
    assert f._K is None and f._counts is None  # never pulled
    assert 0.0 <= acc <= 100.0


def test_fused_smo_on_device(rng):
    """The fused Pallas SMO reaches the same eps-KKT point as the
    while_loop solver on real hardware: rho within eps, identical
    support size, and the returned point's true KKT violation < eps."""
    import jax
    import jax.numpy as jnp

    from fastsk_tpu.svm.kernel_svm import _finalize_rho, _smo_solve_general
    from fastsk_tpu.svm.smo_pallas import smo_solve_fused
    from fastsk_tpu.utils.observe import enable_compilation_cache

    enable_compilation_cache()
    n = 500
    X = rng.normal(size=(n, 6)).astype(np.float32)
    K = (X @ X.T + n * np.eye(n)).astype(np.float32)
    d = np.sqrt(np.diag(K))
    K = (K / np.outer(d, d)).astype(np.float32)
    y = np.where(rng.random(n) > 0.5, 1.0, -1.0).astype(np.float32)
    Qn = (K * np.outer(y, y)).astype(np.float32)
    Q = jnp.asarray(Qn)
    yj = jnp.asarray(y)
    C = jnp.full(n, 1.0, jnp.float32)
    p = -jnp.ones(n, jnp.float32)
    a0 = jnp.zeros(n, jnp.float32)
    eps = 1e-3

    a_f, g_f, it_f = smo_solve_fused(Q, yj, C, p, a0, eps, 10_000_000)
    a_f, rho_f = _finalize_rho(a_f, g_f, yj, C)
    a_r, rho_r, _ = _smo_solve_general(Q, yj, C, p, a0, eps, 10_000_000)

    a = np.asarray(a_f, np.float64)
    g_true = Qn.astype(np.float64) @ a - 1.0
    up = np.where(y > 0, a < 1.0, a > 0)
    low = np.where(y > 0, a > 0, a < 1.0)
    viol = np.max(np.where(up, -y * g_true, -1e30)) + np.max(
        np.where(low, y * g_true, -1e30)
    )
    # grad drift: the incremental f32 gradient can overshoot the exact
    # one by a few ulps around the stop, so allow 2x the tolerance
    assert viol < 2 * eps
    assert abs(float(rho_f) - float(rho_r)) < eps
    assert int(jnp.sum(a_f > 0)) == int(jnp.sum(a_r > 0))


def test_fused_nu_smo_on_device(rng):
    """Fused Solver_NU reaches the same point as the while_loop solver
    on real hardware (rho/r within eps, same support size)."""
    import jax.numpy as jnp

    from fastsk_tpu.svm.kernel_svm import _finalize_nu, _smo_solve_nu
    from fastsk_tpu.svm.smo_pallas import smo_solve_nu_fused
    from fastsk_tpu.utils.observe import enable_compilation_cache

    enable_compilation_cache()
    n = 500
    X = rng.normal(size=(n, 6)).astype(np.float32)
    K = (X @ X.T + n * np.eye(n)).astype(np.float32)
    d = np.sqrt(np.diag(K))
    K = (K / np.outer(d, d)).astype(np.float32)
    y = np.where(np.arange(n) % 2 == 0, 1.0, -1.0).astype(np.float32)
    Q = jnp.asarray(K * np.outer(y, y))
    yj = jnp.asarray(y)
    C = jnp.ones(n, jnp.float32)
    p = jnp.zeros(n, jnp.float32)
    nu = 0.5
    a0 = np.zeros(n, np.float32)
    for cls in (1.0, -1.0):
        left = nu * n / 2.0
        for idx in np.flatnonzero(y == cls):
            take = min(1.0, left)
            a0[idx] = take
            left -= take
            if left <= 0:
                break
    a0 = jnp.asarray(a0)
    eps = 1e-3

    a_f, g_f, it_f = smo_solve_nu_fused(Q, yj, C, p, a0, eps, 1_000_000)
    a_f, rho_f, r_f = _finalize_nu(a_f, g_f, yj, C)
    a_r, rho_r, r_r, it_r = _smo_solve_nu(Q, yj, C, p, a0, eps, 1_000_000)
    assert abs(float(rho_f) - float(rho_r)) < eps
    assert abs(float(r_f) - float(r_r)) < eps
    assert int(jnp.sum(a_f > 0)) == int(jnp.sum(a_r > 0))
