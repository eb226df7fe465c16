"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
hermetically, per the multi-host test strategy the reference lacks
(SURVEY.md §4). Environment must be set before jax is imported anywhere.
"""

import os

# Tests are hermetic: run on a virtual 8-device CPU mesh even when the
# session environment points JAX at a real accelerator (JAX_PLATFORMS=axon
# etc.). Set FASTSK_TEST_TPU=1 to run the @pytest.mark.tpu tests on real
# hardware instead.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if os.environ.get("FASTSK_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REFERENCE_DATA = "/root/reference/data"


def pytest_collection_modifyitems(config, items):
    """Slow tests only run when FASTSK_RUN_SLOW=1; tpu tests need a TPU."""
    run_slow = os.environ.get("FASTSK_RUN_SLOW") == "1"
    skip_slow = pytest.mark.skip(reason="set FASTSK_RUN_SLOW=1 to run")
    skip_tpu = pytest.mark.skip(reason="requires a TPU device")
    on_tpu = os.environ.get("JAX_PLATFORMS", "cpu") not in ("cpu",)
    for item in items:
        if "slow" in item.keywords and not run_slow:
            item.add_marker(skip_slow)
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)


@pytest.fixture(scope="session")
def small_train():
    from fastsk_tpu import FastaUtility

    reader = FastaUtility()
    X, Y = reader.read_data(os.path.join(REFERENCE_DATA, "small.train.fasta"))
    return X, Y, reader


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def random_ragged_seqs(rng, n, lmin, lmax, alphabet):
    return [
        rng.integers(1, alphabet + 1, size=rng.integers(lmin, lmax + 1)).tolist()
        for _ in range(n)
    ]
