"""Pallas streaming count kernel: exact match in interpret mode."""


import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("KREEQ_TPU_PALLAS_INTERPRET", "1")


@pytest.mark.parametrize("seed,n,nbases,badp,k", [
    (0, 20000, 4, 0.02, 21),
    (1, 12000, 2, 0.0, 21),   # low-entropy -> duplicate k-mers
    (2, 8000, 4, 0.0, 31),
    (3, 6000, 2, 0.1, 15),
])
def test_pallas_count_matches_xla(seed, n, nbases, badp, k):
    import jax.numpy as jnp

    from kreeq_tpu.ops.kmers import count_sorted, kmer_positions
    from kreeq_tpu.ops.pallas_kernels import count_sorted_pallas

    rng = np.random.default_rng(seed)
    codes = rng.integers(0, nbases, n).astype(np.uint8)
    codes[rng.random(n) < badp] = 4
    keys, _isfw, edges, valid = kmer_positions(jnp.asarray(codes), k)
    ref = count_sorted(keys, edges, valid)
    got = count_sorted_pallas(keys, edges, valid)
    n_ref, n_got = int(ref[4]), int(got[4])
    assert n_ref == n_got
    for a, b in zip(ref[:4], got[:4]):
        assert np.array_equal(np.asarray(a[:n_ref]),
                              np.asarray(b[:n_ref]))
