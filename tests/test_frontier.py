"""Device frontier-expansion kernel (ops/frontier.py) parity tests.

The kernel must match the host numpy scan bit-for-bit INCLUDING scan
order (goldens pin GFA segment ids on subgraph insertion order), so
every test compares the two paths on the same inputs, and the
subgraph-pass tests force the device gate both ways via
KREEQ_TPU_FRONTIER_MIN.
"""

import numpy as np
import pytest

from kreeq_tpu.core.keys import canonical_np, isin_sorted_np, neighbors8_np
from kreeq_tpu.ops.frontier import survivors_np


def _host_reference(keys, fw, bw, sub_sorted, k, cutoff):
    cand = neighbors8_np(keys, k)
    elig = np.empty((keys.size, 8), bool)
    elig[:, 0::2] = fw > cutoff
    elig[:, 1::2] = bw > cutoff
    ok = elig & ~isin_sorted_np(sub_sorted, cand)
    idx = np.nonzero(ok.ravel())[0]
    return cand.ravel()[idx], idx


@pytest.mark.parametrize("n,m,k,cutoff,seed", [
    (1000, 700, 21, 0, 0),
    (5000, 5000, 31, 1, 1),
    (3, 1, 5, 0, 2),
    (100, 0, 32, 2, 3),     # k=32: full 64-bit keys
    (257, 31, 11, 0, 4),    # non-pow2 sizes exercise padding
])
def test_survivors_matches_host_scan(n, m, k, cutoff, seed):
    rng = np.random.default_rng(seed)
    keys, _ = canonical_np(
        rng.integers(0, 1 << min(2 * k, 63), n).astype(np.uint64), k)
    keys = np.unique(keys)
    rng.shuffle(keys)
    n = keys.size
    fw = rng.integers(0, 4, (n, 4)).astype(np.uint32)
    bw = rng.integers(0, 4, (n, 4)).astype(np.uint32)
    cand = neighbors8_np(keys, k)
    pool = np.concatenate([
        cand.ravel()[rng.integers(0, n * 8, max(m // 2, 1))],
        canonical_np(rng.integers(0, 1 << min(2 * k, 63),
                                  max(m // 2, 1)).astype(np.uint64),
                     k)[0]])
    sub_sorted = np.sort(np.unique(pool)[:m])

    want_vals, want_idx = _host_reference(keys, fw, bw, sub_sorted, k,
                                          cutoff)
    got_vals, got_idx = survivors_np(keys, fw, bw, sub_sorted, k, cutoff)
    assert np.array_equal(got_idx, want_idx)
    assert np.array_equal(got_vals, want_vals)


def test_cap_retry_path():
    """Survivor count above the initial 2^14 cap must retry, not drop."""
    rng = np.random.default_rng(9)
    k = 25
    keys, _ = canonical_np(
        rng.integers(0, 1 << 50, 40000).astype(np.uint64), k)
    keys = np.unique(keys)
    fw = np.full((keys.size, 4), 2, np.uint32)
    bw = np.full((keys.size, 4), 2, np.uint32)
    sub_sorted = np.zeros(0, np.uint64)
    want_vals, want_idx = _host_reference(keys, fw, bw, sub_sorted, k, 0)
    assert want_idx.size > (1 << 14)
    got_vals, got_idx = survivors_np(keys, fw, bw, sub_sorted, k, 0)
    assert np.array_equal(got_idx, want_idx)
    assert np.array_equal(got_vals, want_vals)


def _toy_dbg(monkeypatch_env=None):
    """Small DBG whose assembly is a slice of the read genome, so
    traversal/boundary/prune all have real work."""
    import tempfile

    from kreeq_tpu.config import UserInput
    from kreeq_tpu.constants import ITOC
    from kreeq_tpu.core.dbg import DBG
    from kreeq_tpu.core.table import KmerTable
    from kreeq_tpu.io.sequence import Genome

    rng = np.random.default_rng(11)
    seq = "".join(ITOC[b] for b in rng.integers(0, 4, 4000))
    ui = UserInput()
    ui.kmer_len = 15
    with tempfile.TemporaryDirectory() as td:
        with open(f"{td}/reads.fasta", "w") as fh:
            fh.write(f">r0\n{seq}\n")
        table = KmerTable.from_reads([f"{td}/reads.fasta"], 15)
    genome = Genome()
    genome.append_sequence("asm", "", seq[500:-500], 0)
    dbg = DBG(ui, table)
    dbg.genome = genome
    return dbg


def _snapshot(sub):
    return [(k, tuple(n.fw), tuple(n.bw), n.cov, n.color)
            for k, n in sub.items()]


def test_subgraph_passes_device_vs_host(monkeypatch):
    from kreeq_tpu.core.subgraph import (extract_subgraph,
                                         remove_missing_edges, traversal)

    dbg = _toy_dbg()
    dbg.ui.trav_algorithm = "traversal"
    dbg.ui.kmer_depth = 4

    results = []
    for thr in ("0", "999999999"):
        monkeypatch.setenv("KREEQ_TPU_FRONTIER_MIN", thr)
        sub = extract_subgraph(dbg)
        traversal(dbg, sub)
        remove_missing_edges(dbg, sub)
        results.append(_snapshot(sub))
    assert results[0] == results[1]


def test_best_first_device_vs_host(monkeypatch):
    from kreeq_tpu.core.subgraph import best_first, extract_subgraph

    dbg = _toy_dbg()
    dbg.ui.trav_algorithm = "best-first"
    dbg.ui.kmer_depth = -1

    results = []
    for thr in ("0", "999999999"):
        monkeypatch.setenv("KREEQ_TPU_FRONTIER_MIN", thr)
        sub = extract_subgraph(dbg)
        out = best_first(dbg, sub)
        results.append(_snapshot(out))
    assert results[0] == results[1]
