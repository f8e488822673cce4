"""Kernel-level unit tests (coverage the reference lacks; SURVEY.md §4)."""

import os

import numpy as np
import pytest

from .conftest import REFERENCE, reference_available

K = 21
CM = {c: i for i, c in enumerate("ACGT")}


def ref_count(seqs, k):
    """Pure-python oracle for canonical counting with edge bits."""
    acc = {}
    for s in seqs:
        vals = [CM.get(c.upper(), 4) for c in s]
        n = len(vals)
        for p in range(n - k + 1):
            w = vals[p:p + k]
            if any(v > 3 for v in w):
                continue
            fw = sum(v << (2 * i) for i, v in enumerate(w))
            rc = sum((3 - v) << (2 * i) for i, v in enumerate(reversed(w)))
            isfw = fw <= rc
            key = min(fw, rc)
            e = acc.setdefault(key, [0] * 9)
            nxt = vals[p + k] if p + k < n else 4
            prv = vals[p - 1] if p > 0 else 4
            if isfw:
                if nxt <= 3:
                    e[nxt] += 1
                if prv <= 3:
                    e[4 + prv] += 1
            else:
                if prv <= 3:
                    e[3 - prv] += 1
                if nxt <= 3:
                    e[4 + 3 - nxt] += 1
            e[8] += 1
    return acc


def device_count(seqs, k):
    import jax.numpy as jnp

    from kreeq_tpu.ops import kmers as KM

    acc = {}
    for buf in KM.pack_reads(iter(seqs), k, 1 << 12):
        keys, _isfw, edges, valid = KM.kmer_positions(jnp.asarray(buf), k)
        ukeys, cov, fw, bw, n = KM.count_sorted(keys, edges, valid)
        n = int(n)
        ukeys, cov, fw, bw = (np.asarray(ukeys[:n]), np.asarray(cov[:n]),
                              np.asarray(fw[:n]), np.asarray(bw[:n]))
        for i in range(n):
            e = acc.setdefault(int(ukeys[i]), [0] * 9)
            for w in range(4):
                e[w] += int(fw[i, w])
                e[4 + w] += int(bw[i, w])
            e[8] += int(cov[i])
    return acc


def random_seqs(rng, n, lo=30, hi=200, with_n=False):
    alphabet = "ACGTN" if with_n else "ACGT"
    probs = [0.24, 0.24, 0.24, 0.24, 0.04] if with_n else [0.25] * 4
    return ["".join(rng.choice(list(alphabet), size=rng.integers(lo, hi),
                               p=probs)) for _ in range(n)]


def test_count_matches_oracle():
    rng = np.random.default_rng(0)
    seqs = random_seqs(rng, 40)
    assert device_count(seqs, K) == ref_count(seqs, K)


def test_count_matches_oracle_with_n():
    rng = np.random.default_rng(1)
    seqs = random_seqs(rng, 40, with_n=True)
    assert device_count(seqs, K) == ref_count(seqs, K)


def test_count_small_k():
    rng = np.random.default_rng(2)
    seqs = random_seqs(rng, 10, lo=5, hi=40)
    for k in (3, 15, 31):
        assert device_count(seqs, k) == ref_count(seqs, k)


def test_long_read_bucketing():
    rng = np.random.default_rng(3)
    seqs = random_seqs(rng, 3, lo=5000, hi=9000)
    assert device_count(seqs, K) == ref_count(seqs, K)


def test_multichunk_lookahead_matches_single_chunk(tmp_path):
    """Pipelined (lookahead) chunked build == one-chunk build."""
    from kreeq_tpu.core.table import KmerTable

    rng = np.random.default_rng(7)
    seqs = random_seqs(rng, 200, lo=60, hi=200)
    path = tmp_path / "reads.fasta"
    path.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(seqs)))
    multi = KmerTable.from_reads([str(path)], k=K, chunk=1 << 12)
    one = KmerTable.from_reads([str(path)], k=K, chunk=1 << 17)
    assert np.array_equal(multi.keys, one.keys)
    assert np.array_equal(multi.cov, one.cov)
    assert np.array_equal(multi.fw, one.fw)
    assert np.array_equal(multi.bw, one.bw)


def test_merge_tables():
    import jax.numpy as jnp

    from kreeq_tpu.core.table import KmerTable
    from kreeq_tpu.ops import kmers as KM

    rng = np.random.default_rng(4)
    a, b = random_seqs(rng, 10), random_seqs(rng, 10)

    def to_table(seqs):
        return KmerTable.from_entries(
            K, {k_: tuple(v) for k_, v in device_count(seqs, K).items()})

    merged = to_table(a).merge(to_table(b))
    want = ref_count(a + b, K)
    got = {int(merged.keys[i]): list(merged.fw[i]) + list(merged.bw[i])
           + [int(merged.cov[i])] for i in range(len(merged))}
    assert got == {k_: v for k_, v in want.items()}


def test_merge_saturation():
    from kreeq_tpu.core.table import KmerTable

    big = 0xFFFFFFFF - 1
    t1 = KmerTable.from_entries(K, {5: (big, 0, 0, 0, 0, 0, 0, 0, big)})
    t2 = KmerTable.from_entries(K, {5: (7, 0, 0, 0, 0, 0, 0, 0, 7)})
    m = t1.merge(t2)
    assert int(m.cov[0]) == 0xFFFFFFFF  # LARGEST clamp
    assert int(m.fw[0, 0]) == 0xFFFFFFFF


@pytest.mark.skipif(not reference_available(), reason="no reference corpus")
def test_fixture_db_roundtrip(tmp_path):
    """read test1.kreeq -> write -> read: identical tables; and the
    fixture must equal counting random1.fastq (pins the hash encoding)."""
    from kreeq_tpu.core.table import KmerTable
    from kreeq_tpu.io.kreeqdb import read_kreeq, write_kreeq

    db = read_kreeq(os.path.join(REFERENCE, "testFiles", "test1.kreeq"))
    assert db.k == 21 and len(db) == 96
    st = db.stats()
    assert (st.total, st.unique, st.distinct, st.edges) == (172, 25, 96, 160)

    counted = KmerTable.from_reads(
        [os.path.join(REFERENCE, "testFiles", "random1.fastq")], 21)
    assert np.array_equal(counted.keys, db.keys)
    assert np.array_equal(counted.cov, db.cov)
    assert np.array_equal(counted.fw, db.fw)
    assert np.array_equal(counted.bw, db.bw)

    out = tmp_path / "rt.kreeq"
    write_kreeq(str(out), db)
    rt = read_kreeq(str(out))
    assert np.array_equal(rt.keys, db.keys)
    assert np.array_equal(rt.cov, db.cov)
    assert np.array_equal(rt.fw, db.fw)
    assert np.array_equal(rt.bw, db.bw)


def test_probe():
    from kreeq_tpu.core.table import KmerTable

    rng = np.random.default_rng(5)
    seqs = random_seqs(rng, 20)
    want = ref_count(seqs, K)
    table = KmerTable.from_entries(K, {k_: tuple(v)
                                       for k_, v in want.items()})
    keys = list(want.keys())
    qk = np.array(keys + [1, 2, 3], np.uint64)
    found, cov, fw, bw = table.probe(qk)
    for i, key in enumerate(keys):
        assert found[i]
        assert cov[i] == want[key][8]
        assert list(fw[i]) == want[key][0:4]
        assert list(bw[i]) == want[key][4:8]
    assert not found[-3:].any() or {1, 2, 3} & set(keys)


def test_probe_merge_matches_bucketed():
    """probe_merge is an exact drop-in for the bucketed bisection,
    including SENTINEL table padding, key 0, duplicate queries, and
    all-miss batches (kreeq_tpu/ops/kmers.py probe_merge)."""
    import jax.numpy as jnp

    from kreeq_tpu.ops.kmers import (build_bucket_index, probe_bucketed,
                                     probe_merge)

    rng = np.random.default_rng(11)
    k = 21
    t, q = 1 << 12, 1 << 10
    tkeys = np.unique(rng.integers(0, 1 << (2 * k), t, dtype=np.uint64))
    tkeys = np.sort(tkeys)
    # include key 0 and SENTINEL padding rows
    tkeys[0] = 0
    pad = t - tkeys.size + 8
    tkeys = np.concatenate(
        [tkeys, np.full(pad, 0xFFFFFFFFFFFFFFFF, np.uint64)])
    tt = tkeys.size
    cov = rng.integers(1, 100, tt).astype(np.uint32)
    fw = rng.integers(0, 100, (tt, 4)).astype(np.uint32)
    bw = rng.integers(0, 100, (tt, 4)).astype(np.uint32)
    hits = tkeys[rng.integers(0, tt - pad, q // 2)]
    misses = rng.integers(0, 1 << (2 * k), q // 2, dtype=np.uint64)
    qkeys = np.concatenate([hits, misses, hits[:1], [np.uint64(0)]])

    args = tuple(map(jnp.asarray, (tkeys, cov, fw, bw)))
    qj = jnp.asarray(qkeys)
    bits = 12
    starts = build_bucket_index(args[0], k, bits)
    counts = np.diff(np.asarray(starts))
    rounds = max(1, int(np.ceil(np.log2(counts.max() + 1))))
    want = probe_bucketed(*args, starts, qj, k, bits, rounds)
    got = probe_merge(*args, qj)
    for a, b in zip(want, got):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    # all-miss batch
    qmiss = jnp.asarray(np.full(64, 7, np.uint64))
    found, c, f4, b4 = probe_merge(*args, qmiss)
    if 7 not in tkeys:
        assert not np.asarray(found).any()
        assert not np.asarray(c).any()


def test_highcoverage_multichunk_retrim(tmp_path):
    """Deferred-trim pipeline at high duplication: many chunks of the
    SAME sequence collapse through the level retrims to one small
    table identical to the single-chunk build (core/table.py
    from_reads push/_trim)."""
    from kreeq_tpu.core.table import KmerTable

    rng = np.random.default_rng(9)
    base = "".join(rng.choice(list("ACGT"), size=3000))
    # 30x coverage: 90 copies in overlapping thirds
    reads = [base[i % 3 * 1000:(i % 3 + 1) * 1000 + K - 1]
             for i in range(90)]
    path = tmp_path / "reads.fasta"
    path.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(reads)))
    multi = KmerTable.from_reads([str(path)], k=K, chunk=1 << 11)
    one = KmerTable.from_reads([str(path)], k=K, chunk=1 << 20)
    assert np.array_equal(multi.keys, one.keys)
    assert np.array_equal(multi.cov, one.cov)
    assert np.array_equal(multi.fw, one.fw)
    assert np.array_equal(multi.bw, one.bw)
    assert multi.cov.max() >= 30


def test_k32_boundary_oracle():
    """k=32 uses all 64 key bits (reference allows 0 < k <= 32,
    src/input.cpp:142-145); canonical keys can never collide with the
    SENTINEL because min(x, revcomp(x)) of an all-ones key is 0."""
    import collections

    import jax.numpy as jnp

    from kreeq_tpu.ops.kmers import (count_sorted, kmer_positions,
                                     probe_merge)

    k = 32
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 5000).astype(np.uint8)
    keys, _isfw, edges, valid = kmer_positions(jnp.asarray(codes), k)
    tk, cov, fw, bw, n = count_sorted(keys, edges, valid)
    n = int(n)

    def canon(sub):
        fwd = rc = 0
        for i, c in enumerate(sub):
            fwd |= int(c) << (2 * i)
            rc |= (3 - int(c)) << (2 * (k - 1 - i))
        return min(fwd, rc)

    cnt = collections.Counter(
        canon(codes[p:p + k]) for p in range(len(codes) - k + 1))
    tkn = [int(x) for x in np.asarray(tk)[:n].tolist()]
    assert len(cnt) == n
    assert sorted(cnt.keys()) == sorted(tkn)
    covs = dict(zip(tkn, np.asarray(cov)[:n].tolist()))
    assert all(covs[key] == c for key, c in cnt.items())

    found, _c, _f, _b = probe_merge(tk, cov, fw, bw, keys)
    assert bool(np.asarray(found & np.asarray(valid)).all())
