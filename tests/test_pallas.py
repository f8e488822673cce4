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


def _rand_table(rng, t, kbits=42):
    tkeys = np.unique(rng.integers(0, 1 << kbits, t).astype(np.uint64))
    t = len(tkeys)
    cov = rng.integers(0, 1 << 32, t, dtype=np.uint64).astype(np.uint32)
    fw = rng.integers(0, 1 << 32, (t, 4), dtype=np.uint64).astype(np.uint32)
    bw = rng.integers(0, 1 << 32, (t, 4), dtype=np.uint64).astype(np.uint32)
    return tkeys, cov, fw, bw


@pytest.mark.parametrize("seed,t,q,hit_frac", [
    (0, 2000, 700, 0.5),    # mixed hits/misses, unaligned sizes
    (1, 5, 1500, 0.9),      # tiny table, duplicate-heavy queries
    (2, 4000, 3, 0.3),      # tiny query batch
    (3, 3000, 1024, 0.0),   # all-miss
    (4, 3000, 1024, 1.0),   # all-hit
])
def test_pallas_probe_matches_merge(seed, t, q, hit_frac):
    import jax.numpy as jnp

    from kreeq_tpu.ops.kmers import probe_merge
    from kreeq_tpu.ops.pallas_kernels import probe_merge_pallas

    rng = np.random.default_rng(seed)
    tkeys, cov, fw, bw = _rand_table(rng, t)
    nhit = int(q * hit_frac)
    qk = np.concatenate([
        rng.choice(tkeys, nhit),
        rng.integers(0, 1 << 42, q - nhit).astype(np.uint64),
    ])
    rng.shuffle(qk)
    if q >= 3:  # sentinel (invalid) queries must come back not-found
        qk[q // 2] = np.uint64(0xFFFFFFFFFFFFFFFF)

    args = (jnp.asarray(tkeys), jnp.asarray(cov), jnp.asarray(fw),
            jnp.asarray(bw), jnp.asarray(qk))
    ref = probe_merge(*args)
    got = probe_merge_pallas(*args)
    for name, a, b in zip(("found", "cov", "fw", "bw"), ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_pallas_probe_sentinel_padded_table():
    """count_sorted-style tables carry a SENTINEL-padded tail; padding
    must never match and spans must stay exact."""
    import jax.numpy as jnp

    from kreeq_tpu.ops.kmers import SENTINEL, probe_merge
    from kreeq_tpu.ops.pallas_kernels import probe_merge_pallas

    rng = np.random.default_rng(7)
    tkeys, cov, fw, bw = _rand_table(rng, 900)
    pad = 1024 - len(tkeys)
    tkeys = np.concatenate([tkeys,
                            np.full(pad, 0xFFFFFFFFFFFFFFFF, np.uint64)])
    cov = np.concatenate([cov, np.zeros(pad, np.uint32)])
    fw = np.concatenate([fw, np.zeros((pad, 4), np.uint32)])
    bw = np.concatenate([bw, np.zeros((pad, 4), np.uint32)])
    qk = np.concatenate([rng.choice(tkeys[:900], 300),
                         rng.integers(0, 1 << 42, 200).astype(np.uint64),
                         np.full(8, 0xFFFFFFFFFFFFFFFF, np.uint64)])
    rng.shuffle(qk)
    args = (jnp.asarray(tkeys), jnp.asarray(cov), jnp.asarray(fw),
            jnp.asarray(bw), jnp.asarray(qk))
    ref = probe_merge(*args)
    got = probe_merge_pallas(*args)
    assert int(np.asarray(got[0]).sum()) > 0
    for name, a, b in zip(("found", "cov", "fw", "bw"), ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name
    assert SENTINEL is not None


def test_pallas_probe_skewed_spans():
    """Clustered queries against a clustered table: exercises large
    dmax and zero-span tiles in the same call."""
    import jax.numpy as jnp

    from kreeq_tpu.ops.kmers import probe_merge
    from kreeq_tpu.ops.pallas_kernels import probe_merge_pallas

    rng = np.random.default_rng(11)
    dense = np.arange(0, 20000, dtype=np.uint64)  # dense cluster
    sparse = rng.integers(1 << 40, 1 << 42, 500).astype(np.uint64)
    tkeys = np.unique(np.concatenate([dense, sparse]))
    t = len(tkeys)
    cov = rng.integers(1, 100, t).astype(np.uint32)
    fw = rng.integers(0, 100, (t, 4)).astype(np.uint32)
    bw = rng.integers(0, 100, (t, 4)).astype(np.uint32)
    # one query tile spans the whole dense cluster; others hit nothing
    qk = np.concatenate([
        rng.integers(0, 20000, 300).astype(np.uint64),
        rng.integers(1 << 43, 1 << 44, 800).astype(np.uint64),
    ])
    rng.shuffle(qk)
    args = (jnp.asarray(tkeys), jnp.asarray(cov), jnp.asarray(fw),
            jnp.asarray(bw), jnp.asarray(qk))
    ref = probe_merge(*args)
    got = probe_merge_pallas(*args)
    for name, a, b in zip(("found", "cov", "fw", "bw"), ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_pallas_validate_path_golden(monkeypatch):
    """Full validate pipeline with the Pallas probe (interpret mode)
    must match golden test.0 byte-for-byte."""
    import contextlib
    import io
    import os
    import shlex

    from .conftest import REFERENCE, reference_available
    if not reference_available():
        pytest.skip("reference corpus not present")

    monkeypatch.setenv("KREEQ_TPU_PALLAS", "1")
    from kreeq_tpu.cli.main import run

    tst = os.path.join(REFERENCE, "validateFiles", "test.0.tst")
    with open(tst) as fh:
        lines = fh.read().splitlines()
    cmd, golden = lines[0], "\n".join(lines[2:])
    cwd = os.getcwd()
    buf = io.StringIO()
    try:
        os.chdir(REFERENCE)
        with contextlib.redirect_stdout(buf):
            run(shlex.split(cmd))
    finally:
        os.chdir(cwd)
    assert buf.getvalue().rstrip("\n") == golden.rstrip("\n")


@pytest.mark.parametrize("seed,n,badp,k", [
    (0, 9000, 0.02, 21),
    (1, 5000, 0.0, 31),
    (2, 4000, 0.1, 15),
    (3, 3000, 0.0, 32),   # full-width keys
])
def test_pallas_validate_select_matches_xla(seed, n, badp, k):
    """The select-probe fast path (ctx-carrying sort + column select +
    keyed-sort restore) must match the fused XLA validate classifier
    on every output."""
    import jax.numpy as jnp

    from kreeq_tpu.ops.kmers import (build_bucket_index, count_sorted,
                                     kmer_positions)
    from kreeq_tpu.ops.validate import (validate_positions,
                                        validate_positions_pallas)

    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, n).astype(np.uint8)
    keys, _i, edges, valid = kmer_positions(jnp.asarray(genome), k)
    tkeys, cov, fw, bw, cnt = count_sorted(keys, edges, valid)
    cnt = int(cnt)
    tkeys, cov, fw, bw = (a[:cnt] for a in (tkeys, cov, fw, bw))

    codes = rng.integers(0, 4, n // 2).astype(np.uint8)
    # splice in genome windows (hits) and BAD bases (invalid windows)
    codes[: n // 4] = genome[: n // 4]
    codes[rng.random(n // 2) < badp] = 4
    codes_d = jnp.asarray(codes)

    bits = max(8, int(np.ceil(np.log2(cnt))) + 1)
    bits = min(bits, 2 * k)
    starts = build_bucket_index(tkeys, k, bits)
    counts = np.diff(np.asarray(starts))
    rounds = max(1, int(np.ceil(np.log2(counts.max() + 1))))
    ref = validate_positions(tkeys, cov, fw, bw, starts, codes_d, k, 0,
                             bits, rounds, True)
    got = validate_positions_pallas(tkeys, cov, fw, bw, codes_d, k, 0)
    names = ("valid", "missing", "edge_missing", "cov", "isfw", "right",
             "left")
    for name, a, b in zip(names, ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


@pytest.mark.parametrize("seed,n,badp,k,cutoff", [
    (0, 20000, 0.02, 21, 0),
    (1, 12000, 0.0, 31, 0),
    (2, 9000, 0.05, 21, 2),     # cutoff > 0: cov threshold in-kernel
    (3, 7000, 0.0, 15, 300),    # cutoff above every cov: all missing
])
def test_pallas_validate_qv_sums_match_xla(seed, n, badp, k, cutoff):
    """The sums-only QV fast path (indicator kernel, no restore sort)
    must match the full XLA classifier's window sums exactly,
    including the seam mask and both fallback routes."""
    import jax.numpy as jnp

    from kreeq_tpu.ops.kmers import kmer_positions, count_sorted
    from kreeq_tpu.ops.validate import (validate_positions,
                                        validate_qv_sums_pallas)

    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, n).astype(np.uint8)
    keys, _i, edges, valid = kmer_positions(jnp.asarray(genome), k)
    tkeys, cov, fw, bw, cnt = count_sorted(keys, edges, valid)
    cnt = int(cnt)
    tkeys, cov, fw, bw = (a[:cnt] for a in (tkeys, cov, fw, bw))

    codes = rng.integers(0, 4, n // 2).astype(np.uint8)
    codes[: n // 4] = genome[: n // 4]
    codes[rng.random(n // 2) < badp] = 4
    codes_d = jnp.asarray(codes)
    p = codes.shape[0] - k + 1

    ref = validate_positions(tkeys, cov, fw, bw,
                             jnp.zeros((1 << 8) + 1, jnp.int32),
                             codes_d, k, cutoff, 8, 1, True)
    _valid, missing, edge_missing = ref[0], ref[1], ref[2]
    for lead, hi in ((0, p), (1, p - 1), (5, p // 2)):
        want = (int(np.asarray(missing[lead:hi]).sum()),
                int(np.asarray(edge_missing[lead:hi]).sum()))
        got = validate_qv_sums_pallas(tkeys, cov, fw, bw, codes_d, k,
                                      cutoff, jnp.uint32(lead),
                                      jnp.uint32(hi))
        assert (int(got[0]), int(got[1])) == want, (lead, hi)


def test_pallas_qv_sums_empty_table_fallback():
    """Empty table routes through the XLA fallback: every valid window
    is missing, none edge-missing."""
    import jax.numpy as jnp

    from kreeq_tpu.ops.validate import validate_qv_sums_pallas

    k = 21
    codes = np.random.default_rng(7).integers(0, 4, 200).astype(np.uint8)
    p = codes.shape[0] - k + 1
    res = validate_qv_sums_pallas(
        jnp.zeros((0,), jnp.uint64), jnp.zeros((0,), jnp.uint32),
        jnp.zeros((0, 4), jnp.uint32), jnp.zeros((0, 4), jnp.uint32),
        jnp.asarray(codes), k, 0, jnp.uint32(0), jnp.uint32(p))
    assert int(res[0]) == p and int(res[1]) == 0 and int(res[2]) == 1


def test_pallas_probe_empty_inputs():
    import jax.numpy as jnp

    from kreeq_tpu.ops.pallas_kernels import probe_merge_pallas

    rng = np.random.default_rng(3)
    tkeys, cov, fw, bw = _rand_table(rng, 100)
    # empty query batch
    f, c, w, b = probe_merge_pallas(
        jnp.asarray(tkeys), jnp.asarray(cov), jnp.asarray(fw),
        jnp.asarray(bw), jnp.zeros((0,), jnp.uint64))
    assert f.shape == (0,) and w.shape == (0, 4)
    # empty table
    f, c, w, b = probe_merge_pallas(
        jnp.zeros((0,), jnp.uint64), jnp.zeros((0,), jnp.uint32),
        jnp.zeros((0, 4), jnp.uint32), jnp.zeros((0, 4), jnp.uint32),
        jnp.asarray(tkeys[:5]))
    assert not bool(np.asarray(f).any())


def _rand_merge_table(rng, n, kbits=40):
    keys = np.unique(rng.integers(0, 1 << kbits, n).astype(np.uint64))
    t = len(keys)
    cov = rng.integers(0, 1 << 32, t, dtype=np.uint64).astype(np.uint32)
    fw = rng.integers(0, 1 << 32, (t, 4), dtype=np.uint64).astype(np.uint32)
    bw = rng.integers(0, 1 << 32, (t, 4), dtype=np.uint64).astype(np.uint32)
    return keys, cov, fw, bw


@pytest.mark.parametrize("na,nb,seed", [
    (1500, 900, 1),     # disjoint-ish, multi-tile
    (5, 3000, 8),       # tiny vs big
    (400, 400, 10),     # dense duplicate ratio
    (3000, 3000, 13),   # big
])
def test_pallas_merge_matches_xla(na, nb, seed):
    import jax.numpy as jnp

    from kreeq_tpu.ops.kmers import merge_sorted
    from kreeq_tpu.ops.pallas_kernels import merge_sorted_pallas

    rng = np.random.default_rng(seed)
    A = _rand_merge_table(rng, na)
    B = _rand_merge_table(rng, nb, kbits=14 if na == nb else 40)
    args = [jnp.asarray(x) for x in (*A, *B)]
    ref = merge_sorted(*args)
    got = merge_sorted_pallas(*args)
    n = int(ref[4])
    assert n == int(got[4])
    for name, x, y in zip("kcfb", ref[:4], got[:4]):
        assert np.array_equal(np.asarray(x)[:n], np.asarray(y)[:n]), name


def test_pallas_merge_saturation_and_padding():
    """Overlapping keys near LARGEST must saturate exactly; SENTINEL
    input padding (pow2 table buffers) must not leak."""
    import jax.numpy as jnp

    from kreeq_tpu.ops.kmers import merge_sorted
    from kreeq_tpu.ops.pallas_kernels import merge_sorted_pallas

    rng = np.random.default_rng(3)
    ka, ca, fa, ba = _rand_merge_table(rng, 800)
    kb = np.unique(np.concatenate(
        [ka[::3], rng.integers(0, 1 << 40, 500).astype(np.uint64)]))
    t = len(kb)
    cb = np.full(t, 0xFFFFFFF0, np.uint32)
    fb = rng.integers(0, 1 << 31, (t, 4), dtype=np.uint64).astype(np.uint32)
    bb = rng.integers(0, 1 << 31, (t, 4), dtype=np.uint64).astype(np.uint32)

    def padto(arrs, size):
        k, c, f, b = arrs
        pad = size - len(k)
        return (np.concatenate(
            [k, np.full(pad, 0xFFFFFFFFFFFFFFFF, np.uint64)]),
            np.concatenate([c, np.zeros(pad, np.uint32)]),
            np.concatenate([f, np.zeros((pad, 4), np.uint32)]),
            np.concatenate([b, np.zeros((pad, 4), np.uint32)]))

    A = padto((ka, ca, fa, ba), 1024)
    B = padto((kb, cb, fb, bb), 2048)
    args = [jnp.asarray(x) for x in (*A, *B)]
    ref = merge_sorted(*args)
    got = merge_sorted_pallas(*args)
    n = int(ref[4])
    assert n == int(got[4])
    for name, x, y in zip("kcfb", ref[:4], got[:4]):
        assert np.array_equal(np.asarray(x)[:n], np.asarray(y)[:n]), name


def test_pallas_union_cli_golden(monkeypatch):
    """`kreeq union` through the Pallas merge matches golden test.35."""
    import contextlib
    import io
    import os
    import shlex

    from .conftest import REFERENCE, reference_available
    if not reference_available():
        pytest.skip("reference corpus not present")
    monkeypatch.setenv("KREEQ_TPU_PALLAS", "1")
    from kreeq_tpu.cli.main import run

    tst = os.path.join(REFERENCE, "validateFiles", "test.35.tst")
    with open(tst) as fh:
        lines = fh.read().splitlines()
    cmd, golden = lines[0], "\n".join(lines[2:])
    cwd = os.getcwd()
    buf = io.StringIO()
    try:
        os.chdir(REFERENCE)
        with contextlib.redirect_stdout(buf):
            run(shlex.split(cmd))
    finally:
        os.chdir(cwd)
    assert buf.getvalue().rstrip("\n") == golden.rstrip("\n")


@pytest.mark.parametrize("seed,n,k,split", [(0, 30000, 21, 4),
                                            (1, 20000, 31, 3)])
def test_count_sorted_split_matches(seed, n, k, split):
    import jax.numpy as jnp

    from kreeq_tpu.ops.kmers import count_sorted, kmer_positions
    from kreeq_tpu.ops.pallas_kernels import count_sorted_split

    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, n).astype(np.uint8)
    codes[rng.random(n) < 0.02] = 4
    keys, _i, edges, valid = kmer_positions(jnp.asarray(codes), k)
    ref = count_sorted(keys, edges, valid)
    got = count_sorted_split(keys, edges, valid, split)
    nr = int(ref[4])
    assert nr == int(got[4])
    for a, b in zip(ref[:4], got[:4]):
        assert np.array_equal(np.asarray(a)[:nr], np.asarray(b)[:nr])


def test_selfcheck_exact_interpret():
    """The auto-gate's on-device self-check passes in interpret mode
    (force bypasses the CPU-platform guard that production auto obeys)."""
    from kreeq_tpu.ops.pallas_selfcheck import selfcheck

    assert selfcheck(n=1 << 13, k=21, force=True)


def test_pallas_gate_semantics(monkeypatch, tmp_path):
    import kreeq_tpu.utils.pallas_gate as gate

    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    monkeypatch.setattr(gate, "_cached", None)

    monkeypatch.setenv("KREEQ_TPU_PALLAS", "1")
    assert gate.pallas_enabled() is True
    monkeypatch.setenv("KREEQ_TPU_PALLAS", "0")
    assert gate.pallas_enabled() is False
    monkeypatch.delenv("KREEQ_TPU_PALLAS")
    assert gate.pallas_enabled() is False

    # auto on the CPU backend (no interpret): self-check declines,
    # result cached on disk with the backend fingerprint
    monkeypatch.delenv("KREEQ_TPU_PALLAS_INTERPRET", raising=False)
    monkeypatch.setenv("KREEQ_TPU_PALLAS", "auto")
    assert gate.pallas_enabled() is False
    import json
    with open(gate._cache_path()) as f:
        cached = json.load(f)
    assert cached == {"fingerprint": gate._fingerprint(), "ok": False}

    # cached result short-circuits the check (flip it to prove the
    # cache, not the check, answers)
    monkeypatch.setattr(gate, "_cached", None)
    with open(gate._cache_path(), "w") as f:
        json.dump({"fingerprint": gate._fingerprint(), "ok": True}, f)
    assert gate.pallas_enabled() is True
