"""Multi-device SPMD pipeline tests (8 virtual CPU devices)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mesh():
    import jax

    from kreeq_tpu.parallel.sharded import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    return make_mesh()


def _oracle(reads, asms, k):
    CM = {"A": 0, "C": 1, "G": 2, "T": 3}

    def canon(sub):
        vals = [CM[c] for c in sub]
        fw = sum(v << (2 * i) for i, v in enumerate(vals))
        rc = sum((3 - v) << (2 * i) for i, v in enumerate(reversed(vals)))
        return min(fw, rc)

    db = set()
    for r in reads:
        for p in range(len(r) - k + 1):
            db.add(canon(r[p:p + k]))
    tot = miss = 0
    for a in asms:
        for p in range(len(a) - k + 1):
            tot += 1
            if canon(a[p:p + k]) not in db:
                miss += 1
    return tot, miss


def test_sharded_pipeline_matches_oracle(mesh):
    import jax.numpy as jnp

    from kreeq_tpu.constants import seq_to_codes
    from kreeq_tpu.parallel.sharded import full_pipeline_fn

    n = mesh.devices.size
    k = 21
    chunk = 256
    rng = np.random.default_rng(7)
    genome = "".join(rng.choice(list("ACGT"), size=600))
    reads, asms = [], []
    read_codes = np.full((n, chunk), 4, np.uint8)
    asm_codes = np.full((n, chunk), 4, np.uint8)
    for d in range(n):
        r = genome[d * 60:d * 60 + 180]
        # the assembly diverges from the reads in places -> real misses
        a = list(genome[d * 55:d * 55 + 170])
        if d % 2 == 0 and len(a) > 90:
            a[90] = "ACGT"[(CMIDX := (ord(a[90]) + 1) % 4)]  # noqa: F841
        a = "".join(a)
        reads.append(r)
        asms.append(a)
        read_codes[d, :len(r)] = seq_to_codes(r)
        asm_codes[d, :len(a)] = seq_to_codes(a)

    step = full_pipeline_fn(mesh, k)
    _qf, _qc, tot, miss, _em = step(jnp.asarray(read_codes),
                                    jnp.asarray(asm_codes))
    otot, omiss = _oracle(reads, asms, k)
    assert int(np.asarray(tot)[0]) == otot
    assert int(np.asarray(miss)[0]) == omiss
    assert omiss > 0  # the divergence actually exercised the miss path


def test_sharded_tables_match_host_table(mesh):
    import jax.numpy as jnp

    from kreeq_tpu.core.table import KmerTable
    from kreeq_tpu.ops.kmers import SENTINEL
    from kreeq_tpu.parallel.sharded import sharded_count_fn
    from kreeq_tpu.constants import seq_to_codes

    n = mesh.devices.size
    k = 15
    chunk = 128
    rng = np.random.default_rng(3)
    reads = ["".join(rng.choice(list("ACGT"), size=100)) for _ in range(n)]
    read_codes = np.full((n, chunk), 4, np.uint8)
    for d, r in enumerate(reads):
        read_codes[d, :len(r)] = seq_to_codes(r)

    count = sharded_count_fn(mesh, k)
    tkeys, tcov, _tfw, _tbw, nvalid = count(jnp.asarray(read_codes))
    tkeys = np.asarray(tkeys)
    tcov = np.asarray(tcov)

    got = {}
    for d in range(n):
        for key, cov in zip(tkeys[d], tcov[d]):
            if key != int(np.uint64(SENTINEL)):
                assert int(key) % n == d  # shard ownership
                got[int(key)] = got.get(int(key), 0) + int(cov)

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i, r in enumerate(reads):
            p = f"{td}/r{i}.fasta"
            with open(p, "w") as fh:
                fh.write(f">r{i}\n{r}\n")
            paths.append(p)
        want = KmerTable.from_reads(paths, k)
        # explicit-mesh build must agree with the single-device build
        sharded = KmerTable.from_reads(paths, k, chunk=256, mesh=mesh)
    assert got == {int(want.keys[i]): int(want.cov[i])
                   for i in range(len(want))}
    assert np.array_equal(sharded.keys, want.keys)
    assert np.array_equal(sharded.cov, want.cov)
    assert np.array_equal(sharded.fw, want.fw)
    assert np.array_equal(sharded.bw, want.bw)
