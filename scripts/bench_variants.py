"""1 Mbp error-correction benchmark: batched vs per-position variants.

Measures dbg_to_variants (the `-o vcf` hot path) on a 1 Mbp synthetic
assembly with planted SNVs, against the round-1 per-position host loop
(reimplemented here verbatim for comparison).  Run:

    PYTHONPATH=. KREEQ_TPU_PLATFORM=cpu python scripts/bench_variants.py
"""

import time

import numpy as np


def old_dbg_to_variants(dbg, seg):
    """Round-1 per-position loop (scalar table.lookup + a search from
    every found position), kept for the speedup measurement."""
    from kreeq_tpu.core.variants import search_variants

    k = dbg.k
    ln = len(seg)
    if ln < k:
        return
    kcount = ln - k + 1
    max_span = dbg.ui.max_span
    table = dbg.table
    codes = seg.codes
    cache = {}
    visited = [False] * ln
    variants = []

    import jax.numpy as jnp

    from kreeq_tpu.ops.kmers import kmer_positions

    all_keys, all_isfw, _e, valid = kmer_positions(jnp.asarray(codes), k)
    all_keys = np.asarray(all_keys).copy()
    all_isfw = np.asarray(all_isfw)
    valid = np.asarray(valid)
    invalid = np.nonzero(~valid[:kcount])[0]
    all_keys[invalid] = np.uint64(1 << 63) | invalid.astype(np.uint64)

    def pos_key(p):
        return int(all_keys[p]), bool(all_isfw[p])

    explored_total = 0
    while explored_total < kcount:
        targets_queue = []
        targets_map = {}
        for pos in range(max_span):
            if pos + k < kcount:
                key, _ = pos_key(pos + k)
                targets_queue.append(key)
                targets_map[key] = True
        for c in range(kcount):
            if targets_queue:
                targets_map.pop(targets_queue.pop(0), None)
            if c + k + max_span < kcount:
                key, _ = pos_key(c + k + max_span)
                targets_map[key] = True
                targets_queue.append(key)
            if visited[c]:
                continue
            skey, is_fw = pos_key(c)
            rec = table.lookup(skey)
            if rec is None:
                explored_total += 1
                visited[c] = True
                continue
            ref_key = pos_key(c + 1)[0] if c + 1 <= kcount - 1 else None
            ok, paths = search_variants(
                dbg, skey, rec, is_fw, ref_key, targets_queue,
                targets_map, cache)
            explored_total += ok
            if ok:
                for p in paths:
                    p.pos = c + k
                if paths:
                    variants.append(paths)
                visited[c] = True
    seg.variants = variants


def main():
    import kreeq_tpu  # noqa: F401
    from kreeq_tpu.config import UserInput
    from kreeq_tpu.core.dbg import DBG
    from kreeq_tpu.core.table import KmerTable
    from kreeq_tpu.core.variants import dbg_to_variants
    from kreeq_tpu.io.sequence import Genome

    n = 1_000_000
    n_snv = 100
    rng = np.random.default_rng(42)
    genome = "".join(rng.choice(list("ACGT"), size=n))

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        # reads = 3x coverage of the clean genome (3 shifted copies)
        with open(f"{td}/reads.fasta", "w") as fh:
            for i, off in enumerate((0, 101, 211)):
                fh.write(f">r{i}\n{genome[off:] + genome[:off]}\n")
        t0 = time.perf_counter()
        table = KmerTable.from_reads([f"{td}/reads.fasta"], 21)
        print(f"DB build: {time.perf_counter() - t0:.1f}s "
              f"({len(table)} distinct)")

    asm = list(genome)
    pos = rng.choice(np.arange(1000, n - 1000), size=n_snv, replace=False)
    for p in pos:
        asm[p] = "ACGT"[(ord(asm[p]) + 1) % 4]
    asm = "".join(asm)

    ui = UserInput(out_file="out.vcf")
    g = Genome()
    g.append_sequence("chr1", "", asm, 0)

    dbg = DBG(ui, table)
    dbg.load_genome(g)
    seg = dbg.genome.segments[0]

    dbg_to_variants(dbg, seg)  # warm (JIT compiles)
    t0 = time.perf_counter()
    dbg_to_variants(dbg, seg)
    t_new = time.perf_counter() - t0
    n_vars = sum(len(v) for v in seg.variants)
    print(f"batched:      {t_new:8.2f}s  ({len(seg.variants)} variant "
          f"groups, {n_vars} paths)")

    new_result = [(p.type, p.pos, p.sequence, p.ref_len)
                  for grp in seg.variants for p in grp]

    t0 = time.perf_counter()
    old_dbg_to_variants(dbg, seg)
    t_old = time.perf_counter() - t0
    old_result = [(p.type, p.pos, p.sequence, p.ref_len)
                  for grp in seg.variants for p in grp]
    print(f"per-position: {t_old:8.2f}s")
    print(f"speedup: {t_old / t_new:.1f}x")
    assert new_result == old_result, "batched result differs!"
    print("outputs identical")


if __name__ == "__main__":
    main()
