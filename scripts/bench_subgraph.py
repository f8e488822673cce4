"""Traversal-mode subgraph benchmark: batched vs per-neighbour rounds.

Builds a DB from a 1 Mbp synthetic genome, seeds the subgraph from a
10 kbp slice, and runs `traversal` (BFS frontier expansion) with the
round-1 scalar loop vs the batched rounds, asserting identical node
sets AND identical insertion order (goldens pin GFA ids on it).

    PYTHONPATH=. KREEQ_TPU_PLATFORM=cpu python scripts/bench_subgraph.py
"""

import time

import numpy as np


def old_traversal(dbg, sub):
    """Round-1 per-neighbour loop, kept for the speedup measurement."""
    from kreeq_tpu.core.keys import canonical, next_key_bw, next_key_fw
    from kreeq_tpu.core.subgraph import _db_node

    k = dbg.k
    table = dbg.table
    depth = dbg.ui.resolved_kmer_depth()
    candidates = {}
    frontier = sub
    for _ in range(depth):
        new = {}
        for key, node in frontier.items():
            for i in range(4):
                if node.fw[i] != 0:
                    nk, _ = canonical(next_key_fw(key, i, k), k)
                    if nk not in sub and nk not in new:
                        found = _db_node(table, nk)
                        if found is not None:
                            new[nk] = found
                if node.bw[i] != 0:
                    nk, _ = canonical(next_key_bw(key, i, k), k)
                    if nk not in sub and nk not in new:
                        found = _db_node(table, nk)
                        if found is not None:
                            new[nk] = found
        for key, node in new.items():
            candidates.setdefault(key, node)
        frontier = new
    for key, node in candidates.items():
        sub.setdefault(key, node)


def main() -> None:
    import kreeq_tpu  # noqa: F401
    from kreeq_tpu.config import UserInput
    from kreeq_tpu.constants import ITOC
    from kreeq_tpu.core.dbg import DBG
    from kreeq_tpu.core.subgraph import extract_subgraph, traversal
    from kreeq_tpu.core.table import KmerTable
    from kreeq_tpu.io.sequence import Genome

    import tempfile

    rng = np.random.default_rng(7)
    n = 1_000_000
    genome_codes = rng.integers(0, 4, n).astype(np.uint8)
    genome_str = "".join(ITOC[b] for b in genome_codes)

    ui = UserInput()
    ui.kmer_len = 21
    ui.trav_algorithm = "traversal"

    t0 = time.time()
    with tempfile.TemporaryDirectory() as td:
        with open(f"{td}/reads.fasta", "w") as fh:
            fh.write(f">r0\n{genome_str}\n")  # assembly + 25 kbp flanks
        table = KmerTable.from_reads([f"{td}/reads.fasta"], 21)
    print(f"DB build: {time.time() - t0:.1f}s ({len(table)} distinct)",
          flush=True)

    # assembly = the middle of the read genome: traversal expands the
    # ~1M-node seed subgraph into the flanking read context
    genome = Genome()
    genome.append_sequence("asm", "", genome_str[25_000:-25_000], 0)

    dbg = DBG(ui, table)
    dbg.genome = genome

    sub1 = extract_subgraph(dbg)
    sub2 = {k2: v for k2, v in sub1.items()}
    print(f"seed subgraph: {len(sub1)} nodes", flush=True)

    # warm: compile the device programs on a throwaway copy (every new
    # shape costs a full XLA compile through the remote compiler)
    warm = {k2: v for k2, v in sub1.items()}
    t0 = time.time()
    traversal(dbg, warm)
    print(f"batched traversal (cold): {time.time()-t0:6.2f}s",
          flush=True)

    t0 = time.time()
    traversal(dbg, sub1)
    t_new = time.time() - t0
    print(f"batched traversal (warm): {t_new:6.2f}s -> {len(sub1)} nodes",
          flush=True)

    t0 = time.time()
    old_traversal(dbg, sub2)
    t_old = time.time() - t0
    print(f"scalar traversal:   {t_old:6.2f}s -> {len(sub2)} nodes",
          flush=True)

    assert list(sub1.keys()) == list(sub2.keys()), "order mismatch"
    for kk in sub1:
        a, b = sub1[kk], sub2[kk]
        assert (a.fw, a.bw, a.cov, a.color) == (b.fw, b.bw, b.cov,
                                                b.color), kk
    print(f"speedup: {t_old / t_new:.1f}x — outputs identical "
          f"(incl. insertion order)", flush=True)

    # best-first: prefiltered vs exhaustive per-node Dijkstra
    from kreeq_tpu.core.subgraph import _dijkstra, best_first

    ui.trav_algorithm = "best-first"
    ui.kmer_depth = -1
    sub3 = extract_subgraph(dbg)
    sub4 = dict(sub3)

    t0 = time.time()
    out_new = best_first(dbg, sub3)
    t_new = time.time() - t0
    print(f"prefiltered best-first: {t_new:6.2f}s -> {len(out_new)} nodes",
          flush=True)

    t0 = time.time()
    cache, candidates, copy = {}, {}, {}
    for key, node in sub4.items():
        _e, discovered = _dijkstra(dbg, sub4, key, node, cache)
        for dk, dn in discovered.items():
            candidates.setdefault(dk, dn)
        copy[key] = node
    for dk, dn in candidates.items():
        copy.setdefault(dk, dn)
    t_old = time.time() - t0
    print(f"exhaustive best-first:  {t_old:6.2f}s -> {len(copy)} nodes",
          flush=True)
    assert list(out_new.keys()) == list(copy.keys()), "order mismatch"
    print(f"best-first speedup: {t_old / t_new:.1f}x — identical",
          flush=True)


if __name__ == "__main__":
    main()
