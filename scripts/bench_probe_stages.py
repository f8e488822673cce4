"""Stage-level on-chip timing of probe_merge_pallas with GROUND-TRUTH
methodology: pre-staged distinct random inputs (the chained harness is
invalid for sort-bearing stages — XLA's TPU sort is adaptive and runs
~50x faster on nearly-sorted data, scripts/bench_timing_sanity.py).

Stages: _probe_prep (query sort + spans), _probe_run (the kernel),
_probe_post (restore gather), plus end-to-end for both Pallas and XLA
probe paths.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import kreeq_tpu  # noqa: F401
from kreeq_tpu.ops.kmers import count_sorted, kmer_positions, probe_merge
from kreeq_tpu.ops import pallas_kernels as PK

Q = 1 << 22
CHUNK = 1 << 23
R = 4  # pre-staged input variants
K = 31


def stage(name, fn, argsets, per=Q):
    outs = [fn(*a) for a in argsets]  # compile + warm
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in argsets]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(argsets)
    print(f"{name:30s} {dt*1e3:9.2f} ms   {per/dt/1e6:8.1f} M/s",
          flush=True)
    return outs


def main():
    rng = np.random.default_rng(1)
    print("device:", jax.devices()[0], flush=True)

    genome = rng.integers(0, 4, CHUNK).astype(np.uint8)

    @jax.jit
    def count_step(codes):
        keys, _isfw, edges, valid = kmer_positions(codes, K)
        return count_sorted(keys, edges, valid)

    tkeys, cov, fw, bw, n = count_step(jnp.asarray(genome))
    n = int(n)
    print("table rows:", tkeys.shape[0], "distinct:", n, flush=True)

    # R distinct query sets: sample windows from a different genome
    qsets = []
    for i in range(R):
        g2 = rng.integers(0, 4, Q).astype(np.uint8)
        qsets.append(kmer_positions(jnp.asarray(g2), K)[0])
    jax.block_until_ready(qsets)

    # full pipelines
    stage("probe_merge XLA", lambda q: probe_merge(tkeys, cov, fw, bw, q),
          [(q,) for q in qsets])
    stage("probe_merge_pallas e2e",
          lambda q: PK.probe_merge_pallas(tkeys, cov, fw, bw, q),
          [(q,) for q in qsets])

    # stages
    preps = stage("_probe_prep (qsort+spans)",
                  lambda q: PK._probe_prep(tkeys, q),
                  [(q,) for q in qsets])
    thi, tlo, pay = PK._pack_table(tkeys, cov, fw, bw)
    jax.block_until_ready((thi, tlo, pay))

    runs = []
    for sq, sidx, qhi, qlo, base, nch in preps:
        dmax = PK._grid_depth(nch)
        nq_tiles = sq.shape[0] // PK.TILE
        runs.append((qhi, qlo, base, nch, nq_tiles, dmax, sidx))
    print("dmax per set:", [r[5] for r in runs], flush=True)

    def run_kernel(qhi, qlo, base, nch, nq_tiles, dmax, sidx):
        return PK._probe_run(qhi, qlo, thi, tlo, pay, nq_tiles, dmax,
                             base=base, nch=nch)
    outs = stage("_probe_run (kernel)", run_kernel, runs)

    posts = [(o, r[6]) for o, r in zip(outs, runs)]
    stage("_probe_post (gather)", PK._probe_post, posts)


if __name__ == "__main__":
    main()
