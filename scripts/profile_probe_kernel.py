"""Decompose the probe kernel's 45 ms: grid overhead (nch=0
everywhere), single-visit (nch=1), and full spans — on the real chip.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import kreeq_tpu  # noqa: F401
from kreeq_tpu.ops.kmers import count_sorted, kmer_positions
from kreeq_tpu.ops import pallas_kernels as PK

Q = 1 << 22
CHUNK = 1 << 23
K = 31


def timeit(fn, args_list):
    outs = [fn(*a) for a in args_list]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args_list]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / len(args_list)


def main():
    rng = np.random.default_rng(1)
    print("device:", jax.devices()[0],
          f"QT={PK.QT} TT={PK.TT}", flush=True)
    genome = rng.integers(0, 4, CHUNK).astype(np.uint8)

    @jax.jit
    def count_step(codes):
        keys, _isfw, edges, valid = kmer_positions(codes, K)
        return count_sorted(keys, edges, valid)

    tkeys, cov, fw, bw, n = count_step(jnp.asarray(genome))
    thi, tlo, pay = PK._pack_table(tkeys, cov, fw, bw)

    sets = []
    for i in range(3):
        g2 = rng.integers(0, 4, Q).astype(np.uint8)
        qk = kmer_positions(jnp.asarray(g2), K)[0]
        ctx = jnp.zeros((qk.shape[0],), jnp.uint32)
        sidx, sctx, qhi, qlo, base, nch = PK._probe_prep_sel(tkeys, qk,
                                                             ctx)
        sets.append((qhi, qlo, base, nch))
    jax.block_until_ready(sets)
    nq_tiles = sets[0][0].shape[0] // PK.QT

    zero = jnp.zeros_like(sets[0][3])
    one = jnp.minimum(sets[0][3], 1)

    for name, dmax, mknch in (
            ("nch=0 (grid+init only)", 1, lambda s: zero),
            ("nch=1 (one visit/tile)", 1, lambda s: one),
            ("full spans", None, None)):
        args_list = []
        for qhi, qlo, base, nch in sets:
            nch2 = mknch((qhi,)) if mknch else nch
            d = dmax or PK._grid_depth(nch2)
            args_list.append((qhi, qlo, base, nch2, d))
        dt = timeit(
            lambda qhi, qlo, base, nch2, d: PK._probe_run(
                qhi, qlo, thi, tlo, pay, nq_tiles, d, base=base,
                nch=nch2),
            args_list)
        print(f"{name:28s} {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
