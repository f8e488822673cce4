"""On-chip timing of the select-probe validate fast path (fused
pipeline: prep jit + kernel + post jit).  Ground-truth methodology:
pre-staged distinct random inputs (the chained harness is invalid for
sort-bearing stages; repeated identical calls are relay-elided).
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
from kreeq_tpu.ops.validate import (_post_sel_fused, _prep_sel_fused,
                                    validate_positions_pallas)

Q = 1 << 22
CHUNK = 1 << 23
R = 2
K = 31


def stage(name, fn, argsets, per=Q):
    outs = [fn(*a) for a in argsets]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in argsets]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(argsets)
    print(f"{name:32s} {dt*1e3:9.2f} ms   {per/dt/1e6:8.1f} M/s",
          flush=True)
    return outs


def main():
    rng = np.random.default_rng(1)
    print("device:", jax.devices()[0], f"QT={PK.QT} TT={PK.TT}",
          flush=True)

    genome = rng.integers(0, 4, CHUNK).astype(np.uint8)

    @jax.jit
    def count_step(codes):
        keys, _isfw, edges, valid = kmer_positions(codes, K)
        return count_sorted(keys, edges, valid)

    tkeys, cov, fw, bw, n = count_step(jnp.asarray(genome))
    print("table rows:", tkeys.shape[0], "distinct:", int(n), flush=True)

    csets = []
    for i in range(R):
        g2 = genome.copy()
        g2[Q // 2:Q] = rng.integers(0, 4, Q - Q // 2).astype(np.uint8)
        np.random.default_rng(i).shuffle(g2[:Q].reshape(-1, 4096))
        csets.append(jnp.asarray(g2[:Q]))
    jax.block_until_ready(csets)

    stage("validate select-probe e2e",
          lambda c: validate_positions_pallas(tkeys, cov, fw, bw, c, K, 0),
          [(c,) for c in csets])

    preps = stage("  prep fused (ext+sort+spans)",
                  lambda c: _prep_sel_fused(tkeys, c, K),
                  [(c,) for c in csets])
    thi, tlo, pay = PK._cached_pack_table(tkeys, cov, fw, bw)
    jax.block_until_ready((thi, tlo, pay))
    runs = []
    for sidx, sctx, qhi, qlo, base, nch, isfw, valid in preps:
        dmax = PK._grid_depth(nch)
        runs.append((qhi, qlo, base, nch, qhi.shape[0] // PK.QT, dmax))
    print("dmax:", [r[5] for r in runs], flush=True)
    outs = stage("  kernel", lambda qhi, qlo, base, nch, nt, dm:
                 PK._probe_run(qhi, qlo, thi, tlo, pay, nt, dm,
                               base=base, nch=nch), runs)
    posts = [(o, p[0], p[1], p[6], p[7], c[0])
             for o, p, c in zip(outs, preps,
                                [(c,) for c in csets])]
    stage("  post fused (sel+restore+cls)",
          lambda o, sidx, sctx, isfw, valid, c:
          _post_sel_fused(o, sidx, sctx, isfw, valid, K, 0, codes=c),
          posts)


if __name__ == "__main__":
    main()
