"""On-chip timing of the select-probe validate fast path vs round-2
paths.  Ground-truth methodology: pre-staged distinct random inputs.
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
from kreeq_tpu.ops.validate import (_extract_ctx, validate_positions_pallas)

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
    print("device:", jax.devices()[0], flush=True)

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
        # half hits (genome windows), half random
        g2[Q // 2:Q] = rng.integers(0, 4, Q - Q // 2).astype(np.uint8)
        np.random.default_rng(i).shuffle(g2[:Q].reshape(-1, 4096))
        csets.append(jnp.asarray(g2[:Q]))
    jax.block_until_ready(csets)

    stage("validate select-probe e2e",
          lambda c: validate_positions_pallas(tkeys, cov, fw, bw, c, K, 0),
          [(c,) for c in csets])

    # stages
    ext = stage("  extract+ctx", lambda c: _extract_ctx(c, K),
                [(c,) for c in csets])
    qsets = [(e[0], e[3]) for e in ext]
    preps = stage("  prep_sel (sort+spans)",
                  lambda q, x: PK._probe_prep_sel(tkeys, q, x),
                  qsets)
    thi, tlo, pay = PK._pack_table(tkeys, cov, fw, bw)
    jax.block_until_ready((thi, tlo, pay))
    runs = []
    for sidx, sctx, qhi, qlo, base, nch in preps:
        dmax = PK._grid_depth(nch)
        runs.append((qhi, qlo, base, nch, qhi.shape[0] // PK.QT, dmax,
                     sidx, sctx))
    print("dmax:", [r[5] for r in runs], flush=True)
    outs = stage("  kernel", lambda qhi, qlo, base, nch, nt, dm, si, sx:
                 PK._probe_run(qhi, qlo, thi, tlo, pay, nt, dm,
                               base=base, nch=nch), runs)
    posts = [(o, r[6], r[7]) for o, r in zip(outs, runs)]
    stage("  post_sel (select+restore)", PK._probe_post_sel, posts)


if __name__ == "__main__":
    main()
