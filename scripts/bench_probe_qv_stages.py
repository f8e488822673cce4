"""Stage decomposition of the QV probe path, chained methodology:
prep (fused extract+sort+spans), dmax readback, kernel, post."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import kreeq_tpu  # noqa: F401
from kreeq_tpu.ops.kmers import count_sorted, kmer_positions
from kreeq_tpu.ops import pallas_kernels as PK
from kreeq_tpu.ops.validate import _prep_qv_fused

K = 31
CHUNK = 1 << 23
PCHUNK = 1 << 22
ITERS = 5


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, CHUNK).astype(np.uint8)

    @jax.jit
    def count_step(codes):
        keys, _isfw, edges, valid = kmer_positions(codes, K)
        return count_sorted(keys, edges, valid)

    tkeys, cov, fw, bw, n = count_step(jnp.asarray(genome))
    asm = jnp.asarray(genome[:PCHUNK])
    p = PCHUNK - K + 1
    thi, tlo, pay = PK._cached_pack_table(tkeys, cov, fw, bw)
    jax.block_until_ready((thi, tlo, pay))

    from kreeq_tpu.ops.validate import validate_qv_sums_pallas

    # stage fns, each chained on a perturbed codes input
    def full(codes):
        return validate_qv_sums_pallas(tkeys, cov, fw, bw, codes, K, 0,
                                       jnp.uint32(0), jnp.uint32(p))

    def full_sync(codes):
        sidx, sctx, qhi, qlo, base, nch = _prep_qv_fused(tkeys, codes, K)
        dmax = PK._grid_depth(nch)
        nq_tiles = qhi.shape[0] // PK.QT
        out = PK._probe_run_ind(qhi, qlo, thi, tlo, pay, nq_tiles, dmax,
                                1, base=base, nch=nch)
        return PK._post_qv(out, sidx, sctx, jnp.uint32(0), jnp.uint32(p),
                           nch, jnp.int32(dmax))

    def run(name, fn, chain):
        out = fn(asm)
        _ = np.asarray(chain(out))
        carry = asm
        for _ in range(3):
            out = fn(carry)
            carry = jnp.roll(carry, 1) ^ (chain(out) & 1).astype(jnp.uint8)
        _ = np.asarray(chain(out))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(carry)
            carry = jnp.roll(carry, 1) ^ (chain(out) & 1).astype(jnp.uint8)
        _ = np.asarray(chain(out))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:24s} {dt*1e3:8.2f} ms", flush=True)
        return dt

    run("full qv (hinted)", full, lambda o: o[0].astype(jnp.uint8))
    run("full qv (sync dmax)", full_sync, lambda o: o[0].astype(jnp.uint8))

    # prep only (block on outputs)
    def prep_only(codes):
        sidx, sctx, qhi, qlo, base, nch = _prep_qv_fused(tkeys, codes, K)
        return sidx

    run("prep (fused)", prep_only, lambda o: o[0].astype(jnp.uint8))

    # prep + dmax readback
    def prep_dmax(codes):
        sidx, sctx, qhi, qlo, base, nch = _prep_qv_fused(tkeys, codes, K)
        dmax = PK._grid_depth(nch)
        return sidx, dmax

    run("prep + dmax readback", prep_dmax,
        lambda o: o[0][0].astype(jnp.uint8))

    # prep + kernel (no post)
    def prep_kernel(codes):
        sidx, sctx, qhi, qlo, base, nch = _prep_qv_fused(tkeys, codes, K)
        dmax = PK._grid_depth(nch)
        nq_tiles = qhi.shape[0] // PK.QT
        out = PK._probe_run_ind(qhi, qlo, thi, tlo, pay, nq_tiles, dmax,
                                1, base=base, nch=nch)
        return out, sidx

    run("prep + dmax + kernel", prep_kernel,
        lambda o: o[0][9][0].astype(jnp.uint8))


if __name__ == "__main__":
    main()
