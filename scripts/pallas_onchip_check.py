"""On-chip Pallas validation + timing: run the moment the TPU returns.

Order of business:
  1. trivial kernel executes?
  2. count / probe / merge kernels exact-match their XLA twins on-chip
  3. timed comparison (chained dispatches, warm) at bench.py shapes

Usage:  timeout 1800 python scripts/pallas_onchip_check.py [--small]
        (--exact-only skips the timing section; bench.py uses this as
         its go/no-go probe before timing the Pallas paths itself)
"""

import sys
import time

import numpy as np


def main() -> int:
    small = "--small" in sys.argv
    exact_only = "--exact-only" in sys.argv
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import kreeq_tpu  # noqa: F401
    from jax.experimental import pallas as pl

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    import os
    interp = os.environ.get("KREEQ_TPU_PALLAS_INTERPRET") == "1"

    # 1. trivial kernel
    def trivial(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2

    with jax.enable_x64(False):
        x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
        try:
            y = pl.pallas_call(
                trivial, interpret=interp,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
            ok = bool(np.allclose(np.asarray(y), np.asarray(x) * 2))
            print("trivial kernel:", "OK" if ok else "WRONG RESULT",
                  flush=True)
            if not ok:
                return 1
        except Exception as e:  # noqa: BLE001
            print("trivial kernel FAIL:",
                  str(e).split("\n")[0][:200], flush=True)
            return 1

    from kreeq_tpu.ops.kmers import (count_sorted, kmer_positions,
                                     merge_sorted, probe_merge)
    from kreeq_tpu.ops.pallas_kernels import (count_sorted_pallas,
                                              merge_sorted_pallas,
                                              probe_merge_pallas)

    n = 1 << (20 if small else 23)
    k = 31
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, n).astype(np.uint8))
    keys, _isfw, edges, valid = kmer_positions(codes, k)

    # 2a. count kernel exactness
    ref = count_sorted(keys, edges, valid)
    got = count_sorted_pallas(keys, edges, valid)
    nr = int(ref[4])
    ok = nr == int(got[4]) and all(
        np.array_equal(np.asarray(a)[:nr], np.asarray(b)[:nr])
        for a, b in zip(ref[:4], got[:4]))
    print("count kernel exact:", ok, flush=True)

    # 2b. probe kernel exactness (hit-heavy queries)
    q = n // 2
    qk = keys[:q]
    pref = probe_merge(ref[0], ref[1], ref[2], ref[3], qk)
    pgot = probe_merge_pallas(ref[0], ref[1], ref[2], ref[3], qk)
    pok = all(np.array_equal(np.asarray(a), np.asarray(b))
              for a, b in zip(pref, pgot))
    print("probe kernel exact:", pok, flush=True)

    # 2c. merge kernel exactness
    half = nr // 2
    A = (ref[0][:half], ref[1][:half], ref[2][:half], ref[3][:half])
    B = (ref[0][half:nr], ref[1][half:nr], ref[2][half:nr],
         ref[3][half:nr])
    mref = merge_sorted(*A, *B)
    mgot = merge_sorted_pallas(*A, *B)
    mn = int(mref[4])
    mok = mn == int(mgot[4]) and all(
        np.array_equal(np.asarray(a)[:mn], np.asarray(b)[:mn])
        for a, b in zip(mref[:4], mgot[:4]))
    print("merge kernel exact:", mok, flush=True)

    if not (ok and pok and mok):
        return 1
    if exact_only:
        return 0

    # 3. timing — chained: each iteration's input is derived from the
    # previous output (the remote execution relay elides repeated
    # identical dispatches, so unchained same-input timing is bogus;
    # see bench.py).  Chains are workload-equivalent: a low-bit flip of
    # random count keys, a permutation of the probe queries (hit ratio
    # preserved), a cov tweak for merge (key order untouched).
    def timeit(fn, args, chain, iters=5):
        out = fn(*args)
        jax.block_until_ready(out)
        for _ in range(3):  # chained warm-up: relay pipelining
            args = chain(out, *args)
            out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            args = chain(out, *args)
            out = fn(*args)
            jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    def chain_count(out, ckeys, cedges, cvalid):
        bit = (out[0].ravel()[0] & jnp.uint64(1))
        return ckeys ^ bit, cedges, cvalid

    def chain_probe(out, t0_, t1_, t2_, t3_, q_):
        s = (out[1].ravel()[0] & jnp.uint32(1)).astype(jnp.int32)
        return t0_, t1_, t2_, t3_, jnp.roll(q_, s + 1)

    def chain_merge(out, a0, a1, a2, a3, b0, b1, b2, b3):
        bit = out[1].ravel()[0] & jnp.uint32(1)
        return a0, a1 ^ bit, a2, a3, b0, b1, b2, b3

    tc_x = timeit(count_sorted, (keys, edges, valid), chain_count)
    tc_p = timeit(count_sorted_pallas, (keys, edges, valid), chain_count)
    pargs = (ref[0], ref[1], ref[2], ref[3], qk)
    tp_x = timeit(probe_merge, pargs, chain_probe)
    tp_p = timeit(probe_merge_pallas, pargs, chain_probe)
    tm_x = timeit(merge_sorted, A + B, chain_merge)
    tm_p = timeit(merge_sorted_pallas, A + B, chain_merge)
    print(f"count:  XLA {tc_x*1e3:.1f} ms  pallas {tc_p*1e3:.1f} ms "
          f"({tc_x/tc_p:.2f}x)")
    print(f"probe:  XLA {tp_x*1e3:.1f} ms  pallas {tp_p*1e3:.1f} ms "
          f"({tp_x/tp_p:.2f}x)")
    print(f"merge:  XLA {tm_x*1e3:.1f} ms  pallas {tm_p*1e3:.1f} ms "
          f"({tm_x/tm_p:.2f}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
