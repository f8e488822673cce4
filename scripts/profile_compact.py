"""Compare count_sorted against a compaction variant that gathers the
cumulative rows and keys separately (no [P,11] payload concat), with a
consistency check that stage times sum to the fused step.

Outcome (v5e, 2026-08-17): output-identical; bench.py showed the split
variant at 986 ms vs ~915 ms for the fused-payload version, within the
tunnel's ~9% run-to-run noise — kept the fused payload.

Caveat on the timed() harness here: perturbing one element can
converge to identical buffer contents across iterations, which the
remote relay elides — bench.py's rolling-carry methodology is the
trustworthy one.  Treat per-stage numbers as suspect unless they sum
to the fused step measured by bench.py.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, *args, iters=5, mutate=0):
    carry = list(args)
    out = fn(*carry)
    first = out[0] if isinstance(out, tuple) else out
    _ = np.asarray(first.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*carry)
        first = out[0] if isinstance(out, tuple) else out
        a = carry[mutate]
        carry[mutate] = a.at[0].set((first.ravel()[0] & 1).astype(a.dtype))
    _ = np.asarray(first.ravel()[0])
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms",
          flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    import kreeq_tpu  # noqa: F401
    from kreeq_tpu.ops import kmers as K

    k = 31
    chunk = 1 << 23
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, chunk).astype(np.uint8))
    keys, _isfw, edges, valid = K.kmer_positions(codes, k)

    def count_v2(keys, edges, valid):
        p = keys.shape[0]
        skeys = jnp.where(valid, keys, K.SENTINEL)
        sedges = jnp.where(valid, edges, 0).astype(jnp.uint32)
        skeys, sedges = jax.lax.sort((skeys, sedges), num_keys=1)
        boundary = skeys[1:] != skeys[:-1]
        starts = jnp.concatenate([jnp.ones((1,), bool), boundary])
        ends = jnp.concatenate([boundary, jnp.ones((1,), bool)])
        real = skeys != K.SENTINEL
        n = jnp.sum((starts & real).astype(jnp.uint32))
        flag = ends & real
        cols = [jnp.ones((p, 1), jnp.int32)]
        se = sedges.astype(jnp.int32)
        cols += [((se >> w) & 1)[:, None] for w in range(8)]
        c = K._prefix_sum01(jnp.concatenate(cols, axis=1)).astype(
            jnp.uint32)
        order = K._compact_order(flag)
        cc = c[order]
        live = jnp.arange(p, dtype=jnp.uint32) < n
        ukeys = jnp.where(live, skeys[order], K.SENTINEL)
        totals = cc - jnp.concatenate(
            [jnp.zeros((1, 9), jnp.uint32), cc[:-1]], axis=0)
        totals = jnp.where(live[:, None], totals, 0)
        return ukeys, totals[:, 0], totals[:, 1:5], totals[:, 5:9], n

    cur = jax.jit(K.count_sorted)
    v2 = jax.jit(count_v2)

    a = cur(keys, edges, valid)
    b = v2(keys, edges, valid)
    same = all(bool(jnp.array_equal(x, y)) for x, y in zip(a, b))
    print("v2 == current:", same, flush=True)

    timed("count current", cur, keys, edges, valid)
    timed("count v2 (split gathers)", v2, keys, edges, valid)
    timed("count current (repeat)", cur, keys, edges, valid)


if __name__ == "__main__":
    main()
