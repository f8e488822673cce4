"""Round-2 on-chip profiling: sort representation, gather structure,
probe redesign candidates.

Methodology (see bench.py / PERFORMANCE.md): every timed step carries a
data dependency from the previous iteration's output and the loop ends
with a scalar readback — the remote execution relay elides repeated
identical dispatches, so unchained timing is fantasy.  Trustworthy only
within-run.

Run on the tunneled TPU:  python scripts/profile_round2.py
"""

import time
from functools import partial

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    import kreeq_tpu  # noqa: F401  (x64 + compile cache)
    from kreeq_tpu.ops.kmers import (_compact_order, _prefix_sum01,
                                     build_bucket_index, count_sorted,
                                     kmer_positions, probe_bucketed)

    print("device:", jax.devices()[0], flush=True)
    k = 31
    P = 1 << 23
    Q = 1 << 22
    rng = np.random.default_rng(0)

    def timed(name, fn, chain, x0, iters=3):
        """fn(x) -> (x_next, scalar); chained + readback."""
        step = jax.jit(fn)
        x = step(x0)
        _ = float(np.asarray(x[1]))  # warm + force
        t0 = time.perf_counter()
        x = (x0, x[1])
        cur = x0
        for _ in range(iters):
            out = step(cur)
            cur = chain(cur, out)
        _ = float(np.asarray(out[1]))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:44s} {dt * 1e3:9.1f} ms", flush=True)
        return dt

    # --- inputs -----------------------------------------------------------
    codes = jnp.asarray(rng.integers(0, 4, P).astype(np.uint8))
    keys_np = rng.integers(0, 1 << 62, P, dtype=np.uint64)
    keys0 = jnp.asarray(keys_np)
    edges0 = jnp.asarray(rng.integers(0, 256, P).astype(np.uint8))
    perm = jnp.asarray(rng.permutation(P).astype(np.int32))
    payload11 = jnp.asarray(rng.integers(0, 2 ** 31, (P, 11)).astype(
        np.uint32))
    payload16 = jnp.asarray(rng.integers(0, 2 ** 31, (P, 16)).astype(
        np.uint32))

    def chain_u64(cur, out):
        return jnp.roll(cur, 1) ^ out[1].astype(cur.dtype)

    # --- E1: sorts --------------------------------------------------------
    def e_sort_u64(keys):
        sk, _se = jax.lax.sort((keys, edges0), num_keys=1)
        return keys, sk[0]

    timed("sort u64 key + u8 edges", e_sort_u64, chain_u64, keys0)

    def e_sort_u64_keyonly(keys):
        sk = jax.lax.sort(keys)
        return keys, sk[0]

    timed("sort u64 key only", e_sort_u64_keyonly, chain_u64, keys0)

    hi0 = (keys0 >> jnp.uint64(32)).astype(jnp.uint32)
    lo0 = (keys0 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)

    def chain_u32(cur, out):
        return jnp.roll(cur, 1) ^ out[1].astype(cur.dtype)

    def e_sort_u32pair(hi):
        shi, _slo, _se = jax.lax.sort((hi, lo0, edges0), num_keys=2)
        return hi, shi[0]

    timed("sort (u32 hi, u32 lo) 2-key + u8 edges", e_sort_u32pair,
          chain_u32, hi0)

    def e_sort_u32_single(hi):
        shi = jax.lax.sort(hi)
        return hi, shi[0]

    timed("sort u32 single (flag-sort analog)", e_sort_u32_single,
          chain_u32, hi0)

    # --- E2: gathers ------------------------------------------------------
    def chain_pay(cur, out):
        return cur.at[0, 0].set(out[1])

    def e_gather11(pay):
        out = pay[perm]
        return pay, out[0, 0]

    timed("row gather [8M,11] random perm", e_gather11, chain_pay,
          payload11)

    def e_gather16(pay):
        out = pay[perm]
        return pay, out[0, 0]

    timed("row gather [8M,16] random perm", e_gather16, chain_pay,
          payload16)

    iota = jnp.arange(P, dtype=jnp.int32)

    def e_gather11_mono(pay):
        out = pay[iota]
        return pay, out[0, 0]

    timed("row gather [8M,11] iota (floor)", e_gather11_mono, chain_pay,
          payload11)

    # one-hot blocked-matmul compaction of 15 f32 columns (MXU) —
    # per-512-block permutation matmul + block-offset reindex is the
    # gather-free alternative; time the matmul part at [8M,16]
    def e_blockperm(pay):
        B = 512
        x = pay.reshape(P // B, B, 16).astype(jnp.float32)
        sel = jax.nn.one_hot(jnp.arange(B, dtype=jnp.int32), B,
                             dtype=jnp.float32)
        out = jnp.einsum("ij,bjc->bic", sel, x,
                         preferred_element_type=jnp.float32)
        return pay, out[0, 0, 0].astype(jnp.uint32)

    timed("block one-hot matmul [8M,16] (MXU)", e_blockperm, chain_pay,
          payload16)

    # --- E3: blocked cummax ----------------------------------------------
    cm_in = jnp.asarray(rng.integers(0, 2 ** 30, (P, 9)).astype(np.int32))

    def e_cummax_shift(x):
        B = 512
        y = x.reshape(P // B, B, 9)
        s = 1
        while s < B:
            pad = jnp.concatenate(
                [jnp.full((P // B, s, 9), -2 ** 31, jnp.int32),
                 y[:, :-s]], axis=1)
            y = jnp.maximum(y, pad)
            s *= 2
        bmax = y[:, -1]  # [nb, 9] block maxima (inclusive)
        boff = jax.lax.cummax(bmax, axis=0)
        boff = jnp.concatenate(
            [jnp.full((1, 9), -2 ** 31, jnp.int32), boff[:-1]], axis=0)
        y = jnp.maximum(y, boff[:, None, :])
        return x, y.reshape(P, 9)[0, 0]

    def chain_i32(cur, out):
        return jnp.roll(cur, 1, axis=0).at[0, 0].set(out[1])

    timed("blocked shift-cummax [8M,9] i32", e_cummax_shift, chain_i32,
          cm_in)

    def e_cummax_native(x):
        y = jax.lax.cummax(x, axis=0)
        return x, y[0, 0]

    timed("native cummax [8M,9] i32", e_cummax_native, chain_i32, cm_in)

    # --- E4: current full count step (baseline) ---------------------------
    def e_count(codes):
        keys, _isfw, edges, valid = kmer_positions(codes, k)
        out = count_sorted(keys, edges, valid)
        return codes, out[4].astype(jnp.uint8)

    def chain_codes(cur, out):
        return jnp.roll(cur, 1) ^ (out[1] & 3)

    timed("count_step (current) 8M", e_count, chain_codes, codes)

    # --- E5: probe designs ------------------------------------------------
    keys_s = jnp.sort(keys0)
    mask = jnp.uint64((1 << (2 * k)) - 1)
    tkeys = jnp.sort(keys0 & mask)
    cov = jnp.asarray(rng.integers(1, 100, P).astype(np.uint32))
    fw = jnp.asarray(rng.integers(0, 100, (P, 4)).astype(np.uint32))
    bw = jnp.asarray(rng.integers(0, 100, (P, 4)).astype(np.uint32))
    qkeys0 = jnp.asarray(
        np.asarray(tkeys)[rng.integers(0, P, Q).astype(np.int64)])
    bits = min(int(np.ceil(np.log2(P))) + 1, 24, 2 * k)
    starts = build_bucket_index(tkeys, k, bits)
    counts = np.diff(np.asarray(starts))
    rounds = max(1, int(np.ceil(np.log2(counts.max() + 1))))
    maxb = int(counts.max())
    print(f"bucket index: bits={bits} rounds={rounds} "
          f"max_bucket={maxb}", flush=True)

    def chain_q(cur, out):
        return jnp.roll(cur, 1) ^ out[1].astype(cur.dtype)

    def e_probe_bisect(qk):
        f, c, _fw, _bw = probe_bucketed(tkeys, cov, fw, bw, starts, qk,
                                        k, bits, rounds)
        return qk, c[0].astype(jnp.uint64)

    timed("probe 4M: bucketed bisection (current)", e_probe_bisect,
          chain_q, qkeys0)

    # block slice-gather probe: fetch each query's whole bucket (16
    # rows x 11 cols) as ONE gather slice, match on the VPU
    S = 16
    rows = jnp.concatenate(
        [(tkeys & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)[:, None],
         (tkeys >> jnp.uint64(32)).astype(jnp.uint32)[:, None],
         cov[:, None], fw, bw], axis=1)  # [P, 11]
    rows_pad = jnp.concatenate(
        [rows, jnp.full((S, 11), 0xFFFFFFFF, jnp.uint32)], axis=0)

    def e_probe_slab(qk):
        shift = jnp.uint64(2 * k - bits)
        b = jnp.clip((qk >> shift).astype(jnp.int32), 0,
                     (1 << bits) - 1)
        lo = starts[b]
        blk = jax.vmap(
            lambda s: jax.lax.dynamic_slice(rows_pad, (s, 0), (S, 11)))(lo)
        qlo = (qk & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        qhi = (qk >> jnp.uint64(32)).astype(jnp.uint32)
        hit = ((blk[:, :, 0] == qlo[:, None])
               & (blk[:, :, 1] == qhi[:, None]))
        c = jnp.where(hit, blk[:, :, 2], 0).max(axis=1)
        return qk, c[0].astype(jnp.uint64)

    timed(f"probe 4M: slab gather ({S}x11 slices)", e_probe_slab,
          chain_q, qkeys0)

    S2 = 8
    rows_pad8 = jnp.concatenate(
        [rows, jnp.full((S2, 11), 0xFFFFFFFF, jnp.uint32)], axis=0)

    def e_probe_slab8(qk):
        shift = jnp.uint64(2 * k - bits)
        b = jnp.clip((qk >> shift).astype(jnp.int32), 0,
                     (1 << bits) - 1)
        lo = starts[b]
        blk = jax.vmap(
            lambda s: jax.lax.dynamic_slice(rows_pad8, (s, 0),
                                            (S2, 11)))(lo)
        qlo = (qk & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        qhi = (qk >> jnp.uint64(32)).astype(jnp.uint32)
        hit = ((blk[:, :, 0] == qlo[:, None])
               & (blk[:, :, 1] == qhi[:, None]))
        c = jnp.where(hit, blk[:, :, 2], 0).max(axis=1)
        return qk, c[0].astype(jnp.uint64)

    timed("probe 4M: slab gather (8x11 slices)", e_probe_slab8,
          chain_q, qkeys0)

    # prefix sums sanity (known: ~35 ms)
    m01 = jnp.asarray(rng.integers(0, 2, (P, 9)).astype(np.int32))

    def e_pfx(x):
        y = _prefix_sum01(x)
        return x, y[0, 0]

    timed("blocked MXU prefix_sum01 [8M,9]", e_pfx, chain_i32, m01)

    # compact order (flag sort) baseline
    flags = jnp.asarray(rng.integers(0, 2, P).astype(bool))

    def e_compact(fl):
        o = _compact_order(fl)
        return fl, o[0]

    def chain_fl(cur, out):
        return jnp.roll(cur, 1) ^ (out[1] & 1).astype(bool)

    timed("_compact_order (flag sort) [8M]", e_compact, chain_fl, flags)


if __name__ == "__main__":
    main()
