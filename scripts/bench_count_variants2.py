"""Part 2: full count-step + probe A/B with the part-1 winners.

Part-1 (scripts/bench_count_variants.py on v5e):
  sort (u32 hi24, u64 lo38|e8) 2-key   42.5 ms   (current 1-key: 405)
  gather [8M,16] unique_indices       201.1 ms   (plain: 701)
"""

import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    import kreeq_tpu  # noqa: F401
    from kreeq_tpu.ops.kmers import (SENTINEL, _compact_order,
                                     _prefix_sum01, build_bucket_index,
                                     count_sorted, kmer_positions,
                                     probe_bucketed)

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    P = 1 << 23

    def timed(name, fn, chain, x0, iters=3):
        step = jax.jit(fn)
        x = step(x0)
        _ = float(np.asarray(x[1]))
        t0 = time.perf_counter()
        cur = x0
        for _ in range(iters):
            out = step(cur)
            cur = chain(cur, out)
        _ = float(np.asarray(out[1]))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:52s} {dt * 1e3:9.1f} ms", flush=True)
        return dt

    # remaining gather micro: u64-bitcast + unique
    perm = jnp.asarray(rng.permutation(P).astype(np.int32))
    pay8_64 = jnp.asarray(
        rng.integers(0, 2 ** 62, (P, 8), dtype=np.int64).astype(np.uint64))

    def chain_pay(cur, out):
        return cur.at[0, 0].set(out[1].astype(cur.dtype))

    timed("gather [8M,8] u64 unique_indices",
          lambda p: (p, jnp.take(p, perm, axis=0, unique_indices=True)
                     [0, 0]), chain_pay, pay8_64)

    codes0 = jnp.asarray(rng.integers(0, 4, P).astype(np.uint8))

    def chain_codes(cur, out):
        return jnp.roll(cur, 1) ^ (out[1] & 3).astype(jnp.uint8)

    def mk_step(k, sortfn, pad, unique):
        def step(codes):
            keys, _isfw, edges, valid = kmer_positions(codes, k)
            p = keys.shape[0]
            skeys, sedges = sortfn(
                jnp.where(valid, keys, SENTINEL),
                jnp.where(valid, edges, 0).astype(jnp.uint32))
            boundary = skeys[1:] != skeys[:-1]
            starts = jnp.concatenate([jnp.ones((1,), bool), boundary])
            ends = jnp.concatenate([boundary, jnp.ones((1,), bool)])
            real = skeys != SENTINEL
            n = jnp.sum((starts & real).astype(jnp.uint32))
            flag = ends & real
            cols = [jnp.ones((p, 1), jnp.int32)]
            se = sedges.astype(jnp.int32)
            cols += [((se >> w) & 1)[:, None] for w in range(8)]
            c = _prefix_sum01(jnp.concatenate(cols, axis=1)) \
                .astype(jnp.uint32)
            ffff = jnp.uint32(0xFFFFFFFF)
            key_lo = jnp.where(flag, (skeys & jnp.uint64(0xFFFFFFFF))
                               .astype(jnp.uint32), ffff)
            key_hi = jnp.where(flag, (skeys >> jnp.uint64(32))
                               .astype(jnp.uint32), ffff)
            parts = [c, key_lo[:, None], key_hi[:, None]]
            if pad:
                parts.append(jnp.zeros((p, 16 - 11), jnp.uint32))
            payload = jnp.concatenate(parts, axis=1)
            order = _compact_order(flag)
            if unique:
                out = jnp.take(payload, order, axis=0,
                               unique_indices=True)
            else:
                out = payload[order]
            ukeys = (out[:, 9].astype(jnp.uint64)
                     | (out[:, 10].astype(jnp.uint64) << jnp.uint64(32)))
            cc = out[:, :9]
            totals = cc - jnp.concatenate(
                [jnp.zeros((1, 9), jnp.uint32), cc[:-1]], axis=0)
            totals = jnp.where((ukeys != SENTINEL)[:, None], totals, 0)
            return codes, (ukeys[0] & jnp.uint64(3)).astype(jnp.uint8) \
                ^ totals[0, 0].astype(jnp.uint8) ^ n.astype(jnp.uint8)
        return step

    def sort_cur(k64, e32):
        return jax.lax.sort((k64, e32), num_keys=1)

    def sort_2key_2464(k64, e32):
        hi = (k64 >> jnp.uint64(38)).astype(jnp.uint32)
        lo = ((k64 & jnp.uint64((1 << 38) - 1)) << jnp.uint64(8)) \
            | e32.astype(jnp.uint64)
        shi, slo = jax.lax.sort((hi, lo), num_keys=2)
        keys = (shi.astype(jnp.uint64) << jnp.uint64(38)) \
            | (slo >> jnp.uint64(8))
        return keys, (slo & jnp.uint64(0xFF)).astype(jnp.uint32)

    def sort_embed(k64, e32):
        v = (k64 << jnp.uint64(8)) | e32.astype(jnp.uint64)
        sv = jax.lax.sort(v)
        return sv >> jnp.uint64(8), (sv & jnp.uint64(0xFF)) \
            .astype(jnp.uint32)

    def count_cur(codes):
        keys, _i, edges, valid = kmer_positions(codes, 31)
        out = count_sorted(keys, edges, valid)
        return codes, out[4].astype(jnp.uint8)

    timed("count k=31 current (count_sorted)", count_cur, chain_codes,
          codes0)
    timed("count k=31 2key2464 + pad16 + unique",
          mk_step(31, sort_2key_2464, True, True), chain_codes, codes0)
    timed("count k=31 2key2464 + pad16 (no unique)",
          mk_step(31, sort_2key_2464, True, False), chain_codes, codes0)
    timed("count k=21 embed + pad16 + unique",
          mk_step(21, sort_embed, True, True), chain_codes, codes0)

    codes16 = jnp.asarray(rng.integers(0, 4, 1 << 24).astype(np.uint8))
    timed("count k=31 2key2464+pad16+unique @16M",
          mk_step(31, sort_2key_2464, True, True), chain_codes, codes16)

    # ---- probe -------------------------------------------------------------
    k = 31
    Q = 1 << 22
    keys0 = jnp.asarray(rng.integers(0, 1 << 62, P, dtype=np.uint64))
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
    print(f"bucket index: bits={bits} rounds={rounds} "
          f"max_bucket={int(counts.max())}", flush=True)

    def chain_q(cur, out):
        return jnp.roll(cur, 1) ^ out[1].astype(cur.dtype)

    def e_probe_bisect(qk):
        f, c, _f4, _b4 = probe_bucketed(tkeys, cov, fw, bw, starts, qk,
                                        k, bits, rounds)
        return qk, c[0].astype(jnp.uint64)

    timed("probe 4M: bucketed bisection (current)", e_probe_bisect,
          chain_q, qkeys0)

    rows16 = jnp.concatenate(
        [(tkeys & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)[:, None],
         (tkeys >> jnp.uint64(32)).astype(jnp.uint32)[:, None],
         cov[:, None], fw, bw,
         jnp.zeros((P, 5), jnp.uint32)], axis=1)  # [P, 16]

    for S in (8, 16):
        rows_pad = jnp.concatenate(
            [rows16, jnp.full((S, 16), 0xFFFFFFFF, jnp.uint32)], axis=0)

        def e_probe_slab(qk, rows_pad=rows_pad, S=S):
            shift = jnp.uint64(2 * k - bits)
            b = jnp.clip((qk >> shift).astype(jnp.int32), 0,
                         (1 << bits) - 1)
            lo = starts[b]
            blk = jax.vmap(lambda s: jax.lax.dynamic_slice(
                rows_pad, (s, 0), (S, 16)))(lo)
            qlo = (qk & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
            qhi = (qk >> jnp.uint64(32)).astype(jnp.uint32)
            hit = ((blk[:, :, 0] == qlo[:, None])
                   & (blk[:, :, 1] == qhi[:, None]))
            c = jnp.where(hit, blk[:, :, 2], 0).max(axis=1)
            return qk, c[0].astype(jnp.uint64)

        timed(f"probe 4M: slab dyn-slice ({S}x16)", e_probe_slab,
              chain_q, qkeys0)

    def e_probe_bisect16(qk):
        shift = jnp.uint64(2 * k - bits)
        b = jnp.clip((qk >> shift).astype(jnp.int32), 0, (1 << bits) - 1)
        lo = starts[b]
        hi = starts[b + 1]
        for _ in range(rounds):
            mid = (lo + hi) >> 1
            take = tkeys[jnp.minimum(mid, P - 1)] < qk
            lo = jnp.where(take & (lo < hi), mid + 1, lo)
            hi = jnp.where(take | (lo >= hi), hi, mid)
        idx = jnp.minimum(lo, P - 1)
        r = rows16[idx]
        qlo = (qk & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        qhi = (qk >> jnp.uint64(32)).astype(jnp.uint32)
        found = (r[:, 0] == qlo) & (r[:, 1] == qhi)
        return qk, jnp.where(found, r[:, 2], 0)[0].astype(jnp.uint64)

    timed("probe 4M: bisect + [T,16] row gather", e_probe_bisect16,
          chain_q, qkeys0)


if __name__ == "__main__":
    main()
