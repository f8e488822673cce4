"""On-chip A/B: XLA merge_sorted vs Pallas merge v1 vs v2.

Methodology: chained data-dependent iterations (cov payload perturbed
by the previous output's first cov value) — same scheme as bench.py's
time_merge; the remote relay elides repeated identical dispatches.

    PYTHONPATH=/root/repo python scripts/bench_merge_r4.py [h] [overlap]

h = rows per input (default 4M); overlap = fraction of shared keys
(default 0.3, roughly a 10x-coverage tree-merge level).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import kreeq_tpu  # noqa: F401,E402
from kreeq_tpu.ops.kmers import merge_sorted  # noqa: E402
from kreeq_tpu.ops.pallas_kernels import merge_sorted_pallas  # noqa: E402

ITERS = 5


def make_tables(h, overlap, seed=0):
    rng = np.random.default_rng(seed)
    shared = int(h * overlap)
    pool = np.unique(rng.integers(0, 1 << 62, int(h * 2.5) + shared,
                                  dtype=np.uint64))
    ka = np.sort(rng.choice(pool, h, replace=False))
    kb = np.concatenate([rng.choice(ka, shared, replace=False),
                         rng.choice(pool, h - shared, replace=False)])
    kb = np.sort(np.unique(kb))[:h]
    if len(kb) < h:
        kb = np.concatenate(
            [kb, np.full(h - len(kb), 0xFFFFFFFFFFFFFFFF, np.uint64)])

    def payload(t):
        cov = rng.integers(1, 1000, t, dtype=np.uint64).astype(np.uint32)
        fw = rng.integers(0, 255, (t, 4), dtype=np.uint64).astype(np.uint32)
        bw = rng.integers(0, 255, (t, 4), dtype=np.uint64).astype(np.uint32)
        return cov, fw, bw

    A = (jnp.asarray(ka), *map(jnp.asarray, payload(h)))
    B = (jnp.asarray(kb), *map(jnp.asarray, payload(h)))
    return A, B


def time_merge(step, A, B, label):
    margs = (*A, *B)
    a = margs
    out = step(*a)
    _ = int(out[4])
    for _i in range(2):
        a = (a[0], a[1] ^ (out[1][0] | jnp.uint32(1)), *a[2:])
        out = step(*a)
    _ = int(out[4])
    t0 = time.perf_counter()
    for _i in range(ITERS):
        a = (a[0], a[1] ^ (out[1][0] | jnp.uint32(1)), *a[2:])
        out = step(*a)
    _ = int(out[4])
    dt = (time.perf_counter() - t0) / ITERS
    h2 = A[0].shape[0] + B[0].shape[0]
    print(f"{label:28s} {dt * 1e3:8.2f} ms  "
          f"{h2 / dt / 1e6:7.1f} M rows/s", flush=True)
    return dt, out


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22
    overlap = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
    A, B = make_tables(h, overlap)
    print(f"h={h} overlap={overlap} device={jax.devices()[0]}",
          flush=True)

    dt_x, out_x = time_merge(jax.jit(merge_sorted), A, B, "xla merge_sorted")
    from kreeq_tpu.ops.pallas_kernels import MTILE
    dt2, out2 = time_merge(merge_sorted_pallas, A, B,
                           f"pallas v2 (MTILE={MTILE})")
    n = int(out_x[4])
    ok = all(np.array_equal(np.asarray(x)[:n], np.asarray(y)[:n])
             for x, y in zip(out_x[:4], out2[:4]))
    print(f"v2 exact vs xla (final iterate): {ok}", flush=True)
    print(f"v2={dt2 * 1e3:.2f}ms xla={dt_x * 1e3:.2f}ms "
          f"speedup={dt_x / dt2:.2f}x")


if __name__ == "__main__":
    main()
