"""Timing-methodology sanity check.

bench_probe_r3's chained-dispatch harness reports a 4M 2-key sort at
0.36 ms while pre-staged distinct inputs measure 16 ms.  Scale the
chain length: if wall time doesn't grow linearly with N, the chained
methodology is broken (and every number it produced is suspect).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import kreeq_tpu  # noqa: F401

Q = 1 << 22


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)
    qk = rng.integers(0, 1 << 62, Q, dtype=np.uint64)
    hi = jnp.asarray((qk >> np.uint64(38)).astype(np.uint32))
    lo = jnp.asarray((qk << np.uint64(26)) | np.arange(Q, dtype=np.uint64))

    f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2))

    def chain(out, a, b):
        a0 = jnp.roll(a, 1) ^ out[0].ravel()[0].astype(a.dtype)
        return a0, b

    # warm
    out = f(hi, lo)
    jax.block_until_ready(out)
    args = (hi, lo)
    for _ in range(3):
        args = chain(out, *args)
        out = f(*args)
    jax.block_until_ready(out)

    for iters in (1, 2, 5, 10, 20):
        t0 = time.perf_counter()
        for _ in range(iters):
            args = chain(out, *args)
            out = f(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"chained N={iters:3d}: total {dt*1e3:9.2f} ms  "
              f"({dt/iters*1e3:7.2f} ms/iter)", flush=True)

    # also: verify the chained output is actually a correct sort
    a_np = np.asarray(args[0])
    s_np = np.asarray(out[0])
    assert np.array_equal(s_np, np.sort(a_np)), "chained sort WRONG"
    print("chained output verified correct", flush=True)


if __name__ == "__main__":
    main()
