"""Verify sort primitive timings with an in-jit chained loop.

bench_probe_r3.py measured a 4M (u32,u64) 2-key sort at 0.36 ms, which
contradicts round-2's finding that two such sorts dominate the 225 ms
probe step.  This script times K data-dependent chained sorts inside
ONE jitted fori_loop, so dispatch overhead and any cross-call elision
are ruled out.
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
K = 10


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)
    qk = jnp.asarray(rng.integers(0, 1 << 62, Q, dtype=np.uint64))
    hi = (qk >> jnp.uint64(38)).astype(jnp.uint32)
    lo = (qk << jnp.uint64(26)) | jnp.arange(Q, dtype=jnp.uint64)

    @jax.jit
    def chained(hi, lo):
        def body(i, st):
            h, l = st
            sh, sl = jax.lax.sort((h, l), num_keys=2)
            # data-dependent perturbation: next input depends on output
            h2 = sh ^ (sl[0].astype(jnp.uint32) & jnp.uint32(0xFFFF)) ^ \
                jnp.uint32(i)
            return h2, sl
        return jax.lax.fori_loop(0, K, body, (hi, lo))

    out = chained(hi, lo)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chained(hi, lo)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / K
    print(f"in-jit chained 2-key sort @4M: {dt*1e3:.2f} ms/sort "
          f"({Q/dt/1e6:.0f} M/s)", flush=True)

    # same for single-operand u64 sort
    @jax.jit
    def chained64(lo):
        def body(i, l):
            sl = jax.lax.sort(l)
            return sl ^ (sl[0] & jnp.uint64(0xFFFF)) ^ l[::-1]
        return jax.lax.fori_loop(0, K, body, lo)

    out = chained64(lo)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chained64(lo)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / K
    print(f"in-jit chained u64 sort @4M:   {dt*1e3:.2f} ms/sort "
          f"({Q/dt/1e6:.0f} M/s)", flush=True)


if __name__ == "__main__":
    main()
