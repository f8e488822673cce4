"""Definitive sort timing: K data-dependent sorts inside ONE jit, with
a multiplicative scramble between iterations (uniform random data each
time, no relay/elision possible, no adaptivity shortcut).

Also times the nearly-sorted variant (roll+xor perturbation) to
quantify XLA sort's data-adaptivity on TPU.
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
K = 8


def timed(f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / K, out


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)
    qk = rng.integers(0, 1 << 62, Q, dtype=np.uint64)
    hi = jnp.asarray((qk >> np.uint64(32)).astype(np.uint32))
    lo = jnp.asarray((qk << np.uint64(32)) | np.arange(Q, dtype=np.uint64))

    M32 = jnp.uint32(2654435761)
    M64 = jnp.uint64(0x9E3779B97F4A7C15)

    @jax.jit
    def scrambled(h, l):
        def body(i, st):
            h, l = st
            sh, sl = jax.lax.sort((h, l), num_keys=2)
            h2 = (sh * M32) ^ (sh >> jnp.uint32(16)) ^ jnp.uint32(i)
            l2 = (sl * M64) ^ (sl >> jnp.uint64(31))
            return h2, l2
        return jax.lax.fori_loop(0, K, body, (h, l))

    dt, out = timed(scrambled, hi, lo)
    print(f"in-jit scrambled 2key sort @4M:   {dt*1e3:7.2f} ms/sort "
          f"({Q/dt/1e6:6.0f} M/s)", flush=True)

    @jax.jit
    def nearly(h, l):
        def body(i, st):
            h, l = st
            sh, sl = jax.lax.sort((h, l), num_keys=2)
            h2 = jnp.roll(sh, 1) ^ (sl[0].astype(jnp.uint32) & 0xFFF)
            return h2, sl
        return jax.lax.fori_loop(0, K, body, (h, l))

    dt, out = timed(nearly, hi, lo)
    print(f"in-jit nearly-sorted 2key @4M:    {dt*1e3:7.2f} ms/sort "
          f"({Q/dt/1e6:6.0f} M/s)", flush=True)

    # single-operand u64, scrambled
    @jax.jit
    def scrambled64(l):
        def body(i, l):
            sl = jax.lax.sort(l)
            return (sl * M64) ^ (sl >> jnp.uint64(29)) ^ jnp.uint64(i)
        return jax.lax.fori_loop(0, K, body, l)

    dt, out = timed(scrambled64, lo)
    print(f"in-jit scrambled u64 1op @4M:     {dt*1e3:7.2f} ms/sort "
          f"({Q/dt/1e6:6.0f} M/s)", flush=True)

    # batched [64, 64K] scrambled
    @jax.jit
    def scrambled_b(h, l):
        h = h.reshape(64, -1)
        l = l.reshape(64, -1)

        def body(i, st):
            h, l = st
            sh, sl = jax.lax.sort((h, l), num_keys=2, dimension=1)
            h2 = (sh * M32) ^ (sh >> jnp.uint32(16)) ^ jnp.uint32(i)
            l2 = (sl * M64) ^ (sl >> jnp.uint64(31))
            return h2, l2
        return jax.lax.fori_loop(0, K, body, (h, l))

    dt, out = timed(scrambled_b, hi, lo)
    print(f"in-jit scrambled batched [64,64K]:{dt*1e3:7.2f} ms/sort "
          f"({Q/dt/1e6:6.0f} M/s)", flush=True)

    # 3-operand restore-shaped sort (u32 key, u64, u32), scrambled
    u3 = jnp.asarray(qk.astype(np.uint32))

    @jax.jit
    def scrambled3(h, l, c):
        def body(i, st):
            h, l, c = st
            sh, sl, sc = jax.lax.sort((h, l, c), num_keys=1)
            return ((sh * M32) ^ (sh >> jnp.uint32(16)) ^ jnp.uint32(i),
                    sl, sc)
        return jax.lax.fori_loop(0, K, body, (h, l, c))

    dt, out = timed(scrambled3, hi, lo, u3)
    print(f"in-jit scrambled (u32,u64,u32)1k: {dt*1e3:7.2f} ms/sort "
          f"({Q/dt/1e6:6.0f} M/s)", flush=True)


if __name__ == "__main__":
    main()
