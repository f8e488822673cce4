"""Ground-truth (pre-staged distinct random inputs) timings of sort
shapes the probe/count pipelines could be rebuilt on.
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
R = 4


def bench(name, fn, argsets, per=Q):
    outs = [fn(*a) for a in argsets]
    jax.block_until_ready(outs)
    outs = [fn(*a) for a in argsets]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in argsets]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(argsets)
    print(f"{name:34s} {dt*1e3:9.2f} ms   {per/dt/1e6:8.1f} M/s",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)

    his, los, u32s = [], [], []
    for _ in range(R):
        qk = rng.integers(0, 1 << 62, Q, dtype=np.uint64)
        his.append(jnp.asarray((qk >> np.uint64(32)).astype(np.uint32)))
        los.append(jnp.asarray(
            (qk << np.uint64(32)) | np.arange(Q, dtype=np.uint64)))
        u32s.append(jnp.asarray(qk.astype(np.uint32)))
    jax.block_until_ready((his, los, u32s))

    names = set(sys.argv[1:])

    def want(n):
        return not names or n in names

    if want("k2"):
        f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2))
        bench("(u32,u64) 2key @4M", f,
              [(his[i], los[i]) for i in range(R)])
    if want("k1p2"):
        f = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1))
        bench("(u32,u64,u32) 1key @4M", f,
              [(his[i], los[i], u32s[i]) for i in range(R)])
    if want("k1p1"):
        f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
        bench("(u32,u64) 1key @4M", f,
              [(his[i], los[i]) for i in range(R)])
    if want("b16"):
        S = 16
        f = jax.jit(lambda a, b: jax.lax.sort(
            (a.reshape(S, -1), b.reshape(S, -1)), num_keys=2,
            dimension=1))
        bench(f"batched [{S},{Q//S}] (u32,u64) 2key", f,
              [(his[i], los[i]) for i in range(R)])
    if want("b64"):
        S = 64
        f = jax.jit(lambda a, b: jax.lax.sort(
            (a.reshape(S, -1), b.reshape(S, -1)), num_keys=2,
            dimension=1))
        bench(f"batched [{S},{Q//S}] (u32,u64) 2key", f,
              [(his[i], los[i]) for i in range(R)])
    if want("b256"):
        S = 256
        f = jax.jit(lambda a, b: jax.lax.sort(
            (a.reshape(S, -1), b.reshape(S, -1)), num_keys=2,
            dimension=1))
        bench(f"batched [{S},{Q//S}] (u32,u64) 2key", f,
              [(his[i], los[i]) for i in range(R)])
    if want("half"):
        f = jax.jit(lambda a, b: jax.lax.sort((a[:Q // 2], b[:Q // 2]),
                                              num_keys=2))
        bench("(u32,u64) 2key @2M", f,
              [(his[i], los[i]) for i in range(R)], per=Q // 2)
    if want("k1u32"):
        f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
        bench("(u32,u32) 1key @4M", f,
              [(u32s[i], his[i]) for i in range(R)])


if __name__ == "__main__":
    main()
