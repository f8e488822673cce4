"""Ground-truth sort timing: pre-staged distinct random inputs, output
verified sorted, no chaining tricks that an optimizer could defeat.
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
R = 8  # distinct pre-staged inputs


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)

    his, los = [], []
    for _ in range(R):
        qk = rng.integers(0, 1 << 62, Q, dtype=np.uint64)
        his.append(jnp.asarray((qk >> np.uint64(38)).astype(np.uint32)))
        los.append(jnp.asarray(
            (qk << np.uint64(26)) | np.arange(Q, dtype=np.uint64)))
    jax.block_until_ready((his, los))

    f2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2))
    f1 = jax.jit(lambda a: jax.lax.sort(a))

    # verify correctness once
    sh, sl = f2(his[0], los[0])
    sh_np = np.asarray(sh)
    assert np.all(sh_np[:-1] <= sh_np[1:]), "2-key sort output not sorted!"
    ref = np.sort(np.asarray(his[0]))
    assert np.array_equal(sh_np, ref), "2-key sort wrong!"
    s1 = np.asarray(f1(los[0]))
    assert np.array_equal(s1, np.sort(np.asarray(los[0]))), "u64 sort wrong!"
    print("outputs verified correct", flush=True)

    # warm
    for i in range(R):
        f2(his[i], los[i])
    jax.block_until_ready(f2(his[0], los[0]))

    t0 = time.perf_counter()
    outs = [f2(his[i], los[i]) for i in range(R)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / R
    print(f"2-key (u32,u64) sort @4M: {dt*1e3:.2f} ms  ({Q/dt/1e6:.0f} M/s)",
          flush=True)

    for i in range(R):
        f1(los[i])
    jax.block_until_ready(f1(los[0]))
    t0 = time.perf_counter()
    outs = [f1(los[i]) for i in range(R)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / R
    print(f"u64 1-op sort @4M:        {dt*1e3:.2f} ms  ({Q/dt/1e6:.0f} M/s)",
          flush=True)


if __name__ == "__main__":
    main()
