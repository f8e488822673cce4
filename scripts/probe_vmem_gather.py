"""Feasibility probe: does Mosaic lower a lane-wise dynamic gather
(jnp.take_along_axis) from VMEM inside a Pallas TPU kernel, and how
fast is it?  This decides whether the probe kernel can bisect in VMEM
instead of brute-force comparing (the [QT,TT] eq matrix is VMEM-
bandwidth-bound at ~45 ms per 4M queries).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import kreeq_tpu  # noqa: F401

N = 1024
REP = 512  # gathers per kernel invocation (amortize overhead)


def kernel(tbl_ref, idx_ref, out_ref):
    t = tbl_ref[:, :]      # [1, N] i32
    ix = idx_ref[:, :]     # [1, N] i32
    acc = jnp.zeros((1, N), jnp.int32)

    def body(r, st):
        acc, ix = st
        g = jnp.take_along_axis(t, ix, axis=1)
        acc = acc + g
        ix = (ix + g) & (N - 1)  # data-dependent next indices
        return acc, ix

    acc, _ = jax.lax.fori_loop(0, REP, body, (acc, ix))
    out_ref[:, :] = acc


@jax.jit
def run(tbl, idx):
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.int32),
        )(tbl, idx)


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 7, (1, N)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, N, (1, N)).astype(np.int32))
    out = run(tbl, idx)
    jax.block_until_ready(out)
    print("compiled + ran; sample:", np.asarray(out)[0, :4], flush=True)

    # verify vs numpy
    t_np = np.asarray(tbl)[0]
    i_np = np.asarray(idx)[0].copy()
    acc = np.zeros(N, np.int64)
    for _ in range(REP):
        g = t_np[i_np]
        acc += g
        i_np = (i_np + g) & (N - 1)
    assert np.array_equal(acc.astype(np.int32), np.asarray(out)[0]), \
        "WRONG RESULT"
    print("verified exact", flush=True)

    # time: chain via data-dependent idx so nothing elides
    t0 = time.perf_counter()
    K = 20
    for i in range(K):
        idx = (idx + out[0, 0]) & (N - 1)
        out = run(tbl, idx)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (K * REP)
    print(f"per-gather [1,{N}]: {dt*1e6:.2f} us "
          f"({N/dt/1e9:.2f} G elem/s)", flush=True)


if __name__ == "__main__":
    main()
