"""Bisect the on-chip count/merge kernel mismatch.

Hypothesis: f32 dot_general at DEFAULT precision truncates inputs to
bf16 on the MXU, corrupting u16 key limbs (> 8 mantissa bits) that the
interpret path (CPU f32) preserves.  Test A uses keys whose limbs are
all < 256 (bf16-exact); Test B uses full-range limbs.  If A passes and
B fails, it's precision, and precision=HIGHEST is the fix.
"""

import sys

import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import kreeq_tpu  # noqa: F401
from kreeq_tpu.ops.kmers import count_sorted
from kreeq_tpu.ops.pallas_kernels import count_sorted_pallas


def check(name, keys, edges, valid):
    ref = count_sorted(keys, edges, valid)
    got = count_sorted_pallas(keys, edges, valid)
    nr = int(ref[4])
    ng = int(got[4])
    if nr != ng:
        print(f"{name}: COUNT MISMATCH ref={nr} got={ng}")
        return
    names = ["keys", "cov", "fw", "bw"]
    for nm, a, b in zip(names, ref[:4], got[:4]):
        a = np.asarray(a)[:nr]
        b = np.asarray(b)[:nr]
        if not np.array_equal(a, b):
            bad = np.nonzero(
                (a != b) if a.ndim == 1 else (a != b).any(axis=1))[0]
            print(f"{name}: {nm} differs at {len(bad)}/{nr} rows; "
                  f"first {bad[:5]}")
            for i in bad[:3]:
                print(f"   row {i}: ref={a[i]} got={b[i]}")
            return
    print(f"{name}: exact ({nr} rows)")


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    n = 1 << 16

    # Test A: limbs all < 256 (bf16-exact)
    small = rng.integers(0, 200, (n, 4)).astype(np.uint64)
    keys_a = (small[:, 0] | (small[:, 1] << 16) | (small[:, 2] << 32)
              | (small[:, 3] << 48))
    edges = rng.integers(0, 256, n).astype(np.uint32)
    valid = np.ones(n, bool)
    check("A small-limbs", jnp.asarray(np.sort(keys_a)),
          jnp.asarray(edges), jnp.asarray(valid))

    # Test B: full-range limbs
    keys_b = rng.integers(0, 1 << 62, n, dtype=np.uint64)
    check("B full-limbs ", jnp.asarray(np.sort(keys_b)),
          jnp.asarray(edges), jnp.asarray(valid))

    # Test C: many repeated keys (exercises cov accumulation > 256)
    keys_c = rng.integers(0, 64, n, dtype=np.uint64) * 3
    check("C heavy-dups ", jnp.asarray(np.sort(keys_c)),
          jnp.asarray(edges), jnp.asarray(valid))


if __name__ == "__main__":
    main()
