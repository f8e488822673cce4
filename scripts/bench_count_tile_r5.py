"""CTILE sweep for the count kernel (KREEQ_TPU_COUNT_TILE knob).

Round-4's merge win came from grid restructuring; the count kernel's
remaining ~2.5 us/step orchestration share scales with the number of
grid steps (~P/CTILE), so a wider tile may buy real throughput.  Each
tile width runs in its OWN subprocess (CTILE is read at import) with
exactness asserted against the XLA count_sorted first.

    PYTHONPATH=/root/repo python scripts/bench_count_tile_r5.py [tiles...]
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import time
import numpy as np
import jax
import jax.numpy as jnp
import kreeq_tpu  # noqa: F401
from kreeq_tpu.ops.kmers import count_sorted, kmer_positions
from kreeq_tpu.ops.pallas_kernels import CTILE, count_sorted_pallas

rng = np.random.default_rng(0)
P = 1 << 23
k = 31
codes = jnp.asarray(rng.integers(0, 4, P).astype(np.uint8))

@jax.jit
def step(codes):
    keys, _i, edges, valid = kmer_positions(codes, k)
    return count_sorted_pallas(keys, edges, valid)

@jax.jit
def step_ref(codes):
    keys, _i, edges, valid = kmer_positions(codes, k)
    return count_sorted(keys, edges, valid)

# exactness vs the XLA path on this tile width
got = step(codes)
ref = step_ref(codes)
n = int(ref[4])
assert int(got[4]) == n, (int(got[4]), n)
for a, b in zip(got[:4], ref[:4]):
    assert np.array_equal(np.asarray(a)[:n], np.asarray(b)[:n])

# chained timing (relay elides identical dispatches)
carry = codes
for _ in range(4):
    tkeys, cov, fw, bw, nn = step(carry)
    carry = jnp.roll(carry, 1) ^ (tkeys[0] & 3).astype(jnp.uint8)
_ = int(nn)
t0 = time.perf_counter()
iters = 6
for _ in range(iters):
    tkeys, cov, fw, bw, nn = step(carry)
    carry = jnp.roll(carry, 1) ^ (tkeys[0] & 3).astype(jnp.uint8)
_ = int(nn)
dt = (time.perf_counter() - t0) / iters
print(f"CTILE={CTILE}: {dt*1e3:.2f} ms  "
      f"({(P - k + 1) / dt / 1e6:.1f} M kmers/s)  exact", flush=True)
"""


def main() -> None:
    tiles = sys.argv[1:] or ["512", "1024", "2048"]
    for t in tiles:
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
        env["KREEQ_TPU_COUNT_TILE"] = t
        r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                           capture_output=True, text=True, timeout=1800)
        out = r.stdout.strip().splitlines()
        print(out[-1] if out else f"CTILE={t}: FAILED\n{r.stderr[-800:]}",
              flush=True)


if __name__ == "__main__":
    main()
