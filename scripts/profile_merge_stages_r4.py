"""Per-stage timing of merge_sorted_pallas: prep, pack,
kernel, post.  Chained perturbation like bench_merge_r4.

    PYTHONPATH=/root/repo python scripts/profile_merge_stages_r4.py [h]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import kreeq_tpu  # noqa: F401,E402
from kreeq_tpu.ops import pallas_kernels as PK  # noqa: E402
from bench_merge_r4 import make_tables  # noqa: E402

ITERS = 5


def timeit(label, fn, chain):
    out = fn()
    jax.block_until_ready(out)
    for _ in range(2):
        out = fn()
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn()
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:34s} {dt * 1e3:9.2f} ms", flush=True)
    return out


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    A, B = make_tables(h, 0.3)
    ka_r, ca, fa, ba = A
    kb_r, cb, fb, bb = B
    print(f"h={h} device={jax.devices()[0]}", flush=True)

    MT = PK.MTILE
    prep = timeit("prep (_merge_prep_t)",
                  lambda: PK._merge_prep_t(ka_r, kb_r, MT), None)
    ka, kb, first, nch, b_lo, b_hi, tv, jv = prep

    packA = timeit("pack A", lambda: PK._merge_pack(ka, ca, fa, ba),
                   None)
    packB = timeit("pack B (reversed)",
                   lambda: PK._merge_pack(kb, cb, fb, bb, True), None)
    ahi, alo, apay = packA
    bhir, blor, bpayr = packB
    na_t = ka.shape[0] // MT

    state = {"x": apay}

    def kern():
        # perturb one payload row to defeat the relay memoizer
        ap = state["x"]
        out, cnt = PK._merge_run2(tv, jv, first, nch, b_lo, b_hi,
                                  ahi, alo, ap, bhir, blor, bpayr,
                                  na_t)
        state["x"] = ap ^ (cnt[0, 0] | jnp.int32(1))
        return out, cnt

    out, cnt = timeit("kernel (_merge_run2)", kern, None)

    post = timeit("post (_merge_post)",
                  lambda: PK._merge_post(out, cnt), None)
    del post


if __name__ == "__main__":
    main()
