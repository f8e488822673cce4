"""On-device exactness self-check for the Pallas kernels.

Runs the three streaming kernels (count run-aggregation, merge-probe,
union/merge — ops/pallas_kernels.py) on a small random workload and
compares against their XLA twins bit-for-bit — PER KERNEL, so one
kernel's Mosaic regression never disables the others.  Used by the
`KREEQ_TPU_PALLAS=auto` gate (utils/pallas_gate.py) and as a subprocess
go/no-go by bench.py (`python -m kreeq_tpu.ops.pallas_selfcheck`).

Exit codes (subprocess mode): 0 = all exact, 1 = any mismatch or kernel
failure (stdout lists the per-kernel verdicts), 2 = skipped (CPU
platform without interpret mode — Pallas only has a real lowering for
TPU here).
"""

from __future__ import annotations

import os

import numpy as np

KERNELS = ("count", "probe", "select", "qv", "merge")


def selfcheck_kernels(n: int = 1 << 16, k: int = 31,
                      force: bool = False) -> dict:
    """Per-kernel exactness verdicts (KERNELS) -> bool.

    `force` bypasses the CPU-platform guard (tests run the kernels in
    interpret mode on CPU; production auto mode never does).
    Exceptions are caught per kernel: a Mosaic compile/runtime failure
    means "don't use THAT kernel", not "crash the pipeline" and not
    "disable the ones that work".
    """
    import jax
    import jax.numpy as jnp

    verdict = {name: False for name in KERNELS}
    interp = os.environ.get("KREEQ_TPU_PALLAS_INTERPRET") == "1"
    if jax.devices()[0].platform == "cpu" and not (interp or force):
        return verdict
    try:
        from .kmers import count_sorted, kmer_positions, merge_sorted, \
            probe_merge
        from .pallas_kernels import (count_sorted_pallas,
                                     merge_sorted_pallas,
                                     probe_merge_pallas)

        rng = np.random.default_rng(0)
        codes = jnp.asarray(rng.integers(0, 4, n).astype(np.uint8))
        keys, _isfw, edges, valid = kmer_positions(codes, k)
        ref = count_sorted(keys, edges, valid)
        nr = int(ref[4])
    except Exception:  # noqa: BLE001 — no workload, no Pallas at all
        return verdict

    try:
        got = count_sorted_pallas(keys, edges, valid)
        verdict["count"] = nr == int(got[4]) and all(
            np.array_equal(np.asarray(a)[:nr], np.asarray(b)[:nr])
            for a, b in zip(ref[:4], got[:4]))
    except Exception:  # noqa: BLE001
        pass

    try:
        qk = keys[:n // 2]
        pref = probe_merge(ref[0], ref[1], ref[2], ref[3], qk)
        pgot = probe_merge_pallas(ref[0], ref[1], ref[2], ref[3], qk)
        verdict["probe"] = all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(pref, pgot))
    except Exception:  # noqa: BLE001
        pass

    try:
        from .validate import validate_positions, validate_qv_sums_pallas

        qcodes = jnp.asarray(rng.integers(0, 4, n // 2).astype(np.uint8))
        p = n // 2 - k + 1
        vref = validate_positions(ref[0], ref[1], ref[2], ref[3],
                                  jnp.zeros((1 << 8) + 1, jnp.int32),
                                  qcodes, k, 0, 8, 1, True)
        want = (int(np.asarray(vref[1][1:p - 1]).sum()),
                int(np.asarray(vref[2][1:p - 1]).sum()))
        res = validate_qv_sums_pallas(ref[0], ref[1], ref[2], ref[3],
                                      qcodes, k, 0, jnp.uint32(1),
                                      jnp.uint32(p - 1))
        verdict["qv"] = (int(res[0]), int(res[1])) == want \
            and int(res[2]) == 1
    except Exception:  # noqa: BLE001
        pass

    try:
        # the track path: in-kernel-select probe + keyed-sort restore
        from .validate import validate_positions_pallas

        vgot = validate_positions_pallas(ref[0], ref[1], ref[2], ref[3],
                                         qcodes, k, 0)
        verdict["select"] = all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(vref, vgot))
    except Exception:  # noqa: BLE001
        pass

    try:
        half = nr // 2
        A = tuple(r[:half] for r in ref[:4])
        # overlap half of A's keys so the dedup/saturation paths run
        B = tuple(np.concatenate([np.asarray(r[:half // 2]),
                                  np.asarray(r[half:nr - half // 2])])
                  for r in ref[:4])
        B = tuple(jnp.asarray(b) for b in B)
        mref = merge_sorted(*A, *B)
        mn = int(mref[4])

        def mcheck(fn):
            mgot = fn(*A, *B)
            return mn == int(mgot[4]) and all(
                np.array_equal(np.asarray(a)[:mn], np.asarray(b)[:mn])
                for a, b in zip(mref[:4], mgot[:4]))

        verdict["merge"] = mcheck(merge_sorted_pallas)
    except Exception:  # noqa: BLE001
        pass
    return verdict


def selfcheck(n: int = 1 << 16, k: int = 31, force: bool = False) -> bool:
    """True iff ALL gated Pallas kernels run and exact-match XLA."""
    return all(selfcheck_kernels(n, k, force).values())


def main() -> int:
    import jax

    import kreeq_tpu  # noqa: F401  (x64 config)

    interp = os.environ.get("KREEQ_TPU_PALLAS_INTERPRET") == "1"
    if jax.devices()[0].platform == "cpu" and not interp:
        print("pallas selfcheck: skipped (cpu platform)")
        return 2
    verdict = selfcheck_kernels()
    for name in KERNELS:
        print(f"pallas selfcheck [{name}]:",
              "EXACT" if verdict[name] else "FAILED")
    return 0 if all(verdict.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
