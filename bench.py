"""Benchmark: canonical k-mer counting + probe throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no performance numbers (BASELINE.md); its CI
budget is functional only.  vs_baseline is therefore reported against
a measured reference-style CPU oracle: tools/cpu_oracle/oracle.cpp
re-implements the reference's hot count loop (canonical extraction +
per-partition hash-map updates, src/graph-builder.cpp:75-205) with
every free choice in the reference's favor, threaded over all host
cores.  Measured 29.3 M k-mers counted/s on this host's 4 cores
(BASELINE.md "Measured CPU oracle baseline").
"""

import json
import time

import numpy as np


def _device_available(timeout_s: int = 120) -> bool:
    """Probe backend init in a subprocess: a downed TPU tunnel hangs
    jax.devices() forever, which would otherwise hang the whole bench."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _pallas_ok(timeout_s: int = 900) -> bool:
    """Go/no-go for timing the Pallas paths: run the on-chip exactness
    self-check in a subprocess (bounded — a Mosaic compile/runtime
    fault must not take the bench artifact down with it).  Call BEFORE
    this process initializes its own backend, so the subprocess doesn't
    contend for the chip.

    KREEQ_TPU_BENCH_PALLAS=0 skips, =1 forces (no subprocess check).
    The self-check exits 2 (-> skip) on a CPU platform: there the
    kernels only run in interpret mode, whose timing is meaningless."""
    import os
    import subprocess
    import sys

    force = os.environ.get("KREEQ_TPU_BENCH_PALLAS")
    if force == "0":
        return False
    if force == "1":
        return True
    try:
        r = subprocess.run(
            [sys.executable, "-m", "kreeq_tpu.ops.pallas_selfcheck"],
            timeout=timeout_s, capture_output=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def main() -> None:
    import jax

    avail = _device_available()
    # the Pallas go/no-go subprocess runs before this process touches
    # the backend (single tunneled chip — no concurrent clients)
    pallas_ok = _pallas_ok() if avail else False
    if not avail:
        # fall back to CPU so the round still records a bench artifact
        # (value is not comparable to TPU rounds; device field says so)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import kreeq_tpu  # noqa: F401  (x64)
    from kreeq_tpu.ops.kmers import (build_bucket_index, count_sorted,
                                     kmer_positions)
    from kreeq_tpu.ops.validate import validate_positions

    k = 31
    chunk = 1 << 23  # 8M bases per step (empirically best on v5e)

    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, chunk).astype(np.uint8)

    @jax.jit
    def count_step(codes):
        keys, _isfw, edges, valid = kmer_positions(codes, k)
        return count_sorted(keys, edges, valid)

    codes = jnp.asarray(genome)

    # chain a data dependency between iterations and read back a scalar
    # at the end: the remote execution relay elides repeated identical
    # calls, so unchained same-input timing is bogus.  The first few
    # chained dispatches after compilation run ~3x slower than steady
    # state (relay pipelining warms up), so a full chained warm-up loop
    # precedes the timed one — steady-state throughput is what a
    # multi-chunk production build sees.
    iters = 5

    def time_count(step):
        tkeys, cov, fw, bw, n = step(codes)
        _ = int(n)  # force execution + readback
        carry = codes
        for _ in range(3):
            tkeys, cov, fw, bw, n = step(carry)
            carry = jnp.roll(carry, 1) ^ (tkeys[0] & 3).astype(jnp.uint8)
        _ = int(n)
        t0 = time.perf_counter()
        for _ in range(iters):
            tkeys, cov, fw, bw, n = step(carry)
            carry = jnp.roll(carry, 1) ^ (tkeys[0] & 3).astype(jnp.uint8)
        _ = int(n)
        return (time.perf_counter() - t0) / iters, (tkeys, cov, fw, bw, n)

    dt_count, (tkeys, cov, fw, bw, n) = time_count(count_step)
    count_path = "xla"
    if pallas_ok:
        from kreeq_tpu.ops.pallas_kernels import count_sorted_pallas

        @jax.jit
        def count_step_pallas(codes):
            keys, _isfw, edges, valid = kmer_positions(codes, k)
            return count_sorted_pallas(keys, edges, valid)

        try:
            dt_p, _ = time_count(count_step_pallas)
            if dt_p < dt_count:
                dt_count, count_path = dt_p, "pallas"
        except Exception:  # noqa: BLE001 — never lose the artifact
            pass
    kmers = chunk - k + 1
    count_rate = kmers / dt_count

    # probe: assembly chunk against the built table (4M window, the
    # production validate window size — the merge-join sort scales with
    # table+query so smaller probe windows pipeline better)
    pchunk = 1 << 22
    # assembly drawn FROM the reads (hit-heavy, the production case;
    # matches the CPU oracle's probe workload)
    asm = jnp.asarray(genome[:pchunk])

    bits = min(int(np.ceil(np.log2(int(n)))) + 1, 24, 2 * k)
    starts = build_bucket_index(tkeys, k, bits)
    counts = np.diff(np.asarray(starts))
    rounds = max(1, int(np.ceil(np.log2(counts.max() + 1))))

    use_merge = int(tkeys.shape[0]) <= 6 * pchunk  # KmerTable.probe rule

    @jax.jit
    def probe_step(tkeys, cov, fw, bw, codes):
        return validate_positions(tkeys, cov, fw, bw, starts, codes, k, 0,
                                  bits, rounds, use_merge)

    def time_probe(step):
        out = step(tkeys, cov, fw, bw, asm)
        _ = int(out[3][0])
        carry = asm
        for _ in range(3):
            out = step(tkeys, cov, fw, bw, carry)
            carry = jnp.roll(carry, 1) ^ (out[3][0] & 1).astype(jnp.uint8)
        _ = int(out[3][0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(tkeys, cov, fw, bw, carry)
            carry = jnp.roll(carry, 1) ^ (out[3][0] & 1).astype(jnp.uint8)
        _ = int(out[3][0])
        return (time.perf_counter() - t0) / iters

    dt_probe = time_probe(probe_step)
    probe_path = "xla"
    dt_track = None
    if pallas_ok:
        from kreeq_tpu.ops.validate import (validate_positions_pallas,
                                            validate_qv_sums_pallas)

        def probe_step_pallas(tkeys, cov, fw, bw, codes):
            return validate_positions_pallas(tkeys, cov, fw, bw, codes,
                                             k, 0)

        try:
            dt_track = time_probe(probe_step_pallas)
            if dt_track < dt_probe:
                dt_probe, probe_path = dt_track, "pallas"
        except Exception:  # noqa: BLE001 — never lose the artifact
            pass

        # the sums-only QV fast path — what plain `validate` (no track
        # output) runs per window; chained via the missing-count scalar
        p_hi = jnp.uint32(pchunk - k + 1)

        def probe_step_qv(tkeys, cov, fw, bw, codes):
            res = validate_qv_sums_pallas(tkeys, cov, fw, bw, codes,
                                          k, 0, jnp.uint32(0), p_hi)
            # keep the chain shape compatible with time_probe's
            # out[3][0] access: wrap the scalar
            return None, None, None, (res[0], res)

        try:
            dt_qv = time_probe(probe_step_qv)
            # the cached grid-depth hint must have covered every timed
            # window (depth_ok == res[2]); a short hint would mean the
            # timed kernel did less work than a correct run
            chk = validate_qv_sums_pallas(tkeys, cov, fw, bw, asm,
                                          k, 0, jnp.uint32(0), p_hi)
            assert int(chk[2]) == 1, "qv grid-depth hint too small"
            if dt_qv < dt_probe:
                dt_probe, probe_path = dt_qv, "pallas_qv"
        except Exception:  # noqa: BLE001 — never lose the artifact
            pass
    probe_rate = (pchunk - k + 1) / dt_probe

    # merge/union: the engine behind `kreeq union` and from_reads' tree
    # merges (reference workload: src/graph-builder.cpp:297-432).
    # Two disjoint-ish 4M-row tables -> 8M-row union.
    from kreeq_tpu.ops.kmers import merge_sorted

    h = tkeys.shape[0] // 2
    margs = (tkeys[:h], cov[:h], fw[:h], bw[:h],
             tkeys[h:2 * h], cov[h:2 * h], fw[h:2 * h], bw[h:2 * h])

    def time_merge(step):
        # chain via the cov payload (keys untouched, so the key-driven
        # merge work is representative while the relay can't elide
        # repeated identical calls)
        a = margs
        out = step(*a)
        _ = int(out[4])
        for _ in range(2):
            a = (a[0], a[1] ^ (out[1][0] | jnp.uint32(1)), *a[2:])
            out = step(*a)
        _ = int(out[4])
        t0 = time.perf_counter()
        for _ in range(iters):
            a = (a[0], a[1] ^ (out[1][0] | jnp.uint32(1)), *a[2:])
            out = step(*a)
        _ = int(out[4])
        return (time.perf_counter() - t0) / iters

    dt_merge = time_merge(jax.jit(merge_sorted))
    merge_path = "xla"
    if pallas_ok:
        from kreeq_tpu.ops.pallas_kernels import merge_sorted_pallas

        try:
            dt_mp = time_merge(merge_sorted_pallas)
            if dt_mp < dt_merge:
                dt_merge, merge_path = dt_mp, "pallas"
        except Exception:  # noqa: BLE001 — never lose the artifact
            pass
    merge_rate = 2 * h / dt_merge

    # measured reference-style CPU oracle on this host's 4 cores
    # (tools/cpu_oracle, BASELINE.md): 29.3M counted/s, 66.5M probed/s
    ORACLE_COUNT = 29.3e6
    ORACLE_PROBE = 66.5e6

    result = {
        "metric": "read kmers counted/s/chip",
        "value": round(count_rate),
        "unit": "kmers/s",
        "vs_baseline": round(count_rate / ORACLE_COUNT, 3),
        "extra": {
            "probe_vs_cpu_oracle": round(probe_rate / ORACLE_PROBE, 3),
            "probe_kmers_per_s": round(probe_rate),
            "k": k,
            "chunk_bases": chunk,
            "device": str(jax.devices()[0]),
            "count_step_ms": round(dt_count * 1e3, 2),
            "probe_step_ms": round(dt_probe * 1e3, 2),
            "count_path": count_path,
            "probe_path": probe_path,
            "probe_track_step_ms": (round(dt_track * 1e3, 2)
                                    if dt_track is not None else None),
            "merge_kmers_per_s": round(merge_rate),
            "merge_step_ms": round(dt_merge * 1e3, 2),
            "merge_path": merge_path,
            "pallas_onchip_ok": pallas_ok,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
