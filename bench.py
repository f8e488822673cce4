"""Benchmark: canonical k-mer counting + probe throughput on one chip.

Prints JSON lines of the form
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}
progressively — one line after EVERY metric lands, each a superset of
the previous (the last line is the full result; consumers that take
the last parseable line get the most complete measurement even if a
later stage hangs).

Round-5 hardening (BENCH_r04 was null: rc 124, zero output): the
default entry point is a WATCHDOG that runs the measurements in a
child process group with a hard deadline (KREEQ_TPU_BENCH_DEADLINE,
default 1200 s — comfortably inside the driver's budget), forwards
the child's lines as they arrive, and on timeout kills the exact
child group and exits 0 with whatever partial lines already streamed.
A tunnel wedge mid-run now costs the metrics after the wedge, not the
whole artifact.  The Pallas go/no-go consults the auto-gate's cached
on-chip verdict (kreeq_tpu/utils/pallas_gate.py) instead of always
re-running the ~2-35 min self-check.

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
import os
import signal
import subprocess
import sys
import time

# measured reference-style CPU oracle on this host's 4 cores
# (tools/cpu_oracle, BASELINE.md): 29.3M counted/s, 66.5M probed/s
ORACLE_COUNT = 29.3e6
ORACLE_PROBE = 66.5e6


def watchdog() -> int:
    """Run `bench.py --child` under a hard deadline, forwarding its
    stdout line-by-line.  Always exits 0 with the partial (or full)
    JSON lines on stdout — a hang can no longer null the artifact."""
    deadline = float(os.environ.get("KREEQ_TPU_BENCH_DEADLINE", "1200"))
    t0 = time.time()
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child"],
        stdout=subprocess.PIPE, text=True, bufsize=1,
        start_new_session=True,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    saw_json = False
    stage = "startup"

    def alarm(_sig, _frm):
        raise TimeoutError

    signal.signal(signal.SIGALRM, alarm)
    try:
        while True:
            remain = deadline - (time.time() - t0)
            if remain <= 0:
                raise TimeoutError
            signal.setitimer(signal.ITIMER_REAL, remain)
            line = child.stdout.readline()
            signal.setitimer(signal.ITIMER_REAL, 0)
            if not line:
                break
            if line.startswith("{"):
                saw_json = True
                print(line, end="", flush=True)
            else:
                # diagnostics (stage markers, backend warnings) go to
                # stderr so stdout stays JSON-parseable line by line
                stage = line.strip() or stage
                print(line, end="", file=sys.stderr, flush=True)
        child.wait(timeout=30)
    except (TimeoutError, subprocess.TimeoutExpired):
        try:
            os.killpg(child.pid, signal.SIGKILL)  # exact group we spawned
        except (ProcessLookupError, PermissionError):
            pass
        print(f"# watchdog: deadline {deadline:.0f}s hit at stage "
              f"'{stage}'; partial metrics above stand",
              file=sys.stderr, flush=True)
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0)
    if not saw_json:
        # never leave a null artifact: an honest zero-value line
        # carrying the stage the run died in
        print(json.dumps({
            "metric": "read kmers counted/s/chip", "value": 0,
            "unit": "kmers/s", "vs_baseline": 0,
            "extra": {"incomplete": True, "stage": stage}}), flush=True)
    return 0


def _device_available(timeout_s: int = 120) -> bool:
    """Probe backend init in a subprocess: a downed TPU tunnel hangs
    jax.devices() forever, which would otherwise hang the whole bench."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _pallas_ok(timeout_s: int = 420) -> bool:
    """Go/no-go for timing the Pallas paths, resolved in a subprocess
    BEFORE this process initializes its own backend (single tunneled
    chip — no concurrent clients).  The subprocess asks the auto-gate,
    which returns a CACHED on-chip verdict instantly when the
    (jax, jaxlib, plugin, device, kernel-source, knobs) fingerprint
    matches, and runs the bounded self-check otherwise — so this is
    ~backend-init cost on the common path instead of minutes.

    KREEQ_TPU_BENCH_PALLAS=0 skips, =1 forces (no subprocess check)."""
    force = os.environ.get("KREEQ_TPU_BENCH_PALLAS")
    if force == "0":
        return False, None
    if force == "1":
        return True, None
    env = dict(os.environ)
    env["KREEQ_TPU_PALLAS"] = "auto"
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import sys; from kreeq_tpu.utils.pallas_gate import "
             "pallas_enabled; sys.exit(0 if pallas_enabled() else 1)"],
            timeout=timeout_s, capture_output=True,
            env=env, cwd=os.path.dirname(os.path.abspath(__file__)))
        return r.returncode == 0, None
    except subprocess.TimeoutExpired:
        # a COLD verdict (fresh machine, empty selfcheck cache) can
        # outlast the bound; report the reason so an XLA-only artifact
        # is legible as "gate timed out", not "kernels lost on-chip"
        return False, "gate_timeout"
    except OSError:
        return False, "gate_oserror"


def child() -> None:
    print("stage: device probe", flush=True)
    avail = _device_available()
    # the Pallas go/no-go subprocess runs before this process touches
    # the backend (single tunneled chip — no concurrent clients)
    print("stage: pallas gate", flush=True)
    pallas_ok, gate_reason = _pallas_ok() if avail else (False, None)

    import jax

    if not avail:
        # fall back to CPU so the round still records a bench artifact
        # (value is not comparable to TPU rounds; device field says so)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import kreeq_tpu  # noqa: F401  (x64)
    from kreeq_tpu.ops.kmers import (build_bucket_index, count_sorted,
                                     kmer_positions)
    from kreeq_tpu.ops.validate import validate_positions

    k = 31
    chunk = 1 << 23  # 8M bases per step (empirically best on v5e)

    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, chunk).astype(np.uint8)

    extra = {"k": k, "chunk_bases": chunk,
             "pallas_onchip_ok": pallas_ok}
    if gate_reason:
        extra["pallas_gate_skipped"] = gate_reason

    def emit(count_rate):
        result = {
            "metric": "read kmers counted/s/chip",
            "value": round(count_rate),
            "unit": "kmers/s",
            "vs_baseline": round(count_rate / ORACLE_COUNT, 3),
            "extra": dict(extra),
        }
        print(json.dumps(result), flush=True)

    @jax.jit
    def count_step(codes):
        keys, _isfw, edges, valid = kmer_positions(codes, k)
        return count_sorted(keys, edges, valid)

    print("stage: backend init + count compile", flush=True)
    codes = jnp.asarray(genome)
    extra["device"] = str(jax.devices()[0])

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
    kmers = chunk - k + 1
    extra["count_step_ms"] = round(dt_count * 1e3, 2)
    extra["count_path"] = "xla"
    emit(kmers / dt_count)  # partial 1: XLA count

    if pallas_ok:
        print("stage: count pallas", flush=True)
        from kreeq_tpu.ops.pallas_kernels import count_sorted_pallas

        @jax.jit
        def count_step_pallas(codes):
            keys, _isfw, edges, valid = kmer_positions(codes, k)
            return count_sorted_pallas(keys, edges, valid)

        try:
            dt_p, _ = time_count(count_step_pallas)
            extra["count_pallas_step_ms"] = round(dt_p * 1e3, 2)
            if dt_p < dt_count:
                dt_count = dt_p
                extra["count_step_ms"] = round(dt_count * 1e3, 2)
                extra["count_path"] = "pallas"
        except Exception:  # noqa: BLE001 — never lose the artifact
            pass
    count_rate = kmers / dt_count
    emit(count_rate)  # partial 2: best count

    # probe: assembly chunk against the built table (4M window, the
    # production validate window size — the merge-join sort scales with
    # table+query so smaller probe windows pipeline better)
    print("stage: probe", flush=True)
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
    extra["probe_step_ms"] = round(dt_probe * 1e3, 2)
    extra["probe_path"] = probe_path
    extra["probe_kmers_per_s"] = round((pchunk - k + 1) / dt_probe)
    extra["probe_vs_cpu_oracle"] = round(
        (pchunk - k + 1) / dt_probe / ORACLE_PROBE, 3)
    emit(count_rate)  # partial 3: XLA probe

    if pallas_ok:
        print("stage: probe pallas", flush=True)
        from kreeq_tpu.ops.validate import (validate_positions_pallas,
                                            validate_qv_sums_pallas)

        def probe_step_pallas(tkeys, cov, fw, bw, codes):
            # hint path (sync=False): the production track loop's
            # steady state; validity asserted after the timed loop
            return validate_positions_pallas(tkeys, cov, fw, bw, codes,
                                             k, 0, sync=False,
                                             with_depth_ok=True)

        try:
            dt_track = time_probe(probe_step_pallas)
            chk = probe_step_pallas(tkeys, cov, fw, bw, asm)
            assert int(chk[7]) == 1, "track grid-depth hint too small"
            extra["probe_track_step_ms"] = round(dt_track * 1e3, 2)
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
            extra["probe_qv_step_ms"] = round(dt_qv * 1e3, 2)
            if dt_qv < dt_probe:
                dt_probe, probe_path = dt_qv, "pallas_qv"
        except Exception:  # noqa: BLE001 — never lose the artifact
            pass
    probe_rate = (pchunk - k + 1) / dt_probe
    extra["probe_step_ms"] = round(dt_probe * 1e3, 2)
    extra["probe_path"] = probe_path
    extra["probe_kmers_per_s"] = round(probe_rate)
    extra["probe_vs_cpu_oracle"] = round(probe_rate / ORACLE_PROBE, 3)
    emit(count_rate)  # partial 4: best probe + track

    # merge/union: the engine behind `kreeq union` and from_reads' tree
    # merges (reference workload: src/graph-builder.cpp:297-432).
    # Two disjoint-ish 4M-row tables -> 8M-row union.
    print("stage: merge", flush=True)
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
        print("stage: merge pallas", flush=True)
        from kreeq_tpu.ops.pallas_kernels import merge_sorted_pallas

        try:
            dt_mp = time_merge(merge_sorted_pallas)
            extra["merge_pallas_step_ms"] = round(dt_mp * 1e3, 2)
            if dt_mp < dt_merge:
                dt_merge, merge_path = dt_mp, "pallas"
        except Exception:  # noqa: BLE001 — never lose the artifact
            pass
    merge_rate = 2 * h / dt_merge
    extra["merge_kmers_per_s"] = round(merge_rate)
    extra["merge_step_ms"] = round(dt_merge * 1e3, 2)
    extra["merge_path"] = merge_path
    emit(count_rate)  # final: full result


def main() -> None:
    if "--child" in sys.argv:
        child()
    else:
        sys.exit(watchdog())


if __name__ == "__main__":
    main()
