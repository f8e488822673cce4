"""Gbp-scale soak (round-3 harness; executed + recorded in round 4).

Default: 1 Gbp genome, 10x coverage reads (10 Gbp), k=31 -> DB build +
`.kreeq` write -> DB reuse for QV + `.bkwig` of a 1 Gbp assembly with
planted variants -> `-o vcf` recall on a 100 Mbp slice (the variants
scan is windowed since round 4; slice size is wall-clock policy,
KREEQ_TPU_SOAK_VCF_SLICE overrides).

The 1 Gbp table (~1e9 rows, 44 B/row) exceeds the 16 GB v5e HBM: the
build's top tree merges run on the host (KREEQ_TPU_HOST_MERGE_ROWS
auto-threshold) and the QV probe pages key-range table windows with
the inverted rescan loop (table windows outer — each uploads once).

    PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/soak_round3.py [workdir] [genome_mbp] [coverage]

Records per-phase wall time and peak host RSS.
"""

import os
import resource
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASES = np.frombuffer(b"ACGT", np.uint8)


def gen_reads(workdir, genome, coverage, read_len=150, seed=7):
    """Vectorized FASTQ generation: fixed-width records assembled as a
    byte matrix per 100k-read batch (a per-read Python loop would take
    ~30 min at 67M reads)."""
    rng = np.random.default_rng(seed)
    n = len(genome)
    n_reads = n * coverage // read_len
    t0 = time.time()
    hdr_w = 12  # "@r%09d\n"
    rec_w = hdr_w + read_len + 1 + 2 + read_len + 1
    qual = np.frombuffer(b"I" * read_len, np.uint8)
    batch = 1 << 17
    with open(f"{workdir}/reads.fastq", "wb") as fh:
        for lo in range(0, n_reads, batch):
            m = min(batch, n_reads - lo)
            starts = rng.integers(0, n - read_len, m)
            rec = np.empty((m, rec_w), np.uint8)
            hdrs = "".join(f"@r{i:09d}\n" for i in range(lo, lo + m))
            rec[:, :hdr_w] = np.frombuffer(
                hdrs.encode(), np.uint8).reshape(m, hdr_w)
            rec[:, hdr_w:hdr_w + read_len] = BASES[
                genome[starts[:, None] + np.arange(read_len)]]
            rec[:, hdr_w + read_len] = ord("\n")
            rec[:, hdr_w + read_len + 1] = ord("+")
            rec[:, hdr_w + read_len + 2] = ord("\n")
            rec[:, hdr_w + read_len + 3:rec_w - 1] = qual
            rec[:, rec_w - 1] = ord("\n")
            rec.tofile(fh)
    print(f"reads: {n_reads} x {read_len} bp "
          f"({n_reads * read_len / 1e9:.1f} Gbp) in {time.time()-t0:.0f}s",
          flush=True)


def write_fasta(path, header, codes):
    t0 = time.time()
    with open(path, "wb") as fh:
        fh.write(f">{header}\n".encode())
        width = 80
        n = len(codes)
        pad = (-n) % width
        buf = np.full(n + pad, ord("\n"), np.uint8)
        buf[:n] = BASES[codes]
        mat = np.empty((len(buf) // width, width + 1), np.uint8)
        mat[:, :width] = buf.reshape(-1, width)
        mat[:, width] = ord("\n")
        # trailing pad bytes became '\n'; trim to the real length
        flat = mat.reshape(-1)
        keep = n + n // width + (1 if n % width else 0)
        flat[:keep].tofile(fh)
    print(f"fasta {path}: {n} bp in {time.time()-t0:.0f}s", flush=True)


def plant(genome, rng, n_var=500):
    n = len(genome)
    pos = np.sort(rng.choice(np.arange(1000, n - 1000, 2000),
                             size=n_var, replace=False))
    kinds = rng.permutation(["SNV"] * (n_var * 3 // 5)
                            + ["INS"] * (n_var // 5)
                            + ["DEL"] * (n_var - n_var * 3 // 5
                                         - n_var // 5))
    out = []
    prev = 0
    planted = []
    for p, kind in zip(pos, kinds):
        out.append(genome[prev:p])
        if kind == "SNV":
            out.append(np.array([(genome[p] + 1) % 4], np.uint8))
            planted.append(("SNV", int(p), 0))
            prev = p + 1
        elif kind == "INS":
            ln = int(rng.integers(1, 6))
            out.append(rng.integers(0, 4, ln).astype(np.uint8))
            planted.append(("INS", int(p), ln))
            prev = p
        else:
            ln = int(rng.integers(1, 6))
            planted.append(("DEL", int(p), ln))
            prev = p + ln
    out.append(genome[prev:])
    return np.concatenate(out), planted


def run(phase, cmd, workdir):
    t0 = time.time()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    r = subprocess.run(cmd, cwd=workdir, env=env, capture_output=True,
                       text=True)
    dt = time.time() - t0
    print(f"[{phase}] {dt:7.1f}s  {' '.join(cmd[3:])}", flush=True)
    if r.returncode != 0:
        print(r.stderr[-4000:], flush=True)
        sys.exit(1)
    return dt, r.stdout


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/soak_r3"
    mbp = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    coverage = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(workdir, exist_ok=True)

    rng = np.random.default_rng(2026)
    n = mbp * 1_000_000
    t0 = time.time()
    genome = rng.integers(0, 4, n).astype(np.uint8)
    print(f"genome: {n/1e6:.0f} Mbp in {time.time()-t0:.0f}s", flush=True)
    asm, planted = plant(genome, rng)
    # VCF slice: first 100 Mbp of the assembly (the variants scan is
    # windowed since round 4, so slice size is wall-clock policy, not
    # a memory limit; ends mid-variant-free zone)
    slice_len = min(int(os.environ.get("KREEQ_TPU_SOAK_VCF_SLICE",
                                       100_000_000)), len(asm))
    # KREEQ_TPU_SOAK_REUSE=1 skips (deterministic) input generation
    # when the files already exist — lets generation run in parallel
    # with other work and the CLI phases start later
    reuse = os.environ.get("KREEQ_TPU_SOAK_REUSE") == "1" and \
        os.path.exists(f"{workdir}/asm10.fasta")
    if not reuse:
        gen_reads(workdir, genome, coverage)
        write_fasta(f"{workdir}/asm.fasta", "chr1", asm)
        write_fasta(f"{workdir}/asm10.fasta", "chr1", asm[:slice_len])
    del genome, asm

    py = [sys.executable, "-m", "kreeq_tpu.cli.main"]
    t_db, db_out = run("build DB + write .kreeq",
                       py + ["validate", "-r", "reads.fastq", "-k", "31",
                             "-o", "soak.kreeq"], workdir)
    print(db_out[-400:], flush=True)
    t_qv, qv_out = run("QV + bkwig (DB reuse)",
                       py + ["validate", "-d", "soak.kreeq", "-f",
                             "asm.fasta", "-o", "asm.bkwig"], workdir)
    print(qv_out[-600:], flush=True)
    t_vcf, _ = run(f"-o vcf ({slice_len//1_000_000} Mbp slice)",
                   py + ["validate", "-d", "soak.kreeq", "-f",
                         "asm10.fasta", "-o", "asm10.vcf",
                         "--search-depth", "50", "--max-span", "32"],
                   workdir)

    rows = [l.split("\t") for l in open(f"{workdir}/asm10.vcf")
            if not l.startswith("#")]
    vcf_pos = np.array(sorted(int(r[1]) for r in rows))
    found = 0
    total = 0
    shift = 0
    for kind, p, ln in planted:
        ap = p + shift
        if kind == "INS":
            shift += ln
        elif kind == "DEL":
            shift -= ln
        if ap >= slice_len - 1000:
            continue
        total += 1
        i = np.searchsorted(vcf_pos, ap - 40)
        if i < len(vcf_pos) and vcf_pos[i] <= ap + 40:
            found += 1
    print(f"VCF ({slice_len//1_000_000} Mbp slice): {len(rows)} rows; planted recall "
          f"(+-40bp): {found}/{total}", flush=True)

    sz = os.path.getsize(f"{workdir}/asm.bkwig")
    dbsz = sum(os.path.getsize(os.path.join(r, f))
               for r, _d, fs in os.walk(f"{workdir}/soak.kreeq")
               for f in fs)
    print(f"bkwig: {sz/1e9:.2f} GB; .kreeq DB: {dbsz/1e9:.2f} GB",
          flush=True)
    print(f"\nphases: build+write={t_db:.1f}s qv+bkwig={t_qv:.1f}s "
          f"vcf_slice={t_vcf:.1f}s; driver peak RSS {rss_gb():.1f} GB",
          flush=True)


if __name__ == "__main__":
    main()
