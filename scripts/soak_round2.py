"""Chromosome-scale soak (round 2, VERDICT item 6).

100 Mbp reads (10x coverage of a 10 Mbp genome) -> DB build -> QV of a
10 Mbp assembly with planted SNV/INS/DEL -> `-o vcf` + `-o bkwig`,
end-to-end through the CLI, with per-phase wall times.

Run on the tunneled TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/soak_round2.py [workdir]
"""

import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gen(workdir: str):
    rng = np.random.default_rng(2024)
    n = 10_000_000
    bases = np.frombuffer(b"ACGT", np.uint8)
    genome = rng.integers(0, 4, n).astype(np.uint8)

    t0 = time.time()
    read_len = 150
    coverage = 10
    n_reads = n * coverage // read_len
    starts = rng.integers(0, n - read_len, n_reads)
    with open(f"{workdir}/reads.fastq", "w") as fh:
        qual = "I" * read_len
        for i, s in enumerate(starts):
            seq = bases[genome[s:s + read_len]].tobytes().decode()
            fh.write(f"@r{i}\n{seq}\n+\n{qual}\n")
    print(f"reads: {n_reads} x {read_len} bp "
          f"({n_reads * read_len / 1e6:.0f} Mbp) in {time.time()-t0:.0f}s",
          flush=True)

    # assembly: genome + 300 SNV + 100 INS + 100 DEL (1-5 bp), spaced
    # >1 kbp apart so k-mer footprints never overlap
    t0 = time.time()
    pos = np.sort(rng.choice(np.arange(1000, n - 1000, 1000), size=500,
                             replace=False))
    kinds = rng.permutation(["SNV"] * 300 + ["INS"] * 100 + ["DEL"] * 100)
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
    asm = np.concatenate(out)
    with open(f"{workdir}/asm.fasta", "w") as fh:
        fh.write(">chr1\n")
        s = bases[asm].tobytes().decode()
        for i in range(0, len(s), 80):
            fh.write(s[i:i + 80] + "\n")
    print(f"assembly: {len(asm)} bp with {len(planted)} planted variants "
          f"in {time.time()-t0:.0f}s", flush=True)
    return planted


def run(phase, cmd, workdir):
    t0 = time.time()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    r = subprocess.run(cmd, cwd=workdir, env=env, capture_output=True,
                       text=True)
    dt = time.time() - t0
    print(f"[{phase}] {dt:7.1f}s  {' '.join(cmd[3:])}", flush=True)
    if r.returncode != 0:
        print(r.stderr[-3000:], flush=True)
        sys.exit(1)
    return dt, r.stdout


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/soak_r2"
    os.makedirs(workdir, exist_ok=True)
    planted = gen(workdir)
    py = [sys.executable, "-m", "kreeq_tpu.cli.main"]

    t_db, _ = run("build DB", py + ["validate", "-r", "reads.fastq",
                                    "-k", "31", "-o", "soak.kreeq"],
                  workdir)
    t_qv, qv_out = run("QV report", py + ["validate", "-d", "soak.kreeq",
                                          "-f", "asm.fasta"], workdir)
    print(qv_out, flush=True)
    # search-depth/max-span as the reference's own variant-calling
    # golden uses them (test.50): the default depth (= k) bounds each
    # search at k+1 extractions, one short of even a 1 bp DEL bubble
    t_vcf, _ = run("-o vcf", py + ["validate", "-d", "soak.kreeq",
                                   "-f", "asm.fasta", "-o", "asm.vcf",
                                   "--search-depth", "50",
                                   "--max-span", "32"], workdir)
    t_bkwig, _ = run("-o bkwig", py + ["validate", "-d", "soak.kreeq",
                                       "-f", "asm.fasta", "-o",
                                       "asm.bkwig"], workdir)

    # VCF recall vs planted events, in assembly coordinates (genome
    # coordinates drift by the cumulative indel shift)
    rows = [l.split("\t") for l in open(f"{workdir}/asm.vcf")
            if not l.startswith("#")]
    vcf_pos = np.array(sorted(int(r[1]) for r in rows))
    found = 0
    shift = 0
    for kind, p, ln in planted:
        ap = p + shift
        i = np.searchsorted(vcf_pos, ap - 40)
        if i < len(vcf_pos) and vcf_pos[i] <= ap + 40:
            found += 1
        if kind == "INS":
            shift += ln
        elif kind == "DEL":
            shift -= ln
    print(f"VCF: {len(rows)} rows; planted recall (+-40bp): "
          f"{found}/{len(planted)}", flush=True)

    sz = os.path.getsize(f"{workdir}/asm.bkwig")
    print(f"bkwig: {sz/1e6:.1f} MB", flush=True)
    with open(f"{workdir}/spans.bed", "w") as fh:
        fh.write("chr1\t1000\t1010\nchr1\t9000000\t9000005\n")
    dec = subprocess.run(
        [sys.executable, "-m", "kreeq_tpu.cli.decompressor", "lookup",
         "-i", "asm.bkwig", "-c", "spans.bed"],
        cwd=workdir, capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": REPO + ":"
             + os.environ.get("PYTHONPATH", "")})
    print(f"decompressor rc={dec.returncode}, "
          f"{len(dec.stdout.splitlines())} lines", flush=True)

    print(f"\nphases: build={t_db:.1f}s qv={t_qv:.1f}s vcf={t_vcf:.1f}s "
          f"bkwig={t_bkwig:.1f}s", flush=True)


if __name__ == "__main__":
    main()
