"""Round-4 chip session 1: warmup effectiveness A/B + golden corpus.

VERDICT r3 item 7: `kreeq warmup` exists but its effect was never
measured.  This script runs, on the real chip, with an EMPTY persistent
compile cache (fresh machine):

  A. "before": plain `validate -r reads -f asm -k 31` (24 Mbp reads,
     8 Mbp assembly — standard 8M count chunks + 4M QV windows) with a
     scratch, empty KREEQ_TPU_COMPILE_CACHE: every program compiles
     cold.
  B. `kreeq warmup -k 31` into the DEFAULT cache dir (also what the
     rest of the round reuses).
  C. "after": the same validate command, fresh process, default cache
     dir — compile hits only.

Then the full golden corpus on the TPU backend with
KREEQ_TPU_PALLAS=auto -> GOLDEN_TPU_r04.log.

The Pallas auto-selfcheck verdict is pre-seeded (untimed) so A/B/C all
see the same gate state and A is not charged for the one-time check.
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
from soak_round3 import gen_reads, write_fasta  # noqa: E402

import numpy as np  # noqa: E402


def run(name, cmd, env_extra, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    env.update(env_extra)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                       text=True)
    dt = time.time() - t0
    print(f"[{name}] {dt:8.1f}s  rc={r.returncode}", flush=True)
    if r.returncode != 0:
        print(r.stdout[-2000:], flush=True)
        print(r.stderr[-4000:], flush=True)
    return dt, r


def main():
    workdir = "/tmp/warmup_ab"
    os.makedirs(workdir, exist_ok=True)
    rng = np.random.default_rng(11)
    genome = rng.integers(0, 4, 8_000_000).astype(np.uint8)
    gen_reads(workdir, genome, coverage=3)
    write_fasta(f"{workdir}/asm.fasta", "chr1", genome)

    py = [sys.executable, "-m", "kreeq_tpu.cli.main"]
    vcmd = py + ["validate", "-r", "reads.fastq", "-f", "asm.fasta",
                 "-k", "31"]
    default_cache = os.path.expanduser("~/.cache/kreeq_tpu_jax")

    # pre-seed the Pallas auto verdict (untimed; compiles go to the
    # default cache, NOT the scratch "before" cache)
    run("selfcheck (untimed pre-seed)",
        [sys.executable, "-m", "kreeq_tpu.ops.pallas_selfcheck"],
        {"KREEQ_TPU_COMPILE_CACHE": default_cache}, REPO)

    t_a, r_a = run("A cold validate (no warmup)", vcmd,
                   {"KREEQ_TPU_COMPILE_CACHE": "/tmp/cc_before2",
                    "KREEQ_TPU_PALLAS": "auto"}, workdir)
    print(r_a.stdout[-500:], flush=True)

    t_b, _ = run("B kreeq warmup -k 31",
                 py + ["warmup", "-k", "31"],
                 {"KREEQ_TPU_COMPILE_CACHE": default_cache,
                  "KREEQ_TPU_PALLAS": "auto"}, workdir)

    t_c, r_c = run("C warm validate (after warmup)", vcmd,
                   {"KREEQ_TPU_COMPILE_CACHE": default_cache,
                    "KREEQ_TPU_PALLAS": "auto"}, workdir)
    print(r_c.stdout[-500:], flush=True)
    same = r_a.stdout == r_c.stdout
    print(f"\nwarmup A/B: before={t_a:.0f}s  warmup={t_b:.0f}s  "
          f"after={t_c:.0f}s  speedup={t_a / max(t_c, 1e-9):.1f}x  "
          f"stdout identical: {same}", flush=True)

    # golden corpus on TPU
    env = {"KREEQ_TPU_PALLAS": "auto",
           "KREEQ_TPU_COMPILE_CACHE": default_cache}
    t_g, r_g = run("golden corpus (TPU, pallas=auto)",
                   [sys.executable, os.path.join(REPO, "bin",
                                                 "kreeq-validate"),
                    "/root/reference/validateFiles"],
                   env, REPO)
    with open(os.path.join(REPO, "GOLDEN_TPU_r04.log"), "w") as f:
        f.write(f"# golden corpus on TPU, KREEQ_TPU_PALLAS=auto, "
                f"{time.strftime('%Y-%m-%d')}; wall {t_g:.0f}s\n")
        f.write(r_g.stdout)
        if r_g.returncode != 0:
            f.write(f"\n# exit {r_g.returncode}\n")
    print(f"golden: rc={r_g.returncode}, log -> GOLDEN_TPU_r04.log",
          flush=True)


if __name__ == "__main__":
    main()
