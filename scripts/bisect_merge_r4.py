"""Bisect merge-kernel v2 per-step cost: run bench_merge_r4 (v2 only)
under KREEQ_TPU_MERGE_DEBUG piece-disabling combos in subprocesses.

    PYTHONPATH=/root/repo python scripts/bisect_merge_r4.py [h] [combos...]
"""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    h = sys.argv[1] if len(sys.argv) > 1 else str(1 << 22)
    combos = sys.argv[2:] or ["", "f", "b", "k", "m", "fbkd"]
    for dbg in combos:
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
        env["KREEQ_TPU_MERGE_DEBUG"] = dbg
        env["KREEQ_TPU_MERGE_DEBUG_OPTIN"] = "1"  # bench-only knob
        env["KREEQ_TPU_BENCH_WHICH"] = "2"
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "bench_merge_r4.py"), h],
            env=env, capture_output=True, text=True, timeout=1800)
        m = re.search(r"pallas v2.*?([\d.]+) ms", r.stdout)
        x = re.search(r"xla merge_sorted\s+([\d.]+) ms", r.stdout)
        print(f"debug={dbg!r:8s} v2={m.group(1) if m else '?':>9s} ms  "
              f"(xla {x.group(1) if x else '?'} ms)", flush=True)
        if not m:
            print(r.stdout[-1500:], r.stderr[-2000:])


if __name__ == "__main__":
    main()
