"""Recompute the soak's phase-4 recall check out of band.

The soak harness computes planted-variant recall from in-process state
(scripts/soak_round5.py main); when the VCF phase runs out of band the
planted set is reproduced here from the same deterministic seed and
generation code, then checked against the produced VCF the same way.

Usage: python scripts/soak_vcf_recall.py <workdir> [mbp] [slice]
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/scripts")
from soak_round5 import plant  # noqa: E402  (same generation code)


def main() -> None:
    workdir = sys.argv[1]
    mbp = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    slice_len = int(sys.argv[3]) if len(sys.argv) > 3 else 30_000_000

    rng = np.random.default_rng(2026)
    genome = rng.integers(0, 4, mbp * 1_000_000).astype(np.uint8)
    _asm, planted = plant(genome, rng)

    rows = [ln.split("\t") for ln in open(f"{workdir}/asm10.vcf")
            if not ln.startswith("#")]
    vcf_pos = np.array(sorted(int(r[1]) for r in rows))
    found = total = shift = 0
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
    print(f"[VCF recall] {len(rows)} rows; planted recall (+-40bp): "
          f"{found}/{total}")


if __name__ == "__main__":
    main()
