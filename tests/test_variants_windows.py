"""Windowed variants scan must be byte-exact under forced tiny caps.

dbg_to_variants pages fixed windows over the segment (reference
analog: map-range paging re-scans, src/variants.cpp:75-152); a tiny
KREEQ_TPU_VARIANTS_WINDOW forces many windows with live seams, and the
golden test.50 VCF plus a synthetic multi-variant run must be
identical to the unwindowed scan.
"""

import contextlib
import io
import os
import shlex

import numpy as np
import pytest

from .conftest import REFERENCE, reference_available


def _run_test50():
    with open(os.path.join(REFERENCE, "validateFiles", "test.50.tst")) as fh:
        lines = fh.read().splitlines()
    argv = shlex.split(lines[0])
    out = io.StringIO()
    cwd = os.getcwd()
    try:
        os.chdir(REFERENCE)
        with contextlib.redirect_stdout(out):
            from kreeq_tpu.cli.main import run

            rc = run(argv)
        assert rc in (0, None)
    finally:
        os.chdir(cwd)
    return out.getvalue()


@pytest.mark.skipif(not reference_available(),
                    reason="reference corpus not present")
def test_test50_exact_under_tiny_window_cap(monkeypatch):
    want = _run_test50()  # default (single-window) scan
    monkeypatch.setenv("KREEQ_TPU_VARIANTS_WINDOW", "16")
    got = _run_test50()
    assert got == want


def _variants_of(ap, rp, window, monkeypatch):
    from kreeq_tpu.config import UserInput
    from kreeq_tpu.core.dbg import DBG
    from kreeq_tpu.core.table import KmerTable
    from kreeq_tpu.core.variants import dbg_to_variants
    from kreeq_tpu.io.fastx import load_genome
    from kreeq_tpu.io.sequence import Genome

    if window:
        monkeypatch.setenv("KREEQ_TPU_VARIANTS_WINDOW", str(window))
    else:
        monkeypatch.delenv("KREEQ_TPU_VARIANTS_WINDOW", raising=False)
    ui = UserInput(mode=0, in_sequence=ap, in_reads=[rp],
                   kmer_depth=50, max_span=32)
    table = KmerTable.from_reads([rp], 21)
    dbg = DBG(ui, table)
    g = Genome()
    load_genome(ap, g)
    dbg.load_genome(g)
    out = []
    for seg in dbg.genome.segments:
        dbg_to_variants(dbg, seg)
        out.append([(p.type, p.pos, p.sequence, p.ref_len)
                    for grp in seg.variants for p in grp])
    return out


def test_synthetic_multiwindow_variants_match(tmp_path, monkeypatch):
    """A 6 kbp segment with planted SNV/INS/DEL across many forced
    window seams (cap 256 -> ~23 windows; halos 32/54 positions)."""
    rng = np.random.default_rng(11)
    genome_seq = "".join(rng.choice(list("ACGT"), size=6000))
    rp = str(tmp_path / "r.fasta")
    with open(rp, "w") as fh:
        for i in range(0, 5850, 30):
            fh.write(f">r{i}\n{genome_seq[i:i + 150]}\n")

    asm = list(genome_seq)
    # SNVs on and near seam multiples of 256, plus INS/DEL mid-window
    for pos in (255, 256, 511, 700, 1023, 1024, 2300, 3071, 4095, 5000):
        asm[pos] = "ACGT"[("ACGT".index(asm[pos]) + 1) % 4]
    asm.insert(1500, "T")
    del asm[2800]
    ap = str(tmp_path / "a.fasta")
    with open(ap, "w") as fh:
        fh.write(">a\n" + "".join(asm) + "\n")

    big = _variants_of(ap, rp, None, monkeypatch)
    small = _variants_of(ap, rp, 256, monkeypatch)
    tiny = _variants_of(ap, rp, 100, monkeypatch)
    assert big == small == tiny
    assert sum(len(v) for v in big) >= 10  # the planted errors surfaced


def test_inverted_rescan_out_of_core_table(tmp_path, monkeypatch):
    """Forcing a tiny TABLE window cap routes the scan through the
    inverted out-of-core path (table windows outer, pass-1 host
    partials, pass-2 candidate scan) — outputs must match the in-core
    scan bit-for-bit, with and without a forced variants window cap."""
    rng = np.random.default_rng(12)
    genome_seq = "".join(rng.choice(list("ACGT"), size=4000))
    rp = str(tmp_path / "r.fasta")
    with open(rp, "w") as fh:
        for i in range(0, 3850, 30):
            fh.write(f">r{i}\n{genome_seq[i:i + 150]}\n")
    asm = list(genome_seq)
    for pos in (300, 1024, 2222, 3500):
        asm[pos] = "ACGT"[("ACGT".index(asm[pos]) + 1) % 4]
    asm.insert(1700, "G")
    del asm[2900]
    ap = str(tmp_path / "a.fasta")
    with open(ap, "w") as fh:
        fh.write(">a\n" + "".join(asm) + "\n")

    incore = _variants_of(ap, rp, None, monkeypatch)
    monkeypatch.setenv("KREEQ_TPU_MAX_TABLE_ROWS", "500")  # many windows
    inverted = _variants_of(ap, rp, None, monkeypatch)
    inverted_win = _variants_of(ap, rp, 256, monkeypatch)
    assert incore == inverted == inverted_win
    assert sum(len(v) for v in incore) >= 5
