"""Windowed (chromosome-scale) validation must equal unwindowed."""

import io

import numpy as np


def _run_validate(ap, rp, window):
    from kreeq_tpu.config import UserInput
    from kreeq_tpu.core.dbg import DBG
    from kreeq_tpu.core.table import KmerTable
    from kreeq_tpu.io.fastx import load_genome
    from kreeq_tpu.io.sequence import Genome

    ui = UserInput(mode=0, in_sequence=ap, in_reads=[rp])
    table = KmerTable.from_reads([rp], 21)
    dbg = DBG(ui, table)
    dbg.VALIDATE_WINDOW = window
    g = Genome()
    load_genome(ap, g)
    dbg.load_genome(g)
    dbg.validate_sequences(out=io.StringIO())
    tracks = [(t.cov.tobytes(), t.right.tobytes(), t.left.tobytes(),
               t.isfw.tobytes()) for t in dbg.tracks]
    return dbg.tot_missing, dbg.tot_edge_missing, dbg.tot_kcount, tracks


def test_windowed_validation_matches(tmp_path):
    rng = np.random.default_rng(0)
    genome_seq = "".join(rng.choice(list("ACGT"), size=5000))
    reads = [genome_seq[i:i + 150] for i in range(0, 4800, 40)]
    rp = str(tmp_path / "r.fasta")
    with open(rp, "w") as fh:
        for i, r in enumerate(reads):
            fh.write(f">r{i}\n{r}\n")
    asm = list(genome_seq[:4000])
    for pos in (500, 1500, 2600, 3333):
        asm[pos] = "ACGT"[("ACGT".index(asm[pos]) + 1) % 4]
    ap = str(tmp_path / "a.fasta")
    with open(ap, "w") as fh:
        fh.write(">a\n" + "".join(asm) + "\n")

    big = _run_validate(ap, rp, 1 << 22)
    small = _run_validate(ap, rp, 777)  # many odd-sized windows
    assert big == small
    assert big[0] > 0  # the planted errors produced missing k-mers
