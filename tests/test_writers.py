"""Output-writer tests: track tables and bkwig/decompressor round trip."""

import contextlib
import io
import os
import shlex

import pytest

from .conftest import REFERENCE, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference corpus not present")


def _validate(tmp_path, out_name):
    """Run a validate command from tmp_path (testFiles symlinked) so
    extension-only outputs like `-o hist` land there, as with the
    reference CLI."""
    from kreeq_tpu.cli.main import run

    link = tmp_path / "testFiles"
    if not link.exists():
        link.symlink_to(os.path.join(REFERENCE, "testFiles"))
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        with contextlib.redirect_stdout(io.StringIO()):
            run(shlex.split(
                "kreeq validate -f testFiles/random1.fasta "
                f"-r testFiles/random1.fastq -o {out_name}"))
    finally:
        os.chdir(cwd)
    return tmp_path / out_name


def test_bkwig_roundtrip_through_decompressor(tmp_path):
    """bkwig written by us must inflate to the same rows as our kwig."""
    from kreeq_tpu.cli.decompressor import run as drun

    bkwig = _validate(tmp_path, "out.bkwig")
    kwig = _validate(tmp_path, "out.kwig")

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        drun(["kreeq-decompressor", "inflate", "-i", str(bkwig)])
    inflated = buf.getvalue().rstrip("\n")
    assert inflated == kwig.read_text().rstrip("\n")


def test_bed_table_window(tmp_path):
    bed = _validate(tmp_path, "out.bed")
    lines = bed.read_text().splitlines()
    # one row per base of random1.fasta (9 sequences x 99 bp)
    assert len(lines) == 891
    first = lines[0].split("\t")
    assert first[0] == "sequence1" and first[1] == "0"
    # k-wide sliding windows with zero left-padding at the start
    covs = first[2].split(":")
    assert len(covs) == 21
    assert covs[:20] == ["0"] * 20


def test_hist_output(tmp_path):
    hist = _validate(tmp_path, "hist")
    # `-o hist` goes through the hist writer (cov histogram)
    rows = [l.split("\t") for l in hist.read_text().splitlines()]
    total = sum(int(c) * int(n) for c, n in rows)
    assert total == 172  # total kmers of random1.fastq (test.0 golden)


def test_vcf_to_file(tmp_path):
    from kreeq_tpu.cli.main import run

    cwd = os.getcwd()
    try:
        os.chdir(REFERENCE)
        with contextlib.redirect_stdout(io.StringIO()):
            run(shlex.split(
                "kreeq validate -f testFiles/to_correct.fasta "
                "-r testFiles/to_correct.fastq "
                f"-o {tmp_path}/cand.vcf --search-depth 50 --max-span 32"))
    finally:
        os.chdir(cwd)
    text = (tmp_path / "cand.vcf").read_text()
    assert text.startswith("##fileformat=VCFv4.2\n")
    assert "sequence2\t25\t.\ta\tT" in text
