"""Golden-output parity tests against the reference's validateFiles corpus.

Each test.N.tst holds a command line (line 1) and the expected stdout
(after the literal "embedded" marker) — the same contract the reference
CI enforces via kreeq-validate (reference: src/validate.cpp:43-126).
We re-run each command through the kreeq-tpu CLI in-process and diff
stdout exactly.
"""

import contextlib
import glob
import io
import os
import shlex

import pytest

from .conftest import REFERENCE, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference corpus not present")

# Features not yet implemented in this round; shrink as coverage grows.
NOT_YET = set()

TSTS = sorted(glob.glob(os.path.join(REFERENCE, "validateFiles", "*.tst")),
              key=lambda p: int(p.split(".")[-2]))


def load_tst(path):
    with open(path) as fh:
        lines = fh.read().splitlines()
    cmd = lines[0].rstrip()
    assert lines[1].strip() == "embedded"
    return cmd, "\n".join(lines[2:])


def run_cli(cmd: str) -> str:
    argv = shlex.split(cmd)
    out = io.StringIO()
    cwd = os.getcwd()
    try:
        os.chdir(REFERENCE)
        with contextlib.redirect_stdout(out):
            if argv[0] == "kreeq":
                from kreeq_tpu.cli.main import run

                rc = run(argv)
            elif argv[0] == "kreeq-decompressor":
                from kreeq_tpu.cli.decompressor import run

                rc = run(argv)
            else:
                raise AssertionError(f"unknown binary {argv[0]}")
        assert rc in (0, None), f"exit code {rc}"
    finally:
        os.chdir(cwd)
    return out.getvalue()


@pytest.mark.parametrize(
    "tst", TSTS, ids=[os.path.basename(t)[:-4] for t in TSTS])
def test_golden(tst):
    num = int(tst.split(".")[-2])
    if num in NOT_YET:
        pytest.skip("not yet implemented")
    cmd, expected = load_tst(tst)
    actual = run_cli(cmd)
    assert actual.rstrip("\n") == expected.rstrip("\n")
