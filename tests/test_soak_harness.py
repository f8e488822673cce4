"""Unit tests for the round-5 soak harness's phase runner
(scripts/soak_round5.py run_phase): the stall watchdog, the
exact-process-group kill, and the relaunch-with-resume loop.

Three consecutive rounds lost the at-scale soak to harness defects
(group-signalling timeout kills, unsurvivable wedges — VERDICT r4
item 1), so the machinery itself is pinned here with fake phases:
a clean success, a silent hang that must be killed and relaunched,
and a nonzero exit that must be retried.  chip_ok is stubbed out —
these tests exercise the harness, not the tunnel.
"""

import importlib
import os
import sys
import time

import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")


@pytest.fixture()
def soak(monkeypatch, tmp_path):
    """Import scripts/soak_round5.py with test-speed knobs."""
    monkeypatch.setenv("KREEQ_TPU_SOAK_COOLDOWN_S", "0")
    monkeypatch.setenv("KREEQ_TPU_SOAK_ATTEMPTS", "3")
    monkeypatch.setenv("KREEQ_TPU_SOAK_MIRROR",
                       str(tmp_path / "mirror.log"))
    monkeypatch.syspath_prepend(SCRIPTS)
    import soak_round5

    mod = importlib.reload(soak_round5)
    monkeypatch.setattr(mod, "chip_ok", lambda timeout_s=0: True)
    return mod


def test_run_phase_success(soak, tmp_path):
    wd = str(tmp_path)
    wall, attempts, _rss = soak.run_phase(
        wd, "ok", [sys.executable, "-c", "print('hello')"], stall_s=30)
    assert attempts == 1
    log = (tmp_path / "phase_ok.log").read_text()
    assert "hello" in log


@pytest.mark.slow  # watchdog poll quantum is 30s -> ~1 min wall
def test_run_phase_kills_silent_hang_and_resumes(soak, tmp_path):
    """Attempt 1 prints nothing and sleeps past the stall window; the
    harness must kill its process group and relaunch; attempt 2 (which
    sees the attempt-counter file the fake phase maintains) succeeds.
    This is the wedge-recovery path that round 4's `timeout 3000`
    group-kill broke."""
    wd = str(tmp_path)
    marker = tmp_path / "attempts"
    prog = (
        "import os, sys, time\n"
        f"p = {str(marker)!r}\n"
        "n = int(open(p).read()) if os.path.exists(p) else 0\n"
        "open(p, 'w').write(str(n + 1))\n"
        "if n == 0:\n"
        "    time.sleep(600)\n"  # silent: no output -> stall
        "print('resumed fine')\n"
    )
    t0 = time.time()
    wall, attempts, _rss = soak.run_phase(
        wd, "hang", [sys.executable, "-u", "-c", prog], stall_s=3)
    assert attempts == 2
    assert time.time() - t0 < 120  # killed by watchdog, not by wait
    assert "resumed fine" in (tmp_path / "phase_hang.log").read_text()
    mirror = (tmp_path / "mirror.log").read_text()
    assert "no output for 3s" in mirror


def test_run_phase_retries_nonzero_exit(soak, tmp_path):
    wd = str(tmp_path)
    marker = tmp_path / "attempts"
    prog = (
        "import os, sys\n"
        f"p = {str(marker)!r}\n"
        "n = int(open(p).read()) if os.path.exists(p) else 0\n"
        "open(p, 'w').write(str(n + 1))\n"
        "print('attempt', n)\n"
        "sys.exit(0 if n >= 1 else 7)\n"
    )
    wall, attempts, _rss = soak.run_phase(
        wd, "rc", [sys.executable, "-u", "-c", prog], stall_s=30)
    assert attempts == 2
    mirror = (tmp_path / "mirror.log").read_text()
    assert "rc=7" in mirror


def test_run_phase_gives_up_after_max_attempts(soak, tmp_path):
    wd = str(tmp_path)
    with pytest.raises(SystemExit) as ei:
        soak.run_phase(wd, "fail",
                       [sys.executable, "-c", "raise SystemExit(5)"],
                       stall_s=30)
    assert ei.value.code == 2
    mirror = (tmp_path / "mirror.log").read_text()
    assert "FAILED after 3 attempts" in mirror
