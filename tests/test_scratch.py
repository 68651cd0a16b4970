"""Scratch-directory hygiene (round 11, r10 verdict item 7): the
sink/scan round-trip keys' temp dirs must be bounded across repeated
sweeps — end-of-process cleanup for this process's dirs, an age-gated
janitor for dirs leaked by crashed earlier sessions (526 dirs / ~2 GB
had accumulated in /tmp before the fix), and a source scan so no new
call site regresses to bare mkdtemp."""

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
    scratch._CREATED.remove(d)


def test_janitor_sweeps_only_stale_engine_dirs(tmp_path, monkeypatch):
    import tempfile

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    stale = tmp_path / "mrsas_old_leak"
    young = tmp_path / "mrsas_recent"
    foreign = tmp_path / "somebody_elses_dir"
    for d in (stale, young, foreign):
        d.mkdir()
    old = time.time() - (scratch.STALE_HOURS + 1) * 3600
    os.utime(stale, (old, old))
    os.utime(foreign, (old, old))
    monkeypatch.setattr(scratch, "_janitor_ran", False)
    d = scratch.mkscratch("mrsas_testscratch_")
    try:
        assert not stale.exists(), "stale engine dir must be swept"
        assert young.exists(), "young dir may belong to a live process"
        assert foreign.exists(), "non-engine dirs are never touched"
    finally:
        scratch._cleanup()
        scratch._CREATED.clear()
        monkeypatch.setattr(scratch, "_janitor_ran", False)


def test_no_bare_mkdtemp_in_engine_package():
    """Every temp dir the engine creates must go through mkscratch so
    the cleanup/janitor bounds hold; a new bare tempfile.mkdtemp call
    site reintroduces the unbounded-accumulation leak this module
    exists to close."""
    pkg = pathlib.Path(scratch.__file__).parent
    offenders = [
        str(p)
        for p in pkg.rglob("*.py")
        if p.name != "scratch.py"
        and "tempfile.mkdtemp(" in p.read_text()  # call syntax, not prose
    ]
    assert not offenders, f"bare mkdtemp call sites: {offenders}"
