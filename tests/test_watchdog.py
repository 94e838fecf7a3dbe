"""Stall-watchdog unit tests (utils/watchdog.py).

The real on_stall path calls os._exit(75) — tests inject a recording
callback instead and drive the timing with short windows.
"""
import os
import time

import pytest

from superresolution_aniso_mri_tpu.utils.watchdog import (
    STALL_EXIT_CODE, StepWatchdog,
)


def _make(timeout, fired):
    return StepWatchdog(
        timeout_s=timeout,
        on_stall=lambda el, beats, label: fired.append((el, beats, label)),
        poll_s=0.05, label="t")


def test_beats_prevent_fire():
    fired = []
    wd = _make(0.5, fired).start()
    try:
        for _ in range(8):
            time.sleep(0.1)
            wd.beat()
        assert fired == []
    finally:
        wd.stop()


def test_stall_fires_once_with_diagnostics():
    fired = []
    wd = _make(0.3, fired).start()
    try:
        wd.beat()
        wd.beat()
        time.sleep(1.0)
        assert len(fired) == 1
        elapsed, beats, label = fired[0]
        assert elapsed >= 0.3 and beats == 2 and label == "t"
    finally:
        wd.stop()


def test_suspended_disarms_and_rearms():
    fired = []
    wd = _make(0.3, fired).start()
    try:
        with wd.suspended():
            time.sleep(0.8)  # longer than timeout — must NOT fire
        assert fired == []
        time.sleep(0.8)  # re-armed with a fresh window — must fire now
        assert len(fired) == 1
    finally:
        wd.stop()


def test_stop_is_idempotent_and_quiet():
    fired = []
    wd = _make(0.3, fired).start()
    wd.stop()
    wd.stop()
    time.sleep(0.5)
    assert fired == []


def test_stop_then_start_rearms():
    """stop() → start() must yield a LIVE monitor again (the _stop event
    is cleared on start; a stale set event would make the new thread
    exit instantly and silently never guard)."""
    fired = []
    wd = _make(0.3, fired)
    wd.start()
    wd.stop()
    wd.start()
    try:
        time.sleep(0.8)  # no beats — the restarted monitor must fire
        assert len(fired) == 1
    finally:
        wd.stop()


def test_rejects_nonpositive_timeout():
    with pytest.raises(ValueError):
        StepWatchdog(timeout_s=0)


def test_exit_code_is_ex_tempfail():
    assert STALL_EXIT_CODE == 75


def test_supervise_restarts_on_75_and_stops_on_0(tmp_path):
    """tools/supervise.py: restart on stall-exit 75, stop on any other
    status, abort on consecutive fast deaths."""
    import sys
    sys.path.insert(0, "tools")
    from supervise import supervise

    marker = tmp_path / "count"
    marker.write_text("0")
    # child exits 75 twice, then 0 — supervisor must restart twice
    child = [sys.executable, "-c",
             f"import sys,pathlib; p=pathlib.Path({str(marker)!r}); "
             "n=int(p.read_text()); p.write_text(str(n+1)); "
             "sys.exit(75 if n < 2 else 0)"]
    msgs = []
    rc = supervise(child, max_restarts=5, min_uptime_s=0.0,
                   backoff_s=0.0, _print=msgs.append)
    assert rc == 0
    assert marker.read_text() == "3"
    assert sum("restart" in m for m in msgs) >= 2

    # a real error (exit 3) is not retried
    marker.write_text("0")
    child_err = [sys.executable, "-c",
                 f"import sys,pathlib; p=pathlib.Path({str(marker)!r}); "
                 "p.write_text(str(int(p.read_text())+1)); sys.exit(3)"]
    rc = supervise(child_err, max_restarts=5, min_uptime_s=0.0,
                   backoff_s=0.0, _print=msgs.append)
    assert rc == 3
    assert marker.read_text() == "1"

    # consecutive sub-min_uptime stalls abort with 75
    child_stall = [sys.executable, "-c", "import sys; sys.exit(75)"]
    rc = supervise(child_stall, max_restarts=50, min_uptime_s=9999.0,
                   backoff_s=0.0, _print=msgs.append)
    assert rc == 75


def test_run_child_stall_restarts(tmp_path, monkeypatch):
    """tools/_subproc.run_child(stall_restarts=N): re-run on stall-exit
    75 (tunneled backend wedged, the quality campaign's training child),
    fail fast on any other nonzero status."""
    import sys
    sys.path.insert(0, "tools")
    import _subproc

    monkeypatch.setattr(_subproc.time, "sleep", lambda s: None)
    marker = tmp_path / "count"
    marker.write_text("0")
    child = [sys.executable, "-c",
             f"import sys,pathlib; p=pathlib.Path({str(marker)!r}); "
             "n=int(p.read_text()); p.write_text(str(n+1)); "
             "sys.exit(75 if n < 2 else 0)"]
    log = tmp_path / "child.log"
    r = _subproc.run_child(child, str(tmp_path), "t", log_path=str(log),
                           timeout=60, force_cpu=True, verbose=False,
                           stall_restarts=5, min_stall_uptime_s=0.0)
    assert r.returncode == 0
    assert marker.read_text() == "3"
    # the log appends across attempts instead of erasing earlier ones
    assert log.read_text().count("--- stderr ---") == 3

    # ... but a NEW run_child call truncates it (no stale cross-run logs)
    ok = [sys.executable, "-c", "print('fresh')"]
    _subproc.run_child(ok, str(tmp_path), "t", log_path=str(log),
                       timeout=60, force_cpu=True, verbose=False)
    assert log.read_text().count("--- stderr ---") == 1
    assert "fresh" in log.read_text()

    # restarts exhausted -> SystemExit (still a failure, not a hang)
    marker.write_text("0")
    child75 = [sys.executable, "-c", "import sys; sys.exit(75)"]
    with pytest.raises(SystemExit):
        _subproc.run_child(child75, str(tmp_path), "t", timeout=60,
                           force_cpu=True, verbose=False, stall_restarts=1,
                           min_stall_uptime_s=0.0)

    # two consecutive sub-min-uptime stalls abort even with restarts left
    marker.write_text("0")
    count_child = [sys.executable, "-c",
                   f"import sys,pathlib; p=pathlib.Path({str(marker)!r}); "
                   "p.write_text(str(int(p.read_text())+1)); sys.exit(75)"]
    with pytest.raises(SystemExit):
        _subproc.run_child(count_child, str(tmp_path), "t", timeout=60,
                           force_cpu=True, verbose=False,
                           stall_restarts=50, min_stall_uptime_s=9999.0)
    assert marker.read_text() == "2"     # first + one restart, then abort

    # a real error is never retried
    marker.write_text("0")
    child_err = [sys.executable, "-c",
                 f"import sys,pathlib; p=pathlib.Path({str(marker)!r}); "
                 "p.write_text(str(int(p.read_text())+1)); sys.exit(3)"]
    with pytest.raises(SystemExit):
        _subproc.run_child(child_err, str(tmp_path), "t", timeout=60,
                           force_cpu=True, verbose=False, stall_restarts=5)
    assert marker.read_text() == "1"


def test_first_beat_window_is_wider():
    """Until the first beat the (wider) first_timeout_s window applies —
    the first step carries every XLA compile; sizing the steady-state
    window for compiles would blunt stall detection."""
    fired = []
    wd = StepWatchdog(
        timeout_s=0.3, first_timeout_s=1.2,
        on_stall=lambda el, beats, label: fired.append((el, beats, label)),
        poll_s=0.05, label="t").start()
    try:
        time.sleep(0.7)        # past timeout_s, inside first window
        assert fired == []
        time.sleep(1.0)        # past the first window — genuine stall
        assert len(fired) == 1 and fired[0][1] == 0
    finally:
        wd.stop()


def test_steady_window_applies_after_first_beat():
    fired = []
    wd = StepWatchdog(
        timeout_s=0.3, first_timeout_s=10.0,
        on_stall=lambda el, beats, label: fired.append(el),
        poll_s=0.05, label="t").start()
    try:
        wd.beat()              # compile done — steady window from here
        time.sleep(0.8)
        assert len(fired) == 1 and fired[0] < 10.0
    finally:
        wd.stop()


def test_first_timeout_must_not_be_tighter():
    with pytest.raises(ValueError):
        StepWatchdog(timeout_s=5.0, first_timeout_s=1.0)


def test_compile_cache_env_and_idempotence(tmp_path, monkeypatch):
    """utils/compile_cache.py: SR_COMPILE_CACHE=off disables; a path
    enables and points jax at it; the second call is a no-op returning
    the first directory."""
    from superresolution_aniso_mri_tpu.utils import compile_cache as cc

    monkeypatch.setattr(cc, "_enabled_dir", None)
    monkeypatch.setenv("SR_COMPILE_CACHE", "off")
    assert cc.enable_persistent_compile_cache() is None

    # empty means disabled too (documented: "off/0/empty") — it must
    # not fall through to the default directory
    monkeypatch.setattr(cc, "_enabled_dir", None)
    monkeypatch.setenv("SR_COMPILE_CACHE", "")
    assert cc.enable_persistent_compile_cache() is None

    monkeypatch.setattr(cc, "_enabled_dir", None)
    d = str(tmp_path / "xla_cache")
    monkeypatch.setenv("SR_COMPILE_CACHE", d)
    got = cc.enable_persistent_compile_cache()
    assert got == d and os.path.isdir(d)
    import jax

    assert jax.config.jax_compilation_cache_dir == d
    # idempotent: a later call (other CLI module) keeps the first dir
    assert cc.enable_persistent_compile_cache(str(tmp_path / "other")) == d


def test_pause_covers_peer_serial_window_and_beat_rearms():
    """Cross-host pattern (cli/train_loop.py): a non-main host pauses
    before blocking in the next epoch's first collective while main runs
    its serial preview/checkpoint phase; the first completed step's
    beat()+resume() re-arms with a fresh window."""
    fired = []
    wd = _make(0.3, fired).start()
    try:
        wd.beat()
        wd.pause()            # end-of-epoch on a non-main host
        time.sleep(0.8)       # main's slow serial phase — must NOT fire
        assert fired == []
        wd.beat()             # first train step of the next epoch
        wd.resume()           # _beat() re-arms after a pause window
        time.sleep(0.15)
        assert fired == []    # fresh window, not the stale pre-pause one
        time.sleep(0.7)       # now a genuine stall — must fire
        assert len(fired) == 1
    finally:
        wd.stop()
