#!/usr/bin/env python
"""Supervisor loop for stall-resilient training/serving.

Completes the failure-recovery contract (SURVEY §5 failure detection):
the child runs with ``--step_timeout_s``/``--synth_timeout_s`` and exits
75 (EX_TEMPFAIL, utils/watchdog.py) when its device backend wedges; this
supervisor restarts it — training children should therefore also pass
``--auto_resume`` so each restart continues from the rolling
last.models checkpoint. Any other exit status ends the loop (0 =
finished, nonzero = real error worth a human).

    python tools/supervise.py --max_restarts 20 -- \
        python train_brain_aesr.py -d OASIS ... \
            --auto_resume --step_timeout_s 300

A minimum-uptime guard stops restart storms: a child that dies with 75
faster than ``--min_uptime_s`` twice in a row is treated as a hard
failure (e.g. the backend is down for good, not transiently wedged).
"""
import argparse
import subprocess
import sys
import time

STALL_EXIT_CODE = 75  # keep in sync with utils/watchdog.py


def supervise(cmd, max_restarts=20, min_uptime_s=60.0,
              backoff_s=5.0, _print=print):
    """Run ``cmd`` until it exits with a status other than 75.

    Returns the final exit status. Restarts on 75 up to ``max_restarts``
    times, with ``backoff_s`` between attempts; two consecutive sub-
    ``min_uptime_s`` stalls abort (restart storm / dead backend).
    """
    restarts = 0
    fast_deaths = 0
    while True:
        t0 = time.monotonic()
        rc = subprocess.call(cmd)
        uptime = time.monotonic() - t0
        if rc != STALL_EXIT_CODE:
            if restarts:
                _print(f"[supervise] child exited {rc} after "
                       f"{restarts} restart(s)")
            return rc
        fast_deaths = fast_deaths + 1 if uptime < min_uptime_s else 0
        if fast_deaths >= 2:
            _print(f"[supervise] two consecutive stalls under "
                   f"{min_uptime_s:.0f}s uptime — backend looks dead, "
                   f"giving up")
            return STALL_EXIT_CODE
        if restarts >= max_restarts:
            _print(f"[supervise] stall-restart budget exhausted "
                   f"({max_restarts})")
            return STALL_EXIT_CODE
        restarts += 1
        _print(f"[supervise] stall detected (exit 75, uptime "
               f"{uptime:.0f}s) — restart {restarts}/{max_restarts} "
               f"in {backoff_s:.0f}s")
        time.sleep(backoff_s)


def main():
    p = argparse.ArgumentParser(
        description="Restart a watchdog-equipped child on stall-exit 75",
        usage="supervise.py [options] -- <command> [args...]")
    p.add_argument("--max_restarts", type=int, default=20)
    p.add_argument("--min_uptime_s", type=float, default=60.0)
    p.add_argument("--backoff_s", type=float, default=5.0)
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="child command (prefix with --)")
    args = p.parse_args()
    cmd = args.cmd[1:] if args.cmd[:1] == ["--"] else args.cmd
    if not cmd:
        p.error("no child command given (usage: supervise.py -- cmd ...)")
    sys.exit(supervise(cmd, args.max_restarts, args.min_uptime_s,
                       args.backoff_s))


if __name__ == "__main__":
    main()
