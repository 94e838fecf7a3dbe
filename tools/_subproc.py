"""Shared subprocess plumbing for the tools/ harnesses.

One copy of the env-merging and fail-with-log-tails logic so
dress_rehearsal.py and real_pipeline_quality.py can't drift apart.
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# one definition repo-wide (utils/watchdog.py); tools/supervise.py and
# this module share the same restart-on-75 contract
from superresolution_aniso_mri_tpu.utils.watchdog import (  # noqa: E402
    STALL_EXIT_CODE,
)


def child_env(data_root, force_cpu=False):
    """Environment for a child CLI: SR_DATA_ROOT + repo on PYTHONPATH.

    ``force_cpu=True`` additionally pins the child to the CPU backend
    (dress rehearsals — many short trainings that must not queue on the
    single tunneled chip); by default the child keeps the session's
    platform (the TPU when attached).
    """
    env = dict(
        os.environ, SR_DATA_ROOT=data_root,
        PYTHONPATH=os.pathsep.join(
            p for p in (REPO, os.environ.get("PYTHONPATH")) if p))
    if force_cpu:
        # JAX_PLATFORMS alone is NOT enough here: the axon sitecustomize
        # calls jax.config.update("jax_platforms", ...) at interpreter
        # start, overriding the env var — the child would silently claim
        # (or hang on) the single tunneled chip. Its registration is
        # gated on PALLAS_AXON_POOL_IPS, so dropping that variable keeps
        # the override out of the child entirely.
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update(JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu")
    return env


# a stall-restart that dies again faster than this was never really
# running (import-time failure, backend down for good) — same idea as
# tools/supervise.py's min-uptime guard
_MIN_STALL_UPTIME_S = 30.0


def run_child(cmd, data_root, what, log_path=None, timeout=7200,
              force_cpu=False, verbose=True, stall_restarts=0,
              min_stall_uptime_s=_MIN_STALL_UPTIME_S):
    """Run a child CLI; on failure raise SystemExit with the output
    tails (full output goes to ``log_path`` when given — callers should
    put it somewhere that survives their cleanup).

    ``stall_restarts`` > 0 re-runs the child when it exits with the
    watchdog's stall status (75, utils/watchdog.py — the tunneled
    device backend wedged mid-step), up to that many times; the command
    should pass ``--auto_resume`` so each attempt continues from the
    rolling checkpoint. Any other nonzero status still fails fast, and
    two consecutive stalls faster than 30 s abort the loop (restart
    storm / dead backend, not a transient wedge).

    The log is truncated at the START of each run_child call and
    appended across its stall restarts: one invocation's log holds all
    of its attempts and nothing from previous invocations.
    """
    if log_path:
        open(log_path, "w").close()
    # epoll takes an int-milliseconds timeout: anything past ~24.8 days
    # (2^31-1 ms) raises OverflowError inside subprocess.communicate —
    # a caller computing a generous scaled budget (e.g. a 256^2 dHCP
    # benchmark's steps x per-step headroom) would crash the harness
    # instead of running. Clamp to 7 days: still "effectively no limit"
    # for any legitimate child.
    timeout = min(timeout, 7 * 86400)
    # ``timeout`` is an OVERALL wall-clock cap for this run_child call:
    # stall restarts deduct the time already burned, so up to 11
    # attempts of a repeatedly wedging backend can't stretch a run to
    # 11x the intended budget (round-3 advisor finding).
    deadline = time.time() + timeout
    attempts = 0
    fast_deaths = 0
    while True:
        remaining = deadline - time.time()
        if remaining <= 0:
            raise SystemExit(
                f"TIMEOUT [{what}]: overall {timeout:.0f}s budget "
                f"exhausted after {attempts} attempt(s): "
                f"{' '.join(cmd)}")
        r = _run_once(cmd, data_root, what, log_path, remaining, force_cpu)
        if r.returncode == STALL_EXIT_CODE and attempts < stall_restarts:
            fast_deaths = (fast_deaths + 1
                           if r.elapsed_s < min_stall_uptime_s else 0)
            if fast_deaths >= 2:
                print(f"[{what}] two consecutive "
                      f"sub-{min_stall_uptime_s:.0f}s stalls — backend "
                      f"looks dead, not wedged; giving up", flush=True)
                break
            attempts += 1
            # exponential backoff (capped): the tunneled backend's
            # outages come in multi-minute phases — restarting
            # immediately burns a full resume (data upload + compile)
            # per wedged epoch, while waiting out the down-phase
            # resumes once when the tunnel returns. Deducted from the
            # same overall budget as everything else.
            backoff = min(300.0, 5.0 * (2.0 ** max(0, attempts - 2)))
            print(f"[{what}] device backend stalled (exit 75) — "
                  f"restart {attempts}/{stall_restarts}"
                  + (f" (backoff {backoff:.0f}s)" if backoff > 5
                     else ""), flush=True)
            # never sleep (much) past the deadline — but when the
            # budget IS nearly spent, sleep just beyond it so the next
            # loop iteration raises the budget-exhausted SystemExit
            # instead of launching a ~0s-timeout attempt
            time.sleep(min(backoff,
                           max(0.0, deadline - time.time()) + 0.1))
            continue
        break
    if r.returncode != 0:
        raise SystemExit(
            f"FAIL [{what}]: {' '.join(cmd)}\n{r.stdout[-2000:]}"
            f"\n{r.stderr[-4000:]}")
    if verbose:
        print(f"[{what}] done in {r.elapsed_s:.0f}s", flush=True)
    return r


def _run_once(cmd, data_root, what, log_path, timeout, force_cpu):
    t0 = time.time()
    try:
        r = subprocess.run(cmd, cwd=REPO,
                           env=child_env(data_root, force_cpu=force_cpu),
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired as e:
        # preserve whatever the child printed before the hang — a
        # 30-minute stall with zero diagnostics is undebuggable — and
        # APPEND so earlier stall-restart attempts' logs survive too
        out = (e.stdout or b"") if isinstance(e.stdout, (bytes, type(None))) \
            else e.stdout
        err = (e.stderr or b"") if isinstance(e.stderr, (bytes, type(None))) \
            else e.stderr
        out = out.decode(errors="replace") if isinstance(out, bytes) else out
        err = err.decode(errors="replace") if isinstance(err, bytes) else err
        if log_path:
            with open(log_path, "a") as f:
                f.write((out or "") + "\n--- stderr ---\n" + (err or "")
                        + f"\n--- TIMEOUT after {timeout}s ---\n")
        raise SystemExit(
            f"TIMEOUT [{what}] after {timeout}s: {' '.join(cmd)}\n"
            f"{(out or '')[-2000:]}\n{(err or '')[-4000:]}")
    if log_path:
        # append: stall restarts within this run_child call accumulate
        with open(log_path, "a") as f:
            f.write(r.stdout + "\n--- stderr ---\n" + r.stderr)
    r.elapsed_s = time.time() - t0
    return r
