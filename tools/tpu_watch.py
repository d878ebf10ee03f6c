"""Run queued TPU commands as soon as the flaky axon tunnel is reachable.

The experimental axon backend can hang ``jax.devices()`` forever when its
relay drops (observed repeatedly in round 3) — any probe launched into that
state wedges until its outer timeout. This runner makes hardware A/B queues
survivable: it polls liveness with a SUBPROCESS-isolated check (a hung
check is killed, not inherited), and only when a real dispatch round-trips
does it start the next queued command. Commands that time out are retried
(the tunnel dropping mid-run looks like a timeout), with the wait state
re-entered in between.

Usage:
    python -m tools.tpu_watch --cmdfile /tmp/queue.txt [--log /tmp/watch.log]
    # queue.txt: one shell command per line; blank lines and # comments skipped

Queued commands MUST be idempotent (or write attempt-tagged outputs): a
timed-out attempt is re-run from scratch, so partial side effects of the
first attempt (rows appended to a results file, half-written JSON) would
otherwise be duplicated. The in-repo probes satisfy this by rewriting their
output files whole.

The liveness probe materializes a matmul result — ``jax.devices()`` alone
can succeed while dispatch hangs (tunnel half-up).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

LIVENESS_SNIPPET = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((128, 128));"
    "v = float((x @ x).sum());"
    "print('TPU_LIVE', jax.default_backend(), v, flush=True)"
)


def tpu_alive(timeout_s: float = 90.0) -> bool:
    """True iff a fresh process can dispatch + fetch a value in time."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", LIVENESS_SNIPPET],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False
    return out.returncode == 0 and "TPU_LIVE" in out.stdout


def wait_for_tpu(log, poll_s: float, max_wait_s: float) -> bool:
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        if tpu_alive():
            log(f"tunnel up after {time.time() - t0:.0f}s")
            return True
        log(f"tunnel down ({time.time() - t0:.0f}s elapsed); retry in {poll_s:.0f}s")
        time.sleep(poll_s)
    return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cmdfile", required=True, help="one shell command per line")
    ap.add_argument("--log", default="/tmp/tpu_watch.log")
    ap.add_argument("--cmd_timeout", type=float, default=1200.0)
    ap.add_argument("--poll", type=float, default=60.0)
    ap.add_argument("--max_wait", type=float, default=3600.0, help="per wait state")
    ap.add_argument("--retries", type=int, default=2, help="per command")
    args = ap.parse_args()

    logf = open(args.log, "a", buffering=1)

    def log(msg: str) -> None:
        line = f"[tpu_watch {time.strftime('%H:%M:%S')}] {msg}"
        print(line, flush=True)
        logf.write(line + "\n")

    with open(args.cmdfile) as f:
        cmds = [ln.strip() for ln in f if ln.strip() and not ln.strip().startswith("#")]
    log(f"{len(cmds)} command(s) queued")

    failures = 0
    for i, cmd in enumerate(cmds):
        done = False
        for attempt in range(args.retries + 1):
            if not wait_for_tpu(log, args.poll, args.max_wait):
                log(f"GIVE UP waiting for tunnel (cmd {i}: {cmd})")
                return 2
            log(f"run [{i}.{attempt}] {cmd}")
            # own session: on timeout, killpg reaps the WHOLE process group.
            # Killing only the shell (subprocess.run's behavior) leaves the
            # actual probe alive holding the TPU, and the next liveness wait
            # then fights a zombie forever.
            proc = subprocess.Popen(
                cmd,
                shell=True,
                stdout=logf,
                stderr=subprocess.STDOUT,
                start_new_session=True,
            )
            try:
                proc.wait(timeout=args.cmd_timeout)
                r = proc
            except subprocess.TimeoutExpired:
                import os
                import signal

                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    pass
                proc.wait()
                log(f"TIMEOUT [{i}.{attempt}] after {args.cmd_timeout:.0f}s — "
                    "process group killed; assuming tunnel drop, re-entering wait state")
                continue
            if r.returncode == 0:
                log(f"ok [{i}] {cmd}")
                done = True
                break
            log(f"FAILED [{i}.{attempt}] rc={r.returncode} — not retrying "
                "(non-timeout failures are bugs, not tunnel flake)")
            break
        if not done:
            failures += 1
    log(f"queue drained, {failures} failure(s)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
