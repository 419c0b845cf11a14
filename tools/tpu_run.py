"""Watchdog runner for TPU scripts over the flaky HTTP relay.

The relay occasionally wedges a fresh process before its first device op
(CLAUDE.md "Environment quirks"); the fix is to kill that exact process and
start a fresh one. This runner automates it: it launches the target script as
a subprocess, watches its stdout for progress, and kills + relaunches when no
new output appears within the deadline (scripts should print with
``flush=True`` at every milestone).

Usage: python tools/tpu_run.py [--tries N] [--silence S] script.py [args...]
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def run_once(cmd: list[str], silence: float, hard_timeout: float) -> int | None:
    """Run cmd; return exit code, or None if killed for silence/timeout."""
    env = dict(os.environ)
    env["PYTHONUNBUFFERED"] = "1"
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        env=env, start_new_session=True,
    )
    os.set_blocking(proc.stdout.fileno(), False)
    last_out = time.time()
    start = time.time()
    buf = b""
    try:
        while True:
            chunk = proc.stdout.read()
            if chunk:
                last_out = time.time()
                buf += chunk
                sys.stdout.write(chunk.decode(errors="replace"))
                sys.stdout.flush()
            if proc.poll() is not None:
                rest = proc.stdout.read()
                if rest:
                    sys.stdout.write(rest.decode(errors="replace"))
                    sys.stdout.flush()
                return proc.returncode
            now = time.time()
            if now - last_out > silence or now - start > hard_timeout:
                why = "silence" if now - last_out > silence else "timeout"
                print(f"\n[tpu_run] killing pgid {proc.pid} ({why}, "
                      f"{now - last_out:.0f}s quiet)", flush=True)
                os.killpg(proc.pid, signal.SIGKILL)
                proc.wait()
                return None
            time.sleep(1.0)
    finally:
        if proc.poll() is None:
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tries", type=int, default=4)
    ap.add_argument("--silence", type=float, default=150.0,
                    help="max seconds without new stdout before kill+retry")
    ap.add_argument("--timeout", type=float, default=1800.0)
    ap.add_argument("script")
    ap.add_argument("args", nargs="*")
    a = ap.parse_args()
    cmd = [sys.executable, a.script, *a.args]
    for attempt in range(1, a.tries + 1):
        print(f"[tpu_run] attempt {attempt}/{a.tries}: {' '.join(cmd)}",
              flush=True)
        rc = run_once(cmd, a.silence, a.timeout)
        if rc is not None:
            return rc
    print("[tpu_run] all attempts wedged", flush=True)
    return 17


if __name__ == "__main__":
    sys.exit(main())
