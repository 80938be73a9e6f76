"""Run a command, retrying while the TPU backend is claimed by someone else.

The axon tunnel admits ONE client process at a time; a concurrent claimant
(e.g. a health probe) makes backend init fail with
"Unable to initialize backend 'axon': UNAVAILABLE" after the claim timeout.
That failure happens at INIT — before any work — so a process-level retry is
safe and loses nothing. Once a process holds the chip it keeps it for life.

Usage:
  python scripts/tpu_retry.py [--tries 8] [--sleep 60] -- <cmd> [args...]

Exit code: the command's, or the last failure's after exhausting retries.
"""
from __future__ import annotations

import argparse
import subprocess
import sys
import time

RETRY_MARKERS = (
    "Unable to initialize backend",
    "TPU backend setup/compile error (Unavailable)",
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tries", type=int, default=8)
    ap.add_argument("--sleep", type=float, default=60.0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given")

    for attempt in range(1, args.tries + 1):
        # Tee output through so logs stream live; keep a tail for the check.
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True, bufsize=1)
        tail: list[str] = []
        assert proc.stdout is not None
        for line in proc.stdout:
            sys.stdout.write(line)
            sys.stdout.flush()
            tail.append(line)
            if len(tail) > 80:
                tail.pop(0)
        rc = proc.wait()
        if rc == 0:
            return 0
        text = "".join(tail)
        if not any(m in text for m in RETRY_MARKERS):
            return rc  # real failure — don't mask it
        if attempt == args.tries:
            print(f"[tpu_retry] backend still unavailable after "
                  f"{args.tries} attempts", flush=True)
            return rc
        print(f"[tpu_retry] TPU claimed elsewhere (attempt {attempt}/"
              f"{args.tries}); retrying in {args.sleep:.0f}s", flush=True)
        time.sleep(args.sleep)
    return 1


if __name__ == "__main__":
    sys.exit(main())
