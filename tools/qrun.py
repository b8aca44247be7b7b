"""Loud queue-item runner — one stalled item must never eat a round.

Round-4 postmortem (VERDICT r4, weak #1): the chip queue stalled inside
its first item and five deliverables silently never ran; ROUND4.md cited
artifacts that did not exist. This runner makes every item's state a
committed fact:

    python tools/qrun.py --status logs/r5_queue_status.json \
        --name roofline --timeout 2400 -- python tools/r5_roofline.py

- writes {name: {state: STARTED, t0}} to the status JSON BEFORE launch
  (atomic rewrite), then {state: DONE|FAILED|TIMEOUT, rc, seconds, log}
  after; a crashed runner leaves STARTED, itself a loud signal.
- stdout/stderr tee'd to logs/<name>.log.
- exit code mirrors the child's (124 on timeout), so `&&` chains stop
  on failure while the status file still records the tail items as
  never-started (absent), not silently skipped.

ROUND*.md discipline: cite "Evidence: <file>" only for DONE items;
anything else is "Queued:" / "FAILED:" with the status JSON as witness.
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def _update(path: str, name: str, patch: dict) -> None:
    data = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:
            data = {"_corrupt_previous": True}
    entry = data.get(name, {})
    entry.update(patch)
    data[name] = entry
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=2)
    os.replace(tmp, path)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--status", required=True)
    ap.add_argument("--name", required=True)
    ap.add_argument("--timeout", type=float, required=True)
    ap.add_argument("--log", default=None)
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        print("qrun: no command", file=sys.stderr)
        return 2

    log_path = args.log or os.path.join(ROOT, "logs", f"{args.name}.log")
    os.makedirs(os.path.dirname(log_path), exist_ok=True)
    t0 = time.time()
    _update(args.status, args.name, {
        "state": "STARTED", "cmd": " ".join(cmd), "log": log_path,
        "started_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    })
    print(f"qrun[{args.name}] STARTED: {' '.join(cmd)}", flush=True)

    with open(log_path, "a") as lf:
        try:
            proc = subprocess.Popen(cmd, stdout=lf, stderr=subprocess.STDOUT)
            try:
                rc = proc.wait(timeout=args.timeout)
                state = "DONE" if rc == 0 else "FAILED"
            except subprocess.TimeoutExpired:
                proc.kill()  # exact PID we started — never by pattern
                proc.wait()
                rc, state = 124, "TIMEOUT"
        except Exception as e:  # launch failure (missing binary etc.)
            rc, state = 127, "FAILED"
            lf.write(f"qrun launch error: {e!r}\n")

    dt = round(time.time() - t0, 1)
    _update(args.status, args.name,
            {"state": state, "rc": rc, "seconds": dt})
    print(f"qrun[{args.name}] {state} rc={rc} after {dt}s", flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
