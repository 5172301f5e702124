#!/usr/bin/env python
"""Wedge-tolerant training supervisor for the tunneled TPU.

The tunneled single-chip platform wedges under sustained training load
(observed three times across rounds 4-5: all device ops hang mid-step,
the process burns no CPU, SIGTERM is ignored — only SIGKILL works; a
fresh process recovers instantly and resumes from the last checkpoint).
The SIGTERM-save path in train/loop.py cannot help because the wedged
step never completes.  This supervisor automates the manual recovery
protocol from CLAUDE.md / RESULTS.md session 13:

  1. compute the remaining step budget from the newest checkpoint
     (train.py --max-steps counts steps THIS RUN, so each restart gets
     target_steps - latest_checkpoint_step);
  2. launch train.py and watch its log file's mtime;
  3. if the log goes silent for --stall-seconds (default 300; normal
     cadence is one print line per ~11 s window), SIGKILL the exact
     child process (never a pattern) and go to 1;
  4. exit 0 when the newest checkpoint reaches the target.

Usage:
  python tools/supervise_train.py --target-steps 72100 \
      --checkpoint-dir /root/logs/flagship-v4-cars/checkpoints \
      --log /root/logs/train_v4.log [--stall-seconds 300] \
      -- -c configs/srn-cars-code.yml dataset.basedir=... ...

Everything after ``--`` is passed to train.py verbatim (do NOT include
--max-steps; the supervisor owns it).
"""

import argparse
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def latest_step(ckpt_dir: Path) -> int:
    if not ckpt_dir.is_dir():
        return 0
    steps = [int(p.name) for p in ckpt_dir.iterdir()
             if p.is_dir() and p.name.isdigit()]
    return max(steps, default=0)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--target-steps", type=int, required=True,
                    help="absolute step count to reach (not steps-this-run)")
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--log", required=True,
                    help="train stdout/stderr sink; its mtime is the "
                         "liveness signal")
    ap.add_argument("--stall-seconds", type=float, default=300.0)
    ap.add_argument("--max-restarts", type=int, default=10)
    ap.add_argument("--grace-seconds", type=float, default=30.0,
                    help="SIGTERM->SIGKILL grace (lets a live process "
                         "finish its step + Orbax save; a truly wedged "
                         "one ignores SIGTERM)")
    ap.add_argument("train_args", nargs=argparse.REMAINDER,
                    help="-- then train.py arguments (without --max-steps)")
    args = ap.parse_args()
    train_args = args.train_args
    if train_args and train_args[0] == "--":
        train_args = train_args[1:]
    assert "--max-steps" not in train_args, \
        "the supervisor owns --max-steps"

    ckpt_dir = Path(args.checkpoint_dir)
    log_path = Path(args.log)
    restarts = 0
    while True:
        done = latest_step(ckpt_dir)
        remaining = args.target_steps - done
        if remaining <= 0:
            print(f"supervise_train: target {args.target_steps} reached "
                  f"(checkpoint {done})", flush=True)
            return 0
        cmd = [sys.executable, "train.py", "--max-steps", str(remaining)] \
            + train_args
        print(f"supervise_train: launching from checkpoint {done}, "
              f"{remaining} steps to go: {' '.join(cmd)}", flush=True)
        with open(log_path, "ab") as sink:
            proc = subprocess.Popen(cmd, cwd=REPO, stdout=sink,
                                    stderr=subprocess.STDOUT,
                                    start_new_session=True)
        wedged = False
        while True:
            try:
                proc.wait(timeout=30.0)
                break
            except subprocess.TimeoutExpired:
                pass
            try:
                silent = time.time() - log_path.stat().st_mtime
            except OSError:
                silent = 0.0
            if silent > args.stall_seconds:
                print(f"supervise_train: log silent {silent:.0f}s > "
                      f"{args.stall_seconds:.0f}s — wedged; killing pid "
                      f"{proc.pid}", flush=True)
                wedged = True
                proc.send_signal(signal.SIGTERM)
                try:
                    proc.wait(timeout=args.grace_seconds)
                except subprocess.TimeoutExpired:
                    # the known wedge ignores SIGTERM; kill the whole
                    # process group (exact pgid, never a pattern)
                    os.killpg(proc.pid, signal.SIGKILL)
                    proc.wait()
                break
        if proc.returncode == 0 and not wedged:
            final = latest_step(ckpt_dir)
            if final >= args.target_steps:
                print(f"supervise_train: complete at checkpoint {final}",
                      flush=True)
                return 0
            print(f"supervise_train: train exited 0 at checkpoint {final} "
                  f"< target {args.target_steps}; relaunching", flush=True)
        restarts += 1
        if restarts > args.max_restarts:
            print("supervise_train: restart budget exhausted", flush=True)
            return 1
        time.sleep(5.0)


if __name__ == "__main__":
    sys.exit(main())
