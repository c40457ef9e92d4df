"""Run-directory cleanup: delete runs without checkpoints.

Parity target: `DeleteEmptyRuns.py` - removes runNNNNN directories that
never produced a checkpoint (crashed/aborted runs).

Usage:
  python -m isosurfacesuperresolution_tpu.apps.delete_empty_runs runs \
      [--dryRun]
"""

from __future__ import annotations

import argparse
import os
import re
import shutil


def find_empty_runs(base: str):
    pattern = re.compile(r"^run\d{5}$")
    empty = []
    for name in sorted(os.listdir(base)):
        if not pattern.match(name):
            continue
        run = os.path.join(base, name)
        ckpt = os.path.join(run, "checkpoints")
        has_ckpt = os.path.isdir(ckpt) and any(
            e.isdigit() for e in os.listdir(ckpt))
        if not has_ckpt:
            empty.append(run)
    return empty


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("base", nargs="?", default="runs")
    p.add_argument("--dryRun", action="store_true")
    args = p.parse_args(argv)
    if not os.path.isdir(args.base):
        raise SystemExit(f"no such directory: {args.base}")
    empty = find_empty_runs(args.base)
    for run in empty:
        if args.dryRun:
            print("would delete", run)
        else:
            shutil.rmtree(run)
            print("deleted", run)
    if not empty:
        print("no empty runs found")


if __name__ == "__main__":
    main()
