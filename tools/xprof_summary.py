#!/usr/bin/env python
"""Summarize a jax.profiler trace directory: per-op device time ranking.

The tensorboard_plugin_profile <-> tensorflow versions in this image
disagree (xspace_to_tools_data is missing), so this parses the
.xplane.pb protos directly via tensorflow's bundled xplane_pb2 and
aggregates event durations per op name and per plane (device vs host).

Usage:
  python tools/xprof_summary.py /tmp/xprof_dir [--top 30] [--plane TPU]

Durations are summed over all occurrences in the trace window (divide
by the number of profiled steps yourself).  Event nesting means parent
"module" events include their children; rows are therefore most useful
below the module level — filter with --exclude-substr for the wrappers.
"""

from __future__ import annotations

import argparse
import glob
from collections import defaultdict


def summarize(logdir: str, top: int = 30, plane_filter: str = "",
              exclude: tuple = ()):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {logdir}")
    out = []
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for pl in xs.planes:
            if plane_filter and plane_filter.lower() not in pl.name.lower():
                continue
            if not pl.lines:
                continue
            emeta = {m.id: m.name for m in pl.event_metadata.values()}
            durs = defaultdict(int)
            counts = defaultdict(int)
            for line in pl.lines:
                for ev in line.events:
                    name = emeta.get(ev.metadata_id, "?")
                    if any(x in name for x in exclude):
                        continue
                    durs[name] += ev.duration_ps
                    counts[name] += 1
            rows = sorted(durs.items(), key=lambda kv: -kv[1])[:top]
            out.append((pl.name, [(n, d / 1e9, counts[n]) for n, d in rows]))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--plane", default="", help="substring filter, e.g. TPU")
    ap.add_argument("--exclude-substr", nargs="*", default=[])
    args = ap.parse_args()
    for plane_name, rows in summarize(args.logdir, args.top, args.plane,
                                      tuple(args.exclude_substr)):
        print(f"\n== {plane_name} ==")
        print(f"{'total ms':>10} {'count':>7}  op")
        for name, ms, count in rows:
            print(f"{ms:10.3f} {count:7d}  {name[:100]}")


if __name__ == "__main__":
    main()
