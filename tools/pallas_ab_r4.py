#!/usr/bin/env python
"""Pallas-vs-XLA A/B at the round-4 lever-menu operating points.

VERDICT round-3 item 4: the kernel families were falsified only at the
flagship shape (hidden=256, 32+128 — PERF.md session 4); the lever menu
now recommends num_fine=64 / hidden=192 operating points where the
custom-call layout-glue economics differ (glue bytes scale with
[R*S, hidden] activations, and 192 is a 1.5x multiple of the 128-lane
tile).  This runs the best-at-256 family (`pallas_layer_bwd`, the v3
glue-reduced per-layer backward — ops/layer_bwd.py) against XLA at each
new operating point, ALL IN ONE PROCESS so each pair shares the tunnel /
environment conditions (session drift is 1-5%; the decisions here are
10%+ — PERF.md measurement gotchas).

The serving-shape arm of item 4 is already on record: Pallas fused trunk
fwd 436.6k vs XLA split-fc_out 838.6k rays/s at the 64+64 serving shape
(PERF.md sessions 4-5) — not re-run.

Pairs run in priority order (recommended operating points first) so a
timeout still yields the prime data.  Emits one JSON line per config and
a final summary table.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import run_bench, _arm_watchdog  # noqa: E402

# (label, hidden, coarse, fine, layer_bwd) — 16384 rays = the lever-menu
# measurement shape (PERF.md session 8: raw jitted step, flagship train
# ray batch).  tail_sigma follows bench.py's measured per-shape winner.
CONFIGS = [
    ("h256_f64_xla",  256, 32, 64,  False),
    ("h256_f64_lbwd", 256, 32, 64,  True),
    ("h192_f64_xla",  192, 32, 64,  False),
    ("h192_f64_lbwd", 192, 32, 64,  True),
    ("h192_f128_xla",  192, 32, 128, False),
    ("h192_f128_lbwd", 192, 32, 128, True),
]


def main():
    import jax
    # pallas_layer_bwd silently falls back to XLA off-TPU
    # (models/ray_structured.py gates on jax.default_backend() == 'tpu'),
    # which would make this print a plausible-looking ~0% A/B table.
    if jax.default_backend() != "tpu":
        sys.exit("pallas_ab_r4: refusing to run off-TPU — the layer_bwd "
                 "arm would silently fall back to XLA and the A/B would "
                 "compare XLA against itself "
                 f"(backend={jax.default_backend()!r})")
    results = {}
    for label, hidden, coarse, fine, lbwd in CONFIGS:
        # re-armed per config: on a cold compilation cache each first
        # compile is 4-7 min through the tunnel, so one shared 55-min
        # watchdog could kill the later pairs (ADVICE round 4)
        _arm_watchdog(15.0)
        t0 = time.perf_counter()
        r = run_bench(num_rays=16384, hidden=hidden, num_coarse=coarse,
                      num_fine=fine, pallas_layer_bwd=lbwd,
                      fc_out_tail_sigma=fine >= 96)
        r["config"] = label
        r["wall_s"] = round(time.perf_counter() - t0, 1)
        results[label] = r
        print(json.dumps(r), flush=True)

    print("\n| config | rays/s | band | layer_bwd vs XLA |", flush=True)
    print("|---|---|---|---|", flush=True)
    for label, r in results.items():
        if not label.endswith("_xla"):
            continue
        pair = results.get(label.replace("_xla", "_lbwd"))
        delta = (f"{(pair['value'] / r['value'] - 1) * 100:+.1f}%"
                 if pair else "n/a")
        print(f"| {label[:-4]} | {r['value']:,.0f} | "
              f"{r['band_min']:,.0f}-{r['band_max']:,.0f} | {delta} |",
              flush=True)


if __name__ == "__main__":
    main()
