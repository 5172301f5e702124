"""bench.py secondary modes (serving / tto) — shape and contract smoke.

The recordable numbers come from the TPU (one configuration per process);
these tests pin the JSON contract and that both modes run end-to-end on
the CPU test platform at tiny shapes.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench


REQUIRED = {"metric", "value", "unit", "vs_baseline",
            "band_min", "band_max", "band_rel_spread"}


def test_serving_bench_contract():
    out = bench.run_serving_bench(variant="bf16", num_rays=64, hidden=32,
                                  code=16, steps=3, windows=2)
    assert REQUIRED <= set(out)
    assert out["unit"] == "rays/s"
    assert out["value"] > 0
    assert out["band_min"] <= out["value"] <= out["band_max"]
    assert out["metric"].startswith("serving_rays_per_sec_per_chip_bf16")


def test_tto_bench_contract():
    out = bench.run_tto_bench(num_objects=1, image_size=12,
                              num_random_rays=16, restarts=1,
                              probe_steps=1, tto_steps=3, flip_steps=1)
    assert REQUIRED <= set(out)
    assert out["unit"] == "objects/min"
    assert out["value"] > 0
    assert out["recipe_seconds"] > 0
    assert out["tto_steps_per_sec"] > 0


def test_headline_bench_records_resolved_tail_sigma():
    """ADVICE round 3: the emitted JSON must be self-describing about the
    shape-dependent fc_out_tail_sigma resolution."""
    out = bench.run_bench(num_rays=32, hidden=16, code=16, num_coarse=4,
                          num_fine=4, steps=2, compute_dtype="float32",
                          fc_out_tail_sigma=False)
    assert out["fc_out_tail_sigma"] is False
