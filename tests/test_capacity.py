"""HBM capacity model for batched TTO (eval/capacity.py).

Pins the round-2 failure (RESULTS.md session 10): --batch-objects 8 at
the flagship eval shapes OOMed v5e at compile (16.41 GiB > 15.75 GiB)
and the whole category evaluation died.  validate_category must now
(a) clamp the group size analytically before compiling and (b) survive
a runtime OOM by halving K and continuing.
"""

import numpy as np
import pytest
import jax

from codenerf_tpu.eval import capacity
from codenerf_tpu.pipeline import RenderSettings
from tests.test_train import tiny_config

GIB = 1024 ** 3


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    import subprocess
    import sys
    from pathlib import Path
    root = tmp_path_factory.mktemp("synthcap") / "srn_cars"
    subprocess.run(
        [sys.executable, "tools/make_synth_data.py", "--out", str(root),
         "--objects", "2", "--views", "4", "--val-views", "2",
         "--size", "16"],
        check=True, cwd=Path(__file__).resolve().parents[1],
        capture_output=True)
    return root


def _flagship_settings():
    """The exact shapes of the recorded v5e failure."""
    cfg = tiny_config("CodeNeRFModel")
    import dataclasses
    cfg = dataclasses.replace(
        cfg,
        nerf=dataclasses.replace(
            cfg.nerf,
            point_sampler=dataclasses.replace(
                cfg.nerf.point_sampler, num_coarse=32, num_fine=128)),
        models=dataclasses.replace(
            cfg.models,
            nerf_coarse=dataclasses.replace(cfg.models.nerf_coarse,
                                            hidden_size=256),
            nerf_fine=dataclasses.replace(cfg.models.nerf_fine,
                                          hidden_size=256)),
        runtime=dataclasses.replace(cfg.runtime, compute_dtype="bfloat16"))
    return RenderSettings.from_config(cfg)


class TestEstimator:
    def test_reproduces_v5e_failure_point(self):
        """K=8 at the flagship shapes must estimate ~16.41 GiB (+-10%) —
        over the 15.75 GiB budget — while K=4 (which ran) fits."""
        s = _flagship_settings()
        est8 = capacity.tto_group_bytes(s, num_random_rays=4096, K=8)
        assert est8 == pytest.approx(16.41 * GIB, rel=0.10)
        budget = int(15.75 * GIB)
        assert est8 > budget * capacity.SAFETY
        est4 = capacity.tto_group_bytes(s, num_random_rays=4096, K=4)
        assert est4 < budget * capacity.SAFETY

    def test_max_batch_objects_clamps(self):
        s = _flagship_settings()
        budget = int(15.75 * GIB)
        fit = capacity.max_batch_objects(s, 4096, 8, budget=budget)
        assert 4 <= fit < 8          # would have prevented the failure
        # tiny budget still returns a runnable group size
        assert capacity.max_batch_objects(s, 4096, 8, budget=1) == 1

    def test_unknown_budget_passthrough(self, monkeypatch):
        monkeypatch.delenv("CODENERF_HBM_BUDGET_BYTES", raising=False)
        monkeypatch.setattr(capacity, "device_memory_budget", lambda: None)
        s = _flagship_settings()
        assert capacity.max_batch_objects(s, 4096, 8) == 8

    def test_env_budget_override(self, monkeypatch):
        monkeypatch.setenv("CODENERF_HBM_BUDGET_BYTES", str(4 * GIB))
        assert capacity.device_memory_budget() == 4 * GIB

    def test_is_oom_error(self):
        assert capacity.is_oom_error(
            RuntimeError("RESOURCE_EXHAUSTED: Out of memory ..."))
        assert capacity.is_oom_error(
            RuntimeError("Allocation ... exceeds the amount available"))
        assert not capacity.is_oom_error(ValueError("shape mismatch"))
        # type gate (ADVICE round 3): non-RuntimeError exceptions whose
        # message merely embeds OOM-looking text must surface, not retry
        assert not capacity.is_oom_error(
            ValueError("path '/data/out of memory test' not found"))
        assert not capacity.is_oom_error(
            AssertionError("expected 'Out of memory' in log"))
        # ...but RESOURCE_EXHAUSTED is trusted regardless of wrapper type
        assert capacity.is_oom_error(
            Exception("XlaRuntimeError: RESOURCE_EXHAUSTED: ..."))

    def test_itemsize_follows_actual_dtype(self):
        """A settings built DIRECTLY with compute_dtype='float32' must size
        activations at 4 bytes — the truthiness heuristic halved it and
        over-admitted K (ADVICE round 3)."""
        import dataclasses
        s = _flagship_settings()           # bf16 -> 2 bytes/el
        cc32 = dataclasses.replace(s.coarse_cfg, compute_dtype="float32")
        cf32 = dataclasses.replace(s.fine_cfg, compute_dtype="float32")
        s32 = dataclasses.replace(s, coarse_cfg=cc32, fine_cfg=cf32)
        assert (capacity.tto_group_bytes(s32, 4096, 4)
                == 2 * capacity.tto_group_bytes(s, 4096, 4))


class TestCategoryAutoSplit:
    """validate_category's two defense layers, exercised without a TPU."""

    def _harness(self, synth_root, tmp_path):
        from codenerf_tpu.harness import Harness
        from tests.test_loop import _cfg
        cfg = _cfg(synth_root, tmp_path)
        return Harness.from_config(cfg, make_devices_mesh=False)

    def test_analytic_clamp_auto_splits(self, synth_root, tmp_path,
                                        monkeypatch, capsys):
        """A budget that only admits K=1 must split a --batch-objects 2
        category run into singleton groups and still cover every object."""
        import codenerf_tpu.harness as H
        from codenerf_tpu.train import init_train_state
        from codenerf_tpu.utils.logging import MetricLogger

        harness = self._harness(synth_root, tmp_path)
        s = harness.settings
        per_obj = capacity.tto_group_bytes(
            s, harness.cfg.nerf.ray_sampler.num_random_rays, 1)
        monkeypatch.setenv("CODENERF_HBM_BUDGET_BYTES",
                           str(int(per_obj / capacity.SAFETY) + 1))
        state, _ = init_train_state(jax.random.PRNGKey(0), harness.cfg, s,
                                    harness.train_dataset.num_objects)
        out = H.validate_category(harness, state.params,
                                  MetricLogger(tmp_path / "cap1"),
                                  batch_objects=2, val_iterations=2)
        assert out["num_objects"] == 2     # both val objects still evaluated
        assert "auto-splitting into groups of 1" in capsys.readouterr().out

    def test_runtime_oom_halves_group(self, synth_root, tmp_path,
                                      monkeypatch, capsys):
        """An OOM raised by the batched step must halve K and redo the
        remaining objects instead of killing the protocol."""
        import codenerf_tpu.harness as H
        from codenerf_tpu.train import init_train_state
        from codenerf_tpu.utils.logging import MetricLogger

        harness = self._harness(synth_root, tmp_path)
        state, _ = init_train_state(jax.random.PRNGKey(0), harness.cfg,
                                    harness.settings,
                                    harness.train_dataset.num_objects)
        real_validate = H.validate_batched
        calls = []

        def flaky(harness_, params_, logger_, K, **kw):
            calls.append(K)
            if K > 1:
                raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory "
                                   "allocating 17624345600 bytes")
            return real_validate(harness_, params_, logger_, K, **kw)

        monkeypatch.setattr(H, "validate_batched", flaky)
        out = H.validate_category(harness, state.params,
                                  MetricLogger(tmp_path / "cap2"),
                                  batch_objects=2, val_iterations=2)
        assert out["num_objects"] == 2
        assert calls[0] == 2 and all(k == 1 for k in calls[1:])
        assert "ran out of device memory" in capsys.readouterr().out
