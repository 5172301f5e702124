"""End-to-end harness tests: run_training + validate on a synthetic SRN tree."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import jax

from codenerf_tpu.config import load_config


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth") / "srn_cars"
    subprocess.run(
        [sys.executable, "tools/make_synth_data.py", "--out", str(root),
         "--objects", "2", "--views", "4", "--val-views", "2",
         "--size", "16"],
        check=True, cwd=Path(__file__).resolve().parents[1],
        capture_output=True)
    return root


def _cfg(synth_root, tmp_path, **extra):
    overrides = [
        f"dataset.basedir={synth_root}",
        f"experiment.logdir={tmp_path}",
        "experiment.id=looptest",
        "experiment.iterations=100000",
        "experiment.print_every=2",
        "experiment.save_every=4",
        "experiment.validate_every=1000000",
        "experiment.val_iterations=3",
        "experiment.val_print_every=2",
        "dataset.train_batch_size=2",
        "nerf.ray_sampler.num_random_rays=32",
        "nerf.point_sampler.num_coarse=8",
        "nerf.point_sampler.num_fine=8",
        "models.nerf_coarse.hidden_size=16",
        "models.nerf_fine.hidden_size=16",
        "models.embedding.shape_code_size=8",
        "models.embedding.texture_code_size=8",
        "nerf.embedder.num_encoding_fn_xyz=4",
        "nerf.embedder.num_encoding_fn_dir=2",
        "nerf.validation.chunksize=64",
        "runtime.compute_dtype=float32",
    ] + [f"{k}={v}" for k, v in extra.items()]
    base = Path(__file__).resolve().parents[1] / "configs" / "synth-smoke.yml"
    return load_config(base, overrides=overrides)


class TestRunTraining:
    def test_trains_checkpoints_and_resumes(self, synth_root, tmp_path):
        from codenerf_tpu.train.loop import run_training
        from codenerf_tpu.train import checkpoint

        cfg = _cfg(synth_root, tmp_path)
        metrics = run_training(cfg, max_steps=5)
        assert np.isfinite(metrics["loss"])
        ckdir = tmp_path / "looptest" / "checkpoints"
        assert checkpoint.latest_step(ckdir) == 5
        # resolved config + metrics written
        assert (tmp_path / "looptest" / "config.yml").exists()
        assert (tmp_path / "looptest" / "metrics.jsonl").exists()

        # resume continues from step 5
        metrics2 = run_training(cfg, max_steps=2)
        assert checkpoint.latest_step(ckdir) == 7

    def test_validation_tto_path(self, synth_root, tmp_path):
        from codenerf_tpu.harness import Harness, validate
        from codenerf_tpu.train.state import init_train_state
        from codenerf_tpu.utils.logging import MetricLogger

        cfg = _cfg(synth_root, tmp_path)
        harness = Harness.from_config(cfg)
        state, _ = init_train_state(jax.random.PRNGKey(0), cfg,
                                    harness.settings,
                                    harness.train_dataset.num_objects)
        logger = MetricLogger(tmp_path / "val", enable_tensorboard=False)
        out = validate(harness, state.params, logger, iteration=0)
        assert np.isfinite(out["psnr"])
        logger.close()

    def test_validation_int8_serving_ab(self, synth_root, tmp_path):
        """runtime.int8_serving renders the final image through the int8
        path too and reports both metric sets (models/quantized.py)."""
        from codenerf_tpu.harness import Harness, validate
        from codenerf_tpu.train.state import init_train_state
        from codenerf_tpu.utils.logging import MetricLogger

        cfg = _cfg(synth_root, tmp_path, **{"runtime.int8_serving": "true",
                                            "experiment.id": "int8test"})
        harness = Harness.from_config(cfg)
        state, _ = init_train_state(jax.random.PRNGKey(0), cfg,
                                    harness.settings,
                                    harness.train_dataset.num_objects)
        logger = MetricLogger(tmp_path / "val8", enable_tensorboard=False)
        out = validate(harness, state.params, logger, iteration=0)
        logger.close()
        assert np.isfinite(out["psnr_int8"])
        # int8 render of an (untrained) model still tracks the full-
        # precision render closely
        assert abs(out["psnr_int8"] - out["psnr"]) < 1.0, out

    def test_validation_multi_start_pose(self, synth_root, tmp_path, capsys):
        """optimizer.pose_restarts probes several azimuth inits and
        continues from the lowest-loss candidate (beyond-reference)."""
        import dataclasses
        from codenerf_tpu.harness import Harness, validate
        from codenerf_tpu.train.state import init_train_state
        from codenerf_tpu.utils.logging import MetricLogger

        cfg = _cfg(synth_root, tmp_path)
        cfg = dataclasses.replace(
            cfg, optimizer=dataclasses.replace(
                cfg.optimizer, pose_restarts=3, pose_restart_steps=2))
        harness = Harness.from_config(cfg)
        state, _ = init_train_state(jax.random.PRNGKey(0), cfg,
                                    harness.settings,
                                    harness.train_dataset.num_objects)
        logger = MetricLogger(tmp_path / "valms", enable_tensorboard=False)
        out = validate(harness, state.params, logger, iteration=0,
                       val_iterations=3)
        assert np.isfinite(out["psnr"])
        assert "pose multi-start" in capsys.readouterr().out
        logger.close()

    def test_multiview_se3_refine_composition(self, synth_root, tmp_path,
                                              capsys):
        """The full beyond-reference TTO stack composes in one harness run:
        multi-start probing + multi-view TTO (with the constant-total ray
        budget split) + flip rescue + PER-VIEW SE(3) refinement (VERDICT
        round-4 item 5: previously the refine stage was skipped when
        tto_views > 1)."""
        import dataclasses
        from codenerf_tpu.harness import Harness, validate_batched
        from codenerf_tpu.train.state import init_train_state
        from codenerf_tpu.utils.logging import MetricLogger

        cfg = _cfg(synth_root, tmp_path)
        cfg = dataclasses.replace(
            cfg, optimizer=dataclasses.replace(
                cfg.optimizer, pose_restarts=2, pose_restart_steps=1,
                pose_flip_steps=1, se3_refine_steps=2,
                tto_view_ray_split=True))
        harness = Harness.from_config(cfg)
        state, _ = init_train_state(jax.random.PRNGKey(0), cfg,
                                    harness.settings,
                                    harness.train_dataset.num_objects)
        logger = MetricLogger(tmp_path / "valmvr", enable_tensorboard=False)
        out = validate_batched(harness, state.params, logger, num_objects=2,
                               val_iterations=2, tto_views=2,
                               return_recovered=True)
        printed = capsys.readouterr().out
        assert "SE3 refine" in printed          # the stage RAN (not skipped)
        assert "not implemented" not in printed
        assert "tto_view_ray_split: 16 rays/view x 2 views" in printed
        assert np.isfinite(out["psnr_mean"])
        assert all(np.isfinite(o["pose_error"]) for o in out["per_object"])
        rec = out["recovered"]
        assert rec["z_s"].shape[0] == 2
        assert rec["final_poses"].shape == (2, 4, 4)
        assert rec["theta"].shape == (2,)       # view-0 spherical winners
        logger.close()
