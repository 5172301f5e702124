"""Config system: loads every reference YAML unchanged (all 3 schema
generations), applies dotted overrides, dumps resolved config."""

from pathlib import Path

import pytest

from codenerf_tpu.config import load_config, dump_config

REF_CONFIGS = Path("/root/reference/config")


class TestReferenceConfigs:
    @pytest.mark.parametrize("name", [
        "srn-cars-code.yml", "srn-chairs-code.yml", "srn-cars-code-3080.yml",
        "srn-cars-code-3080-val.yml", "lego.yml", "srn-cars.yml",
        "srn-chairs.yml", "fern.yml",
    ])
    def test_loads(self, name):
        cfg = load_config(REF_CONFIGS / name)
        assert cfg.experiment.iterations > 0
        assert cfg.nerf.point_sampler.num_coarse > 0
        assert cfg.nerf.point_sampler.far_limit > cfg.nerf.point_sampler.near_limit

    def test_modern_schema_values(self):
        cfg = load_config(REF_CONFIGS / "srn-cars-code.yml")
        assert cfg.models.nerf_coarse.type == "CodeNeRFModel"
        assert cfg.models.nerf_coarse.hidden_size == 256
        assert cfg.models.embedding.shape_code_size == 256
        assert cfg.nerf.point_sampler.num_coarse == 32
        assert cfg.nerf.point_sampler.num_fine == 128
        assert cfg.nerf.point_sampler.spacing_mode == "lindepth"
        assert cfg.optimizer.type == "AdamW"
        assert cfg.optimizer.resolved_embedding_lr == pytest.approx(1e-3)
        assert cfg.optimizer.resolved_val_type == "AdamW"
        # defaults for keys absent in this yaml (reference eval.py would
        # crash on them: cfg.optimizer.angle_lr)
        assert cfg.optimizer.resolved_angle_lr == cfg.optimizer.val_lr
        assert cfg.experiment.regularizer_lambda == pytest.approx(1e-5)

    def test_chairs_has_explicit_tto_lrs(self):
        cfg = load_config(REF_CONFIGS / "srn-chairs-code.yml")
        assert cfg.optimizer.resolved_angle_lr == pytest.approx(5e-2)
        assert cfg.optimizer.resolved_radius_lr == pytest.approx(1e-1)
        assert cfg.nerf.point_sampler.near_limit == pytest.approx(1.25)

    def test_legacy_models_coarse_schema(self):
        cfg = load_config(REF_CONFIGS / "lego.yml")
        assert cfg.models.nerf_coarse.type == "FlexibleNeRFModel"
        assert cfg.models.nerf_coarse.num_layers == 8
        assert cfg.models.nerf_coarse.skip_connect_ids == (4,)
        assert cfg.nerf.point_sampler.near_limit == pytest.approx(2.0)
        assert cfg.dataset.type == "BlenderNeRFDataset"

    def test_fern_oldest_schema(self):
        cfg = load_config(REF_CONFIGS / "fern.yml")
        assert cfg.experiment.iterations == 250000          # train_iters
        assert cfg.optimizer.scheduler_step_size == 250000  # lr_decay * 1000
        assert cfg.optimizer.scheduler_gamma == pytest.approx(0.1)
        assert cfg.nerf.ray_sampler.num_random_rays == 4096
        assert cfg.nerf.point_sampler.num_coarse == 64
        # lindisp: False in old schema = linear in depth = modern "lindisp"
        assert cfg.nerf.point_sampler.spacing_mode == "lindisp"
        assert cfg.models.nerf_coarse.hidden_size == 64
        assert cfg.nerf.embedder.num_encoding_fn_xyz == 6

    def test_dotted_overrides(self):
        cfg = load_config(REF_CONFIGS / "srn-cars-code.yml",
                          overrides=["optimizer.lr=3e-4",
                                     "nerf.point_sampler.num_coarse=64",
                                     "experiment.id=foo"])
        assert cfg.optimizer.lr == pytest.approx(3e-4)
        assert cfg.nerf.point_sampler.num_coarse == 64
        assert cfg.experiment.id == "foo"

    def test_runtime_kernel_flags_reach_render_settings(self):
        from codenerf_tpu.pipeline import RenderSettings
        cfg = load_config(REF_CONFIGS / "srn-cars-code.yml",
                          overrides=["runtime.pallas_hybrid=True",
                                     "runtime.pallas_backward=True"])
        s = RenderSettings.from_config(cfg)
        assert s.pallas_hybrid and s.pallas_backward and not s.use_pallas

    def test_python_source_config(self, tmp_path):
        """.py configs exporting a cfg dict (reference cfg_node.py:370-384)."""
        py = tmp_path / "exp.py"
        py.write_text(
            "base = 128\n"
            "cfg = {'experiment': {'id': 'pycfg'},\n"
            "       'models': {'nerf_coarse':\n"
            "                  {'type': 'CodeNeRFModel', 'hidden_size': base}}}\n")
        cfg = load_config(py, overrides=["optimizer.lr=2e-4"])
        assert cfg.experiment.id == "pycfg"
        assert cfg.models.nerf_coarse.hidden_size == 128
        assert cfg.optimizer.lr == pytest.approx(2e-4)

    def test_python_source_config_requires_cfg_dict(self, tmp_path):
        py = tmp_path / "bad.py"
        py.write_text("x = 1\n")
        with pytest.raises(ValueError):
            load_config(py)

    def test_unknown_override_raises(self):
        with pytest.raises(KeyError):
            load_config(REF_CONFIGS / "srn-cars-code.yml",
                        overrides=["optimizer.bogus=1"])

    def test_dump_roundtrip(self, tmp_path):
        cfg = load_config(REF_CONFIGS / "srn-cars-code.yml")
        out = tmp_path / "config.yml"
        dump_config(cfg, out)
        cfg2 = load_config(out)
        assert cfg2.models.nerf_coarse.hidden_size == 256
        assert cfg2.nerf.point_sampler.spacing_mode == "lindepth"


class TestCfgNodeCompat:
    """The reference CfgNode API surface (cfg_node.py:238-319) mapped onto
    frozen dataclasses: structural immutability + defrost-as-dict, and the
    deprecated/renamed key registries guarding dotted overrides."""

    def test_freeze_is_structural(self):
        import dataclasses
        cfg = load_config(REF_CONFIGS / "srn-cars-code.yml")
        assert cfg.is_frozen()
        assert cfg.freeze() is cfg
        with pytest.raises(dataclasses.FrozenInstanceError):
            cfg.experiment = None

    def test_clone_is_deep_and_equal(self):
        cfg = load_config(REF_CONFIGS / "srn-cars-code.yml")
        c = cfg.clone()
        assert c == cfg and c is not cfg

    def test_defrost_edit_refreeze(self):
        from codenerf_tpu.config import config_from_dict
        cfg = load_config(REF_CONFIGS / "srn-cars-code.yml")
        d = cfg.defrost()
        d["models"]["nerf_coarse"]["hidden_size"] = 64
        cfg2 = config_from_dict(d)
        assert cfg2.models.nerf_coarse.hidden_size == 64
        assert cfg2.models.nerf_fine.hidden_size == 256  # untouched
        assert cfg2.is_frozen()

    def test_deprecated_key_warned_and_ignored(self):
        cfg = load_config(
            REF_CONFIGS / "srn-cars-code.yml",
            overrides=["models.nerf_coarse.skip_connect_every=3"])
        # ignored, not applied, not fatal
        assert cfg.models.nerf_coarse.hidden_size == 256

    def test_renamed_key_raises_with_new_name(self):
        with pytest.raises(KeyError, match="experiment.iterations"):
            load_config(REF_CONFIGS / "srn-cars-code.yml",
                        overrides=["experiment.train_iters=5"])

    def test_renamed_key_with_unit_note(self):
        """scheduler.lr_decay counted THOUSANDS of steps; the rename hint
        must carry the unit conversion or users set a value 1000x too
        small (ADVICE round 3; the reference registry's (new, message)
        form, cfg_node.py:282-296)."""
        with pytest.raises(KeyError) as ei:
            load_config(REF_CONFIGS / "srn-cars-code.yml",
                        overrides=["scheduler.lr_decay=250"])
        assert "optimizer.scheduler_step_size" in str(ei.value)
        assert "multiply your value by 1000" in str(ei.value)

    def test_register_new_keys(self):
        from codenerf_tpu.config.schema import (
            DEPRECATED_KEYS, RENAMED_KEYS, register_deprecated_key,
            register_renamed_key)
        register_deprecated_key("experiment.test_dep_key")
        register_renamed_key("experiment.test_old", "experiment.test_new")
        try:
            assert "experiment.test_dep_key" in DEPRECATED_KEYS
            assert RENAMED_KEYS["experiment.test_old"] == "experiment.test_new"
            with pytest.raises(ValueError):
                register_deprecated_key("experiment.test_dep_key")
        finally:
            DEPRECATED_KEYS.discard("experiment.test_dep_key")
            RENAMED_KEYS.pop("experiment.test_old", None)
