"""Reference torch checkpoint import: weights must round-trip into our
pytrees so outputs match the torch model exactly, and the Orbax conversion
must be loadable by the standard restore path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from codenerf_tpu.models import (
    CodeNeRFConfig, FlexibleNeRFConfig, apply_codenerf, apply_flexible_nerf,
    lookup_codes,
)
from codenerf_tpu.train.torch_import import (
    codenerf_params_from_torch, flexible_params_from_torch, codes_from_torch,
    params_from_torch_checkpoint, import_torch_checkpoint,
    codenerf_state_dict, flexible_state_dict, codes_state_dict,
    export_torch_checkpoint,
)
from tests.reference_loader import load_reference_module


def _ref_models(hidden=32, code=16, seed=0):
    import torch
    torch.manual_seed(seed)
    model_mod = load_reference_module(
        "ref_model", "view_synthesis/models/model.py")
    kw = dict(hidden_size=hidden, shape_code_size=code,
              texture_code_size=code, num_encoding_fn_xyz=6,
              num_encoding_fn_dir=4)
    coarse = model_mod.CodeNeRFModel(**kw)
    fine = model_mod.CodeNeRFModel(**kw)
    emb = model_mod.ShapeTextureEmbedding(5, code, code)
    return coarse, fine, emb


class TestStateDictConversion:
    def test_codenerf_outputs_match_torch(self):
        import torch
        coarse, _, _ = _ref_models()
        cfg = CodeNeRFConfig(hidden_size=32, shape_code_size=16,
                             texture_code_size=16, num_encoding_fn_xyz=6,
                             num_encoding_fn_dir=4)
        params = codenerf_params_from_torch(coarse.state_dict())

        rng = np.random.default_rng(0)
        x = rng.normal(size=(9, cfg.dim_xyz + cfg.dim_dir)).astype(np.float32)
        z_s = rng.normal(size=(9, 16)).astype(np.float32)
        z_t = rng.normal(size=(9, 16)).astype(np.float32)
        want = coarse(torch.from_numpy(z_s), torch.from_numpy(z_t),
                      torch.from_numpy(x)).detach().numpy()
        got = apply_codenerf(params, cfg, jnp.asarray(x), jnp.asarray(z_s),
                             jnp.asarray(z_t))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-6)

    def test_ddp_module_prefix_stripped(self):
        coarse, _, _ = _ref_models(seed=1)
        sd = {f"module.{k}": v for k, v in coarse.state_dict().items()}
        params = codenerf_params_from_torch(sd)
        np.testing.assert_array_equal(
            np.asarray(params["layer_xyz1"]["b"]),
            coarse.state_dict()["layer_xyz1.bias"].numpy())

    def test_flexible_with_viewdirs(self):
        import torch
        torch.manual_seed(2)
        model_mod = load_reference_module(
            "ref_model", "view_synthesis/models/model.py")
        ref = model_mod.FlexibleNeRFModel(
            num_layers=4, hidden_size=32, skip_connect_ids=[2],
            num_encoding_fn_xyz=6, num_encoding_fn_dir=4, use_viewdirs=True)
        cfg = FlexibleNeRFConfig(num_layers=4, hidden_size=32,
                                 skip_connect_ids=(2,), num_encoding_fn_xyz=6,
                                 num_encoding_fn_dir=4, use_viewdirs=True)
        params = flexible_params_from_torch(ref.state_dict())
        rng = np.random.default_rng(3)
        x = rng.normal(size=(7, cfg.dim_xyz + cfg.dim_dir)).astype(np.float32)
        want = ref(torch.from_numpy(x)).detach().numpy()
        got = apply_flexible_nerf(params, cfg, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-6)

    def test_code_tables(self):
        _, _, emb = _ref_models(seed=4)
        codes = codes_from_torch(emb.state_dict())
        ids = jnp.asarray([0, 3, 1])
        z_s, z_t = lookup_codes(codes, ids)
        import torch
        ws, wt = emb(torch.tensor([0, 3, 1]))
        np.testing.assert_allclose(np.asarray(z_s), ws.detach().numpy())
        np.testing.assert_allclose(np.asarray(z_t), wt.detach().numpy())


class TestFullCheckpointImport:
    def _save_reference_ckpt(self, path, seed=5):
        """Write a checkpoint in the exact reference format
        (train.py:130-136)."""
        import torch
        coarse, fine, emb = _ref_models(seed=seed)
        torch.save({
            "iter": 1234,
            "model_nerf_coarse_state_dict": coarse.state_dict(),
            "model_nerf_fine_state_dict": fine.state_dict(),
            "model_embedding_state_dict": emb.state_dict(),
            "optimizer_state_dict": {},
        }, path)
        return coarse, fine, emb

    def test_params_and_step(self, tmp_path):
        import torch
        p = tmp_path / "checkpoint 1234.ckpt"
        coarse, _, emb = self._save_reference_ckpt(p)
        ckpt = torch.load(p, map_location="cpu", weights_only=False)
        params, step = params_from_torch_checkpoint(ckpt)
        assert step == 1234
        assert set(params) == {"coarse", "fine", "codes"}
        np.testing.assert_allclose(
            np.asarray(params["codes"]["shape"]),
            emb.shape_embedding.weight.detach().numpy())

    def test_orbax_roundtrip_through_standard_restore(self, tmp_path):
        from codenerf_tpu.config.schema import (
            Config, ModelsConfig, ModelSpec, EmbeddingSpec, NerfConfig,
            PointSamplerConfig, EmbedderConfig)
        from codenerf_tpu.pipeline import RenderSettings
        from codenerf_tpu.train import init_train_state, checkpoint

        p = tmp_path / "ref.ckpt"
        self._save_reference_ckpt(p, seed=6)
        cfg = Config(
            models=ModelsConfig(
                nerf_coarse=ModelSpec(type="CodeNeRFModel", hidden_size=32),
                nerf_fine=ModelSpec(type="CodeNeRFModel", hidden_size=32),
                embedding=EmbeddingSpec(shape_code_size=16,
                                        texture_code_size=16)),
            nerf=NerfConfig(
                point_sampler=PointSamplerConfig(num_coarse=8, num_fine=8,
                                                 near_limit=0.8,
                                                 far_limit=1.8),
                embedder=EmbedderConfig(num_encoding_fn_xyz=6,
                                        num_encoding_fn_dir=4)),
        )
        settings = RenderSettings.from_config(cfg)
        out = tmp_path / "orbax"
        step = import_torch_checkpoint(str(p), cfg, settings, str(out))
        assert step == 1234

        fresh, _ = init_train_state(jax.random.PRNGKey(9), cfg, settings,
                                    num_objects=5)
        restored = checkpoint.restore_checkpoint(out, fresh)
        assert int(restored.step) == 1234
        import torch
        ckpt = torch.load(p, map_location="cpu", weights_only=False)
        want, _ = params_from_torch_checkpoint(ckpt)
        for a, b in zip(jax.tree.leaves(restored.params),
                        jax.tree.leaves(want)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_export_roundtrip(self, tmp_path):
        """Our params -> torch state dict -> back must be identity, and the
        torch model must load the exported dict (strict=True)."""
        import torch
        from codenerf_tpu.models import init_codenerf, init_code_tables
        cfg = CodeNeRFConfig(hidden_size=32, shape_code_size=16,
                             texture_code_size=16, num_encoding_fn_xyz=6,
                             num_encoding_fn_dir=4)
        params = init_codenerf(jax.random.PRNGKey(11), cfg)
        sd = codenerf_state_dict(params)
        model_mod = load_reference_module(
            "ref_model", "view_synthesis/models/model.py")
        ref = model_mod.CodeNeRFModel(
            hidden_size=32, shape_code_size=16, texture_code_size=16,
            num_encoding_fn_xyz=6, num_encoding_fn_dir=4)
        ref.load_state_dict(sd, strict=True)
        back = codenerf_params_from_torch(ref.state_dict())
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        codes = init_code_tables(jax.random.PRNGKey(12), 5, 16, 16)
        emb = model_mod.ShapeTextureEmbedding(5, 16, 16)
        emb.load_state_dict(codes_state_dict(codes), strict=True)
        back = codes_from_torch(emb.state_dict())
        for a, b in zip(jax.tree.leaves(codes), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_flexible_export_loads_strict(self):
        import torch
        from codenerf_tpu.models import init_flexible_nerf
        cfg = FlexibleNeRFConfig(num_layers=4, hidden_size=32,
                                 skip_connect_ids=(2,), num_encoding_fn_xyz=6,
                                 num_encoding_fn_dir=4, use_viewdirs=True)
        params = init_flexible_nerf(jax.random.PRNGKey(13), cfg)
        sd = flexible_state_dict(params)
        model_mod = load_reference_module(
            "ref_model", "view_synthesis/models/model.py")
        ref = model_mod.FlexibleNeRFModel(
            num_layers=4, hidden_size=32, skip_connect_ids=[2],
            num_encoding_fn_xyz=6, num_encoding_fn_dir=4, use_viewdirs=True)
        ref.load_state_dict(sd, strict=True)

    def test_export_full_checkpoint(self, tmp_path):
        """Orbax checkpoint -> reference .ckpt with the exact key set the
        reference's load_checkpoint expects (util.py:175-213)."""
        import torch
        from codenerf_tpu.config.schema import (
            Config, ModelsConfig, ModelSpec, EmbeddingSpec, NerfConfig,
            PointSamplerConfig, EmbedderConfig)
        from codenerf_tpu.pipeline import RenderSettings
        from codenerf_tpu.train import init_train_state, checkpoint
        from codenerf_tpu.train.state import TrainState

        cfg = Config(
            models=ModelsConfig(
                nerf_coarse=ModelSpec(type="CodeNeRFModel", hidden_size=32),
                nerf_fine=ModelSpec(type="CodeNeRFModel", hidden_size=32),
                embedding=EmbeddingSpec(shape_code_size=16,
                                        texture_code_size=16)),
            nerf=NerfConfig(
                point_sampler=PointSamplerConfig(num_coarse=8, num_fine=8,
                                                 near_limit=0.8,
                                                 far_limit=1.8),
                embedder=EmbedderConfig(num_encoding_fn_xyz=6,
                                        num_encoding_fn_dir=4)),
        )
        settings = RenderSettings.from_config(cfg)
        state, _ = init_train_state(jax.random.PRNGKey(14), cfg, settings,
                                    num_objects=4)
        state = TrainState(state.params, state.opt_state,
                           jnp.asarray(42, jnp.int32))
        ckdir = tmp_path / "orbax"
        checkpoint.save_checkpoint(ckdir, state)

        out = tmp_path / "exported.ckpt"
        step = export_torch_checkpoint(str(ckdir), cfg, settings, str(out))
        assert step == 42
        ck = torch.load(out, map_location="cpu", weights_only=False)
        assert set(ck) == {"iter", "model_nerf_coarse_state_dict",
                           "model_nerf_fine_state_dict",
                           "model_embedding_state_dict",
                           "optimizer_state_dict"}
        assert ck["iter"] == 42
        # num_objects recovered from checkpoint metadata, not the config
        assert ck["model_embedding_state_dict"][
            "shape_embedding.weight"].shape == (4, 16)
        np.testing.assert_allclose(
            ck["model_nerf_fine_state_dict"]["layer_xyz1.weight"].numpy(),
            np.asarray(state.params["fine"]["layer_xyz1"]["w"]).T)

    def test_shape_mismatch_raises(self, tmp_path):
        from codenerf_tpu.config.schema import (
            Config, ModelsConfig, ModelSpec, EmbeddingSpec, NerfConfig,
            PointSamplerConfig, EmbedderConfig)
        from codenerf_tpu.pipeline import RenderSettings

        p = tmp_path / "ref.ckpt"
        self._save_reference_ckpt(p, seed=7)
        cfg = Config(
            models=ModelsConfig(
                nerf_coarse=ModelSpec(type="CodeNeRFModel", hidden_size=64),
                nerf_fine=ModelSpec(type="CodeNeRFModel", hidden_size=64),
                embedding=EmbeddingSpec(shape_code_size=16,
                                        texture_code_size=16)),
            nerf=NerfConfig(
                point_sampler=PointSamplerConfig(num_coarse=8, num_fine=8,
                                                 near_limit=0.8,
                                                 far_limit=1.8),
                embedder=EmbedderConfig(num_encoding_fn_xyz=6,
                                        num_encoding_fn_dir=4)),
        )
        settings = RenderSettings.from_config(cfg)
        with pytest.raises(ValueError, match="shape mismatch"):
            import_torch_checkpoint(str(p), cfg, settings,
                                    str(tmp_path / "o2"))


class TestOptimizerMomentImport:
    """Round-2 VERDICT item 6: torch Adam/AdamW moments must graft into the
    optax state so cross-framework resume continues the same trajectory."""

    def _cfg(self):
        from codenerf_tpu.config.schema import (
            Config, ModelsConfig, ModelSpec, EmbeddingSpec, NerfConfig,
            PointSamplerConfig, EmbedderConfig, OptimizerConfig)
        return Config(
            models=ModelsConfig(
                nerf_coarse=ModelSpec(type="CodeNeRFModel", hidden_size=32),
                nerf_fine=ModelSpec(type="CodeNeRFModel", hidden_size=32),
                embedding=EmbeddingSpec(shape_code_size=16,
                                        texture_code_size=16)),
            nerf=NerfConfig(
                point_sampler=PointSamplerConfig(num_coarse=8, num_fine=8,
                                                 near_limit=0.8,
                                                 far_limit=1.8),
                embedder=EmbedderConfig(num_encoding_fn_xyz=6,
                                        num_encoding_fn_dir=4)),
            optimizer=OptimizerConfig(type="AdamW", lr=1e-3,
                                      embedding_lr=5e-3,
                                      scheduler_gamma=0.1,
                                      scheduler_step_size=100),
        )

    def _train_reference(self, tmp_path, steps=3, seed=8):
        """Run `steps` AdamW steps on the reference models with the exact
        reference param-group layout (util.py:159-164) and LambdaLR
        schedule (util.py:166-170); the dummy loss sum(p^2) gives every
        parameter the gradient 2p."""
        import torch
        coarse, fine, emb = _ref_models(seed=seed)
        opt = torch.optim.AdamW([
            {"params": coarse.parameters()},
            {"params": fine.parameters()},
            {"params": emb.parameters(), "lr": 5e-3},
        ], lr=1e-3)
        sched = torch.optim.lr_scheduler.LambdaLR(
            opt, lr_lambda=lambda e: 0.1 ** (e / 100))

        def one_step():
            opt.zero_grad()
            loss = sum(p.pow(2).sum()
                       for m in (coarse, fine, emb) for p in m.parameters())
            loss.backward()
            opt.step()
            sched.step()

        for _ in range(steps):
            one_step()
        path = tmp_path / "ref.ckpt"
        torch.save({
            "iter": steps,
            "model_nerf_coarse_state_dict": coarse.state_dict(),
            "model_nerf_fine_state_dict": fine.state_dict(),
            "model_embedding_state_dict": emb.state_dict(),
            "optimizer_state_dict": opt.state_dict(),
        }, path)
        return coarse, fine, emb, opt, one_step, path

    def test_moments_map_with_weight_transpose(self, tmp_path):
        import torch
        from codenerf_tpu.train.torch_import import (
            moments_from_torch_optimizer)
        coarse, fine, emb, opt, _, path = self._train_reference(tmp_path)
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        params, _ = params_from_torch_checkpoint(ckpt)
        mu, nu = moments_from_torch_optimizer(
            ckpt["optimizer_state_dict"], params, "CodeNeRFModel")
        st = opt.state[coarse.layer_xyz1.weight]
        np.testing.assert_allclose(np.asarray(mu["coarse"]["layer_xyz1"]["w"]),
                                   st["exp_avg"].numpy().T)
        st = opt.state[fine.fc_rgb.bias]
        np.testing.assert_allclose(np.asarray(nu["fine"]["fc_rgb"]["b"]),
                                   st["exp_avg_sq"].numpy())
        st = opt.state[emb.shape_embedding.weight]
        np.testing.assert_allclose(np.asarray(mu["codes"]["shape"]),
                                   st["exp_avg"].numpy())

    def test_resumed_step_matches_torch_resumed_step(self, tmp_path):
        """Import ckpt+moments, apply one more identical-gradient step in
        both frameworks: parameters must stay allclose — i.e. the resumed
        trajectory matches a torch-resumed trajectory."""
        import torch
        import optax
        from codenerf_tpu.pipeline import RenderSettings
        from codenerf_tpu.train import init_train_state, checkpoint

        coarse, fine, emb, opt, one_step, path = self._train_reference(
            tmp_path)
        cfg = self._cfg()
        settings = RenderSettings.from_config(cfg)
        out = tmp_path / "orbax"
        step = import_torch_checkpoint(str(path), cfg, settings, str(out))
        assert step == 3

        fresh, optimizer = init_train_state(jax.random.PRNGKey(1), cfg,
                                            settings, num_objects=5)
        restored = checkpoint.restore_checkpoint(out, fresh)

        # continue torch one step (same dummy loss => grad 2p)
        one_step()
        ck_want = {
            "coarse": codenerf_params_from_torch(coarse.state_dict()),
            "fine": codenerf_params_from_torch(fine.state_dict()),
            "codes": codes_from_torch(emb.state_dict()),
        }

        grads = jax.tree.map(lambda p: 2.0 * p, restored.params)
        updates, _ = optimizer.update(grads, restored.opt_state,
                                      restored.params)
        got = optax.apply_updates(restored.params, updates)
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ck_want)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-7)

    def test_moments_skipped_without_state(self, tmp_path):
        """Empty optimizer_state_dict (our own exported ckpts) must import
        cleanly with fresh (zero) moments."""
        import torch
        from codenerf_tpu.pipeline import RenderSettings
        from codenerf_tpu.train import init_train_state, checkpoint

        coarse, fine, emb = _ref_models(seed=9)
        path = tmp_path / "ref.ckpt"
        torch.save({
            "iter": 7,
            "model_nerf_coarse_state_dict": coarse.state_dict(),
            "model_nerf_fine_state_dict": fine.state_dict(),
            "model_embedding_state_dict": emb.state_dict(),
            "optimizer_state_dict": {},
        }, path)
        cfg = self._cfg()
        settings = RenderSettings.from_config(cfg)
        out = tmp_path / "orbax"
        assert import_torch_checkpoint(str(path), cfg, settings,
                                       str(out)) == 7
