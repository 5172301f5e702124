"""Parity tests: jax MLPs vs reference torch modules at identical weights."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from codenerf_tpu.models import (
    CodeNeRFConfig, FlexibleNeRFConfig,
    init_codenerf, apply_codenerf,
    init_flexible_nerf, apply_flexible_nerf,
    init_code_tables, lookup_codes, mean_codes, code_table_norms,
)
from tests.reference_loader import load_reference_module


def _copy_linear(torch_linear, jax_params):
    """Copy jax [in,out] weights into a torch Linear ([out,in])."""
    import torch
    with torch.no_grad():
        torch_linear.weight.copy_(
            torch.from_numpy(np.asarray(jax_params["w"]).T))
        torch_linear.bias.copy_(torch.from_numpy(np.asarray(jax_params["b"])))


class TestCodeNeRFParity:
    @pytest.mark.parametrize("hidden,code", [(128, 128), (256, 256)])
    def test_forward_matches_reference(self, hidden, code):
        import torch
        model_mod = load_reference_module(
            "ref_model", "view_synthesis/models/model.py")
        cfg = CodeNeRFConfig(hidden_size=hidden, shape_code_size=code,
                             texture_code_size=code, num_encoding_fn_xyz=10,
                             num_encoding_fn_dir=4)
        params = init_codenerf(jax.random.PRNGKey(0), cfg)

        ref = model_mod.CodeNeRFModel(
            hidden_size=hidden, shape_code_size=code, texture_code_size=code,
            num_encoding_fn_xyz=10, num_encoding_fn_dir=4)
        for name in ["layer_xyz1", "layer_xyz2", "fc_out", "shape_code_layer1",
                     "shape_code_layer2", "texture_code_layer1", "layer_dir1",
                     "layer_dir2", "fc_rgb"]:
            _copy_linear(getattr(ref, name), params[name])

        rng = np.random.default_rng(0)
        N = 37
        x = rng.normal(size=(N, cfg.dim_xyz + cfg.dim_dir)).astype(np.float32)
        z_s = rng.normal(size=(N, code)).astype(np.float32)
        z_t = rng.normal(size=(N, code)).astype(np.float32)

        want = ref(torch.from_numpy(z_s), torch.from_numpy(z_t),
                   torch.from_numpy(x)).detach().numpy()
        got = apply_codenerf(params, cfg, jnp.asarray(x), jnp.asarray(z_s),
                             jnp.asarray(z_t))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    def test_gradients_match_reference(self):
        import torch
        model_mod = load_reference_module(
            "ref_model", "view_synthesis/models/model.py")
        cfg = CodeNeRFConfig(hidden_size=64, shape_code_size=32,
                             texture_code_size=32, num_encoding_fn_xyz=6,
                             num_encoding_fn_dir=4)
        params = init_codenerf(jax.random.PRNGKey(1), cfg)
        ref = model_mod.CodeNeRFModel(
            hidden_size=64, shape_code_size=32, texture_code_size=32,
            num_encoding_fn_xyz=6, num_encoding_fn_dir=4)
        for name in ["layer_xyz1", "layer_xyz2", "fc_out", "shape_code_layer1",
                     "shape_code_layer2", "texture_code_layer1", "layer_dir1",
                     "layer_dir2", "fc_rgb"]:
            _copy_linear(getattr(ref, name), params[name])

        rng = np.random.default_rng(2)
        N = 11
        x = rng.normal(size=(N, cfg.dim_xyz + cfg.dim_dir)).astype(np.float32)
        z_s = rng.normal(size=(N, 32)).astype(np.float32)
        z_t = rng.normal(size=(N, 32)).astype(np.float32)

        zs_t = torch.from_numpy(z_s).requires_grad_(True)
        out_t = ref(zs_t, torch.from_numpy(z_t), torch.from_numpy(x))
        out_t.sum().backward()
        want = zs_t.grad.numpy()

        g = jax.grad(lambda z: jnp.sum(apply_codenerf(
            params, cfg, jnp.asarray(x), z, jnp.asarray(z_t))))(jnp.asarray(z_s))
        np.testing.assert_allclose(np.asarray(g), want, rtol=1e-4, atol=1e-5)


class TestFlexibleNeRFParity:
    @pytest.mark.parametrize("use_viewdirs", [True, False])
    def test_forward_matches_reference(self, use_viewdirs):
        import torch
        model_mod = load_reference_module(
            "ref_model", "view_synthesis/models/model.py")
        cfg = FlexibleNeRFConfig(num_layers=8, hidden_size=256,
                                 skip_connect_ids=(4,), num_encoding_fn_xyz=10,
                                 num_encoding_fn_dir=4,
                                 use_viewdirs=use_viewdirs)
        params = init_flexible_nerf(jax.random.PRNGKey(0), cfg)
        ref = model_mod.FlexibleNeRFModel(
            num_layers=8, hidden_size=256, skip_connect_ids=[4],
            num_encoding_fn_xyz=10, num_encoding_fn_dir=4,
            use_viewdirs=use_viewdirs)

        _copy_linear(ref.layer1, params["layer1"])
        for i, layer in enumerate(ref.layers_xyz):
            _copy_linear(layer, params["layers_xyz"][i])
        if use_viewdirs:
            _copy_linear(ref.fc_feat, params["fc_feat"])
            _copy_linear(ref.layers_dir[0], params["layer_dir1"])
            _copy_linear(ref.fc_alpha, params["fc_alpha"])
            _copy_linear(ref.fc_rgb, params["fc_rgb"])
        else:
            _copy_linear(ref.fc_out, params["fc_out"])

        rng = np.random.default_rng(3)
        N = 23
        x = rng.normal(size=(N, cfg.dim_xyz + cfg.dim_dir)).astype(np.float32)
        want = ref(torch.from_numpy(x)).detach().numpy()
        got = apply_flexible_nerf(params, cfg, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


class TestCodeTables:
    def test_lookup_and_mean(self):
        tables = init_code_tables(jax.random.PRNGKey(0), 10, 16, 8)
        assert tables["shape"].shape == (10, 16)
        assert tables["texture"].shape == (10, 8)
        ids = jnp.asarray([0, 3, 3, 9])
        z_s, z_t = lookup_codes(tables, ids)
        assert z_s.shape == (4, 16) and z_t.shape == (4, 8)
        np.testing.assert_array_equal(np.asarray(z_s[1]), np.asarray(z_s[2]))
        ms, mt = mean_codes(tables)
        np.testing.assert_allclose(np.asarray(ms),
                                   np.asarray(tables["shape"]).mean(0, keepdims=True),
                                   rtol=1e-6)
        assert ms.shape == (1, 16) and mt.shape == (1, 8)

    def test_norms_match_reference_regularizer(self):
        tables = init_code_tables(jax.random.PRNGKey(1), 7, 4, 4)
        ns, nt = code_table_norms(tables)
        assert float(ns) == pytest.approx(
            float(np.linalg.norm(np.asarray(tables["shape"]).ravel())), rel=1e-6)
        assert float(nt) == pytest.approx(
            float(np.linalg.norm(np.asarray(tables["texture"]).ravel())), rel=1e-6)

    def test_lookup_gradient_is_dense_scatter(self):
        tables = init_code_tables(jax.random.PRNGKey(2), 5, 3, 3)

        def f(t):
            z_s, _ = lookup_codes(t, jnp.asarray([1, 1, 4]))
            return jnp.sum(z_s)

        g = jax.grad(f)(tables)
        gs = np.asarray(g["shape"])
        np.testing.assert_allclose(gs[1], 2.0)
        np.testing.assert_allclose(gs[4], 1.0)
        np.testing.assert_allclose(gs[0], 0.0)
