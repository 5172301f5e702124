"""Ray-structured (factored concat-matmul) applies must match the flat
reference-shaped applies exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from codenerf_tpu.models import (
    CodeNeRFConfig, FlexibleNeRFConfig,
    init_codenerf, apply_codenerf,
    init_flexible_nerf, apply_flexible_nerf,
)
from codenerf_tpu.models.ray_structured import (
    apply_codenerf_rays, apply_flexible_rays,
)


class TestCodeNeRFRayStructured:
    def test_matches_flat_apply(self):
        cfg = CodeNeRFConfig(hidden_size=64, shape_code_size=32,
                             texture_code_size=32, num_encoding_fn_xyz=10,
                             num_encoding_fn_dir=4)
        params = init_codenerf(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        R, S = 7, 11
        xyz_enc = jnp.asarray(rng.normal(size=(R, S, cfg.dim_xyz)),
                              dtype=jnp.float32)
        dir_enc = jnp.asarray(rng.normal(size=(R, cfg.dim_dir)),
                              dtype=jnp.float32)
        z_s = jnp.asarray(rng.normal(size=(R, 32)), dtype=jnp.float32)
        z_t = jnp.asarray(rng.normal(size=(R, 32)), dtype=jnp.float32)

        fast = apply_codenerf_rays(params, cfg, xyz_enc, dir_enc, z_s, z_t)

        # flat reference-shaped path: broadcast codes + dirs per sample
        x = jnp.concatenate(
            [xyz_enc,
             jnp.broadcast_to(dir_enc[:, None, :], (R, S, cfg.dim_dir))],
            axis=-1).reshape(R * S, -1)
        zs_flat = jnp.broadcast_to(z_s[:, None, :], (R, S, 32)).reshape(-1, 32)
        zt_flat = jnp.broadcast_to(z_t[:, None, :], (R, S, 32)).reshape(-1, 32)
        flat = apply_codenerf(params, cfg, x, zs_flat, zt_flat).reshape(R, S, 4)

        np.testing.assert_allclose(np.asarray(fast), np.asarray(flat),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match(self):
        cfg = CodeNeRFConfig(hidden_size=32, shape_code_size=16,
                             texture_code_size=16, num_encoding_fn_xyz=6,
                             num_encoding_fn_dir=4)
        params = init_codenerf(jax.random.PRNGKey(1), cfg)
        rng = np.random.default_rng(1)
        R, S = 4, 6
        xyz_enc = jnp.asarray(rng.normal(size=(R, S, cfg.dim_xyz)),
                              dtype=jnp.float32)
        dir_enc = jnp.asarray(rng.normal(size=(R, cfg.dim_dir)),
                              dtype=jnp.float32)
        z_s = jnp.asarray(rng.normal(size=(R, 16)), dtype=jnp.float32)
        z_t = jnp.asarray(rng.normal(size=(R, 16)), dtype=jnp.float32)

        g_fast = jax.grad(lambda z: jnp.sum(apply_codenerf_rays(
            params, cfg, xyz_enc, dir_enc, z, z_t) ** 2))(z_s)

        def flat_loss(z):
            x = jnp.concatenate(
                [xyz_enc, jnp.broadcast_to(dir_enc[:, None, :],
                                           (R, S, cfg.dim_dir))],
                axis=-1).reshape(R * S, -1)
            zs = jnp.broadcast_to(z[:, None, :], (R, S, 16)).reshape(-1, 16)
            zt = jnp.broadcast_to(z_t[:, None, :], (R, S, 16)).reshape(-1, 16)
            return jnp.sum(apply_codenerf(params, cfg, x, zs, zt) ** 2)

        g_flat = jax.grad(flat_loss)(z_s)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_flat),
                                   rtol=1e-4, atol=1e-4)

    def test_parameter_gradients_match(self):
        """Every weight/bias grad through the single-residual fused
        linear+relu ops must equal plain autodiff of the flat apply."""
        cfg = CodeNeRFConfig(hidden_size=32, shape_code_size=16,
                             texture_code_size=16, num_encoding_fn_xyz=6,
                             num_encoding_fn_dir=4)
        params = init_codenerf(jax.random.PRNGKey(5), cfg)
        rng = np.random.default_rng(5)
        R, S = 5, 7
        xyz_enc = jnp.asarray(rng.normal(size=(R, S, cfg.dim_xyz)),
                              dtype=jnp.float32)
        dir_enc = jnp.asarray(rng.normal(size=(R, cfg.dim_dir)),
                              dtype=jnp.float32)
        z_s = jnp.asarray(rng.normal(size=(R, 16)), dtype=jnp.float32)
        z_t = jnp.asarray(rng.normal(size=(R, 16)), dtype=jnp.float32)
        wgt = jnp.asarray(rng.normal(size=(R, S, 4)), dtype=jnp.float32)

        def fast_loss(p, enc):
            return jnp.sum(wgt * apply_codenerf_rays(p, cfg, enc, dir_enc,
                                                     z_s, z_t))

        def flat_loss(p, enc):
            x = jnp.concatenate(
                [enc, jnp.broadcast_to(dir_enc[:, None, :],
                                       (R, S, cfg.dim_dir))],
                axis=-1).reshape(R * S, -1)
            zs = jnp.broadcast_to(z_s[:, None, :], (R, S, 16)).reshape(-1, 16)
            zt = jnp.broadcast_to(z_t[:, None, :], (R, S, 16)).reshape(-1, 16)
            out = apply_codenerf(p, cfg, x, zs, zt).reshape(R, S, 4)
            return jnp.sum(wgt * out)

        gp1, ge1 = jax.grad(fast_loss, argnums=(0, 1))(params, xyz_enc)
        gp2, ge2 = jax.grad(flat_loss, argnums=(0, 1))(params, xyz_enc)
        np.testing.assert_allclose(np.asarray(ge1), np.asarray(ge2),
                                   rtol=1e-4, atol=1e-5)
        for (pa, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(gp1),
                                   jax.tree_util.tree_leaves_with_path(gp2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                err_msg=jax.tree_util.keystr(pa))


class TestFlexibleRayStructured:
    def test_matches_flat_apply_with_skip(self):
        cfg = FlexibleNeRFConfig(num_layers=8, hidden_size=64,
                                 skip_connect_ids=(4,), num_encoding_fn_xyz=10,
                                 num_encoding_fn_dir=4, use_viewdirs=True)
        params = init_flexible_nerf(jax.random.PRNGKey(2), cfg)
        rng = np.random.default_rng(2)
        R, S = 5, 9
        xyz_enc = jnp.asarray(rng.normal(size=(R, S, cfg.dim_xyz)),
                              dtype=jnp.float32)
        dir_enc = jnp.asarray(rng.normal(size=(R, cfg.dim_dir)),
                              dtype=jnp.float32)

        fast = apply_flexible_rays(params, cfg, xyz_enc, dir_enc)
        x = jnp.concatenate(
            [xyz_enc, jnp.broadcast_to(dir_enc[:, None, :],
                                       (R, S, cfg.dim_dir))],
            axis=-1).reshape(R * S, -1)
        flat = apply_flexible_nerf(params, cfg, x).reshape(R, S, 4)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(flat),
                                   rtol=1e-5, atol=1e-5)

    def test_no_viewdirs(self):
        cfg = FlexibleNeRFConfig(num_layers=4, hidden_size=32,
                                 use_viewdirs=False)
        params = init_flexible_nerf(jax.random.PRNGKey(3), cfg)
        rng = np.random.default_rng(3)
        R, S = 3, 4
        xyz_enc = jnp.asarray(rng.normal(size=(R, S, cfg.dim_xyz)),
                              dtype=jnp.float32)
        fast = apply_flexible_rays(params, cfg, xyz_enc, None)
        flat = apply_flexible_nerf(
            params, cfg, xyz_enc.reshape(R * S, -1)).reshape(R, S, 4)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(flat),
                                   rtol=1e-5, atol=1e-5)


class TestLowPrecisionBackward:
    def test_bf16_grads_close_to_f32(self):
        """The custom bf16-backward dot must agree with the f32 path within
        bf16 tolerance (values and all gradients)."""
        cfg32 = CodeNeRFConfig(hidden_size=64, shape_code_size=32,
                               texture_code_size=32, num_encoding_fn_xyz=6,
                               num_encoding_fn_dir=4)
        cfg16 = CodeNeRFConfig(hidden_size=64, shape_code_size=32,
                               texture_code_size=32, num_encoding_fn_xyz=6,
                               num_encoding_fn_dir=4,
                               compute_dtype="bfloat16")
        params = init_codenerf(jax.random.PRNGKey(5), cfg32)
        rng = np.random.default_rng(5)
        R, S = 6, 8
        xyz_enc = jnp.asarray(rng.normal(size=(R, S, cfg32.dim_xyz)),
                              dtype=jnp.float32)
        dir_enc = jnp.asarray(rng.normal(size=(R, cfg32.dim_dir)),
                              dtype=jnp.float32)
        z_s = jnp.asarray(rng.normal(size=(R, 32)), dtype=jnp.float32)
        z_t = jnp.asarray(rng.normal(size=(R, 32)), dtype=jnp.float32)

        def loss(cfg):
            def f(p, zs):
                return jnp.mean(apply_codenerf_rays(
                    p, cfg, xyz_enc, dir_enc, zs, z_t) ** 2)
            return f

        v32, (gp32, gz32) = jax.value_and_grad(loss(cfg32), argnums=(0, 1))(
            params, z_s)
        v16, (gp16, gz16) = jax.value_and_grad(loss(cfg16), argnums=(0, 1))(
            params, z_s)
        assert np.isfinite(float(v16))
        np.testing.assert_allclose(float(v16), float(v32), rtol=0.05)
        np.testing.assert_allclose(np.asarray(gz16), np.asarray(gz32),
                                   rtol=0.5, atol=0.05)
        for a, b in zip(jax.tree.leaves(gp16), jax.tree.leaves(gp32)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0.5, atol=0.08)
