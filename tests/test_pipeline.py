"""End-to-end render pipeline tests: full coarse->fine parity vs the reference
stack at fixed inputs, plus shape/grad sanity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from codenerf_tpu.config import load_config
from codenerf_tpu.pipeline import (
    RenderSettings, render_rays, init_model, model_config_from_spec,
)
from tests.reference_loader import load_reference_module


def _settings(num_coarse=16, num_fine=8, hidden=32, code=16):
    from codenerf_tpu.config.schema import (
        Config, ModelsConfig, ModelSpec, EmbeddingSpec, NerfConfig,
        PointSamplerConfig, EmbedderConfig, RuntimeConfig,
    )
    cfg = Config(
        models=ModelsConfig(
            nerf_coarse=ModelSpec(type="CodeNeRFModel", hidden_size=hidden),
            nerf_fine=ModelSpec(type="CodeNeRFModel", hidden_size=hidden),
            embedding=EmbeddingSpec(shape_code_size=code,
                                    texture_code_size=code),
        ),
        nerf=NerfConfig(point_sampler=PointSamplerConfig(
            num_coarse=num_coarse, num_fine=num_fine,
            near_limit=0.8, far_limit=1.8)),
        runtime=RuntimeConfig(compute_dtype="float32"),
    )
    return RenderSettings.from_config(cfg)


class TestRenderRays:
    def test_shapes_and_determinism(self):
        s = _settings()
        key = jax.random.PRNGKey(0)
        kc, kf, kr = jax.random.split(key, 3)
        params = {"coarse": init_model(kc, s.coarse_cfg),
                  "fine": init_model(kf, s.fine_cfg)}
        R, C = 24, 16
        rng = np.random.default_rng(0)
        ro = jnp.asarray(rng.normal(size=(R, 3)), dtype=jnp.float32)
        rd = jnp.asarray(rng.normal(size=(R, 3)), dtype=jnp.float32)
        z_s = jnp.asarray(rng.normal(size=(R, C)), dtype=jnp.float32)
        z_t = jnp.asarray(rng.normal(size=(R, C)), dtype=jnp.float32)

        out_c, out_f = render_rays(params, s, ro, rd, z_s, z_t, kr, True)
        assert out_c.rgb.shape == (R, 3)
        assert out_c.weights.shape == (R, 16)
        assert out_f.rgb.shape == (R, 3)
        assert out_f.weights.shape == (R, 24)

        # deterministic given the same key
        out_c2, out_f2 = render_rays(params, s, ro, rd, z_s, z_t, kr, True)
        np.testing.assert_array_equal(np.asarray(out_f.rgb),
                                      np.asarray(out_f2.rgb))

    def test_sigma_noise_regularizer(self):
        """radiance_field_noise_std semantics: noise perturbs the sigma
        channel only during perturbed (train) renders, and noise_std=0 is
        bit-identical to the pre-noise pipeline (reference
        volumetric_render.py:47 intent; srn-cars.yml:59 sets 0.05)."""
        s = _settings()
        key = jax.random.PRNGKey(0)
        kc, kf, kr = jax.random.split(key, 3)
        params = {"coarse": init_model(kc, s.coarse_cfg),
                  "fine": init_model(kf, s.fine_cfg)}
        R, C = 24, 16
        rng = np.random.default_rng(1)
        ro = jnp.asarray(rng.normal(size=(R, 3)), dtype=jnp.float32)
        rd = jnp.asarray(rng.normal(size=(R, 3)), dtype=jnp.float32)
        z_s = jnp.asarray(rng.normal(size=(R, C)), dtype=jnp.float32)
        z_t = jnp.asarray(rng.normal(size=(R, C)), dtype=jnp.float32)

        base = render_rays(params, s, ro, rd, z_s, z_t, kr, True)
        zero = render_rays(params, s, ro, rd, z_s, z_t, kr, True,
                           noise_std=0.0)
        np.testing.assert_array_equal(np.asarray(base[1].rgb),
                                      np.asarray(zero[1].rgb))

        noisy = render_rays(params, s, ro, rd, z_s, z_t, kr, True,
                            noise_std=0.5)
        # noise moves the compositing weights (sigma path) ...
        assert not np.allclose(np.asarray(base[1].weights),
                               np.asarray(noisy[1].weights))
        # ... and is deterministic under the same key
        noisy2 = render_rays(params, s, ro, rd, z_s, z_t, kr, True,
                             noise_std=0.5)
        np.testing.assert_array_equal(np.asarray(noisy[1].rgb),
                                      np.asarray(noisy2[1].rgb))

        # eval-style renders (perturb=False) never see noise
        a = render_rays(params, s, ro, rd, z_s, z_t, None, False,
                        noise_std=0.5)
        b = render_rays(params, s, ro, rd, z_s, z_t, None, False)
        np.testing.assert_array_equal(np.asarray(a[1].rgb),
                                      np.asarray(b[1].rgb))

    def test_full_parity_vs_reference_stack(self):
        """Whole pipeline (no perturb) vs reference predict_radiance_and_render
        with identical weights and rays — the BASELINE.json parity bar."""
        import torch
        model_mod = load_reference_module(
            "ref_model", "view_synthesis/models/model.py")
        ps_mod = load_reference_module(
            "ref_point_sampler", "view_synthesis/nerf/point_sampler.py")
        pe_mod = load_reference_module(
            "ref_position_embed", "view_synthesis/nerf/position_embed.py")
        vr_mod = load_reference_module(
            "ref_volumetric_render", "view_synthesis/nerf/volumetric_render.py")

        hidden, code, num_coarse, num_fine = 64, 32, 16, 8
        s = _settings(num_coarse, num_fine, hidden, code)
        kc, kf = jax.random.split(jax.random.PRNGKey(1))
        params = {"coarse": init_model(kc, s.coarse_cfg),
                  "fine": init_model(kf, s.fine_cfg)}

        # Mirror weights into torch models
        refs = {}
        for name, p in params.items():
            m = model_mod.CodeNeRFModel(
                hidden_size=hidden, shape_code_size=code,
                texture_code_size=code, num_encoding_fn_xyz=10,
                num_encoding_fn_dir=4)
            for lname in ["layer_xyz1", "layer_xyz2", "fc_out",
                          "shape_code_layer1", "shape_code_layer2",
                          "texture_code_layer1", "layer_dir1", "layer_dir2",
                          "fc_rgb"]:
                with torch.no_grad():
                    getattr(m, lname).weight.copy_(torch.from_numpy(
                        np.asarray(p[lname]["w"]).T.copy()))
                    getattr(m, lname).bias.copy_(torch.from_numpy(
                        np.asarray(p[lname]["b"]).copy()))
            refs[name] = m

        rng = np.random.default_rng(5)
        R = 10
        ro = rng.normal(size=(R, 3)).astype(np.float32)
        rd = rng.normal(size=(R, 3)).astype(np.float32)
        z_s = rng.normal(size=(R, code)).astype(np.float32) * 0.3
        z_t = rng.normal(size=(R, code)).astype(np.float32) * 0.3

        # --- reference stack (torch, CPU, no perturb) ---
        point_sampler = ps_mod.PointSampler(
            num_coarse, num_fine, 0.8, 1.8, spacing_mode="lindepth",
            perturb=False, dtype=torch.float32, device="cpu")
        emb_xyz = pe_mod.PositionalEmbedder(10, True, True, torch.float32, "cpu")
        emb_dir = pe_mod.PositionalEmbedder(4, True, True, torch.float32, "cpu")

        def ref_forward(model, rd_t, pts, zs_v=None, zt_v=None):
            nr, ns = pts.shape[0], pts.shape[1]
            zs_v = torch.from_numpy(z_s) if zs_v is None else zs_v
            zt_v = torch.from_numpy(z_t) if zt_v is None else zt_v
            zs = zs_v[:, None, :].expand(-1, ns, -1).reshape(-1, code)
            zt = zt_v[:, None, :].expand(-1, ns, -1).reshape(-1, code)
            flat = pts.reshape(-1, 3)
            e = emb_xyz.embed(flat)
            vd = rd_t / rd_t.norm(p=2, dim=-1).unsqueeze(-1)
            ed = emb_dir.embed(vd[:, None, :].expand(-1, ns, -1).reshape(-1, 3))
            x = torch.cat([e, ed], dim=-1)
            out = model(zs, zt, x)
            return out.reshape(nr, ns, 4)

        ro_t, rd_t = torch.from_numpy(ro), torch.from_numpy(rd)
        pts_c, z_c = point_sampler.sample_uniform(ro_t, rd_t)
        raw_c = ref_forward(refs["coarse"], rd_t, pts_c)
        rgb_c, _, _, w_c, _ = vr_mod.volume_render(raw_c, z_c, rd_t)
        pts_f, z_f = point_sampler.sample_pdf(ro_t, rd_t, w_c[..., 1:-1], z_c)
        raw_f = ref_forward(refs["fine"], rd_t, pts_f)
        rgb_f, _, _, _, _ = vr_mod.volume_render(raw_f, z_f, rd_t)

        # --- our stack ---
        out_c, out_f = render_rays(params, s, jnp.asarray(ro), jnp.asarray(rd),
                                   jnp.asarray(z_s), jnp.asarray(z_t),
                                   None, False)

        np.testing.assert_allclose(np.asarray(out_c.rgb),
                                   rgb_c.detach().numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_f.rgb),
                                   rgb_f.detach().numpy(), rtol=1e-4, atol=1e-5)

        # --- end-to-end GRADIENT parity (BASELINE.json: rendered RGB AND
        # pixel gradients allclose) --- the full coarse->importance->fine
        # loss backpropagated to codes and model weights in both stacks.
        target_np = rng.uniform(size=(R, 3)).astype(np.float32)
        target_t = torch.from_numpy(target_np)
        zs_t = torch.from_numpy(z_s).clone().requires_grad_(True)
        zt_t = torch.from_numpy(z_t).clone().requires_grad_(True)
        raw_c2 = ref_forward(refs["coarse"], rd_t, pts_c, zs_t, zt_t)
        rgb_c2, _, _, w_c2, _ = vr_mod.volume_render(raw_c2, z_c, rd_t)
        pts_f2, z_f2 = point_sampler.sample_pdf(ro_t, rd_t,
                                                w_c2[..., 1:-1], z_c)
        raw_f2 = ref_forward(refs["fine"], rd_t, pts_f2, zs_t, zt_t)
        rgb_f2 = vr_mod.volume_render(raw_f2, z_f2, rd_t)[0]
        loss_t = (((rgb_c2 - target_t) ** 2).mean()
                  + ((rgb_f2 - target_t) ** 2).mean())
        loss_t.backward()

        def loss_j(p, zs, zt):
            oc, of = render_rays(p, s, jnp.asarray(ro), jnp.asarray(rd),
                                 zs, zt, None, False)
            t = jnp.asarray(target_np)
            return (jnp.mean((oc.rgb - t) ** 2)
                    + jnp.mean((of.rgb - t) ** 2))

        gp, gzs, gzt = jax.grad(loss_j, argnums=(0, 1, 2))(
            params, jnp.asarray(z_s), jnp.asarray(z_t))
        np.testing.assert_allclose(np.asarray(gzs), zs_t.grad.numpy(),
                                   rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gzt), zt_t.grad.numpy(),
                                   rtol=1e-3, atol=1e-6)
        for mname in ("coarse", "fine"):
            for lname in ("fc_rgb", "layer_xyz1", "shape_code_layer1"):
                want = getattr(refs[mname], lname).weight.grad.numpy().T
                got = np.asarray(gp[mname][lname]["w"])
                np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-6,
                                           err_msg=f"{mname}.{lname}")

    def test_gradient_flows_to_codes_and_params(self):
        s = _settings()
        kc, kf = jax.random.split(jax.random.PRNGKey(2))
        params = {"coarse": init_model(kc, s.coarse_cfg),
                  "fine": init_model(kf, s.fine_cfg)}
        R, C = 8, 16
        rng = np.random.default_rng(1)
        ro = jnp.asarray(rng.normal(size=(R, 3)), dtype=jnp.float32)
        rd = jnp.asarray(rng.normal(size=(R, 3)), dtype=jnp.float32)
        z = jnp.asarray(rng.normal(size=(R, C)), dtype=jnp.float32)

        def loss(p, zz):
            c, f = render_rays(p, s, ro, rd, zz, zz, None, False)
            return jnp.sum(c.rgb ** 2) + jnp.sum(f.rgb ** 2)

        gp, gz = jax.grad(loss, argnums=(0, 1))(params, z)
        assert float(jnp.abs(gz).sum()) > 0
        assert float(jnp.abs(gp["coarse"]["layer_xyz1"]["w"]).sum()) > 0
        assert float(jnp.abs(gp["fine"]["fc_rgb"]["w"]).sum()) > 0

    def test_flexible_nerf_pathway_works(self):
        """The vanilla-NeRF configs are stale/broken in the reference harness
        (SURVEY §3.6); here they must work end-to-end."""
        from codenerf_tpu.config.schema import (
            Config, ModelsConfig, ModelSpec, NerfConfig, PointSamplerConfig,
            RuntimeConfig,
        )
        cfg = Config(
            models=ModelsConfig(
                nerf_coarse=ModelSpec(type="FlexibleNeRFModel", hidden_size=32,
                                      num_layers=4),
                nerf_fine=ModelSpec(type="FlexibleNeRFModel", hidden_size=32,
                                    num_layers=4),
            ),
            nerf=NerfConfig(point_sampler=PointSamplerConfig(
                num_coarse=16, num_fine=8, near_limit=2.0, far_limit=6.0)),
            runtime=RuntimeConfig(compute_dtype="float32"),
        )
        s = RenderSettings.from_config(cfg)
        kc, kf, kr = jax.random.split(jax.random.PRNGKey(3), 3)
        params = {"coarse": init_model(kc, s.coarse_cfg),
                  "fine": init_model(kf, s.fine_cfg)}
        R = 6
        ro = jnp.zeros((R, 3))
        rd = jnp.ones((R, 3))
        out_c, out_f = render_rays(params, s, ro, rd, None, None, kr, True)
        assert out_f.rgb.shape == (R, 3)
        assert np.isfinite(np.asarray(out_f.rgb)).all()
