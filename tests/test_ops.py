"""Parity + property tests for sampling and volume rendering ops.

Oracle = the reference torch implementation run on CPU at fixed inputs
(BASELINE.json: "Rendered RGB and pixel gradients must be allclose to the
reference PyTorch view_synthesis/nerf implementation").
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from codenerf_tpu.ops import (
    base_z_vals, sample_stratified, sample_pdf, volume_render,
)
from tests.reference_loader import load_reference_module


def _ref_point_sampler(num_coarse, num_fine, near, far, spacing_mode, perturb):
    import torch
    ps_mod = load_reference_module(
        "ref_point_sampler", "view_synthesis/nerf/point_sampler.py")
    return ps_mod.PointSampler(num_coarse, num_fine, near, far,
                               spacing_mode=spacing_mode, perturb=perturb,
                               dtype=torch.float32, device="cpu")


class TestBaseZVals:
    @pytest.mark.parametrize("spacing_mode", ["lindisp", "lindepth"])
    def test_matches_reference(self, spacing_mode):
        ref = _ref_point_sampler(64, 128, 0.8, 1.8, spacing_mode, False)
        got = base_z_vals(64, 0.8, 1.8, spacing_mode)
        np.testing.assert_allclose(np.asarray(got), ref.z_vals.numpy(),
                                   rtol=1e-6)

    def test_lindepth_is_linear_in_disparity(self):
        # The reference's "lindepth" label actually selects
        # linear-in-disparity spacing (point_sampler.py:43).
        z = np.asarray(base_z_vals(16, 2.0, 6.0, "lindepth"))
        disp = 1.0 / z
        np.testing.assert_allclose(np.diff(disp), np.diff(disp)[0], rtol=1e-4)


class TestSampleStratified:
    def test_unperturbed_matches_reference(self):
        import torch
        ref = _ref_point_sampler(32, 64, 0.8, 1.8, "lindepth", False)
        rng = np.random.default_rng(0)
        ro = rng.normal(size=(10, 3)).astype(np.float32)
        rd = rng.normal(size=(10, 3)).astype(np.float32)
        pts_ref, z_ref = ref.sample_uniform(torch.from_numpy(ro),
                                            torch.from_numpy(rd))
        z_base = base_z_vals(32, 0.8, 1.8, "lindepth")
        pts, z = sample_stratified(None, jnp.asarray(ro), jnp.asarray(rd),
                                   z_base, perturb=False)
        np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(pts), pts_ref.numpy(),
                                   rtol=1e-5, atol=1e-6)

    def test_perturbed_within_bins(self):
        z_base = base_z_vals(32, 0.8, 1.8, "lindepth")
        ro = jnp.zeros((50, 3))
        rd = jnp.ones((50, 3))
        _, z = sample_stratified(jax.random.PRNGKey(0), ro, rd, z_base,
                                 perturb=True)
        z = np.asarray(z)
        assert (np.diff(np.asarray(z_base)) > 0).all()
        assert (z >= 0.8 - 1e-6).all() and (z <= 1.8 + 1e-6).all()
        # strata bounds: each sample within [lower_i, upper_i]
        from codenerf_tpu.ops import stratified_bins
        lower, upper = stratified_bins(z_base)
        assert (z >= np.asarray(lower) - 1e-6).all()
        assert (z <= np.asarray(upper) + 1e-6).all()
        # different keys give different jitters
        _, z2 = sample_stratified(jax.random.PRNGKey(1), ro, rd, z_base, True)
        assert not np.allclose(z, np.asarray(z2))


class TestSamplePDF:
    @pytest.mark.parametrize("num_coarse,num_fine", [(32, 128), (64, 64)])
    def test_deterministic_matches_reference(self, num_coarse, num_fine):
        import torch
        ref = _ref_point_sampler(num_coarse, num_fine, 0.8, 1.8,
                                 "lindepth", False)
        rng = np.random.default_rng(1)
        R = 12
        ro = rng.normal(size=(R, 3)).astype(np.float32)
        rd = rng.normal(size=(R, 3)).astype(np.float32)
        z = np.sort(rng.uniform(0.8, 1.8, size=(R, num_coarse))
                    ).astype(np.float32)
        weights = rng.uniform(0.0, 1.0, size=(R, num_coarse - 2)
                              ).astype(np.float32)

        pts_ref, z_ref = ref.sample_pdf(torch.from_numpy(ro),
                                        torch.from_numpy(rd),
                                        torch.from_numpy(weights),
                                        torch.from_numpy(z))
        pts, z_union = sample_pdf(None, jnp.asarray(ro), jnp.asarray(rd),
                                  jnp.asarray(weights), jnp.asarray(z),
                                  num_fine=num_fine, perturb=False)
        np.testing.assert_allclose(np.asarray(z_union), z_ref.numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pts), pts_ref.numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_fine_samples_concentrate_on_peak(self):
        R, S, F = 4, 32, 128
        z = jnp.broadcast_to(jnp.linspace(0.8, 1.8, S), (R, S))
        weights = jnp.zeros((R, S - 2)).at[:, 14].set(100.0) + 1e-3
        ro, rd = jnp.zeros((R, 3)), jnp.ones((R, 3))
        _, z_union = sample_pdf(jax.random.PRNGKey(0), ro, rd, weights, z,
                                num_fine=F, perturb=True)
        # peak bin is around z[15] (weights index 14 -> z index 15)
        peak = float(z[0, 15])
        frac_near_peak = float(jnp.mean(jnp.abs(z_union - peak) < 0.1))
        assert frac_near_peak > 0.5

    def test_fine_depths_carry_no_gradient(self):
        R, S, F = 3, 16, 8
        z = jnp.broadcast_to(jnp.linspace(0.8, 1.8, S), (R, S))
        ro, rd = jnp.zeros((R, 3)), jnp.ones((R, 3))

        def f(w):
            _, zu = sample_pdf(None, ro, rd, w, z, num_fine=F, perturb=False)
            return jnp.sum(zu)

        g = jax.grad(f)(jnp.ones((R, S - 2)) * 0.5)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


class TestVolumeRender:
    def _random_inputs(self, R=16, S=48, seed=0):
        rng = np.random.default_rng(seed)
        raw = rng.normal(size=(R, S, 4)).astype(np.float32)
        z = np.sort(rng.uniform(0.8, 1.8, size=(R, S))).astype(np.float32)
        rd = rng.normal(size=(R, 3)).astype(np.float32)
        return raw, z, rd

    def test_forward_matches_reference(self):
        import torch
        vr_mod = load_reference_module(
            "ref_volumetric_render", "view_synthesis/nerf/volumetric_render.py")
        raw, z, rd = self._random_inputs()
        want = vr_mod.volume_render(torch.from_numpy(raw),
                                    torch.from_numpy(z),
                                    torch.from_numpy(rd))
        got = volume_render(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd))
        names = ["rgb", "disp", "acc", "weights", "depth"]
        for name, w, g in zip(names, want, got):
            np.testing.assert_allclose(np.asarray(g), w.numpy(), rtol=2e-5,
                                       atol=2e-6, err_msg=name)

    def test_gradients_match_reference(self):
        import torch
        vr_mod = load_reference_module(
            "ref_volumetric_render", "view_synthesis/nerf/volumetric_render.py")
        raw, z, rd = self._random_inputs(R=8, S=32, seed=7)

        raw_t = torch.from_numpy(raw).requires_grad_(True)
        out_t = vr_mod.volume_render(raw_t, torch.from_numpy(z),
                                     torch.from_numpy(rd))
        out_t[0].sum().backward()
        want = raw_t.grad.numpy()

        def f(r):
            return jnp.sum(volume_render(r, jnp.asarray(z),
                                         jnp.asarray(rd)).rgb)
        got = jax.grad(f)(jnp.asarray(raw))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-6)

    def test_weights_sum_at_most_one(self):
        raw, z, rd = self._random_inputs(seed=3)
        out = volume_render(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd))
        w = np.asarray(out.weights)
        assert (w >= 0).all()
        assert (w.sum(-1) <= 1.0 + 1e-5).all()

    def test_opaque_limit(self):
        # Very high density at the first sample: rgb_map -> first sample color.
        R, S = 4, 16
        raw = np.zeros((R, S, 4), dtype=np.float32)
        raw[:, 0, 3] = 1000.0  # huge sigma at first sample -> alpha ~= 1
        raw[:, :, :3] = 2.0
        z = np.tile(np.linspace(1.0, 2.0, S, dtype=np.float32), (R, 1))
        rd = np.tile(np.array([0.0, 0.0, 1.0], dtype=np.float32), (R, 1))
        out = volume_render(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd))
        expect_rgb = 1.0 / (1.0 + np.exp(-2.0)) * 1.002 - 0.001
        np.testing.assert_allclose(np.asarray(out.rgb), expect_rgb, atol=1e-3)
        np.testing.assert_allclose(np.asarray(out.depth), 1.0, atol=1e-3)


class TestWhiteBackground:
    def test_blend_to_white(self):
        # empty space (sigma -> 0) must composite to pure white
        R, S = 4, 16
        raw = np.full((R, S, 4), -50.0, dtype=np.float32)  # sigma ~ 0
        z = np.tile(np.linspace(1.0, 2.0, S, dtype=np.float32), (R, 1))
        rd = np.tile(np.array([0.0, 0.0, 1.0], dtype=np.float32), (R, 1))
        out = volume_render(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd),
                            white_background=True)
        np.testing.assert_allclose(np.asarray(out.rgb), 1.0, atol=1e-3)
        # default (off) composites to ~black (widened sigmoid floor)
        out2 = volume_render(jnp.asarray(raw), jnp.asarray(z),
                             jnp.asarray(rd))
        assert float(np.abs(np.asarray(out2.rgb)).max()) < 1e-2

    def test_opaque_unchanged_by_background(self):
        R, S = 3, 8
        rng = np.random.default_rng(0)
        raw = rng.normal(size=(R, S, 4)).astype(np.float32)
        raw[:, 0, 3] = 1000.0  # fully opaque first sample
        z = np.tile(np.linspace(1.0, 2.0, S, dtype=np.float32), (R, 1))
        rd = np.ones((R, 3), dtype=np.float32)
        a = volume_render(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd))
        b = volume_render(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd),
                          white_background=True)
        np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb),
                                   atol=1e-3)


class TestSamplingEdgeCases:
    def test_minimal_sample_counts(self):
        # smallest legal configuration: 3 coarse (weights need S-2 >= 1)
        z = jnp.broadcast_to(jnp.asarray(base_z_vals(3, 0.5, 2.0,
                                                     "lindepth")), (2, 3))
        ro, rd = jnp.zeros((2, 3)), jnp.ones((2, 3))
        w = jnp.ones((2, 1))
        pts, zu = sample_pdf(None, ro, rd, w, z, num_fine=1, perturb=False)
        assert zu.shape == (2, 4)
        assert np.isfinite(np.asarray(zu)).all()
        assert (np.diff(np.asarray(zu), axis=-1) >= 0).all()

    def test_two_sample_grid(self):
        z = base_z_vals(2, 1.0, 2.0, "lindisp")
        np.testing.assert_allclose(np.asarray(z), [1.0, 2.0], rtol=1e-6)

    def test_degenerate_weights_all_equal(self):
        # uniform weights must reproduce near-uniform fine samples
        R, S, F = 3, 16, 32
        z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, S), (R, S))
        w = jnp.ones((R, S - 2))
        ro, rd = jnp.zeros((R, 3)), jnp.ones((R, 3))
        _, zu = sample_pdf(None, ro, rd, w, z, num_fine=F, perturb=False)
        zu = np.asarray(zu)
        assert np.isfinite(zu).all()
        # fine samples span the interior bins roughly uniformly
        assert zu.min() >= 1.0 - 1e-5 and zu.max() <= 2.0 + 1e-5

    def test_extreme_sigma_values_finite(self):
        R, S = 2, 8
        raw = np.zeros((R, S, 4), dtype=np.float32)
        raw[..., 3] = 1e6  # extreme density logits
        raw[..., :3] = -1e6
        z = np.tile(np.linspace(1.0, 2.0, S, dtype=np.float32), (R, 1))
        rd = np.ones((R, 3), dtype=np.float32)
        out = volume_render(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rd))
        for leaf in out:
            assert np.isfinite(np.asarray(leaf)).all()
