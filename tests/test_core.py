"""Unit + parity tests for codenerf_tpu.core (geometry, encoding, lie, metrics)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from codenerf_tpu.core import (
    pixel_directions, ray_bundle, select_ray_indices, pose_spherical,
    positional_encoding, encoding_dim, lie, mse2psnr,
)
from tests.reference_loader import load_reference_module


def _intrinsic(focal=100.0, cx=32.0, cy=24.0):
    k = np.eye(4, dtype=np.float32)
    k[0, 0] = k[1, 1] = focal
    k[0, 2], k[1, 2] = cx, cy
    return k


class TestGeometryParity:
    def test_pixel_directions_matches_reference(self):
        import torch
        ray_sampler_mod = load_reference_module(
            "ref_ray_sampler", "view_synthesis/nerf/ray_sampler.py")
        H, W = 48, 64
        k = _intrinsic()
        ref = ray_sampler_mod.RaySampler(H, W, k, sample_size=16,
                                         device="cpu", datatype=torch.float32)
        ours = pixel_directions(H, W, jnp.asarray(k))
        np.testing.assert_allclose(np.asarray(ours),
                                   ref.directions.numpy(), rtol=1e-6)

    def test_ray_bundle_matches_reference(self):
        import torch
        ray_sampler_mod = load_reference_module(
            "ref_ray_sampler", "view_synthesis/nerf/ray_sampler.py")
        H, W, B = 20, 30, 3
        k = _intrinsic(80.0, 15.0, 10.0)
        rng = np.random.default_rng(0)
        # random valid-ish SE3 poses
        poses = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        for b in range(B):
            q = rng.normal(size=3).astype(np.float32) * 0.5
            poses[b, :3, :3] = np.asarray(lie.so3_exp(jnp.asarray(q)))
            poses[b, :3, 3] = rng.normal(size=3).astype(np.float32)

        ref = ray_sampler_mod.RaySampler(H, W, k, sample_size=16,
                                         device="cpu", datatype=torch.float32)
        ro_ref, rd_ref = ref.get_bundle(torch.from_numpy(poses))

        dirs = pixel_directions(H, W, jnp.asarray(k))
        ro, rd = ray_bundle(dirs, jnp.asarray(poses))
        np.testing.assert_allclose(np.asarray(rd), rd_ref.numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ro), ro_ref.numpy(), rtol=1e-6)

    def test_select_ray_indices_distinct_and_in_range(self):
        key = jax.random.PRNGKey(0)
        inds = select_ray_indices(key, num_pixels=100, sample_size=32,
                                  batch_size=4)
        assert inds.shape == (4, 32)
        for row in np.asarray(inds):
            assert len(set(row.tolist())) == 32
            assert row.min() >= 0 and row.max() < 100
        # distinct draws per batch element
        assert not np.array_equal(np.asarray(inds[0]), np.asarray(inds[1]))


class TestPoseSpherical:
    def test_matches_reference_layout(self):
        # Oracle reproduces eval.py:33-38 entry-by-entry.
        theta, phi, rho = 1.57, 0.35, 1.30
        st, ct, sp, cp = np.sin(theta), np.cos(theta), np.sin(phi), np.cos(phi)
        want = np.eye(4)
        want[0, 0], want[1, 0] = -sp, cp
        want[0, 1], want[1, 1], want[2, 1] = -st * cp, -st * sp, ct
        want[0, 2], want[1, 2], want[2, 2] = ct * cp, ct * sp, st
        want[0, 3], want[1, 3], want[2, 3] = rho * ct * cp, rho * ct * sp, rho * st
        got = pose_spherical(jnp.float32(theta), jnp.float32(phi),
                             jnp.float32(rho))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    def test_rotation_orthonormal(self):
        got = np.asarray(pose_spherical(0.7, -0.4, 2.0))
        R = got[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)

    def test_differentiable(self):
        def f(theta):
            return jnp.sum(pose_spherical(theta, 0.1, 1.3))
        g = jax.grad(f)(jnp.float32(1.0))
        assert np.isfinite(np.asarray(g))


class TestEncodingParity:
    @pytest.mark.parametrize("num_freq,log_sampling,include_input", [
        (10, True, True), (4, True, True), (6, False, True), (3, True, False),
    ])
    def test_matches_reference(self, num_freq, log_sampling, include_input):
        import torch
        pe_mod = load_reference_module(
            "ref_position_embed", "view_synthesis/nerf/position_embed.py")
        ref = pe_mod.PositionalEmbedder(num_freq=num_freq,
                                        log_sampling=log_sampling,
                                        include_input=include_input,
                                        dtype=torch.float32, device="cpu")
        x = np.random.default_rng(1).normal(size=(17, 3)).astype(np.float32)
        want = ref.embed(torch.from_numpy(x)).numpy()
        got = positional_encoding(jnp.asarray(x), num_freq,
                                  include_input=include_input,
                                  log_sampling=log_sampling)
        assert got.shape[-1] == encoding_dim(3, num_freq, include_input)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


class TestLie:
    def test_so3_exp_log_roundtrip(self):
        rng = np.random.default_rng(2)
        for scale in [1e-6, 1e-3, 0.5, 2.0, 3.0]:
            w = rng.normal(size=(8, 3)).astype(np.float64)
            w = w / np.linalg.norm(w, axis=-1, keepdims=True) * scale
            R = lie.so3_exp(jnp.asarray(w))
            w2 = lie.so3_log(R)
            np.testing.assert_allclose(np.asarray(w2), w, rtol=1e-4, atol=1e-6)

    def test_se3_exp_log_roundtrip(self):
        rng = np.random.default_rng(3)
        for scale in [1e-5, 0.1, 1.0, 2.5]:
            xi = rng.normal(size=(6, 6)).astype(np.float64)
            xi[:, 3:] = (xi[:, 3:] /
                         np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True) * scale)
            T = lie.se3_exp(jnp.asarray(xi))
            xi2 = lie.se3_log(T)
            np.testing.assert_allclose(np.asarray(xi2), xi, rtol=1e-4, atol=1e-6)

    def test_inv_vecs_Xg_ig_matches_reference(self):
        """Public inverse-left-Jacobian alias vs the reference's torch
        implementation (lieutils.py:569-582), across small/large angles."""
        import torch
        lieutils = load_reference_module(
            "ref_lieutils", "view_synthesis/utils/lieutils.py")
        rng = np.random.default_rng(11)
        for scale in [1e-6, 1e-3, 0.5, 2.0, 3.0]:
            w = rng.normal(size=(8, 3)).astype(np.float64)
            w = w / np.linalg.norm(w, axis=-1, keepdims=True) * scale
            ours = np.asarray(lie.inv_vecs_Xg_ig(jnp.asarray(w)))
            ref = lieutils.SO3.inv_vecs_Xg_ig(
                torch.from_numpy(w)).numpy()
            np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)
        # and it is exactly the matrix se3_log uses for the v component
        xi = rng.normal(size=(4, 6)) * 0.8
        T = lie.se3_exp(jnp.asarray(xi))
        w = lie.so3_log(T[..., :3, :3])
        v = np.einsum("bij,bj->bi", np.asarray(lie.inv_vecs_Xg_ig(w)),
                      np.asarray(T[..., :3, 3]))
        np.testing.assert_allclose(v, xi[:, :3], rtol=1e-4, atol=1e-6)

    def test_se3_inverse(self):
        xi = jnp.asarray(np.random.default_rng(4).normal(size=(5, 6)) * 0.7)
        T = lie.se3_exp(xi)
        ident = np.asarray(T @ lie.se3_inverse(T))
        np.testing.assert_allclose(ident, np.tile(np.eye(4), (5, 1, 1)),
                                   atol=1e-5)

    def test_pose_error_zero_at_identity(self):
        xi = jnp.asarray(np.random.default_rng(5).normal(size=(6,)) * 0.5)
        T = lie.se3_exp(xi)
        assert float(lie.pose_error(T, T)) == pytest.approx(0.0, abs=1e-5)

    def test_pose_error_differentiable(self):
        T_gt = lie.se3_exp(jnp.asarray(np.random.default_rng(6).normal(size=6) * 0.3))

        def f(theta):
            return lie.pose_error(T_gt, pose_spherical(theta, 0.1, 1.3))
        g = jax.grad(f)(jnp.float64(1.0))
        assert np.isfinite(np.asarray(g))


class TestMetrics:
    def test_mse2psnr(self):
        assert float(mse2psnr(jnp.float32(0.01))) == pytest.approx(20.0, abs=1e-4)
        assert np.isfinite(float(mse2psnr(jnp.float32(0.0))))


class TestSSIM:
    def test_identical_images(self):
        from codenerf_tpu.core.metrics import ssim
        img = jnp.asarray(np.random.default_rng(0).uniform(
            size=(32, 32, 3)), dtype=jnp.float32)
        assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)

    def test_uncorrelated_lower_than_noisy(self):
        from codenerf_tpu.core.metrics import ssim
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(size=(32, 32, 3)), dtype=jnp.float32)
        noisy = img + jnp.asarray(rng.normal(size=(32, 32, 3)) * 0.05,
                                  dtype=jnp.float32)
        other = jnp.asarray(rng.uniform(size=(32, 32, 3)), dtype=jnp.float32)
        s_noisy = float(ssim(img, noisy))
        s_other = float(ssim(img, other))
        assert 0.5 < s_noisy < 1.0
        assert s_other < s_noisy

    def test_small_image_window_clamped(self):
        # images smaller than the 11-tap window used to yield an empty
        # valid-mode conv output and therefore NaN
        from codenerf_tpu.core.metrics import ssim
        img = jnp.asarray(np.random.default_rng(3).uniform(
            size=(8, 8, 3)), dtype=jnp.float32)
        assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
        other = jnp.asarray(np.random.default_rng(4).uniform(
            size=(8, 8, 3)), dtype=jnp.float32)
        assert np.isfinite(float(ssim(img, other)))

    def test_matches_known_degradation(self):
        from codenerf_tpu.core.metrics import ssim
        # constant shift barely affects structure -> high SSIM but < 1
        img = jnp.asarray(np.random.default_rng(2).uniform(
            size=(24, 24, 3)), dtype=jnp.float32) * 0.5
        shifted = jnp.clip(img + 0.1, 0, 1)
        s = float(ssim(img, shifted))
        assert 0.5 < s < 0.999


class TestRaySelectionGuard:
    def test_oversized_sample_raises_clearly(self):
        with pytest.raises(AssertionError, match="num_random_rays"):
            select_ray_indices(jax.random.PRNGKey(0), num_pixels=100,
                               sample_size=200, batch_size=1)


class TestLieNearPi:
    def test_so3_log_near_pi_branch(self):
        """Rotations within 1e-3 of pi exercise the symmetric-part axis
        recovery; the log is defined up to sign there."""
        rng = np.random.default_rng(11)
        for theta in [3.141, 3.1415, np.pi - 1e-5]:
            axis = rng.normal(size=3)
            axis = axis / np.linalg.norm(axis)
            w = jnp.asarray(axis * theta)
            w2 = np.asarray(lie.so3_log(lie.so3_exp(w)))
            err = min(np.linalg.norm(w2 - np.asarray(w)),
                      np.linalg.norm(w2 + np.asarray(w)))
            assert err < 5e-4, (theta, err)


class TestNDCRays:
    """NDC parametrization for forward-facing scenes (fern.yml's
    `no_ndc: false` intent — the reference never implements it,
    SURVEY §3.6)."""

    def _camera_rays(self, H=40, W=60, focal=50.0, shift=(0.1, -0.2, 0.3)):
        from codenerf_tpu.core import pixel_directions, ray_bundle
        k = _intrinsic(focal, W / 2.0, H / 2.0)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = shift  # camera near origin looking down -z
        ro, rd = ray_bundle(pixel_directions(H, W, jnp.asarray(k)),
                            jnp.asarray(pose)[None])
        return ro.reshape(-1, 3), rd.reshape(-1, 3)

    def test_frustum_maps_into_unit_cube(self):
        from codenerf_tpu.core import ndc_rays
        H, W, focal = 40, 60, 50.0
        ro, rd = self._camera_rays(H, W, focal, shift=(0.0, 0.0, 0.0))
        ro_n, rd_n = ndc_rays(ro, rd, H, W, focal)
        for t in [0.0, 0.25, 0.5, 0.99]:
            p = np.asarray(ro_n + t * rd_n)
            assert np.all(np.abs(p[:, 0]) <= 1.0 + 1e-4)
            assert np.all(np.abs(p[:, 1]) <= 1.0 + 1e-4)
            # NDC z spans [-1, 1] over ray parameter t in [0, 1]
            assert np.all(np.abs(p[:, 2]) <= 1.0 + 1e-4)

    def test_points_project_consistently(self):
        """NDC of a world point on the ray lies on the NDC ray: the
        standard-NeRF identity ndc(o + s d) = o' + s' d' with
        s' = 1 - oz/(oz + s dz), after origins shift to the near plane."""
        from codenerf_tpu.core import ndc_rays
        H, W, focal, near = 40, 60, 50.0, 1.0
        ro, rd = self._camera_rays(H, W, focal)
        ro_n, rd_n = map(np.asarray, ndc_rays(ro, rd, H, W, focal, near))
        # shift world origins to the near plane exactly as ndc_rays does
        ro, rd = np.asarray(ro, np.float64), np.asarray(rd, np.float64)
        tshift = -(near + ro[:, 2]) / rd[:, 2]
        ro = ro + tshift[:, None] * rd
        for s in [0.0, 0.7, 3.0, 50.0]:
            p = ro + s * rd
            px = -2.0 * focal / W * p[:, 0] / p[:, 2]
            py = -2.0 * focal / H * p[:, 1] / p[:, 2]
            pz = 1.0 + 2.0 * near / p[:, 2]
            s_ndc = 1.0 - ro[:, 2] / (ro[:, 2] + s * rd[:, 2])
            q = ro_n + s_ndc[:, None] * rd_n
            np.testing.assert_allclose(q[:, 0], px, atol=2e-4)
            np.testing.assert_allclose(q[:, 1], py, atol=2e-4)
            np.testing.assert_allclose(q[:, 2], pz, atol=2e-4)

    def test_z_near_plane_and_infinity_limits(self):
        """Ray parameter 0 = near plane (NDC z = -1); parameter 1 = the
        world-space limit t -> infinity (NDC z = +1)."""
        from codenerf_tpu.core import ndc_rays
        ro, rd = self._camera_rays()
        ro_n, rd_n = map(np.asarray, ndc_rays(ro, rd, 40, 60, 50.0))
        np.testing.assert_allclose(ro_n[:, 2], -1.0, atol=1e-5)
        np.testing.assert_allclose(ro_n[:, 2] + rd_n[:, 2], 1.0, atol=1e-5)

    def test_differentiable_for_pose_tto(self):
        from codenerf_tpu.core import ndc_rays

        def f(shift):
            ro, rd = self._camera_rays(8, 8, 6.0, shift=(0.0, 0.0, 0.0))
            ro_n, rd_n = ndc_rays(ro + shift, rd, 8, 8, 6.0)
            return jnp.sum(ro_n ** 2 + rd_n ** 2)

        g = jax.grad(f)(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))
