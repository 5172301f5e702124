"""Pallas fused CodeNeRF trunk vs the XLA reference path (interpret mode on
CPU; the same kernel runs compiled on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from codenerf_tpu.models import CodeNeRFConfig, init_codenerf
from codenerf_tpu.ops import fused as fused_mod
from codenerf_tpu.ops.fused import make_fused_codenerf, make_hybrid_codenerf


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    """Run pallas_call in interpreter mode on CPU."""
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(fused_mod.pl, "pallas_call", interp)


def _inputs(cfg, R=8, S=16, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.uniform(-1, 1, size=(R, S, 3)), jnp.float32)
    dir_enc = jnp.asarray(rng.normal(size=(R, cfg.dim_dir)), jnp.float32)
    z_s = jnp.asarray(rng.normal(size=(R, cfg.shape_code_size)), jnp.float32)
    z_t = jnp.asarray(rng.normal(size=(R, cfg.texture_code_size)), jnp.float32)
    return pts, dir_enc, z_s, z_t


class TestFusedTrunk:
    @pytest.mark.parametrize("include_input", [True, False])
    def test_matches_xla_reference(self, include_input):
        cfg = CodeNeRFConfig(hidden_size=64, shape_code_size=32,
                             texture_code_size=32, num_encoding_fn_xyz=10,
                             num_encoding_fn_dir=4,
                             include_input_xyz=include_input)
        params = init_codenerf(jax.random.PRNGKey(0), cfg)
        fused = make_fused_codenerf(cfg, 10, include_input, True,
                                    tile_rows=64)
        pts, dir_enc, z_s, z_t = _inputs(cfg)
        got = fused(params, pts, dir_enc, z_s, z_t)
        want = fused.xla_reference(params, pts, dir_enc, z_s, z_t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_odd_ray_count_tiles(self):
        """R not divisible by the preferred tile -> T falls back to a
        divisor."""
        cfg = CodeNeRFConfig(hidden_size=32, shape_code_size=16,
                             texture_code_size=16, num_encoding_fn_xyz=6)
        params = init_codenerf(jax.random.PRNGKey(1), cfg)
        fused = make_fused_codenerf(cfg, 6, True, True, tile_rows=64)
        pts, dir_enc, z_s, z_t = _inputs(cfg, R=7, S=8, seed=1)
        got = fused(params, pts, dir_enc, z_s, z_t)
        want = fused.xla_reference(params, pts, dir_enc, z_s, z_t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_gradients_flow_through_vjp(self):
        cfg = CodeNeRFConfig(hidden_size=32, shape_code_size=16,
                             texture_code_size=16, num_encoding_fn_xyz=6,
                             num_encoding_fn_dir=4)
        params = init_codenerf(jax.random.PRNGKey(2), cfg)
        fused = make_fused_codenerf(cfg, 6, True, True, tile_rows=64)
        pts, dir_enc, z_s, z_t = _inputs(cfg, R=4, S=8, seed=2)

        def loss_fused(p, zs, pt):
            return jnp.sum(fused(p, pt, dir_enc, zs, z_t) ** 2)

        def loss_ref(p, zs, pt):
            return jnp.sum(fused.xla_reference(p, pt, dir_enc, zs, z_t) ** 2)

        gp1, gz1, gpt1 = jax.grad(loss_fused, argnums=(0, 1, 2))(
            params, z_s, pts)
        gp2, gz2, gpt2 = jax.grad(loss_ref, argnums=(0, 1, 2))(
            params, z_s, pts)
        np.testing.assert_allclose(np.asarray(gz1), np.asarray(gz2),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gpt1), np.asarray(gpt2),
                                   rtol=1e-4, atol=1e-4)
        for a, b in zip(jax.tree.leaves(gp1), jax.tree.leaves(gp2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


class TestFusedBackwardKernel:
    """Fully fused Pallas fwd+bwd pair vs the XLA reference gradients."""

    def _check_grads(self, cfg, R, S, seed, tile_rows=64, rtol=2e-3,
                     atol=2e-3):
        params = init_codenerf(jax.random.PRNGKey(seed), cfg)
        fused = make_fused_codenerf(
            cfg, cfg.num_encoding_fn_xyz, cfg.include_input_xyz, True,
            tile_rows=tile_rows, pallas_backward=True)
        pts, dir_enc, z_s, z_t = _inputs(cfg, R=R, S=S, seed=seed)

        # weighted sum makes every output position's cotangent distinct
        wgt = jnp.asarray(
            np.random.default_rng(seed + 7).normal(size=(R, S, 4)),
            jnp.float32)

        def loss(fn):
            def f(p, zs, zt, de, pt):
                return jnp.sum(wgt * fn(p, pt, de, zs, zt))
            return f

        got = jax.grad(loss(fused), argnums=(0, 1, 2, 3, 4))(
            params, z_s, z_t, dir_enc, pts)
        want = jax.grad(loss(fused.xla_reference), argnums=(0, 1, 2, 3, 4))(
            params, z_s, z_t, dir_enc, pts)
        flat_got, tree_got = jax.tree.flatten(got)
        flat_want, tree_want = jax.tree.flatten(want)
        assert tree_got == tree_want
        for a, b in zip(flat_got, flat_want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=rtol, atol=atol)

    @pytest.mark.parametrize("include_input", [True, False])
    def test_all_gradients_match_xla(self, include_input):
        cfg = CodeNeRFConfig(hidden_size=64, shape_code_size=32,
                             texture_code_size=32, num_encoding_fn_xyz=10,
                             num_encoding_fn_dir=4,
                             include_input_xyz=include_input)
        self._check_grads(cfg, R=8, S=16, seed=3)

    def test_multi_tile_accumulation(self):
        """Weight-grad accumulators must sum across grid steps: force
        several tiles (tile_rows < R*S)."""
        cfg = CodeNeRFConfig(hidden_size=32, shape_code_size=16,
                             texture_code_size=16, num_encoding_fn_xyz=6)
        self._check_grads(cfg, R=12, S=8, seed=4, tile_rows=16)

    def test_forward_value_unchanged(self):
        cfg = CodeNeRFConfig(hidden_size=32, shape_code_size=16,
                             texture_code_size=16, num_encoding_fn_xyz=6)
        params = init_codenerf(jax.random.PRNGKey(5), cfg)
        fused = make_fused_codenerf(cfg, 6, True, True, tile_rows=64,
                                    pallas_backward=True)
        pts, dir_enc, z_s, z_t = _inputs(cfg, R=8, S=8, seed=5)
        got = fused(params, pts, dir_enc, z_s, z_t)
        want = fused.xla_reference(params, pts, dir_enc, z_s, z_t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_bf16_compute_dtype(self):
        """bf16 kernels round at different points than the bf16 XLA chain,
        so exact comparison is to the f32 truth: the pallas-bwd bf16 grads
        must sit within bf16 rounding distance (relative L2) of the f32
        gradients, leaf by leaf."""
        self._bf16_check(
            lambda cfg: make_fused_codenerf(cfg, 6, True, True, tile_rows=64,
                                            pallas_backward=True))

    def _bf16_check(self, make):
        kw = dict(hidden_size=64, shape_code_size=32, texture_code_size=32,
                  num_encoding_fn_xyz=6)
        cfg16 = CodeNeRFConfig(compute_dtype="bfloat16", **kw)
        cfg32 = CodeNeRFConfig(**kw)
        params = init_codenerf(jax.random.PRNGKey(6), cfg16)
        fused16 = make(cfg16)
        fused32 = make_fused_codenerf(cfg32, 6, True, True, tile_rows=64)
        pts, dir_enc, z_s, z_t = _inputs(cfg16, R=8, S=8, seed=6)

        def loss(fn):
            def f(p, zs, zt, de, pt):
                return jnp.mean(fn(p, pt, de, zs, zt) ** 2)
            return f

        got = jax.grad(loss(fused16), argnums=(0, 1, 2, 3, 4))(
            params, z_s, z_t, dir_enc, pts)
        want = jax.grad(loss(fused32.xla_reference),
                        argnums=(0, 1, 2, 3, 4))(
            params, z_s, z_t, dir_enc, pts)
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            denom = np.linalg.norm(b)
            if denom < 1e-12:
                assert np.linalg.norm(a) < 1e-6
            else:
                assert np.linalg.norm(a - b) / denom < 0.05


class TestHybridBackwardKernel:
    """XLA forward + stored-activation Pallas backward
    (make_hybrid_codenerf) vs the XLA reference gradients."""

    def _check_grads(self, cfg, R, S, seed, tile_rows_bwd=64, rtol=2e-3,
                     atol=2e-3):
        params = init_codenerf(jax.random.PRNGKey(seed), cfg)
        hybrid = make_hybrid_codenerf(
            cfg, cfg.num_encoding_fn_xyz, cfg.include_input_xyz, True,
            tile_rows_bwd=tile_rows_bwd, vmem_limit=None)
        pts, dir_enc, z_s, z_t = _inputs(cfg, R=R, S=S, seed=seed)

        wgt = jnp.asarray(
            np.random.default_rng(seed + 7).normal(size=(R, S, 4)),
            jnp.float32)

        def loss(fn):
            def f(p, zs, zt, de, pt):
                return jnp.sum(wgt * fn(p, pt, de, zs, zt))
            return f

        got_out = hybrid(params, pts, dir_enc, z_s, z_t)
        want_out = hybrid.xla_reference(params, pts, dir_enc, z_s, z_t)
        np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                                   rtol=1e-4, atol=1e-4)

        got = jax.grad(loss(hybrid), argnums=(0, 1, 2, 3, 4))(
            params, z_s, z_t, dir_enc, pts)
        want = jax.grad(loss(hybrid.xla_reference), argnums=(0, 1, 2, 3, 4))(
            params, z_s, z_t, dir_enc, pts)
        flat_got, tree_got = jax.tree.flatten(got)
        flat_want, tree_want = jax.tree.flatten(want)
        assert tree_got == tree_want
        for a, b in zip(flat_got, flat_want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=rtol, atol=atol)

    @pytest.mark.parametrize("include_input", [True, False])
    def test_all_gradients_match_xla(self, include_input):
        cfg = CodeNeRFConfig(hidden_size=64, shape_code_size=32,
                             texture_code_size=32, num_encoding_fn_xyz=10,
                             num_encoding_fn_dir=4,
                             include_input_xyz=include_input)
        self._check_grads(cfg, R=8, S=16, seed=3)

    def test_multi_tile_accumulation(self):
        cfg = CodeNeRFConfig(hidden_size=32, shape_code_size=16,
                             texture_code_size=16, num_encoding_fn_xyz=6)
        self._check_grads(cfg, R=12, S=8, seed=4, tile_rows_bwd=16)

    def test_bf16_compute_dtype(self):
        TestFusedBackwardKernel()._bf16_check(
            lambda cfg: make_hybrid_codenerf(cfg, 6, True, True,
                                             tile_rows_bwd=64,
                                             vmem_limit=None))
