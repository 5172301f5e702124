"""Single-pass Pallas layer backward (ops/layer_bwd.py) vs the XLA path
(interpret mode on CPU; the same kernel runs compiled on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from codenerf_tpu.models import ray_structured as rs
from codenerf_tpu.ops import layer_bwd as lb


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(lb.pl, "pallas_call", interp)


def _loss(op, w, b, cd):
    def f(x, w, b, g):
        return jnp.sum(op(x, w, b, cd) * g)
    return f


@pytest.mark.parametrize("cd", [None, jnp.bfloat16])
@pytest.mark.parametrize("per_ray", [False, True])
def test_grads_match_xla_path(cd, per_ray):
    R, S, K, N = 6, 8, 24, 32
    rng = np.random.default_rng(0 if per_ray else 1)
    x = jnp.asarray(rng.normal(size=(R, S, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.normal(size=(R, 1, N) if per_ray else (N,)),
                    jnp.float32)
    g = jnp.asarray(rng.normal(size=(R, S, N)), jnp.float32)
    if cd is not None:
        x = x.astype(cd)

    got = jax.grad(_loss(rs._dot_add_relu_pl, w, b, cd),
                   argnums=(0, 1, 2))(x, w, b, g)
    want = jax.grad(_loss(rs._dot_add_relu, w, b, cd),
                    argnums=(0, 1, 2))(x, w, b, g)
    for a, e in zip(got, want):
        assert a.dtype == e.dtype and a.shape == e.shape
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(e, np.float32),
                                   rtol=1e-5, atol=1e-5)


def test_multi_tile_accumulation():
    """dw/db must accumulate across grid steps (tile_rows < M)."""
    R, S, K, N = 16, 8, 16, 16
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(R, S, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    y = jax.nn.relu(x @ w + b)
    g = jnp.asarray(rng.normal(size=(R, S, N)), jnp.float32)
    dx, dw, db = lb.linear_relu_bwd_pallas(x, w, b, y, g, None, tile_rows=32)
    gp = np.where(np.asarray(y) > 0, np.asarray(g), 0)
    np.testing.assert_allclose(np.asarray(dw),
                               np.asarray(x).reshape(-1, K).T
                               @ gp.reshape(-1, N), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db), gp.reshape(-1, N).sum(0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dx), gp @ np.asarray(w).T,
                               rtol=1e-4, atol=1e-4)


def test_2d_input_plain_bias():
    M, K, N = 24, 16, 16
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(M, N)), jnp.float32)
    got = jax.grad(_loss(rs._dot_add_relu_pl, w, b, None),
                   argnums=(0, 1, 2))(x, w, b, g)
    want = jax.grad(_loss(rs._dot_add_relu, w, b, None),
                    argnums=(0, 1, 2))(x, w, b, g)
    for a, e in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-5, atol=1e-5)


def test_apply_codenerf_rays_layer_bwd_flag(monkeypatch):
    """pallas_layer_bwd routes through the kernel and matches the XLA
    path's gradients at the model level."""
    from codenerf_tpu.models.mlp import CodeNeRFConfig, init_codenerf
    from codenerf_tpu.models.ray_structured import apply_codenerf_rays
    # force the backend gate open on CPU (kernel runs in interpret mode)
    monkeypatch.setattr(rs, "_layer_bwd_active",
                        lambda cfg: cfg.pallas_layer_bwd)
    kw = dict(hidden_size=32, shape_code_size=16, texture_code_size=16,
              num_encoding_fn_xyz=6, num_encoding_fn_dir=4)
    cfg_pl = CodeNeRFConfig(pallas_layer_bwd=True, **kw)
    cfg = CodeNeRFConfig(**kw)
    params = init_codenerf(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    R, S = 4, 8
    xyz = jnp.asarray(rng.normal(size=(R, S, cfg.dim_xyz)), jnp.float32)
    de = jnp.asarray(rng.normal(size=(R, cfg.dim_dir)), jnp.float32)
    z_s = jnp.asarray(rng.normal(size=(R, 16)), jnp.float32)
    z_t = jnp.asarray(rng.normal(size=(R, 16)), jnp.float32)
    wgt = jnp.asarray(rng.normal(size=(R, S, 4)), jnp.float32)

    def loss(c):
        def f(p, zs, x):
            return jnp.sum(wgt * apply_codenerf_rays(p, c, x, de, zs, z_t))
        return f

    got = jax.grad(loss(cfg_pl), argnums=(0, 1, 2))(params, z_s, xyz)
    want = jax.grad(loss(cfg), argnums=(0, 1, 2))(params, z_s, xyz)
    for a, e in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-4)
