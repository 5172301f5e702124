"""Per-object shape/texture latent code tables (auto-decoder).

Replaces the reference's ``ShapeTextureEmbedding`` torch module
(view_synthesis/models/model.py:87-120).  On TPU the tables live as plain
arrays in the parameter pytree; lookup is ``jnp.take`` whose gradient is a
dense scatter-add that pjit all-reduces over the mesh — the TPU-native
counterpart of DDP's dense all-reduce of sparse embedding grads
(SURVEY §2, ShapeTextureEmbedding row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_code_tables(key: jax.Array, num_objects: int, shape_code_size: int,
                     texture_code_size: int, dtype=jnp.float32):
    """N(0,1) tables, matching torch.nn.Embedding default init
    (model.py:99-100)."""
    ks, kt = jax.random.split(key)
    return {
        "shape": jax.random.normal(ks, (num_objects, shape_code_size), dtype),
        "texture": jax.random.normal(kt, (num_objects, texture_code_size), dtype),
    }


def lookup_codes(tables, object_ids: jax.Array):
    """(z_s, z_t) for a batch of object ids (model.py:102-105)."""
    z_s = jnp.take(tables["shape"], object_ids, axis=0)
    z_t = jnp.take(tables["texture"], object_ids, axis=0)
    return z_s, z_t


def mean_codes(tables):
    """Mean of each learned table — the TTO initialization
    (reference eval.py:126-127)."""
    return (jnp.mean(tables["shape"], axis=0, keepdims=True),
            jnp.mean(tables["texture"], axis=0, keepdims=True))


def code_table_norms(tables):
    """L2 norm of each flattened table, for the training regularizer
    (model.py:113-120 + train.py:107)."""
    return (jnp.linalg.norm(tables["shape"].reshape(-1)),
            jnp.linalg.norm(tables["texture"].reshape(-1)))
