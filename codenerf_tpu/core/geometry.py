"""Camera / ray geometry as pure jnp functions.

Replaces the reference's stateful ``RaySampler`` class
(view_synthesis/nerf/ray_sampler.py:7-99) with stateless functions:

  * `pixel_directions`  — camera-frame per-pixel ray direction grid
    (ray_sampler.py:35-51)
  * `ray_bundle`        — rotate directions into the world frame and broadcast
    origins from the pose translation (ray_sampler.py:84-99)
  * `select_ray_indices`— device-side without-replacement pixel draw, replacing
    the host-side ``np.random.permutation`` loop (ray_sampler.py:71-75)
  * `pose_spherical`    — differentiable spherical camera pose used by
    test-time pose optimization (eval.py:22-38)

All functions are shape-static and jit/vmap/grad-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_directions(height: int, width: int, intrinsic: jax.Array) -> jax.Array:
    """Camera-frame ray directions for every pixel.

    Convention (matches reference ray_sampler.py:44-51): x right, y up, camera
    looks down -z.  ``intrinsic`` is a 4x4 matrix whose [0,0] is the focal
    length and [0,2]/[1,2] are cx/cy.

    Returns: [H, W, 3] array of (unnormalized) directions.
    """
    intrinsic = jnp.asarray(intrinsic)
    focal = intrinsic[0, 0]
    cx = intrinsic[0, 2]
    cy = intrinsic[1, 2]
    dtype = intrinsic.dtype
    ii, jj = jnp.meshgrid(
        jnp.arange(width, dtype=dtype),
        jnp.arange(height, dtype=dtype),
        indexing="xy",
    )
    return jnp.stack(
        [(ii - cx) / focal, -(jj - cy) / focal, -jnp.ones_like(ii)],
        axis=-1,
    )


def ray_bundle(directions: jax.Array, pose_c2w: jax.Array):
    """World-frame ray origins/directions for a batch of camera poses.

    Args:
      directions: [H, W, 3] camera-frame direction grid from
        `pixel_directions`.
      pose_c2w:   [B, 4, 4] camera-to-world SE(3) transforms.

    Returns:
      ro, rd: each [B, H, W, 3].  rd[b] = R_b @ dir (reference einsum
      'hwij,bji->bhwj' at ray_sampler.py:97), ro[b] = t_b broadcast.
    """
    rot = pose_c2w[..., :3, :3]
    rd = jnp.einsum("hwi,bji->bhwj", directions, rot)
    ro = jnp.broadcast_to(pose_c2w[..., :3, 3][:, None, None, :], rd.shape)
    return ro, rd


def select_ray_indices(key: jax.Array, num_pixels: int, sample_size: int,
                       batch_size: int) -> jax.Array:
    """Draw `sample_size` distinct pixel indices per batch element, on device.

    Matches the reference's per-image without-replacement draw
    (ray_sampler.py:71-75) but with a threaded JAX PRNG key instead of
    host-side numpy RNG.

    Returns: [B, S] int32 indices into the flattened H*W pixel axis.
    """
    # The reference asserts this (ray_sampler.py:18); without the guard a
    # too-large sample_size silently truncates to num_pixels rays and the
    # shape error surfaces far downstream.
    assert 0 < sample_size <= num_pixels, (
        f"sample_size ({sample_size}) must be in (0, num_pixels="
        f"{num_pixels}]; reduce nerf.ray_sampler.num_random_rays or use "
        f"larger images")
    keys = jax.random.split(key, batch_size)

    def one(k):
        return jax.random.permutation(k, num_pixels)[:sample_size]

    return jax.vmap(one)(keys).astype(jnp.int32)


def ndc_rays(ro: jax.Array, rd: jax.Array, height: float, width: float,
             focal: float, near: float = 1.0):
    """Shift rays to the near plane and map them to NDC space.

    The standard NeRF normalized-device-coordinate parametrization for
    forward-facing (LLFF) scenes: cameras look down -z; after the transform
    the visible frustum becomes the cube [-1,1]^3 and sampling linearly in
    NDC z corresponds to sampling linearly in *disparity* in world space.
    The reference's fern.yml declares ``no_ndc: false`` but the reference
    never implements the transform (SURVEY §3.6 / VERDICT round-1 item 3);
    this supplies the evidently-intended behavior.

    Args:
      ro, rd: [..., 3] world-frame ray origins / directions (camera forward
        along -z, i.e. rd[..., 2] < 0 for rays in front of the camera).
      height, width, focal: image geometry in pixels.
      near: world-space distance of the plane mapped to NDC z = 0.

    Returns: (ro_ndc, rd_ndc), each [..., 3].  The NDC z coordinate spans
    [-1, 1] from the near plane to infinity, and the *ray parameter* t in
    ro_ndc + t * rd_ndc spans [0, 1] over that range — so callers sample
    t linearly in [0, 1] (near_limit=0, far_limit=1, linear-in-depth
    spacing).  Fully differentiable (TTO pose gradients flow through it).
    """
    # move origins onto the near plane z = -near
    t = -(near + ro[..., 2]) / rd[..., 2]
    ro = ro + t[..., None] * rd

    ox, oy, oz = ro[..., 0], ro[..., 1], ro[..., 2]
    dx, dy, dz = rd[..., 0], rd[..., 1], rd[..., 2]
    sx = -2.0 * focal / width
    sy = -2.0 * focal / height
    o0 = sx * ox / oz
    o1 = sy * oy / oz
    o2 = 1.0 + 2.0 * near / oz
    d0 = sx * (dx / dz - ox / oz)
    d1 = sy * (dy / dz - oy / oz)
    d2 = -2.0 * near / oz
    return (jnp.stack([o0, o1, o2], axis=-1),
            jnp.stack([d0, d1, d2], axis=-1))


def pose_spherical(theta: jax.Array, phi: jax.Array, rho: jax.Array) -> jax.Array:
    """Differentiable camera-to-world pose on a sphere looking at the origin.

    Exact reproduction of the reference's matrix layout (eval.py:33-38) so the
    test-time pose optimization has identical parametrization:

      column 0: [-sin(phi),            cos(phi),            0       ]
      column 1: [-sin(th)cos(phi),    -sin(th)sin(phi),     cos(th) ]
      column 2: [ cos(th)cos(phi),     cos(th)sin(phi),     sin(th) ]
      column 3: rho * column 2 (camera position), bottom row [0,0,0,1]

    Accepts scalars or 0/1-d arrays; returns [4, 4].
    """
    theta = jnp.asarray(theta).reshape(())
    phi = jnp.asarray(phi).reshape(())
    rho = jnp.asarray(rho).reshape(())
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    zero = jnp.zeros_like(st)
    one = jnp.ones_like(st)
    c0 = jnp.stack([-sp, cp, zero, zero])
    c1 = jnp.stack([-st * cp, -st * sp, ct, zero])
    c2 = jnp.stack([ct * cp, ct * sp, st, zero])
    c3 = jnp.stack([rho * ct * cp, rho * ct * sp, rho * st, one])
    return jnp.stack([c0, c1, c2, c3], axis=-1)
