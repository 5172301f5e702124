"""SO(3) / SE(3) exponential and logarithm maps, numerically stable in JAX.

Re-designed replacement for the reference's torch Lie utilities
(view_synthesis/utils/lieutils.py:453-743).  The reference hand-writes
autograd Functions with Taylor small-angle branches; here we write the stable
formulas once with guarded `where` branches and let JAX autodiff them.  Two
known reference bugs are fixed rather than replicated:

  * lieutils.py:553 — `torh.sign` typo in the SO3.Log small-angle branch
    (crashes when hit)
  * lieutils.py:644 — wrong matrix entry in SE3.hat (`w2` instead of `w3`)

Only `se3_log` (plus `se3_inverse`) is needed by the main pipeline — the
pose-error metric at reference eval.py:161-162 — but the full family is
provided and property-tested (round-trip Exp/Log).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8
# Below this angle (radians) Taylor series replace the closed forms.
_SMALL = 1e-4
# Branch threshold for the sinc-family coefficients (A, B, C, D), in
# theta^2.  These divide quantities like (1 - cos theta) by theta^2, which
# cancels catastrophically in float32 once 1 - cos(theta) approaches the
# ulp at 1 (~1.2e-7): at theta = 1e-3 the generic branch's B carries ~10%
# noise and D = (1 - A/(2B))/theta^2 explodes by ~5 orders of magnitude
# (caught by the inv_vecs_Xg_ig parity test vs the torch reference, which
# branches at a much larger angle — lieutils.py:20-27).  theta < 0.05 uses
# the Taylor heads, whose truncation error (~theta^6/40320) is below f32
# resolution there; the generic branch at theta >= 0.05 has relative error
# <= 2 eps / theta^2 ~ 1e-4.
_SINC_SMALL_SQ = 2.5e-3


def hat(w: jax.Array) -> jax.Array:
    """so(3) hat: [..., 3] -> [..., 3, 3] skew-symmetric matrix."""
    w1, w2, w3 = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(w1)
    return jnp.stack(
        [
            jnp.stack([zero, -w3, w2], axis=-1),
            jnp.stack([w3, zero, -w1], axis=-1),
            jnp.stack([-w2, w1, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of `hat`: [..., 3, 3] -> [..., 3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta_sq: jax.Array):
    """A = sin(t)/t, B = (1-cos(t))/t^2, C = (1 - A)/t^2 with Taylor guards.

    All three are smooth even functions of theta, so expressing them in
    theta^2 keeps gradients finite at 0 (the `where` operands are sanitized
    before the transcendental is applied — the "double where" trick).
    """
    small = theta_sq < _SINC_SMALL_SQ
    safe_sq = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    theta = jnp.sqrt(safe_sq)
    A = jnp.where(small, 1.0 - theta_sq / 6.0 + theta_sq**2 / 120.0,
                  jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta_sq / 24.0 + theta_sq**2 / 720.0,
                  (1.0 - jnp.cos(theta)) / safe_sq)
    C = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0 + theta_sq**2 / 5040.0,
                  (1.0 - jnp.sin(theta) / theta) / safe_sq)
    return A, B, C


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues' formula: axis-angle [..., 3] -> rotation matrix [..., 3, 3]."""
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta_sq)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> axis-angle [..., 3].

    Stable for theta in [0, pi).  Near pi the antisymmetric-part formula
    degrades; we switch to axis recovery from the symmetric part.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # w_vec = vee(R - R^T) = 2 sin(theta) * axis
    w_vec = vee(R - jnp.swapaxes(R, -1, -2))

    small = theta < _SMALL
    near_pi = theta > jnp.pi - 1e-3

    # Generic branch: theta / (2 sin theta) * vee(R - R^T)
    safe_sin = jnp.where(small | near_pi, jnp.ones_like(theta), jnp.sin(theta))
    generic = (theta / (2.0 * safe_sin))[..., None] * w_vec
    # Small-angle branch: 0.5 * (1 + theta^2/6) * vee(R - R^T)
    small_branch = 0.5 * (1.0 + theta[..., None] ** 2 / 6.0) * w_vec
    # Near-pi branch: axis^2 from diagonal of (R + I)/2 = I + (1-cos) aa^T ...
    # (R + R^T)/2 = cos I + (1-cos) aa^T  =>  aa^T = (sym - cos I)/(1-cos)
    sym = 0.5 * (R + jnp.swapaxes(R, -1, -2))
    one_minus_cos = jnp.where(near_pi, 1.0 - cos_theta, jnp.ones_like(theta))
    aaT = (sym - cos_theta[..., None, None] * jnp.eye(3, dtype=R.dtype)) / (
        one_minus_cos[..., None, None]
    )
    axis_abs = jnp.sqrt(jnp.clip(jnp.stack(
        [aaT[..., 0, 0], aaT[..., 1, 1], aaT[..., 2, 2]], axis=-1), 0.0, 1.0))
    # Signs from the off-diagonal of aa^T relative to its largest component.
    idx = jnp.argmax(axis_abs, axis=-1)

    def signed_axis(aaT_, axis_abs_, idx_):
        col = jnp.take_along_axis(aaT_, idx_[..., None, None].repeat(3, axis=-2),
                                  axis=-1)[..., 0]
        denom = jnp.take_along_axis(axis_abs_, idx_[..., None], axis=-1)
        denom = jnp.where(denom < _EPS, jnp.ones_like(denom), denom)
        return col / denom

    axis = signed_axis(aaT, axis_abs, idx)
    norm = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    axis = axis / jnp.where(norm < _EPS, jnp.ones_like(norm), norm)
    pi_branch = theta[..., None] * axis

    out = jnp.where(small[..., None], small_branch,
                    jnp.where(near_pi[..., None], pi_branch, generic))
    return out


def _V_matrix(w: jax.Array) -> jax.Array:
    """Left-Jacobian V(w) = I + B W + C W^2 used by se3_exp."""
    theta_sq = jnp.sum(w * w, axis=-1)
    _, B, C = _sinc_coeffs(theta_sq)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + B[..., None, None] * W + C[..., None, None] * W2


def _V_inv_matrix(w: jax.Array) -> jax.Array:
    """Inverse left-Jacobian: V^-1 = I - W/2 + D W^2 with
    D = (1 - A/(2B)) / theta^2 (Taylor 1/12 at 0)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta_sq)
    small = theta_sq < _SINC_SMALL_SQ
    safe_sq = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    D = jnp.where(small, 1.0 / 12.0 + theta_sq / 720.0,
                  (1.0 - A / (2.0 * B)) / safe_sq)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + D[..., None, None] * W2


def inv_vecs_Xg_ig(w: jax.Array) -> jax.Array:
    """Inverse left SO(3) Jacobian H = inv(vecs_Xg_ig(w)) — public alias of
    ``_V_inv_matrix`` under the reference's name (lieutils.py:569-582).
    The reference computes eta = (1 - (t/2)/tan(t/2))/t^2 and forms
    I - W/2 + eta W^2; our D coefficient is the same function of theta
    expressed through the shared A/B sinc pair (identical Taylor head
    1/12 + t^2/720).  Used by SE3.Log (lieutils.py:715) = ``se3_log``."""
    return _V_inv_matrix(w)


def se3_exp(xi: jax.Array) -> jax.Array:
    """Twist [..., 6] (v, w ordering) -> SE(3) matrix [..., 4, 4]."""
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t = (_V_matrix(w) @ v[..., None])[..., 0]
    batch = xi.shape[:-1]
    T = jnp.zeros(batch + (4, 4), dtype=xi.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_log(T: jax.Array) -> jax.Array:
    """SE(3) matrix [..., 4, 4] -> twist [..., 6] (v, w ordering).

    This is the pose-error workhorse (reference eval.py:161-162 computes
    ``norm(SE3.Log(inv(pose_gt) @ pose))``; the twist norm is invariant to
    the (v, w) vs (w, v) ordering choice).
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    v = (_V_inv_matrix(w) @ t[..., None])[..., 0]
    return jnp.concatenate([v, w], axis=-1)


def se3_inverse(T: jax.Array) -> jax.Array:
    """Inverse of an SE(3) matrix without a general matrix solve."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(Rt @ t[..., None])[..., 0]
    batch = T.shape[:-2]
    out = jnp.zeros(batch + (4, 4), dtype=T.dtype)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(ti)
    out = out.at[..., 3, 3].set(1.0)
    return out


def pose_error(pose_gt: jax.Array, pose: jax.Array) -> jax.Array:
    """|| log(inv(pose_gt) @ pose) ||_2 — the reference's pose-error metric
    (eval.py:161-162)."""
    rel = se3_inverse(pose_gt) @ pose
    return jnp.linalg.norm(se3_log(rel), axis=-1)
