"""Effective-rank (anti-needle) regularizer on Gaussian scales.

Reference parity: the CUDA backward adds this term directly to the scale
gradients when lambda_erank > 0 (backward.cu:355-376, the Taming-3DGS /
erank-regularization recipe):

  S      = s1² + s2² + s3²
  q_i    = s_i / S
  erank  = exp(−Σ q_i·log q_i)
  gated on −log(erank − 1 + 1e-5) > 0  (i.e. erank < 2):
    dq_i   = erank/(erank − 1 + 1e-5) · (−log q_i − 1)
    g_1    = λ·2/S²·s1·( dq_1·(s2²+s3²) − dq_2·s2² − dq_3·s3²)
    g_2    = λ·2/S²·s2·(−dq_1·s1² + dq_2·(s1²+s3²) − dq_3·s3²)
    g_3    = λ·2/S²·s3·(−dq_1·s1² − dq_2·s2² + dq_3·(s1²+s2²))
  plus an unconditional +1 on the s3 (z-scale) gradient.

The reference never materializes the corresponding loss value — the term exists
only as a hand-written gradient — so we express it as a zero-valued
`jax.custom_vjp` whose backward injects exactly this gradient into the scale
cotangent. The reference applies it inside the visibility-gated preprocess
backward and the sparse Adam masks invisible Gaussians anyway; we mirror that
by letting the (visible-masked) optimizer drop the padding lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-5


def _erank_scale_grad(scale: jnp.ndarray) -> jnp.ndarray:
    """The reference's per-Gaussian addition to dL/dscale, WITHOUT lambda
    (folded in by the caller) but WITH the unconditional +1 on z."""
    s1, s2, s3 = scale[:, 0], scale[:, 1], scale[:, 2]
    s1s1, s2s2, s3s3 = s1 * s1, s2 * s2, s3 * s3
    S = s1s1 + s2s2 + s3s3
    safe_S = jnp.maximum(S, 1e-20)
    q1 = jnp.clip(s1 / safe_S, 1e-20, None)
    q2 = jnp.clip(s2 / safe_S, 1e-20, None)
    q3 = jnp.clip(s3 / safe_S, 1e-20, None)
    erank = jnp.exp(-(q1 * jnp.log(q1) + q2 * jnp.log(q2) + q3 * jnp.log(q3)))
    # reference gate: −log(erank−1+ε) > 0. The q_i are NOT normalized (s/Σs²),
    # so erank < 1 happens; there the CUDA log returns NaN and the comparison
    # is false — i.e. the gate is open only for 1−ε < erank < 2−ε.
    arg = erank - 1.0 + _EPS
    gate = (arg > 0.0) & (arg < 1.0)
    coeff = erank / (erank - 1.0 + _EPS)
    dq1 = coeff * (-jnp.log(q1) - 1.0)
    dq2 = coeff * (-jnp.log(q2) - 1.0)
    dq3 = coeff * (-jnp.log(q3) - 1.0)
    lam_ = 2.0 / (safe_S * safe_S)
    g1 = lam_ * s1 * (dq1 * (s2s2 + s3s3) - dq2 * s2s2 - dq3 * s3s3)
    g2 = lam_ * s2 * (-dq1 * s1s1 + dq2 * (s1s1 + s3s3) - dq3 * s3s3)
    g3 = lam_ * s3 * (-dq1 * s1s1 - dq2 * s2s2 + dq3 * (s1s1 + s2s2))
    g = jnp.stack([g1, g2, g3], axis=1)
    g = jnp.where(gate[:, None], g, 0.0)
    return g


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def erank_regularizer(scale: jnp.ndarray, lambda_erank: float) -> jnp.ndarray:
    """Zero-valued term injecting the reference's erank gradient into `scale`
    (activated (P,3) scales). Add its result to the training loss."""
    return jnp.zeros((), jnp.float32)


def _fwd(scale, lambda_erank):
    return jnp.zeros((), jnp.float32), scale


def _bwd(lambda_erank, scale, ct):
    g = lambda_erank * _erank_scale_grad(scale)
    g = g.at[:, 2].add(1.0)  # unconditional +1 on the z-scale gradient
    return (ct * g,)


erank_regularizer.defvjp(_fwd, _bwd)
