"""Sparse visibility-masked Adam.

Parity with adamUpdateCUDA (adam.cu:9-38) / SparseGaussianAdam (optim_utils.h:69-142):
  * update only where the Gaussian was visible in the last render (radii > 0)
  * NO bias correction (adam.cu:30-34)
  * param += −lr · m / (√v + eps), eps = 1e-15, betas (0.9, 0.999)

On TPU this is a jnp.where inside the jitted train step — the masked lanes cost
nothing extra and XLA fuses the whole update into the backward pass.

Per-group learning rates follow trainingSetup (gaussian.cpp:399-424): xyz, dc, rest
(feature_lr/20), opacity, scaling, rotation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

BETA1 = 0.9
BETA2 = 0.999
EPS = 1e-15  # gaussian.cpp:401


class AdamState(NamedTuple):
    """First/second moments, one pytree mirroring the param pytree."""

    exp_avg: jnp.ndarray
    exp_avg_sq: jnp.ndarray


def init_state(params) -> "jax.tree_util.PyTreeDef":
    return jax.tree_util.tree_map(
        lambda p: AdamState(jnp.zeros_like(p), jnp.zeros_like(p)), params
    )


def sparse_adam_update(
    param: jnp.ndarray,
    grad: jnp.ndarray,
    state: AdamState,
    visible: jnp.ndarray,  # (P,) bool mask over the leading axis
    lr: float,
    b1: float = BETA1,
    b2: float = BETA2,
    eps: float = EPS,
):
    """One masked Adam step on a single (P, ...) tensor. Returns (param, state)."""
    mask = visible.reshape((-1,) + (1,) * (param.ndim - 1))
    m = b1 * state.exp_avg + (1.0 - b1) * grad
    v = b2 * state.exp_avg_sq + (1.0 - b2) * grad * grad
    step = -lr * m / (jnp.sqrt(v) + eps)
    new_param = jnp.where(mask, param + step, param)
    new_m = jnp.where(mask, m, state.exp_avg)
    new_v = jnp.where(mask, v, state.exp_avg_sq)
    return new_param, AdamState(new_m, new_v)


def dense_adam_update(
    param: jnp.ndarray,
    grad: jnp.ndarray,
    state: AdamState,
    lr: float,
    b1: float = BETA1,
    b2: float = BETA2,
    eps: float = 1e-8,
    step_count: jnp.ndarray | None = None,
):
    """Standard (bias-corrected) Adam for the exposure params (torch::optim::Adam,
    gaussian.cpp:419-423). step_count is the 1-based step index."""
    m = b1 * state.exp_avg + (1.0 - b1) * grad
    v = b2 * state.exp_avg_sq + (1.0 - b2) * grad * grad
    if step_count is None:
        mh, vh = m, v
    else:
        t = step_count.astype(jnp.float32)
        mh = m / (1.0 - b1**t)
        vh = v / (1.0 - b2**t)
    new_param = param - lr * mh / (jnp.sqrt(vh) + eps)
    return new_param, AdamState(m, v)
