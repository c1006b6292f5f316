"""Dense reference renderer: O(P · pixels) pure-JAX 3DGS forward.

The permanent correctness oracle (SURVEY.md §4): differentiable by plain JAX AD,
CPU-runnable, no binning/Pallas. Reproduces renderCUDA's per-pixel blending semantics
(forward.cu:321-481) over *all* Gaussians in global front-to-back depth order:

  α      = min(0.99, opacity · exp(−q(d)))          forward.cu:436
  skip   if α < 1/255                               forward.cu:437
  stop   before applying a Gaussian if T·(1−α) < 1e-4  forward.cu:438-443
  C     += color · α · T;  T *= (1−α)               forward.cu:446-453
  out    = C (no background compositing — renderCUDA writes C only, forward.cu:460-468)

Differences vs the tiled path (documented, tolerance-tested): the tiled rasterizer
restricts each Gaussian to the tiles of its 3σ rect that pass exact culling
(forward.cu:151-230); the dense oracle evaluates everywhere. `box_cull=True` applies
the per-Gaussian radius box to approximate that footprint restriction.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gaussian_lic_tpu.camera import Camera
from gaussian_lic_tpu.ops import sh as sh_ops
from gaussian_lic_tpu.ops.projection import (
    OPACITY_THRESHOLD,
    ProjectionResult,
    project_gaussians,
)

ALPHA_CAP = 0.99          # forward.cu:436
T_EPS = 1e-4              # forward.cu:439


class RenderOutput(NamedTuple):
    image: jnp.ndarray      # (3, H, W) — CHW like the reference (forward.cu:467)
    final_T: jnp.ndarray    # (H, W)
    n_contrib: jnp.ndarray  # (H, W) int32, index of last applied Gaussian (1-based)
    visible: jnp.ndarray    # (P,) bool — radii > 0 (renderer.cpp:84-86)
    radii: jnp.ndarray      # (P,) float


def render_dense(
    xyz: jnp.ndarray,         # (P,3)
    scale: jnp.ndarray,       # (P,3) activated
    quat: jnp.ndarray,        # (P,4)
    opacity: jnp.ndarray,     # (P,) activated (sigmoid'd)
    camera: Camera,
    dc: Optional[jnp.ndarray] = None,        # (P,3) SH DC
    sh_rest: Optional[jnp.ndarray] = None,   # (P,M-1,3)
    sh_degree: int = 3,
    colors: Optional[jnp.ndarray] = None,    # (P,3) precomputed RGB (overrides SH)
    no_color: bool = False,   # alpha-only pass used by densification (gaussian.cpp:505-507)
    box_cull: bool = False,
    proj: Optional[ProjectionResult] = None,
) -> RenderOutput:
    """Render with the dense oracle. All Gaussians participate (no tiling)."""
    if proj is None:
        proj = project_gaussians(xyz, scale, quat, camera)
    intr = camera.intr
    H, W = intr.height, intr.width

    active = proj.in_front & proj.det_valid & (opacity >= OPACITY_THRESHOLD)
    radius = jnp.where(active, proj.radius, 0.0)
    visible = radius > 0.0

    # Global front-to-back order (the tiled path orders per tile by the same depth key).
    order = jnp.argsort(proj.depth)
    xy_s = proj.xy[order]
    conic_s = proj.conic[order]
    opa_s = jnp.where(visible, opacity, 0.0)[order]
    rad_s = radius[order]

    if no_color:
        rgb_s = jnp.zeros((xyz.shape[0], 3), jnp.float32)
    elif colors is not None:
        rgb_s = colors[order]
    else:
        dirs = xyz - camera.cam_center
        rgb = sh_ops.eval_sh_color(sh_degree, dc, sh_rest, dirs)
        rgb_s = rgb[order]

    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys)  # (H, W)

    def per_gaussian_alpha(xy, conic, opa, rad):
        dx = xy[0] - px
        dy = xy[1] - py
        power = -0.5 * (conic[0] * dx * dx + conic[2] * dy * dy) - conic[1] * dx * dy
        alpha = jnp.minimum(ALPHA_CAP, opa * jnp.exp(power))
        alpha = jnp.where(power > 0.0, 0.0, alpha)           # forward.cu:431
        alpha = jnp.where(alpha < OPACITY_THRESHOLD, 0.0, alpha)  # forward.cu:437
        if box_cull:
            inside = (jnp.abs(dx) <= rad) & (jnp.abs(dy) <= rad)
            alpha = jnp.where(inside, alpha, 0.0)
        return alpha

    # (P, H, W) alpha maps. Memory O(P·H·W): oracle is for small scenes only.
    alphas = jax.vmap(per_gaussian_alpha)(xy_s, conic_s, opa_s, rad_s)

    # Early-termination emulation (forward.cu:438-443): T before each Gaussian,
    # a contributing Gaussian whose application would push T below 1e-4 is dropped
    # along with everything behind it.
    t_factors = 1.0 - alphas
    T_excl = jnp.concatenate(
        [jnp.ones_like(t_factors[:1]), jnp.cumprod(t_factors, axis=0)[:-1]], axis=0
    )
    trigger = (alphas > 0.0) & (T_excl * t_factors < T_EPS)
    dead = jnp.cumsum(trigger.astype(jnp.int32), axis=0) > 0
    alphas = jnp.where(dead, 0.0, alphas)

    t_factors = 1.0 - alphas
    T_excl = jnp.concatenate(
        [jnp.ones_like(t_factors[:1]), jnp.cumprod(t_factors, axis=0)[:-1]], axis=0
    )
    weights = alphas * T_excl  # (P, H, W)
    final_T = jnp.prod(t_factors, axis=0)

    if no_color:
        image = jnp.zeros((3, H, W), jnp.float32)
        n_contrib = jnp.zeros((H, W), jnp.int32)
    else:
        image = jnp.einsum("phw,pc->chw", weights, rgb_s)
        idx = jnp.arange(alphas.shape[0], dtype=jnp.int32)[:, None, None] + 1
        n_contrib = jnp.max(jnp.where(alphas > 0.0, idx, 0), axis=0)

    return RenderOutput(
        image=image,
        final_T=final_T,
        n_contrib=n_contrib,
        visible=visible,
        radii=radius,
    )
