"""Differentiable tiled rasterizer: the public render() API.

The TPU counterpart of the reference render stack (renderer.cpp:21-88 →
GaussianRasterizerFunction (rasterizer.cpp:21-183) → CudaRasterizer forward/backward).
Composition (DESIGN.md §2):

  jnp preprocess (projection/EWA/SH — differentiated by JAX AD, replacing the
      hand-written backward.cu:138-376)
  → tile binning under stop_gradient (ops.tiles — sort-based, fixed budgets)
  → custom_vjp Pallas blend (ops.blend_pallas), whose backward produces per-entry
      gradients that are reduced per-Gaussian by an inverse-permutation gather +
      reshape-sum (atomic-free equivalent of backward.cu:585-595).

Unlike the reference, `use_trained_exposure` actually works: the reference accepts
the flag but never applies the exposure transform (renderer.cpp:25; SURVEY.md C22).
Here `apply_exposure=True` maps the rendered image through exposure[:, :3] @ rgb +
exposure[:, 3:].

Background color parity note: renderCUDA never composites bg (forward.cu:460-468
writes the accumulated color only), so neither do we; `bg` is accepted for API
compatibility and ignored, matching observable reference behavior.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_lic_tpu.camera import Camera
from gaussian_lic_tpu.ops import sh as sh_ops
from gaussian_lic_tpu.ops import tiles as tiles_ops
from gaussian_lic_tpu.ops.blend_pallas import (
    CHUNK,
    SUB,
    ROW_A,
    ROW_B,
    ROW_B2,
    ROW_C,
    ROW_G,
    ROW_OPA,
    ROW_R,
    ROW_X,
    ROW_Y,
    SPLAT_ROWS,
    blend_backward,
    blend_forward,
    unswizzle_tiles,
)
from gaussian_lic_tpu.ops.projection import OPACITY_THRESHOLD, project_gaussians
from gaussian_lic_tpu.ops.rasterize_ref import RenderOutput


def _splat_budget_for(capacity: int, cfg) -> int:
    """Sorted-splat-list budget: `splat_budget_factor` entries per Gaussian
    (measured live-entry count at 1M Gaussians / 32×32 tiles is ~1.4), CHUNK-
    aligned, capped by the per-Gaussian slot limit. Overflow past the budget is
    counted per step and the engine auto-grows the factor (see config.py)."""
    b = max(int(capacity * cfg.splat_budget_factor), 1 << 12)
    b = (b + CHUNK - 1) // CHUNK * CHUNK
    return min(b, capacity * cfg.max_tiles_per_gaussian)


class TiledRenderOutput(NamedTuple):
    image: jnp.ndarray      # (3, H, W)
    final_T: jnp.ndarray    # (H, W)
    n_contrib: jnp.ndarray  # (H, W) int32
    visible: jnp.ndarray    # (P,) bool — radii > 0
    radii: jnp.ndarray      # (P,)
    overflow: jnp.ndarray     # () int32 — total binning slots lost (monitoring)
    budget_lost: jnp.ndarray  # () int32 — lost to max_total_splats (growable)
    truncated: jnp.ndarray    # () int32 — lost to the K-slot rect limit


def _pack_rows(xy, conic, opacity, rgb):
    P = xy.shape[0]
    rows = jnp.zeros((P, SPLAT_ROWS), jnp.float32)
    rows = rows.at[:, ROW_X].set(xy[:, 0])
    rows = rows.at[:, ROW_Y].set(xy[:, 1])
    rows = rows.at[:, ROW_A].set(conic[:, 0])
    rows = rows.at[:, ROW_B].set(conic[:, 1])
    rows = rows.at[:, ROW_C].set(conic[:, 2])
    rows = rows.at[:, ROW_OPA].set(opacity)
    rows = rows.at[:, ROW_R].set(rgb[:, 0])
    rows = rows.at[:, ROW_G].set(rgb[:, 1])
    rows = rows.at[:, ROW_B2].set(rgb[:, 2])
    return rows


@functools.lru_cache(maxsize=32)
def _make_blend(n_tx: int, n_ty: int, tile_h: int, tile_w: int, max_total_splats: int,
                max_tiles_per_gaussian: int = 16, interpret=None):
    """custom_vjp blend closed over the static tile-grid configuration.

    The single differentiable primal is the packed per-Gaussian attribute table
    `rows` (P, SPLAT_ROWS) — x, y, conic A/B/C, opacity, r, g, b in the kernel
    row layout. The forward gathers the sorted splat list from it; the backward
    reduces per-entry kernel gradients back to a (P, SPLAT_ROWS) cotangent.
    Keeping the primal in row form lets the multi-chip step shard the table:
    AD's transpose of `lax.all_gather(rows)` is a psum_scatter, which routes
    each band's per-Gaussian gradient contributions back to the Gaussian's
    owner shard with no explicit collective code.

    `max_tiles_per_gaussian` bounds per-Gaussian run lengths in the sorted list
    (the backward's segmented scan needs log2 of it steps)."""
    M = max_total_splats
    K = max_tiles_per_gaussian

    def _fwd_impl(rows, sorted_gauss, tile_starts, tile_lens):
        # the gather places dead entries (sentinel id P) as zero rows → alpha 0
        # → in-kernel no-ops; the (M_pad//SUB, SUB·16) view is a free reshape
        # giving the kernels 128-lane DMA rows with no transposes
        splat_rows = jnp.take(rows, sorted_gauss, axis=0, mode="fill",
                              fill_value=0.0)
        m_pad = sorted_gauss.shape[0]
        splats = splat_rows.reshape(m_pad // SUB, SUB * SPLAT_ROWS)
        color, final_t, n_contrib = blend_forward(
            splats, tile_starts, tile_lens,
            n_tx=n_tx, n_ty=n_ty, tile_h=tile_h, tile_w=tile_w,
            interpret=interpret,
        )
        return color, final_t, n_contrib, splats

    @jax.custom_vjp
    def blend(rows, sorted_gauss, tile_starts, tile_lens, cnt):
        color, final_t, n_contrib, _ = _fwd_impl(
            rows, sorted_gauss, tile_starts, tile_lens
        )
        return color, final_t, n_contrib

    def blend_fwd(rows, sorted_gauss, tile_starts, tile_lens, cnt):
        color, final_t, n_contrib, splats = _fwd_impl(
            rows, sorted_gauss, tile_starts, tile_lens
        )
        res = (splats, sorted_gauss, tile_starts, tile_lens, final_t, n_contrib,
               cnt)
        return (color, final_t, n_contrib), res

    def blend_bwd(res, cotangents):
        splats, sorted_gauss, tile_starts, tile_lens, final_t, n_contrib, cnt = res
        d_color, _d_final_t, _d_ncontrib = cotangents
        # The reference backward likewise consumes only the image gradient
        # (PerGaussianRenderCUDA reads dL_dpixels only, backward.cu:529-536).
        entry_grads = blend_backward(
            splats, tile_starts, tile_lens,
            d_color, final_t, n_contrib,
            n_tx=n_tx, n_ty=n_ty, tile_h=tile_h, tile_w=tile_w,
            interpret=interpret,
        )  # (SPLAT_ROWS, M_pad), attribute-major
        m_pad = sorted_gauss.shape[0]
        P = cnt.shape[0]

        # Per-Gaussian reduction via carry-sort + segmented scan + one row
        # gather — gathers/scatters keyed per slot are 2.5-4× slower (PERF.md).
        # 1) group entries by Gaussian id (dead entries carry id P → sort last)
        outs = jax.lax.sort(
            (sorted_gauss,) + tuple(entry_grads[i] for i in range(9)), num_keys=1
        )
        skey, scols = outs[0], list(outs[1:])
        # 2) segmented inclusive scan (runs are ≤ K entries → log2(K) steps);
        #    each Gaussian's total lands on its run's last entry
        j = 1
        while j < K:
            same = jnp.concatenate(
                [jnp.zeros((j,), bool), skey[j:] == skey[:-j]]
            )
            for qi in range(9):
                shifted = jnp.concatenate(
                    [jnp.zeros((j,), jnp.float32), scols[qi][:-j]]
                )
                scols[qi] = scols[qi] + jnp.where(same, shifted, 0.0)
            j *= 2
        # 3) run lengths from binning (exact even under budget loss)
        off = jnp.cumsum(cnt) - cnt
        last = jnp.clip(off + cnt - 1, 0, m_pad - 1)
        stacked = jnp.stack(scols, axis=1)              # (M_pad, 9)
        g = jnp.take(stacked, last, axis=0, mode="clip")  # (P, 9)
        g = jnp.where((cnt > 0)[:, None], g, 0.0)
        # rows cotangent: the 9 gradient columns in kernel-row positions 0..8
        d_rows = jnp.pad(g, ((0, 0), (0, SPLAT_ROWS - 9)))

        def int_zero(x):
            return np.zeros(x.shape, jax.dtypes.float0)

        return (
            d_rows,
            int_zero(jnp.zeros(m_pad, jnp.int32)),
            int_zero(tile_starts),
            int_zero(tile_lens),
            int_zero(cnt),
        )

    blend.defvjp(blend_fwd, blend_bwd)
    return blend


def render_tiled(
    xyz: jnp.ndarray,         # (P,3)
    scale: jnp.ndarray,       # (P,3) activated
    quat: jnp.ndarray,        # (P,4)
    opacity: jnp.ndarray,     # (P,) activated
    camera: Camera,
    dc: Optional[jnp.ndarray] = None,
    sh_rest: Optional[jnp.ndarray] = None,
    sh_degree: int = 3,
    colors: Optional[jnp.ndarray] = None,
    active: Optional[jnp.ndarray] = None,    # (P,) bool, e.g. index < count
    exposure: Optional[jnp.ndarray] = None,  # (3,4); applied when apply_exposure
    apply_exposure: bool = False,
    no_color: bool = False,
    bg: Optional[jnp.ndarray] = None,        # accepted, ignored (parity)
    tile_h: int = 32,
    tile_w: int = 32,
    max_tiles_per_gaussian: int = 16,
    max_total_splats: int = 1 << 21,
    interpret=None,   # Pallas interpret override (None → by default backend)
) -> TiledRenderOutput:
    """Full differentiable render. Matches reference `render` outputs
    (renderer.cpp:81-87): image, final_T, (screenspace grads are implicit in JAX),
    visible, radii."""
    del bg
    intr = camera.intr
    grid = tiles_ops.TileGrid(
        width=intr.width, height=intr.height, tile_w=tile_w, tile_h=tile_h
    )

    proj = project_gaussians(xyz, scale, quat, camera)
    base_active = proj.in_front & proj.det_valid & (opacity >= OPACITY_THRESHOLD)
    if active is not None:
        base_active = base_active & active
    radius = jnp.where(base_active, proj.radius, 0.0)
    visible = radius > 0.0

    if no_color:
        rgb = jnp.zeros((xyz.shape[0], 3), jnp.float32)
    elif colors is not None:
        rgb = colors
    else:
        dirs = xyz - camera.cam_center
        rgb = sh_ops.eval_sh_color(sh_degree, dc, sh_rest, dirs)

    sg = jax.lax.stop_gradient
    binning = tiles_ops.bin_gaussians(
        sg(proj.xy), sg(proj.depth), sg(proj.conic), sg(opacity), sg(radius),
        base_active, grid,
        max_tiles_per_gaussian=max_tiles_per_gaussian,
        max_total_splats=max_total_splats,
        align=CHUNK,
    )
    # pack the per-Gaussian attribute table; the custom_vjp blend gathers the
    # sorted splat list from it and its backward returns the table's cotangent
    # directly (the _pack_rows transpose back to xy/conic/... is free slicing)
    rows = _pack_rows(proj.xy, proj.conic, opacity, rgb)

    if no_color:
        # alpha-only pass (extend(), gaussian.cpp:505-507) — no gradients needed
        splat_rows = jnp.take(
            sg(rows), binning.sorted_gauss, axis=0, mode="fill", fill_value=0.0
        )
        m_pad = binning.sorted_gauss.shape[0]
        splats = splat_rows.reshape(m_pad // SUB, SUB * SPLAT_ROWS)
        color_t, final_t_t, ncontrib_t = blend_forward(
            splats, binning.tile_starts, binning.tile_lens,
            n_tx=grid.n_tx, n_ty=grid.n_ty, tile_h=tile_h, tile_w=tile_w,
            no_color=True, interpret=interpret,
        )
    else:
        blend = _make_blend(grid.n_tx, grid.n_ty, tile_h, tile_w, max_total_splats,
                            max_tiles_per_gaussian, interpret)
        color_t, final_t_t, ncontrib_t = blend(
            rows, binning.sorted_gauss,
            binning.tile_starts, binning.tile_lens,
            binning.cnt,
        )
    # kernels are tile-major; map back to image space (differentiable reshapes,
    # so the loss cotangent arrives at the custom_vjp already tile-major)
    color_p = unswizzle_tiles(color_t, grid.n_tx, grid.n_ty, tile_h, tile_w)
    final_t_p = unswizzle_tiles(final_t_t, grid.n_tx, grid.n_ty, tile_h, tile_w)
    ncontrib_p = unswizzle_tiles(ncontrib_t, grid.n_tx, grid.n_ty, tile_h, tile_w)

    H, W = intr.height, intr.width
    image = color_p[:, :H, :W]
    final_t = final_t_p[:H, :W]
    n_contrib = ncontrib_p[:H, :W]

    if apply_exposure and exposure is not None:
        flat = image.reshape(3, -1)
        # precision=HIGHEST: the default bf16 MXU pass visibly quantizes the
        # exposure-mapped image (same failure class as the SSIM/projection
        # contractions — PERF.md "Numerics notes")
        image = (
            jnp.matmul(exposure[:, :3], flat,
                       precision=jax.lax.Precision.HIGHEST)
            + exposure[:, 3:]
        ).reshape(3, H, W)

    return TiledRenderOutput(
        image=image,
        final_T=final_t,
        n_contrib=n_contrib,
        visible=visible,
        radii=radius,
        overflow=binning.overflow,
        budget_lost=binning.budget_lost,
        truncated=binning.truncated,
    )


def render_map(
    gm,
    camera: Camera,
    *,
    apply_exposure: bool = False,
    no_color: bool = False,
    **kw,
) -> TiledRenderOutput:
    """Render a GaussianMap (activations + active-count mask applied)."""
    return render_tiled(
        gm.xyz,
        gm.scaling,
        gm.rotation,
        gm.opacity,
        camera,
        dc=gm.dc,
        sh_rest=gm.sh_rest,
        sh_degree=gm.sh_degree,
        active=gm.active_mask(),
        exposure=gm.exposure,
        apply_exposure=apply_exposure,
        no_color=no_color,
        **kw,
    )
