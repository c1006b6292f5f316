"""Pallas tile-blending kernels: the TPU equivalents of renderCUDA
(forward.cu:321-481) and PerGaussianRenderCUDA (backward.cu:379-597).

Design (DESIGN.md §2): one grid program per image tile of (tile_h, tile_w) =
(8, 128) pixels — the native f32 VPU register tile — which walks its slice of the
depth-sorted splat list in fixed-size chunks, DMA'd HBM→VMEM, and alpha-blends
front-to-back vectorized over all 1024 pixels at once. Splat entries are packed
rows of a (M, 16) f32 array (x, y, conic A/B/C, opacity, r, g, b).

Forward parity targets: α = min(0.99, opa·exp(power)); skip α < 1/255 or power > 0;
prospective termination T·(1−α) < 1e-4 marks the pixel done *without* applying the
splat (forward.cu:431-443); outputs color, final_T, n_contrib (1-based index of the
last applied splat, counting every splat in the tile's range).

Backward: back-to-front walk reconstructing the per-pixel transmittance by division
from final_T (the Inria scheme — no warp shuffles, no checkpointed buckets, no
atomics; per-entry gradients are written to disjoint slices and reduced per-Gaussian
outside by a dense gather+sum, replacing backward.cu:585-595's atomicAdd).
Gradient conventions: true ∂power/∂conic = (−dx²/2, −dx·dy, −dy²/2) (the CUDA code
folds a factor-2 bookkeeping between kernels; we keep exact math since JAX AD chains
the conic→cov2D→cov3D backward), and — reference parity — the α = 0.99 cap is NOT
masked in the gradient (backward.cu:553 uses dL_dG = con_o.w·dL_dα unconditionally).

Grid iteration must be sequential ("arbitrary" dimension semantics): a tile's final
chunk writes a full CH-row slice whose tail overlaps the next tile's range; the next
program deterministically overwrites it (single-core v5e; no megacore races).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_lic_tpu.ops.rasterize_ref import ALPHA_CAP, T_EPS
from gaussian_lic_tpu.ops.projection import OPACITY_THRESHOLD

# Packed splat row layout (16 f32 per entry; 16-row alignment keeps DMA simple).
ROW_X, ROW_Y, ROW_A, ROW_B, ROW_C, ROW_OPA, ROW_R, ROW_G, ROW_B2 = range(9)
SPLAT_ROWS = 16
# Backward per-entry gradient row layout.
GROW_X, GROW_Y, GROW_A, GROW_B, GROW_C, GROW_OPA, GROW_R, GROW_G, GROW_B2 = range(9)

CHUNK = 256          # splat entries per DMA
SUB = 8              # splats per unrolled inner step


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pixel_coords(t, n_tx: int, tile_h: int, tile_w: int):
    ty = t // n_tx
    tx = t % n_tx
    py = (ty * tile_h + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)).astype(
        jnp.float32
    )
    px = (tx * tile_w + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)).astype(
        jnp.float32
    )
    return px, py


def _splat_scalars(buf, idx, no_color: bool):
    x = buf[idx, ROW_X]
    y = buf[idx, ROW_Y]
    A = buf[idx, ROW_A]
    B = buf[idx, ROW_B]
    C = buf[idx, ROW_C]
    opa = buf[idx, ROW_OPA]
    if no_color:
        return x, y, A, B, C, opa, None, None, None
    return x, y, A, B, C, opa, buf[idx, ROW_R], buf[idx, ROW_G], buf[idx, ROW_B2]


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _forward_kernel(
    # scalar prefetch
    starts_ref, lens_ref,
    # inputs
    splats_ref,                 # (SPLAT_ROWS, M_pad) f32 in HBM/ANY, attribute-major
    # outputs (blocked per tile)
    color_ref,                  # (3, th, tw)
    final_t_ref,                # (th, tw)
    ncontrib_ref,               # (th, tw) int32
    # scratch
    dbuf, buf, sem,
    *, n_tx: int, tile_h: int, tile_w: int, no_color: bool,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    length = lens_ref[t]
    px, py = _pixel_coords(t, n_tx, tile_h, tile_w)

    shape = (tile_h, tile_w)
    T0 = jnp.ones(shape, jnp.float32)
    C0r = jnp.zeros(shape, jnp.float32)
    C0g = jnp.zeros(shape, jnp.float32)
    C0b = jnp.zeros(shape, jnp.float32)
    # done carried as f32 (Mosaic cannot carry (8,128) i1 vectors through scf.for)
    done0 = jnp.zeros(shape, jnp.float32)
    last0 = jnp.zeros(shape, jnp.int32)

    n_chunks = pl.cdiv(length, CHUNK)

    def chunk_body(ci, carry):
        T, Cr, Cg, Cb, done, last = carry
        # start is CHUNK-aligned (ops.tiles); multiple_of makes it provable
        chunk_start = pl.multiple_of(start + ci * CHUNK, CHUNK)
        copy = pltpu.make_async_copy(
            splats_ref.at[:, pl.ds(chunk_start, CHUNK)], dbuf, sem
        )
        copy.start()
        copy.wait()
        # row-major view for per-splat dynamic-sublane scalar reads
        buf[:, :] = dbuf[:, :].T
        remaining = length - ci * CHUNK  # entries of this chunk inside the range

        def splat_step(j, c):
            T, Cr, Cg, Cb, done, last = c
            x, y, A, B, Cc, opa, r, g, b = _splat_scalars(buf, j, no_color)
            in_range = j < remaining
            dx = x - px
            dy = y - py
            power = -0.5 * (A * dx * dx + Cc * dy * dy) - B * dx * dy
            alpha = jnp.minimum(ALPHA_CAP, opa * jnp.exp(power))
            contrib = (alpha >= OPACITY_THRESHOLD) & (power <= 0.0) & in_range
            test_T = T * (1.0 - alpha)
            would_term = contrib & (test_T < T_EPS)
            applied = contrib & (done < 0.5) & jnp.logical_not(would_term)
            done = jnp.maximum(done, would_term.astype(jnp.float32))
            w = jnp.where(applied, alpha * T, 0.0)
            if not no_color:
                Cr = Cr + w * r
                Cg = Cg + w * g
                Cb = Cb + w * b
                pos = ci * CHUNK + j + 1  # 1-based contributor index
                last = jnp.where(applied, pos, last)
            T = jnp.where(applied, test_T, T)
            return (T, Cr, Cg, Cb, done, last)

        def process(c):
            return jax.lax.fori_loop(0, CHUNK, splat_step, c)

        all_done = jnp.min(done) > 0.5
        return jax.lax.cond(all_done, lambda c: c, process, (T, Cr, Cg, Cb, done, last))

    T, Cr, Cg, Cb, done, last = jax.lax.fori_loop(
        0, n_chunks, chunk_body, (T0, C0r, C0g, C0b, done0, last0)
    )

    final_t_ref[:, :] = T
    if not no_color:
        color_ref[0, :, :] = Cr
        color_ref[1, :, :] = Cg
        color_ref[2, :, :] = Cb
        ncontrib_ref[:, :] = last
    else:
        color_ref[0, :, :] = jnp.zeros(shape, jnp.float32)
        color_ref[1, :, :] = jnp.zeros(shape, jnp.float32)
        color_ref[2, :, :] = jnp.zeros(shape, jnp.float32)
        ncontrib_ref[:, :] = jnp.zeros(shape, jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("n_tx", "n_ty", "tile_h", "tile_w", "no_color"),
)
def blend_forward(
    splats: jnp.ndarray,       # (SPLAT_ROWS, M_pad) f32 packed sorted splats
    tile_starts: jnp.ndarray,  # (T,) int32 — CHUNK-aligned
    tile_lens: jnp.ndarray,    # (T,) int32
    *,
    n_tx: int,
    n_ty: int,
    tile_h: int = 8,
    tile_w: int = 128,
    no_color: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (color (3, Hp, Wp), final_T (Hp, Wp), n_contrib (Hp, Wp) int32)."""
    T = n_tx * n_ty
    Hp, Wp = n_ty * tile_h, n_tx * tile_w
    kernel = functools.partial(
        _forward_kernel, n_tx=n_tx, tile_h=tile_h, tile_w=tile_w, no_color=no_color
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(
                (3, tile_h, tile_w),
                lambda t, *_: (0, t // n_tx, t % n_tx),
            ),
            pl.BlockSpec((tile_h, tile_w), lambda t, *_: (t // n_tx, t % n_tx)),
            pl.BlockSpec((tile_h, tile_w), lambda t, *_: (t // n_tx, t % n_tx)),
        ],
        scratch_shapes=[
            pltpu.VMEM((SPLAT_ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((CHUNK, SPLAT_ROWS), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    color, final_t, n_contrib = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((3, Hp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(tile_starts, tile_lens, splats)
    return color, final_t, n_contrib


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _backward_kernel(
    # scalar prefetch
    starts_ref, lens_ref,
    # inputs
    splats_ref,                 # (SPLAT_ROWS, M_pad) ANY, attribute-major
    dl_dcolor_ref,              # (3, th, tw) block
    final_t_ref,                # (th, tw) block
    ncontrib_ref,               # (th, tw) int32 block
    # outputs
    grads_ref,                  # (SPLAT_ROWS, M_pad) ANY — per-entry grads
    # scratch
    dbuf, buf, gbuf, tbuf, sem_in, sem_out,
    *, n_tx: int, tile_h: int, tile_w: int,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    length = lens_ref[t]
    px, py = _pixel_coords(t, n_tx, tile_h, tile_w)

    dlr = dl_dcolor_ref[0, :, :]
    dlg = dl_dcolor_ref[1, :, :]
    dlb = dl_dcolor_ref[2, :, :]
    ncontrib = ncontrib_ref[:, :]

    T_init = final_t_ref[:, :]
    S0r = jnp.zeros((tile_h, tile_w), jnp.float32)

    n_chunks = pl.cdiv(length, CHUNK)

    def chunk_body(r, carry):
        T_run, Sr, Sg, Sb = carry
        ci = n_chunks - 1 - r
        chunk_start = pl.multiple_of(start + ci * CHUNK, CHUNK)
        copy = pltpu.make_async_copy(
            splats_ref.at[:, pl.ds(chunk_start, CHUNK)], dbuf, sem_in
        )
        copy.start()
        copy.wait()
        buf[:, :] = dbuf[:, :].T
        remaining = length - ci * CHUNK

        def splat_step(jr, c):
            T_run, Sr, Sg, Sb = c
            j = CHUNK - 1 - jr
            x, y, A, B, Cc, opa, rr, gg, bb = _splat_scalars(buf, j, False)
            in_range = j < remaining
            dx = x - px
            dy = y - py
            power = -0.5 * (A * dx * dx + Cc * dy * dy) - B * dx * dy
            G = jnp.exp(power)
            alpha = jnp.minimum(ALPHA_CAP, opa * G)
            pos = ci * CHUNK + j + 1
            applied = (
                (alpha >= OPACITY_THRESHOLD)
                & (power <= 0.0)
                & in_range
                & (pos <= ncontrib)
            )
            one_minus = 1.0 - alpha
            # reconstruct T before this splat (Inria backward walk)
            T_run = jnp.where(applied, T_run / one_minus, T_run)
            w = alpha * T_run
            # per-pixel dL/dalpha = Σc (c·T − S_c/(1−α))·dL_dpix_c
            dalpha = (
                (rr * T_run - Sr / one_minus) * dlr
                + (gg * T_run - Sg / one_minus) * dlg
                + (bb * T_run - Sb / one_minus) * dlb
            )
            dalpha = jnp.where(applied, dalpha, 0.0)
            wsel = jnp.where(applied, w, 0.0)
            # color gradients
            d_r = jnp.sum(wsel * dlr)
            d_g = jnp.sum(wsel * dlg)
            d_b = jnp.sum(wsel * dlb)
            # dα→(opacity, position, conic); α-cap not masked (reference parity)
            dG_coeff = opa * dalpha
            d_opa = jnp.sum(G * dalpha)
            gd = G * dG_coeff
            d_x = jnp.sum(gd * (-(A * dx + B * dy)))
            d_y = jnp.sum(gd * (-(Cc * dy + B * dx)))
            d_A = jnp.sum(gd * (-0.5 * dx * dx))
            d_B = jnp.sum(gd * (-dx * dy))
            d_C = jnp.sum(gd * (-0.5 * dy * dy))
            # update suffix color and store the row
            Sr = Sr + wsel * rr
            Sg = Sg + wsel * gg
            Sb = Sb + wsel * bb
            # stacked-scalar row store (scatter/.at[].set does not lower in Mosaic;
            # a (1,16) vector store at a dynamic sublane does)
            zero = jnp.float32(0.0)
            row = jnp.stack(
                [d_x, d_y, d_A, d_B, d_C, d_opa, d_r, d_g, d_b,
                 zero, zero, zero, zero, zero, zero, zero]
            )
            gbuf[pl.ds(j, 1), :] = row[None, :]
            return (T_run, Sr, Sg, Sb)

        carry = jax.lax.fori_loop(0, CHUNK, splat_step, (T_run, Sr, Sg, Sb))

        tbuf[:, :] = gbuf[:, :].T
        out_copy = pltpu.make_async_copy(
            tbuf, grads_ref.at[:, pl.ds(chunk_start, CHUNK)], sem_out
        )
        out_copy.start()
        out_copy.wait()
        return carry

    jax.lax.fori_loop(0, n_chunks, chunk_body, (T_init, S0r, S0r, S0r))


@functools.partial(
    jax.jit,
    static_argnames=("n_tx", "n_ty", "tile_h", "tile_w"),
)
def blend_backward(
    splats: jnp.ndarray,       # (SPLAT_ROWS, M_pad)
    tile_starts: jnp.ndarray,
    tile_lens: jnp.ndarray,
    dl_dcolor: jnp.ndarray,    # (3, Hp, Wp)
    final_t: jnp.ndarray,      # (Hp, Wp)
    n_contrib: jnp.ndarray,    # (Hp, Wp) int32
    *,
    n_tx: int,
    n_ty: int,
    tile_h: int = 8,
    tile_w: int = 128,
) -> jnp.ndarray:
    """Returns per-entry gradients (SPLAT_ROWS, M_pad)."""
    T = n_tx * n_ty
    kernel = functools.partial(
        _backward_kernel, n_tx=n_tx, tile_h=tile_h, tile_w=tile_w
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, tile_h, tile_w), lambda t, *_: (0, t // n_tx, t % n_tx)),
            pl.BlockSpec((tile_h, tile_w), lambda t, *_: (t // n_tx, t % n_tx)),
            pl.BlockSpec((tile_h, tile_w), lambda t, *_: (t // n_tx, t % n_tx)),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((SPLAT_ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((CHUNK, SPLAT_ROWS), jnp.float32),
            pltpu.VMEM((CHUNK, SPLAT_ROWS), jnp.float32),
            pltpu.VMEM((SPLAT_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    grads = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(splats.shape, jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(tile_starts, tile_lens, splats, dl_dcolor, final_t, n_contrib)[0]
    return grads
