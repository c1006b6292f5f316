"""Pallas tile-blending kernels: the TPU equivalents of renderCUDA
(forward.cu:321-481) and PerGaussianRenderCUDA (backward.cu:379-597).

Design (DESIGN.md §2, PERF.md): one grid program per image tile of
(tile_h, tile_w) = (8, 128) pixels — the native f32 VPU register tile — which
walks its slice of the depth-sorted splat list in CHUNK-entry windows and
alpha-blends front-to-back vectorized over all 1024 pixels at once.

Memory layout (Mosaic constraints, measured on v5e):
  * Splat entries live attribute-major in HBM as (SPLAT_ROWS, M_pad) f32 —
    DMA slices need 128-multiple lane widths and provably aligned offsets.
  * Tile ranges are NOT re-laid out to chunk boundaries (that pass cost more
    than the binning sorts): each tile walks the globally chunk-aligned windows
    [⌊start/CHUNK⌋·CHUNK, …) overlapping its range and masks entries outside
    [start, start+len). Chunks shared between adjacent tiles are processed by
    both, masked disjointly.
  * Per-splat attributes are DMA'd into SMEM and read as scalar loads that run
    on the scalar core concurrently with the VPU. Measured alternatives
    (PERF.md round-3 kernel hunt): vector-register lane extracts from a VMEM
    copy burn ~1.8 VPU cycles per value — the 9 extracts per splat were the
    forward kernel's single largest cost (38.4 → 25.6 ms moving them to SMEM,
    bit-identical); dynamic per-splat scalar VMEM loads were worse still
    (3.8× slower forward).

Forward parity targets: α = min(0.99, opa·exp(power)); skip α < 1/255 or
power > 0; prospective termination T·(1−α) < 1e-4 marks the pixel done
*without* applying the splat (forward.cu:431-443); outputs color, final_T,
n_contrib (1-based index of the last applied splat within the tile's range).

Backward: back-to-front walk reconstructing per-pixel transmittance by division
from final_T (the Inria scheme — no warp shuffles, no atomics). Per-splat
sublane reductions run as VPU shift trees (an MXU ones-dot is faster only at
bf16 precision, whose rounding corrupts the gradients — see the in-kernel
note); splat/gradient DMAs are double-buffered with write-back overlap
(−3.3 ms, bit-identical). Per-entry gradients are ACCUMULATED into a
caller-zeroed (SPLAT_ROWS, M_pad) buffer
(input/output aliased): the sequential grid serializes read-modify-write on
chunks shared between tiles, and the walk is bounded by max(n_contrib) per tile
— entries past every pixel's last contributor have zero gradient and are never
touched. Per-Gaussian reduction happens outside via an inverse-permutation
gather + reshape-sum (replacing backward.cu:585-595's atomicAdd).

Gradient conventions: true ∂power/∂conic = (−dx²/2, −dx·dy, −dy²/2) (the CUDA
code folds a factor-2 bookkeeping between kernels; we keep exact math since JAX
AD chains the conic→cov2D→cov3D backward), and — reference parity — the α=0.99
cap is NOT masked in the gradient (backward.cu:553).

Grid iteration must be sequential ("arbitrary" dimension semantics): adjacent
tiles read-modify-write shared boundary chunks of the gradient buffer.
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

# Packed splat row layout (16 f32 per entry).
ROW_X, ROW_Y, ROW_A, ROW_B, ROW_C, ROW_OPA, ROW_R, ROW_G, ROW_B2 = range(9)
SPLAT_ROWS = 16
# Backward per-entry gradient row layout (same positions).
GROW_X, GROW_Y, GROW_A, GROW_B, GROW_C, GROW_OPA, GROW_R, GROW_G, GROW_B2 = range(9)

CHUNK = 256          # splat entries per DMA window
SUB = 32             # splats per vector-loaded block
VREG_H, VREG_W = 8, 128   # native f32 vreg tile; every tile holds 1024 pixels
TILE_PIX = VREG_H * VREG_W


def _interpret(override=None) -> bool:
    """Interpret-mode decision for the Pallas calls. Callers that know the
    target devices (e.g. a CPU shard_map mesh on a TPU-default host) pass the
    decision explicitly; the default keys on the process default backend."""
    if override is not None:
        return bool(override)
    return jax.default_backend() == "cpu"


def _pixel_coords(t, n_tx: int, tile_h: int, tile_w: int):
    """Image coordinates of the (VREG_H, VREG_W) register tile for image tile t.

    The 1024 pixels of an image tile of any aspect (tile_h·tile_w = 1024) are
    laid out row-major across the (8, 128) vreg: flat = sublane·128 + lane,
    pixel = (flat // tile_w, flat % tile_w). Square 32×32 tiles cut the splat
    list ~25% vs 8×128 strips (a splat's bounding rect meets fewer squares),
    while every in-kernel op stays on the native (8, 128) f32 vreg. With
    (tile_h, tile_w) = (8, 128) this reduces to the identity strip mapping.
    """
    ty = t // n_tx
    tx = t % n_tx
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (VREG_H, VREG_W), 0) * VREG_W
        + jax.lax.broadcasted_iota(jnp.int32, (VREG_H, VREG_W), 1)
    )
    py = (ty * tile_h + flat // tile_w).astype(jnp.float32)
    px = (tx * tile_w + flat % tile_w).astype(jnp.float32)
    return px, py


def swizzle_tiles(img: jnp.ndarray, n_tx: int, n_ty: int, tile_h: int, tile_w: int):
    """(..., n_ty·tile_h, n_tx·tile_w) → tile-major (..., T, VREG_H, VREG_W)."""
    lead = img.shape[:-2]
    x = img.reshape(*lead, n_ty, tile_h, n_tx, tile_w)
    x = jnp.moveaxis(x, -2, -3)
    return x.reshape(*lead, n_ty * n_tx, VREG_H, VREG_W)


def unswizzle_tiles(tiles: jnp.ndarray, n_tx: int, n_ty: int, tile_h: int, tile_w: int):
    """Tile-major (..., T, VREG_H, VREG_W) → image (..., n_ty·tile_h, n_tx·tile_w)."""
    lead = tiles.shape[:-3]
    x = tiles.reshape(*lead, n_ty, n_tx, tile_h, tile_w)
    x = jnp.moveaxis(x, -3, -2)
    return x.reshape(*lead, n_ty * tile_h, n_tx * tile_w)


def _splat_attrs(load, no_color: bool):
    """Per-splat attributes via the caller's scalar SMEM `load(field)` —
    splat s of a packed group row lives at lanes [s·16, s·16+16). Scalar SMEM
    loads run on the scalar core concurrently with the VPU and broadcast for
    free into vector arithmetic; vector-register lane extracts from a VMEM
    copy of the same rows cost ~1.8 VPU cycles per value and were the forward
    kernel's largest single cost (PERF.md round-3 kernel hunt)."""
    if no_color:
        return (load(ROW_X), load(ROW_Y), load(ROW_A), load(ROW_B),
                load(ROW_C), load(ROW_OPA), None, None, None)
    return (load(ROW_X), load(ROW_Y), load(ROW_A), load(ROW_B), load(ROW_C),
            load(ROW_OPA), load(ROW_R), load(ROW_G), load(ROW_B2))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _forward_kernel(
    # scalar prefetch
    starts_ref, lens_ref,
    # inputs
    splats_ref,                 # (M_pad//SUB, SUB*16) f32 in HBM/ANY, packed rows
    # outputs (tile-major, one (VREG_H, VREG_W) register tile per image tile)
    color_ref,                  # (3, 1, VREG_H, VREG_W)
    final_t_ref,                # (1, VREG_H, VREG_W)
    ncontrib_ref,               # (1, VREG_H, VREG_W) int32
    # scratch
    dbuf, sem,
    *, n_tx: int, tile_h: int, tile_w: int, no_color: bool,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    length = lens_ref[t]
    px, py = _pixel_coords(t, n_tx, tile_h, tile_w)

    shape = (VREG_H, VREG_W)
    T0 = jnp.ones(shape, jnp.float32)
    C0r = jnp.zeros(shape, jnp.float32)
    C0g = jnp.zeros(shape, jnp.float32)
    C0b = jnp.zeros(shape, jnp.float32)
    # done carried as f32 (Mosaic cannot carry (8,128) i1 vectors through scf.for)
    done0 = jnp.zeros(shape, jnp.float32)
    last0 = jnp.zeros(shape, jnp.int32)

    c0 = start // CHUNK
    n_chunks = pl.cdiv(start + length, CHUNK) - c0

    rows_per_chunk = CHUNK // SUB

    def dma(ci, slot):
        row_start = (c0 + ci) * rows_per_chunk
        return pltpu.make_async_copy(
            splats_ref.at[pl.ds(row_start, rows_per_chunk), :],
            dbuf.at[slot], sem.at[slot],
        )

    # double-buffered: prefetch chunk ci+1 while blending chunk ci
    @pl.when(n_chunks > 0)
    def _prologue():
        dma(0, 0).start()

    def chunk_body(ci, carry):
        T, Cr, Cg, Cb, done, last = carry
        slot = jax.lax.rem(ci, 2)
        chunk_start = pl.multiple_of((c0 + ci) * CHUNK, CHUNK)
        dma(ci, slot).wait()

        @pl.when(ci + 1 < n_chunks)
        def _prefetch():
            dma(ci + 1, 1 - slot).start()

        lo = start - chunk_start            # window within this chunk
        hi = start + length - chunk_start

        def make_group_step(windowed: bool):
            def group_step(g_idx, c):
                T, Cr, Cg, Cb, done, last = c
                for s in range(SUB):
                    x, y, A, B, Cc, opa, r, g, b = _splat_attrs(
                        lambda f: dbuf[slot, g_idx, s * SPLAT_ROWS + f], no_color
                    )
                    j = g_idx * SUB + s
                    if windowed:
                        # fold the (scalar) chunk-window test into the opacity
                        # operand: out-of-window → α = 0 → fails the α ≥ 1/255
                        # test identically, one vector AND cheaper per splat
                        opa = jnp.where((j >= lo) & (j < hi), opa, 0.0)
                    # conic halves negated on the scalar unit → the quadratic
                    # form is 2 fewer vector ops in fma form
                    nA = -0.5 * A
                    nC = -0.5 * Cc
                    dx = x - px
                    dy = y - py
                    power = (nA * dx - B * dy) * dx + (nC * dy) * dy
                    alpha = jnp.minimum(ALPHA_CAP, opa * jnp.exp(power))
                    contrib = (alpha >= OPACITY_THRESHOLD) & (power <= 0.0)
                    test_T = T * (1.0 - alpha)
                    would_term = contrib & (test_T < T_EPS)
                    applied = contrib & (done < 0.5) & jnp.logical_not(would_term)
                    done = jnp.maximum(done, would_term.astype(jnp.float32))
                    w = jnp.where(applied, alpha, 0.0) * T
                    if not no_color:
                        Cr = Cr + w * r
                        Cg = Cg + w * g
                        Cb = Cb + w * b
                        pos = chunk_start + j - start + 1  # 1-based in-range idx
                        last = jnp.where(applied, pos, last)
                    T = jnp.where(applied, test_T, T)
                return (T, Cr, Cg, Cb, done, last)

            return group_step

        def process(c):
            # Interior fast path: a tile's range spans many chunks but only the
            # FIRST and LAST are partial — every interior chunk has lo ≤ 0 and
            # hi ≥ CHUNK, making the per-splat window test the identity. The
            # scalar unit is this kernel's bind (PERF.md kernel hunt), so the
            # ~3 scalar ops/splat it saves are a direct win on most chunks.
            interior = (lo <= 0) & (hi >= CHUNK)
            return jax.lax.cond(
                interior,
                lambda c: jax.lax.fori_loop(
                    0, CHUNK // SUB, make_group_step(False), c
                ),
                lambda c: jax.lax.fori_loop(
                    0, CHUNK // SUB, make_group_step(True), c
                ),
                c,
            )

        all_done = jnp.min(done) > 0.5
        return jax.lax.cond(all_done, lambda c: c, process, (T, Cr, Cg, Cb, done, last))

    T, Cr, Cg, Cb, done, last = jax.lax.fori_loop(
        0, n_chunks, chunk_body, (T0, C0r, C0g, C0b, done0, last0)
    )

    final_t_ref[0, :, :] = T
    if not no_color:
        color_ref[0, 0, :, :] = Cr
        color_ref[1, 0, :, :] = Cg
        color_ref[2, 0, :, :] = Cb
        ncontrib_ref[0, :, :] = last
    else:
        color_ref[0, 0, :, :] = jnp.zeros(shape, jnp.float32)
        color_ref[1, 0, :, :] = jnp.zeros(shape, jnp.float32)
        color_ref[2, 0, :, :] = jnp.zeros(shape, jnp.float32)
        ncontrib_ref[0, :, :] = jnp.zeros(shape, jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("n_tx", "n_ty", "tile_h", "tile_w", "no_color", "interpret"),
)
def blend_forward(
    splats: jnp.ndarray,       # (M_pad//SUB, SUB*16) f32 packed sorted splats
    tile_starts: jnp.ndarray,  # (T,) int32 — unaligned entry offsets
    tile_lens: jnp.ndarray,    # (T,) int32
    *,
    n_tx: int,
    n_ty: int,
    tile_h: int = 8,
    tile_w: int = 128,
    no_color: bool = False,
    interpret=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns TILE-MAJOR (color (3, T, 8, 128), final_T (T, 8, 128),
    n_contrib (T, 8, 128) int32); map to image space with unswizzle_tiles."""
    assert tile_h * tile_w == TILE_PIX, "tiles must hold exactly one (8,128) vreg"
    T = n_tx * n_ty
    kernel = functools.partial(
        _forward_kernel, n_tx=n_tx, tile_h=tile_h, tile_w=tile_w, no_color=no_color
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(
                (3, 1, VREG_H, VREG_W),
                lambda t, *_: (0, t, 0, 0),
            ),
            pl.BlockSpec((1, VREG_H, VREG_W), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, VREG_H, VREG_W), lambda t, *_: (t, 0, 0)),
        ],
        scratch_shapes=[
            # splat rows land in SMEM: every per-splat read is a scalar load
            # on the scalar core (see _splat_attrs)
            pltpu.SMEM((2, CHUNK // SUB, SUB * SPLAT_ROWS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    color, final_t, n_contrib = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((3, T, VREG_H, VREG_W), jnp.float32),
            jax.ShapeDtypeStruct((T, VREG_H, VREG_W), jnp.float32),
            jax.ShapeDtypeStruct((T, VREG_H, VREG_W), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(interpret),
    )(tile_starts, tile_lens, splats)
    return color, final_t, n_contrib


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _backward_kernel(
    # scalar prefetch
    starts_ref, lens_ref,
    # inputs
    splats_ref,                 # (M_pad//SUB, SUB*16) ANY, packed rows
    dl_dcolor_ref,              # (3, 1, VREG_H, VREG_W) tile-major block
    final_t_ref,                # (1, VREG_H, VREG_W) block
    ncontrib_ref,               # (1, VREG_H, VREG_W) int32 block
    grads_in_ref,               # (SPLAT_ROWS, M_pad) ANY — aliased with output
    # outputs
    grads_ref,                  # (SPLAT_ROWS, M_pad) ANY — per-entry grads (accum)
    # scratch
    dbuf, gbuf, tbuf, rbuf, sem_in, sem_r, sem_out,
    *, n_tx: int, tile_h: int, tile_w: int,
):
    del grads_in_ref  # same buffer as grads_ref (input/output alias)
    t = pl.program_id(0)
    start = starts_ref[t]
    length = lens_ref[t]
    px, py = _pixel_coords(t, n_tx, tile_h, tile_w)

    dlr = dl_dcolor_ref[0, 0, :, :]
    dlg = dl_dcolor_ref[1, 0, :, :]
    dlb = dl_dcolor_ref[2, 0, :, :]
    ncontrib = ncontrib_ref[0, :, :]

    T_init = final_t_ref[0, :, :]
    Sdl0 = jnp.zeros((VREG_H, VREG_W), jnp.float32)

    # Entries past the tile's deepest contributor have zero gradients: bound the
    # reverse walk at max(n_contrib) (final_T is already the transmittance
    # there). Untouched chunks keep the caller's zero initialization.
    nmax = jnp.max(ncontrib)
    c0 = start // CHUNK
    n_chunks_eff = pl.cdiv(start + jnp.minimum(nmax, length), CHUNK) - c0

    # Double-buffered DMA pipeline (measured −3.3 ms, bit-identical): splat
    # rows and the chunk's previous gradient contents prefetch one chunk
    # ahead, and the write-back of chunk ci overlaps the compute of chunk
    # ci−1 (its slot is reclaimed two iterations later). Chunks within one
    # tile walk are disjoint, so in-flight write-backs never alias a
    # prefetch; ACROSS tiles the sequential grid plus the end-of-body drain
    # keeps the boundary-chunk read-modify-write ordered.
    def dma_splat(ci, slot):
        return pltpu.make_async_copy(
            splats_ref.at[pl.ds((c0 + ci) * (CHUNK // SUB), CHUNK // SUB), :],
            dbuf.at[slot], sem_in.at[slot],
        )

    def dma_grad(ci, slot):
        cs = pl.multiple_of((c0 + ci) * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            grads_ref.at[:, pl.ds(cs, CHUNK)], rbuf.at[slot], sem_r.at[slot]
        )

    @pl.when(n_chunks_eff > 0)
    def _prologue():
        ci = n_chunks_eff - 1
        dma_splat(ci, 0).start()
        dma_grad(ci, 0).start()

    def chunk_body(r, carry):
        # Sdl = Σ_applied-later wsel·(r·dlr + g·dlg + b·dlb): the suffix colors
        # (Sr, Sg, Sb of backward.cu:519-530) only ever enter dL/dα through
        # their dot product with the pixel cotangent, so ONE running field
        # replaces three and dα drops from ~14 vector ops to 6 per splat.
        # The per-color suffix sums wsel·dl_c for d_r/g/b are reduced
        # separately below (raw fields 6..8).
        T_run, Sdl = carry
        ci = n_chunks_eff - 1 - r
        slot = jax.lax.rem(r, 2)
        chunk_start = pl.multiple_of((c0 + ci) * CHUNK, CHUNK)
        dma_splat(ci, slot).wait()

        @pl.when(r + 1 < n_chunks_eff)
        def _prefetch():
            dma_splat(ci - 1, 1 - slot).start()
            dma_grad(ci - 1, 1 - slot).start()

        lo = start - chunk_start

        def make_group_step(windowed: bool):
            return functools.partial(_bwd_group_step, windowed)

        def _bwd_group_step(windowed, gr, c):
            T_run, Sdl = c
            g_idx = (CHUNK // SUB) - 1 - gr
            # deferred reductions: per splat only sublane-reduce (8,128)→(1,128)
            # on the VPU; the lane reduction is shared per group (9 trees
            # instead of 72). An MXU ones-dot over the 9 lane-concatenated raw
            # fields measured −11.4 ms — but only at DEFAULT (bf16, one-pass)
            # precision, whose 8-mantissa-bit rounding puts ~1.6e-3 relative
            # error on the gradients; at the f32-accurate Precision.HIGHEST the
            # multi-pass decomposition made the whole kernel 57 → 119 ms (the
            # round-4 regression, profiled 2026-08-20). VPU trees are the f32
            # optimum until a split-hi/lo bf16 two-pass dot is proven.
            q_parts = [[None] * SUB for _ in range(9)]
            for sr in range(SUB):
                s = SUB - 1 - sr  # back-to-front within the group
                x, y, A, B, Cc, opa, rr, gg, bb = _splat_attrs(
                    lambda f: dbuf[slot, g_idx, s * SPLAT_ROWS + f], False
                )
                j = g_idx * SUB + s
                if windowed:
                    # scalar window test folded into opacity (forward kernel
                    # note). Only the LOW side is needed here: entries past the
                    # range end have pos > length ≥ ncontrib, so the
                    # pos ≤ ncontrib gate below already kills them; entries
                    # before the range start have pos ≤ 0 ≤ ncontrib and need
                    # this mask.
                    opa = jnp.where(j >= lo, opa, 0.0)
                nA = -0.5 * A
                nC = -0.5 * Cc
                dx = x - px
                dy = y - py
                power = (nA * dx - B * dy) * dx + (nC * dy) * dy
                G = jnp.exp(power)
                alpha = jnp.minimum(ALPHA_CAP, opa * G)
                pos = chunk_start + j - start + 1
                applied = (
                    (alpha >= OPACITY_THRESHOLD)
                    & (power <= 0.0)
                    & (pos <= ncontrib)
                )
                one_minus = 1.0 - alpha
                # one reciprocal replaces the four /(1−α) divides per splat
                # (VPU divides are many-op; α ≤ 0.99 keeps 1−α ≥ 0.01)
                inv_om = 1.0 / one_minus
                # reconstruct T before this splat (Inria backward walk)
                T_run = jnp.where(applied, T_run * inv_om, T_run)
                w = alpha * T_run
                # per-pixel dL/dα = Σc (c·T − S_c/(1−α))·dL_dpix_c
                #                 = T·(c·dl) − (Σ_c S_c·dl_c)/(1−α)
                # with s1 = r·dlr + g·dlg + b·dlb (splat color is scalar) and
                # Sdl the running suffix dot product — 3 fma + mul + fnma
                s1 = rr * dlr + gg * dlg + bb * dlb
                dalpha = T_run * s1 - Sdl * inv_om
                dalpha = jnp.where(applied, dalpha, 0.0)
                wsel = jnp.where(applied, w, 0.0)
                # dα→(opacity, position, conic); α-cap not masked (ref parity).
                # Only raw moments touch full (8,128) vregs — Σgd·dx, Σgd·dy,
                # Σgd·dx², Σgd·dxdy, Σgd·dy² — and the position/conic grads are
                # derived from them per splat on the (1,128) sublane-reduced
                # rows (A, B, C are per-splat scalars, so e.g.
                # d_x = Σ gd·(−(A·dx + B·dy)) = −(A·Σgd·dx + B·Σgd·dy)).
                E = G * dalpha          # = ∂L/∂(opa·G) per pixel
                gd = opa * E
                t1 = gd * dx
                t2 = gd * dy

                def rsum(q):
                    return jnp.sum(q, axis=0, keepdims=True)

                m1 = rsum(t1)
                m2 = rsum(t2)
                quantities = (
                    -(A * m1 + B * m2),          # d_x
                    -(Cc * m2 + B * m1),         # d_y
                    -0.5 * rsum(t1 * dx),        # d_A
                    -rsum(t1 * dy),              # d_B
                    -0.5 * rsum(t2 * dy),        # d_C
                    rsum(E),                     # d_opa
                    rsum(wsel * dlr),            # d_r
                    rsum(wsel * dlg),            # d_g
                    rsum(wsel * dlb),            # d_b
                )
                for qi in range(9):
                    q_parts[qi][s] = quantities[qi]
                # update the suffix color·cotangent dot product
                Sdl = Sdl + wsel * s1
            cols = []
            for qi in range(9):
                m = jnp.concatenate(q_parts[qi], axis=0)       # (SUB, 128)
                cols.append(jnp.sum(m, axis=1, keepdims=True))  # (SUB, 1)
            block_g = jnp.concatenate(
                cols + [jnp.zeros((SUB, SPLAT_ROWS - 9), jnp.float32)], axis=1
            )  # (SUB, SPLAT_ROWS): row s = splat s's gradient record
            gbuf[pl.ds(g_idx * SUB, SUB), :] = block_g
            return (T_run, Sdl)

        # Interior fast path (forward kernel note): only the chunk containing
        # `start` needs the low-side window mask; every other chunk in the
        # walk has lo ≤ 0 and the test is the identity.
        carry = jax.lax.cond(
            lo <= 0,
            lambda c: jax.lax.fori_loop(
                0, CHUNK // SUB, make_group_step(False), c
            ),
            lambda c: jax.lax.fori_loop(
                0, CHUNK // SUB, make_group_step(True), c
            ),
            (T_run, Sdl),
        )

        # accumulate into the shared gradient buffer (sequential grid ⇒ the
        # read of a boundary chunk sees the neighbor tile's finished writes).
        # The write-back of this chunk overlaps the next chunk's compute; its
        # tbuf slot is reclaimed (waited) two iterations later.
        dma_grad(ci, slot).wait()

        @pl.when(r >= 2)
        def _reclaim_slot():
            pltpu.make_async_copy(
                tbuf.at[slot],
                grads_ref.at[:, pl.ds(
                    pl.multiple_of((c0 + ci + 2) * CHUNK, CHUNK), CHUNK)],
                sem_out.at[slot],
            ).wait()

        tbuf[slot, :, :] = gbuf[:, :].T + rbuf[slot, :, :]
        pltpu.make_async_copy(
            tbuf.at[slot], grads_ref.at[:, pl.ds(chunk_start, CHUNK)],
            sem_out.at[slot],
        ).start()
        return carry

    jax.lax.fori_loop(0, n_chunks_eff, chunk_body, (T_init, Sdl0))

    # drain the last (up to two) in-flight write-backs before the grid step
    # ends — the next tile may read-modify-write a shared boundary chunk
    @pl.when(n_chunks_eff >= 2)
    def _drain_prev():
        pltpu.make_async_copy(
            tbuf.at[jax.lax.rem(n_chunks_eff, 2)],
            grads_ref.at[:, pl.ds(
                pl.multiple_of((c0 + 1) * CHUNK, CHUNK), CHUNK)],
            sem_out.at[jax.lax.rem(n_chunks_eff, 2)],
        ).wait()

    @pl.when(n_chunks_eff >= 1)
    def _drain_last():
        pltpu.make_async_copy(
            tbuf.at[jax.lax.rem(n_chunks_eff - 1, 2)],
            grads_ref.at[:, pl.ds(pl.multiple_of(c0 * CHUNK, CHUNK), CHUNK)],
            sem_out.at[jax.lax.rem(n_chunks_eff - 1, 2)],
        ).wait()


@functools.partial(
    jax.jit,
    static_argnames=("n_tx", "n_ty", "tile_h", "tile_w", "interpret"),
)
def blend_backward(
    splats: jnp.ndarray,       # (M_pad//SUB, SUB*16) packed rows
    tile_starts: jnp.ndarray,
    tile_lens: jnp.ndarray,
    dl_dcolor: jnp.ndarray,    # (3, T, 8, 128) tile-major
    final_t: jnp.ndarray,      # (T, 8, 128)
    n_contrib: jnp.ndarray,    # (T, 8, 128) int32
    *,
    n_tx: int,
    n_ty: int,
    tile_h: int = 8,
    tile_w: int = 128,
    interpret=None,
) -> jnp.ndarray:
    """Returns per-entry gradients (SPLAT_ROWS, M_pad). Pixel inputs are
    TILE-MAJOR (swizzle_tiles of the image-space arrays)."""
    assert tile_h * tile_w == TILE_PIX, "tiles must hold exactly one (8,128) vreg"
    T = n_tx * n_ty
    kernel = functools.partial(
        _backward_kernel, n_tx=n_tx, tile_h=tile_h, tile_w=tile_w
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 1, VREG_H, VREG_W), lambda t, *_: (0, t, 0, 0)),
            pl.BlockSpec((1, VREG_H, VREG_W), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, VREG_H, VREG_W), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            # splat rows in SMEM: scalar-core attr loads (see _splat_attrs);
            # double-buffered along with the gradient read (rbuf) and
            # write-back (tbuf) chunks
            pltpu.SMEM((2, CHUNK // SUB, SUB * SPLAT_ROWS), jnp.float32),
            pltpu.VMEM((CHUNK, SPLAT_ROWS), jnp.float32),
            pltpu.VMEM((2, SPLAT_ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((2, SPLAT_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    m_pad = splats.shape[0] * SUB
    grads_init = jnp.zeros((SPLAT_ROWS, m_pad), jnp.float32)
    grads = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((SPLAT_ROWS, m_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        # indices count the scalar-prefetch args too: grads_init is input 6
        input_output_aliases={6: 0},  # grads_init buffer IS the output
        interpret=_interpret(interpret),
    )(tile_starts, tile_lens, splats, dl_dcolor, final_t, n_contrib, grads_init)[0]
    return grads
