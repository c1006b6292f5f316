"""Tile binning: sorted splat-list construction for the tiled rasterizer.

TPU-native replacement for the CUDA pipeline duplicateWithKeys → cub radix sort →
identifyTileRanges (rasterizer_impl.cu:59-218, 395-429). Design (DESIGN.md §2):

  * Every Gaussian owns K static tile-slots (`max_tiles_per_gaussian`). Slot k maps
    to the k-th tile of the Gaussian's bounding rect in row-major order; slots beyond
    the rect — or failing StopThePop exact per-tile culling (forward.cu:151-230) —
    are dead. Rects larger than K tiles are truncated (counted in `overflow`).
  * Keys pack (tile_id << depth_bits) | truncated-f32-depth into uint32 (slot id
    as secondary sort key for a deterministic order under depth-quantum ties);
    dead slots get 0xFFFFFFFF and sort to the end. One `lax.sort` over all P·K
    slots replaces the radix sort; there is no scatter and no host round-trip
    (the reference's two hidden D2H syncs, rasterizer_impl.cu:398,442,
    disappear — the splat list has a static budget `max_total_splats`).
  * Per-tile [start, len) ranges come from `searchsorted` over the sorted tile ids.
  * Per-Gaussian surviving-entry counts (the run lengths the backward's segmented
    carry-sort reduction needs) come from one dense key compare against the
    budget-boundary key — no atomics (vs backward.cu:585-595), no scatter-add,
    and no inverse-permutation sort.

Everything here is non-differentiable bookkeeping; callers wrap it in stop_gradient.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussian_lic_tpu.ops.projection import (
    OPACITY_THRESHOLD,
    max_contrib_power_rect,
    max_contrib_power_rect_components,
)

INVALID_KEY = jnp.uint32(0xFFFFFFFF)
# Key packing (tile_id << depth_bits) | truncated_depth into uint32. depth_bits
# is chosen per grid: small tile grids leave more bits for depth. The depth
# field is the top `depth_bits` of the positive-f32 bit pattern (monotone in
# depth): sorting keys orders splats front-to-back per tile with ~2^-(db-8)
# relative depth resolution (23 bits at 640×512/32² → 2^-15 ≈ 3e-5 — far finer
# than any visually meaningful ordering). Entries within one depth quantum are
# ordered by slot id (a deterministic total order; exact-duplicate depths get
# insertion order, matching a stable exact-depth sort). This replaces the
# depth-rank scheme of round 1 — two full-P argsorts per render — with zero
# extra passes, and removes its P ≤ 2^rank_bits capacity coupling.
RANK_BITS = 20  # legacy default, used only when a grid isn't supplied


def rank_bits_for(num_tiles: int) -> int:
    """Bits available for the depth field next to `num_tiles`+sentinel ids."""
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    return 32 - tile_bits


def depth_key(depth: jnp.ndarray, depth_bits: int) -> jnp.ndarray:
    """Truncated monotone uint32 depth field (top `depth_bits` of the f32 bit
    pattern; depths are positive after frustum culling, z > 0.2)."""
    bits = jax.lax.bitcast_convert_type(depth.astype(jnp.float32), jnp.uint32)
    return (bits >> (31 - depth_bits)).astype(jnp.uint32)


class TileGrid(NamedTuple):
    """Static description of the image's tile decomposition."""

    width: int
    height: int
    tile_w: int
    tile_h: int

    @property
    def n_tx(self) -> int:
        return -(-self.width // self.tile_w)

    @property
    def n_ty(self) -> int:
        return -(-self.height // self.tile_h)

    @property
    def num_tiles(self) -> int:
        return self.n_tx * self.n_ty

    @property
    def padded_width(self) -> int:
        return self.n_tx * self.tile_w

    @property
    def padded_height(self) -> int:
        return self.n_ty * self.tile_h


class Binning(NamedTuple):
    sorted_gauss: jnp.ndarray   # (M_pad,) int32 — Gaussian id per entry (P = dead)
    tile_starts: jnp.ndarray    # (T,) int32 — entry offset of each tile's range
                                #   (UNALIGNED: the blend kernels walk whole
                                #   `align`-sized chunks and mask the overhang)
    tile_lens: jnp.ndarray      # (T,) int32 — live entries per tile
    cnt: jnp.ndarray            # (P,) int32 — entries per Gaussian that survived
                                #   the budget cut (run lengths in sorted_gauss)
    num_valid: jnp.ndarray      # () int32 — live entries (pre-budget-truncation)
    overflow: jnp.ndarray       # () int32 — total slots lost (truncated+budget)
    budget_lost: jnp.ndarray    # () int32 — live slots cut by max_total_splats;
                                #   fixable by growing the splat budget
    truncated: jnp.ndarray      # () int32 — rect tiles beyond the K-slot limit;
                                #   only a larger max_tiles_per_gaussian helps
    tiles_touched: jnp.ndarray  # (P,) int32 — live tiles per Gaussian (exact culled)



def gaussian_rects(
    xy: jnp.ndarray,       # (P,2) pixel means
    radius: jnp.ndarray,   # (P,) pixel radius (0 = culled)
    grid: TileGrid,
):
    """Tile-space bounding rects (getRect, auxiliary.h:46-56): min inclusive,
    max exclusive, both clamped to the grid."""
    r = radius
    x, y = xy[:, 0], xy[:, 1]
    rect_min_x = jnp.clip(((x - r) / grid.tile_w).astype(jnp.int32), 0, grid.n_tx)
    rect_min_y = jnp.clip(((y - r) / grid.tile_h).astype(jnp.int32), 0, grid.n_ty)
    rect_max_x = jnp.clip(
        ((x + r + grid.tile_w - 1) / grid.tile_w).astype(jnp.int32), 0, grid.n_tx
    )
    rect_max_y = jnp.clip(
        ((y + r + grid.tile_h - 1) / grid.tile_h).astype(jnp.int32), 0, grid.n_ty
    )
    return rect_min_x, rect_min_y, rect_max_x, rect_max_y


def compute_slot_tiles(
    xy: jnp.ndarray,       # (P,2)
    conic: jnp.ndarray,    # (P,3)
    opacity: jnp.ndarray,  # (P,)
    radius: jnp.ndarray,   # (P,)
    live: jnp.ndarray,     # (P,) bool
    grid: TileGrid,
    K: int,
):
    """Per-slot tile assignment with StopThePop exact culling: slot k of a
    Gaussian is the k-th tile of its bounding rect in row-major order
    (duplicateWithKeys' enumeration, rasterizer_impl.cu:59-193), kept only if
    the max contribution inside the tile can reach the opacity threshold
    (forward.cu:169-170). Returns (tx, ty, slot_valid, in_rect,
    (rminy, rmaxy, rect_w)) — all (P, K) except the rect info (P,)."""
    rminx, rminy, rmaxx, rmaxy = gaussian_rects(xy, radius, grid)
    rect_w = rmaxx - rminx
    rect_h = rmaxy - rminy
    rect_count = rect_w * rect_h

    k = jnp.arange(K, dtype=jnp.int32)[None, :]           # (1, K)
    safe_w = jnp.maximum(rect_w, 1)[:, None]
    tile_dx = k % safe_w                                   # (P, K)
    tile_dy = k // safe_w
    tx = rminx[:, None] + tile_dx
    ty = rminy[:, None] + tile_dy
    in_rect = (k < rect_count[:, None]) & (k < K)

    tile_px_min = jnp.stack(
        [(tx * grid.tile_w).astype(jnp.float32), (ty * grid.tile_h).astype(jnp.float32)],
        axis=-1,
    )
    tile_px_max = jnp.stack(
        [((tx + 1) * grid.tile_w - 1).astype(jnp.float32),
         ((ty + 1) * grid.tile_h - 1).astype(jnp.float32)],
        axis=-1,
    )
    power = max_contrib_power_rect(
        conic[:, None, :], xy[:, None, :], tile_px_min, tile_px_max
    )
    opacity_power_threshold = jnp.log(
        jnp.maximum(opacity, OPACITY_THRESHOLD) / OPACITY_THRESHOLD
    )
    contributes = power <= opacity_power_threshold[:, None]
    slot_valid = live[:, None] & in_rect & contributes
    return tx, ty, slot_valid, in_rect, (rminy, rmaxy, rect_w)


def compute_slot_keys_kmajor(
    xy: jnp.ndarray,       # (P,2)
    dkey: jnp.ndarray,     # (P,) truncated depth key (depth_key())
    conic: jnp.ndarray,    # (P,3)
    opacity: jnp.ndarray,  # (P,)
    radius: jnp.ndarray,   # (P,)
    live: jnp.ndarray,     # (P,) bool
    grid: TileGrid,
    K: int,
    depth_bits: int,
    band_ty0=None,         # traced int32 (None → row 0)
    band_n_ty: int = None, # None → no band filtering, GLOBAL tile ids
):
    """Slot enumeration + StopThePop exact culling + key packing, computed
    K-MAJOR: every per-slot array is (K, P) with the Gaussian axis minor, so
    the heavy per-slot math runs on full 128-lane vregs — a (P, K=8) layout
    puts the 8-wide slot axis on the lanes and wastes 15/16 of each vreg.
    The keys stay in K-major order (slot id = k·P + p): relayouting them back
    to p-major cost a measured 20.7 ms at 1M Gaussians (the (K,P)→(P·K)
    transpose was the single most expensive piece of binning), and the only
    thing the order buys is the tie-break rule under equal truncated-depth
    keys — k-major insertion order is just as deterministic, and the sharded
    binning path reproduces it exactly (slot id as an explicit second merge
    key), so single-chip and multi-chip renders still agree bit-for-bit.

    With band_n_ty set, keys use BAND-LOCAL tile ids and out-of-band slots are
    dead (bin_gaussians semantics); otherwise GLOBAL tile ids
    (bin_gaussians_sharded semantics). Returns
    (keys (K·P,) k-major uint32, tiles_touched (P,) int32 live slots,
    truncated () int32 rect tiles lost to the K-slot cap [band-aware]).
    """
    P = xy.shape[0]
    rminx, rminy, rmaxx, rmaxy = gaussian_rects(xy, radius, grid)
    rect_w = rmaxx - rminx
    rect_count = rect_w * (rmaxy - rminy)

    k = jnp.arange(K, dtype=jnp.int32)[:, None]            # (K, 1)
    safe_w = jnp.maximum(rect_w, 1)[None, :]               # (1, P)
    tx = rminx[None, :] + k % safe_w                       # (K, P)
    ty = rminy[None, :] + k // safe_w
    in_rect = k < rect_count[None, :]

    txf = tx.astype(jnp.float32)
    tyf = ty.astype(jnp.float32)
    power = max_contrib_power_rect_components(
        conic[None, :, 0], conic[None, :, 1], conic[None, :, 2],
        xy[None, :, 0], xy[None, :, 1],
        txf * grid.tile_w, tyf * grid.tile_h,
        (txf + 1.0) * grid.tile_w - 1.0, (tyf + 1.0) * grid.tile_h - 1.0,
    )
    opacity_power_threshold = jnp.log(
        jnp.maximum(opacity, OPACITY_THRESHOLD) / OPACITY_THRESHOLD
    )
    contributes = power <= opacity_power_threshold[None, :]
    slot_valid = live[None, :] & in_rect & contributes     # (K, P)

    if band_n_ty is not None:
        if band_ty0 is None:
            band_ty0 = jnp.int32(0)
        ty_local = ty - band_ty0
        in_band = (ty_local >= 0) & (ty_local < band_n_ty)
        slot_valid = slot_valid & in_band
        tile_id = jnp.where(
            slot_valid, ty_local * grid.n_tx + tx, 0
        ).astype(jnp.uint32)
        band_end = band_ty0 + band_n_ty
        rows_in_band = jnp.clip(
            jnp.minimum(rmaxy, band_end) - jnp.maximum(rminy, band_ty0), 0, None
        )
        in_scope_total = rows_in_band * rect_w             # (P,)
        enumerated = jnp.sum((in_rect & in_band).astype(jnp.int32), axis=0)
    else:
        tile_id = jnp.where(
            slot_valid, ty * grid.n_tx + tx, 0
        ).astype(jnp.uint32)
        in_scope_total = rect_count
        enumerated = jnp.sum(in_rect.astype(jnp.int32), axis=0)

    truncated = jnp.sum(
        jnp.where(live, jnp.maximum(in_scope_total - enumerated, 0), 0)
    ).astype(jnp.int32)
    tiles_touched = jnp.sum(slot_valid, axis=0).astype(jnp.int32)

    keys_kp = jnp.where(
        slot_valid,
        (tile_id << depth_bits) | dkey[None, :],
        INVALID_KEY,
    )
    keys = keys_kp.reshape(-1)   # (K·P,) k-major — no relayout
    return keys, tiles_touched, truncated


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid", "max_tiles_per_gaussian", "max_total_splats", "band_n_ty", "align"
    ),
)
def bin_gaussians(
    xy: jnp.ndarray,        # (P,2)
    depth: jnp.ndarray,     # (P,)
    conic: jnp.ndarray,     # (P,3)
    opacity: jnp.ndarray,   # (P,)
    radius: jnp.ndarray,    # (P,) 0 where culled
    active: jnp.ndarray,    # (P,) bool (in_front & det_valid & opacity & in_count)
    grid: TileGrid,
    max_tiles_per_gaussian: int = 16,
    max_total_splats: int = 1 << 22,
    band_ty0=None,          # traced int32 — first tile row of this device's band
    band_n_ty: int = None,  # static — tile rows in the band (None = full grid)
    align: int = 256,       # static — tile ranges start/end on `align` boundaries
) -> Binning:
    """Bin into the full grid, or — for the tile-row-sharded multi-chip renderer
    (parallel.sharded) — into a horizontal band of `band_n_ty` tile rows starting
    at traced row `band_ty0`. Tile ids in the output are band-local.

    Each tile's entry range is placed at an `align`-multiple offset and padded to
    an `align`-multiple length with dead entries (gauss id = P → zero splat rows):
    the Mosaic DMA that streams the splat list requires 128-lane-aligned slices,
    so the blend kernel walks whole aligned chunks and masks the tail. The output
    list is therefore (M + num_tiles·align) entries long."""
    P = xy.shape[0]
    K = max_tiles_per_gaussian
    M = max_total_splats
    n_ty_local = grid.n_ty if band_n_ty is None else band_n_ty
    num_tiles_local = n_ty_local * grid.n_tx
    depth_bits = rank_bits_for(num_tiles_local)
    if band_ty0 is None:
        band_ty0 = jnp.int32(0)

    live = active & (radius > 0.0)
    dkey = depth_key(depth, depth_bits)

    # K-major slot enumeration + exact culling + key packing (full-lane
    # layout; see compute_slot_keys_kmajor). The keys stay in k-major slot
    # order (slot id = k·P + p): `lax.sort` is stable, so carrying slot_ids as
    # a PAYLOAD (not a second key) gives the deterministic
    # (tile, depth, k-major slot) total order with no relayout and one fewer
    # compared column per merge pass.
    keys, tiles_touched, truncated = compute_slot_keys_kmajor(
        xy, dkey, conic, opacity, radius, live, grid, K, depth_bits,
        band_ty0=band_ty0, band_n_ty=n_ty_local,
    )
    slot_ids = jnp.arange(P * K, dtype=jnp.int32)
    sorted_keys, sorted_slots = jax.lax.sort((keys, slot_ids), num_keys=1)

    num_valid = jnp.sum(tiles_touched).astype(jnp.int32)
    budget_lost = jnp.maximum(num_valid - M, 0)
    overflow = truncated + budget_lost

    m_eff = min(M, P * K)  # the sorted list can't exceed the slot count
    M_pad = ((m_eff + align - 1) // align) * align

    # --- per-Gaussian surviving-entry counts (run lengths in sorted_gauss),
    # needed by the blend backward's segmented reduction. The effective sort
    # key (key, slot_id) is unique, so "slot's sorted position < m_eff" ⟺
    # "(key, slot) < the m_eff-th smallest (key, slot)" — a dense lexicographic
    # compare instead of a second P·K inverse-permutation sort. In the common
    # case (no budget overflow) every live slot survives and cnt is just
    # tiles_touched — lax.cond skips the ~6 ms P·K compare at run time. ---
    if m_eff < P * K:

        def _cnt_overflowed(_):
            bk_key = sorted_keys[m_eff]
            bk_slot = sorted_slots[m_eff]
            k2 = keys.reshape(K, P)
            s2 = slot_ids.reshape(K, P)
            survive = (k2 != INVALID_KEY) & (
                (k2 < bk_key) | ((k2 == bk_key) & (s2 < bk_slot))
            )
            return jnp.sum(survive, axis=0).astype(jnp.int32)

        cnt = jax.lax.cond(
            budget_lost > 0, _cnt_overflowed, lambda _: tiles_touched, None
        )
    else:
        cnt = tiles_touched

    # --- budget truncation + per-tile ranges (ranges stay UNALIGNED: the blend
    # kernels walk globally chunk-aligned windows and mask entries outside
    # [start, start+len), so no re-layout pass is needed) ---
    sorted_keys = sorted_keys[:m_eff]
    sorted_slots = sorted_slots[:m_eff]
    sorted_tiles = (sorted_keys >> depth_bits).astype(jnp.int32)
    boundaries = jnp.arange(num_tiles_local + 1, dtype=jnp.int32)
    edges = jnp.searchsorted(sorted_tiles, boundaries, side="left").astype(jnp.int32)
    tile_starts = edges[:-1]
    tile_lens = edges[1:] - edges[:-1]

    # dead entries (INVALID keys past num_valid, plus the M_pad round-up tail)
    # carry sentinel id P → zero splat rows → in-kernel no-ops.
    # Slot ids are k-major: gaussian = slot mod P.
    gauss_raw = jnp.where(
        sorted_keys != INVALID_KEY, (sorted_slots % P).astype(jnp.int32), P
    )
    sorted_gauss = jnp.concatenate(
        [gauss_raw, jnp.full((M_pad - m_eff,), P, jnp.int32)]
    )

    return Binning(
        sorted_gauss=sorted_gauss,
        tile_starts=tile_starts,
        tile_lens=tile_lens,
        cnt=cnt,
        num_valid=num_valid,
        overflow=overflow,
        budget_lost=budget_lost,
        truncated=truncated,
        tiles_touched=tiles_touched,
    )
