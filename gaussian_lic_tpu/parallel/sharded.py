"""Multi-chip sharded rendering and training over a `jax.sharding.Mesh`.

The reference is a single-process, single-GPU program with **no** distributed story
(SURVEY.md §2, "Parallelism & distributed inventory") — this scale axis is ours to
design. The natural decomposition for tiled 3DGS rasterization on a TPU pod slice:

  * **Tile-row sharding (spatial parallel)** — the hot work is the per-tile alpha
    blend (O(splats·pixels), renderCUDA's analogue). The tile grid is split into
    `n_ty / D` horizontal bands, one per device; each device blends only its
    band's splats, then the band images are stitched with one `all_gather` over
    ICI (a few MB — trivial next to the blend FLOPs it parallelizes).
  * **Distributed binning (all_to_all)** — the sorted splat list is built
    cooperatively (`bin_gaussians_sharded`): each device enumerates and
    exact-culls slots for a P/D Gaussian shard, one local sort groups them by
    destination band, fixed-size buckets ride an `all_to_all` over ICI, and
    each band owner merges its D incoming streams with a small sort. Per-device
    sort volume drops from P·K to P·K/D + band size — binning scales with the
    mesh instead of being replicated.
  * **Replicated preprocess** — projection/EWA/SH is O(P) elementwise with ~200
    flops/Gaussian, orders of magnitude below the blend; replicating it avoids an
    all-gather of per-Gaussian intermediates and keeps the backward local.
  * **Replicated parameters, psum'd gradients (data-parallel optimizer)** — each
    device backprops its band's contribution; one `psum` over ICI yields the full
    gradient and every device applies the identical sparse-Adam update. The /D
    correction below accounts for the loss being recomputed on every device from
    the all-gathered image (the all_gather transpose — a psum_scatter — sums D
    identical image cotangents).

Gradient flow (all inside one jitted SPMD program, AD-derived):
  loss (replicated) → d/d image → all_gather^T = psum_scatter → per-band image
  cotangent → Pallas blend backward (custom_vjp) → per-entry grads → carry-sort
  segmented reduction → per-Gaussian partial grads → psum/D → full grads.

Capacity growth, keyframe cadence, and densification are unchanged host-side logic
(engine.trainer.MappingEngine accepts a mesh and swaps its train step for this one).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from gaussian_lic_tpu.camera import Camera, Intrinsics
from gaussian_lic_tpu.config import Params
from gaussian_lic_tpu.models.gaussians import GaussianMap, LearningRates
from gaussian_lic_tpu.ops import adam as adam_ops
from gaussian_lic_tpu.ops import losses
from gaussian_lic_tpu.ops import sh as sh_ops
from gaussian_lic_tpu.ops import tiles as tiles_ops
from gaussian_lic_tpu.ops.blend_pallas import CHUNK, unswizzle_tiles
from gaussian_lic_tpu.ops.projection import OPACITY_THRESHOLD, project_gaussians
from gaussian_lic_tpu.ops.rasterize import _make_blend, _pack_rows, _splat_budget_for

AXIS_TILES = "tiles"


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = AXIS_TILES,
    platform: Optional[str] = None,
) -> Mesh:
    """1-D device mesh over the tile-band axis (v5e-8: all 8 chips on ICI).

    `platform` selects the backend explicitly (e.g. "cpu" for the virtual
    host-device mesh used by tests and the multichip dryrun) — never rely on
    `jax.devices()`' default ordering when a TPU plugin is also registered."""
    devs = jax.devices(platform) if platform else jax.devices()
    n = len(devs) if n_devices is None else n_devices
    if n > len(devs):
        raise ValueError(
            f"requested {n} devices, have {len(devs)}"
            + (f" on platform {platform}" if platform else "")
        )
    return Mesh(np.asarray(devs[:n]), (axis_name,))


def mesh_interpret(mesh: Mesh) -> bool:
    """True when Pallas kernels targeting this mesh must run in interpret mode
    (host/CPU devices — Mosaic lowering only exists for TPU)."""
    return mesh.devices.flat[0].platform == "cpu"


def bin_gaussians_sharded(
    xy, depth, conic, opacity, radius, active,
    grid: tiles_ops.TileGrid,
    *,
    axis_name: str,
    n_dev: int,
    band_n_ty: int,
    max_tiles_per_gaussian: int,
    m_pair: int,             # per (source, band) bucket budget
    align: int,
    sharded_inputs: bool = False,  # True → inputs are (P/D,) shard arrays
):
    """Distributed tile binning inside shard_map — the ICI-native replacement
    for running the full P·K sort replicated on every device:

      1. each device enumerates + exact-culls slots for its P/D Gaussian shard
         (ops.tiles.compute_slot_tiles) across ALL bands;
      2. one local sort groups them by (destination band, tile, depth rank);
      3. an `all_to_all` routes fixed-size per-band buckets over ICI;
      4. the band owner merges its D incoming streams with one small sort.

    Per-device sort volume drops from P·K to P·K/D + D·m_pair. Returns
    band-local (sorted_gauss, tile_starts, tile_lens, cnt, num_valid,
    budget_lost, truncated) where cnt (P,) counts the slots present in THIS
    band's list (per-Gaussian run lengths for the blend backward's reduction).
    budget_lost is this device's SEND-side bucket loss and truncated the
    K-slot rect truncation over its Gaussian shard — psum both over the mesh
    for scene totals."""
    K = max_tiles_per_gaussian
    if sharded_inputs:
        shard = xy.shape[0]
        P = shard * n_dev
    else:
        P = xy.shape[0]
        assert P % n_dev == 0, "Gaussian capacity must divide the mesh"
        shard = P // n_dev
    num_tiles_local = band_n_ty * grid.n_tx
    # GLOBAL tile ids ride the keys: the destination band is then just the
    # key's high bits (tile // tiles_per_band), so the local sort needs no
    # separate band-key column — one u32 key + the slot payload. Depth bits
    # match the single-chip full-grid packing exactly (same truncation ⇒ same
    # tie behavior as bin_gaussians on the whole image).
    depth_bits = tiles_ops.rank_bits_for(grid.n_ty * grid.n_tx)
    tiles_per_band = num_tiles_local
    dev = lax.axis_index(axis_name)
    g0 = (dev * shard).astype(jnp.int32)

    live_all = active & (radius > 0.0)

    if sharded_inputs:
        xy_s, conic_s, opa_s, rad_s = xy, conic, opacity, radius
        live_s = live_all
        depth_s = depth
    else:
        sl = lambda a: lax.dynamic_slice_in_dim(a, g0, shard, axis=0)
        xy_s, conic_s, opa_s, rad_s = sl(xy), sl(conic), sl(opacity), sl(radius)
        live_s = sl(live_all)
        depth_s = sl(depth)
    # truncated-depth keys need no global pass (the round-1 rank scheme ran two
    # replicated full-P argsorts on every device — gone)
    dkey_s = tiles_ops.depth_key(depth_s, depth_bits)

    # K-major slot enumeration + exact culling + GLOBAL-tile key packing
    # (full-lane (K, shard) layout, kept in k-major order — tiles.py).
    # truncated counts this shard's rect tiles lost to the K-slot cap.
    packed, _tt, truncated = tiles_ops.compute_slot_keys_kmajor(
        xy_s, dkey_s, conic_s, opa_s, rad_s, live_s, grid, K, depth_bits,
    )
    # Global k-major slot ids (slot = k·P + p): monotone in (k, gaussian), so
    # ordering ties by slot id reproduces bin_gaussians' k-major tie rule.
    slot_global = (
        jax.lax.broadcasted_iota(jnp.int32, (K, shard), 0) * P
        + g0 + jax.lax.broadcasted_iota(jnp.int32, (K, shard), 1)
    ).reshape(-1)

    # one local sort groups by (band, tile, depth) at once — the global tile id
    # makes the band the key's high bits. Truncated-depth keys may collide, but
    # the stable sort over the k-major-slot-ordered input keeps slot_global a
    # PAYLOAD while matching the shard-restricted global k-major tie order.
    pk, sk = jax.lax.sort((packed, slot_global), num_keys=1)

    # fixed-size per-band buckets (gather formulation; the q-side is tiny).
    # Band b's key range starts at its first tile's minimal key.
    band_bounds = (
        jnp.arange(n_dev + 1, dtype=jnp.uint32) * jnp.uint32(tiles_per_band)
    ) << depth_bits
    edges = jnp.searchsorted(pk, band_bounds, side="left").astype(jnp.int32)
    q = jnp.arange(n_dev * m_pair, dtype=jnp.int32)
    b_of_q = q // m_pair
    off = q - b_of_q * m_pair
    seg_len = edges[b_of_q + 1] - edges[b_of_q]
    valid_q = off < seg_len
    src = jnp.clip(edges[b_of_q] + off, 0, shard * K - 1)
    send_keys = jnp.where(valid_q, pk[src], tiles_ops.INVALID_KEY)
    send_slots = jnp.where(valid_q, sk[src], -1)
    band_lens = edges[1:] - edges[:-1]
    bucket_overflow = jnp.sum(jnp.maximum(band_lens - m_pair, 0))

    # route buckets to their band owners over ICI
    recv_keys = lax.all_to_all(
        send_keys.reshape(n_dev, m_pair), axis_name, split_axis=0, concat_axis=0
    ).reshape(-1)
    recv_slots = lax.all_to_all(
        send_slots.reshape(n_dev, m_pair), axis_name, split_axis=0, concat_axis=0
    ).reshape(-1)

    # merge the D sorted streams for MY band. With k-major slot ids a device's
    # slots are NOT a contiguous global range, so concat order (source device
    # major) is not the global tie order — the slot id rides as an explicit
    # SECOND KEY here, which reproduces bin_gaussians' k-major tie rule
    # exactly (the merge list is D·m_pair ≪ P·K, so the extra key column is
    # cheap where it matters).
    fk, fs = jax.lax.sort((recv_keys, recv_slots), num_keys=2)
    m_eff = n_dev * m_pair
    M_pad = ((m_eff + align - 1) // align) * align
    present = fk != tiles_ops.INVALID_KEY
    gauss_raw = jnp.where(present, fs % P, P).astype(jnp.int32)
    sorted_gauss = jnp.concatenate(
        [gauss_raw, jnp.full((M_pad - m_eff,), P, jnp.int32)]
    )
    # keys carry GLOBAL tile ids; my band's tiles start at dev·tiles_per_band
    sorted_tiles = (fk >> depth_bits).astype(jnp.int32)
    boundaries = (
        jnp.arange(num_tiles_local + 1, dtype=jnp.int32)
        + dev * tiles_per_band
    )
    e2 = jnp.searchsorted(sorted_tiles, boundaries, side="left").astype(jnp.int32)
    tile_starts = e2[:-1]
    tile_lens = e2[1:] - e2[:-1]

    # per-Gaussian entry counts for the backward's carry-sort reduction.
    # Derived from the merged stream itself — sort the m_eff gaussian ids,
    # compute run lengths, scatter each run's length at its gaussian — so the
    # cost scales with the band list (O(M/D)), not with capacity. (Round 2
    # scattered into a (P·K,) bool array and summed it: ~7.5 ms per device per
    # step at 1M Gaussians that did NOT shrink with the mesh.)
    m_eff_ids = jnp.sort(jnp.where(present, fs % P, P))
    idx = jnp.arange(m_eff_ids.shape[0], dtype=jnp.int32)
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), m_eff_ids[1:] != m_eff_ids[:-1]]
    )
    is_last = jnp.concatenate(
        [m_eff_ids[:-1] != m_eff_ids[1:], jnp.ones((1,), bool)]
    )
    start_pos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_first, idx, 0)
    )
    run_len = idx - start_pos + 1
    cnt = (
        jnp.zeros((P,), jnp.int32)
        .at[jnp.where(is_last & (m_eff_ids < P), m_eff_ids, P)]
        .set(run_len, mode="drop", unique_indices=True)
    )

    num_valid = jnp.sum(present.astype(jnp.int32))
    # bucket_overflow is this device's SEND-side loss; callers psum over the mesh
    return (sorted_gauss, tile_starts, tile_lens, cnt, num_valid,
            bucket_overflow.astype(jnp.int32), truncated)


def render_band(
    xyz: jnp.ndarray,
    scale: jnp.ndarray,
    quat: jnp.ndarray,
    opacity: jnp.ndarray,
    camera: Camera,
    *,
    dc: jnp.ndarray,
    sh_rest: jnp.ndarray,
    sh_degree: int,
    active: jnp.ndarray,
    band_ty0: jnp.ndarray,   # traced int32 — first tile row of this band
    band_n_ty: int,          # static — tile rows per band
    tile_h: int,
    tile_w: int,
    max_tiles_per_gaussian: int,
    max_total_splats: int,   # per-band splat budget
    axis_name: Optional[str] = None,   # set → distributed binning over the mesh
    n_dev: int = 1,
    bucket_overprovision: float = 2.0,  # per-(source,band) budget multiple
    interpret=None,          # Pallas interpret override (from the mesh platform)
):
    """Per-device differentiable render of one horizontal band of tile rows.

    Returns (color (3, band_n_ty·tile_h, Wp), final_T, visible (P,),
    budget_lost (), truncated ()). Same math as ops.rasterize.render_tiled
    restricted to the band. With `axis_name` set, binning runs distributed
    (Gaussian-sharded slot generation + all_to_all band routing) instead of
    replicated per device; the overflow counters are then per-device partials
    (psum for scene totals).
    """
    intr = camera.intr
    grid = tiles_ops.TileGrid(
        width=intr.width, height=intr.height, tile_w=tile_w, tile_h=tile_h
    )

    proj = project_gaussians(xyz, scale, quat, camera)
    base_active = (
        proj.in_front & proj.det_valid & (opacity >= OPACITY_THRESHOLD) & active
    )
    radius = jnp.where(base_active, proj.radius, 0.0)
    visible = radius > 0.0

    dirs = xyz - camera.cam_center
    rgb = sh_ops.eval_sh_color(sh_degree, dc, sh_rest, dirs)

    sg = lax.stop_gradient
    if axis_name is not None and n_dev > 1:
        m_pair = max(
            -(-int(bucket_overprovision * max_total_splats) // n_dev)
            // 256 * 256,
            512,
        )
        (sorted_gauss, tile_starts, tile_lens, cnt, _num_valid,
         budget_lost, truncated) = bin_gaussians_sharded(
            sg(proj.xy), sg(proj.depth), sg(proj.conic), sg(opacity), sg(radius),
            base_active, grid,
            axis_name=axis_name, n_dev=n_dev, band_n_ty=band_n_ty,
            max_tiles_per_gaussian=max_tiles_per_gaussian,
            m_pair=m_pair, align=CHUNK,
        )
        m_list = n_dev * m_pair
    else:
        binning = tiles_ops.bin_gaussians(
            sg(proj.xy), sg(proj.depth), sg(proj.conic), sg(opacity), sg(radius),
            base_active, grid,
            max_tiles_per_gaussian=max_tiles_per_gaussian,
            max_total_splats=max_total_splats,
            band_ty0=sg(band_ty0),
            band_n_ty=band_n_ty,
            align=CHUNK,
        )
        sorted_gauss, tile_starts, tile_lens = (
            binning.sorted_gauss, binning.tile_starts, binning.tile_lens
        )
        cnt = binning.cnt
        budget_lost, truncated = binning.budget_lost, binning.truncated
        m_list = max_total_splats
    # The blend kernel derives pixel coords from band-local tile indices; shift
    # splat y into band-local pixel space (a constant shift — gradient-transparent).
    y_off = (band_ty0 * tile_h).astype(jnp.float32)
    xy_local = proj.xy - jnp.stack(
        [jnp.zeros((), jnp.float32), y_off]
    )[None, :]
    # packed attribute table is the blend's differentiable primal; its backward
    # returns the table cotangent (band-local list is M/D entries, so the
    # in-vjp gather is even cheaper here)
    rows = _pack_rows(xy_local, proj.conic, opacity, rgb)
    blend = _make_blend(grid.n_tx, band_n_ty, tile_h, tile_w, m_list,
                        max_tiles_per_gaussian, interpret)
    color_t, final_t_t, _n_contrib = blend(
        rows, sorted_gauss, tile_starts, tile_lens, cnt,
    )
    color = unswizzle_tiles(color_t, grid.n_tx, band_n_ty, tile_h, tile_w)
    final_t = unswizzle_tiles(final_t_t, grid.n_tx, band_n_ty, tile_h, tile_w)
    return color, final_t, visible, budget_lost, truncated


def _band_geometry(intr: Intrinsics, cfg: Params, n_dev: int):
    """Pick a tile shape whose row count divides the mesh.

    Band sharding needs `n_ty % n_dev == 0`. The configured square tile is
    preferred (lowest splat-tile overlap); for short images we fall back to
    flatter 1024-pixel tiles — (16,64) then (8,128) — which multiply the row
    count without changing the kernels (they always compute on one (8,128)
    f32 vreg per tile)."""
    shapes = [(cfg.tile_h, cfg.tile_w), (16, 64), (8, 128)]
    grid = None
    for th, tw in shapes:
        g = tiles_ops.TileGrid(
            width=intr.width, height=intr.height, tile_w=tw, tile_h=th
        )
        if g.n_ty % n_dev == 0:
            grid = g
            break
    if grid is None:
        raise ValueError(
            f"no 1024-pixel tile shape gives tile rows divisible by the mesh "
            f"({n_dev} devices, image {intr.width}x{intr.height}); pad the "
            f"image height to a multiple of {8 * n_dev}"
        )
    return grid, grid.n_ty // n_dev


def _gm_pspecs(cfg: Params, axis_name: str) -> GaussianMap:
    """GaussianMap-shaped pytree of PartitionSpecs: Gaussian arrays sharded on
    the leading (capacity) dim, count/exposure replicated."""
    s = P(axis_name)
    return GaussianMap(
        xyz=s, dc=s, sh_rest=s, log_scale=s, quat=s, opa_logit=s,
        count=P(), exposure=P(),
        sh_degree=cfg.sh_degree, skybox_count=cfg.skybox_points_num,
    )


def _opt_pspecs(cfg: Params, axis_name: str) -> dict:
    s = P(axis_name)
    specs = {
        name: adam_ops.AdamState(s, s)
        for name in ("xyz", "dc", "sh_rest", "opacity", "log_scale", "quat")
    }
    if cfg.apply_exposure:
        specs["exposure"] = adam_ops.AdamState(P(), P())
    return specs


def _make_train_device_body(intr: Intrinsics, cfg: Params, mesh: Mesh,
                            axis_name: str = AXIS_TILES,
                            with_grads: bool = False):
    """Per-device SPMD train-step body (runs inside shard_map) plus the
    in/out partition specs. Shared by `make_sharded_train_step` (one step per
    dispatch) and `make_sharded_train_bundle` (k steps per dispatch via
    lax.scan, amortizing the dispatch floor like trainer._make_train_bundle).

    Fully sharded design (round 2; round 1 replicated params and psum'd a
    ~59-column full-P gradient — ~250 MB of ICI per step at 1M Gaussians):

      * Gaussian arrays, optimizer moments, preprocess (projection/EWA/SH),
        and sparse Adam are all sharded P/D per device.
      * Each device packs its shard's 16-float splat rows; ONE `all_gather`
        (64 MB at 1M) replicates the packed table for binning-free access by
        every band owner.
      * Binning is distributed (bin_gaussians_sharded: Gaussian-sharded slot
        enumeration → all_to_all band routing → band merge).
      * Gradient routing is pure AD: the blend's custom_vjp emits a (P, 16)
        table cotangent; the transpose of `all_gather` is a `psum_scatter`
        that sums every band's contribution and delivers exactly the owner
        shard's 16 columns (36 MB of ICI instead of the 250 MB psum). The
        preprocess VJP and Adam then run on the shard.
      * The replicated image loss is scaled by 1/D so the D identical image
        cotangents sum to the true gradient through the gather transposes;
        psum(loss) reported to keep the metric at reference scale.
    """
    n_dev = int(mesh.devices.size)
    grid, band_n_ty = _band_geometry(intr, cfg, n_dev)
    tile_h, tile_w = grid.tile_h, grid.tile_w
    interpret = mesh_interpret(mesh)
    lrs = LearningRates.from_params(cfg)
    H, W = intr.height, intr.width
    # Band-local loss needs every band row to be a real image row; with a
    # padded grid height the last band holds out-of-image rows and the
    # replicated-loss path is used instead.
    band_loss = H == grid.padded_height
    K = cfg.max_tiles_per_gaussian
    lr_map = dict(
        xyz=lrs.xyz, dc=lrs.dc, sh_rest=lrs.sh_rest,
        opacity=lrs.opacity, log_scale=lrs.log_scale, quat=lrs.quat,
    )
    from gaussian_lic_tpu.ops import sh as sh_ops
    from gaussian_lic_tpu.ops.blend_pallas import ROW_Y

    def device_body(gm_s: GaussianMap, opt_state, kf, idx, exp_step):
        dev = lax.axis_index(axis_name)
        shard = gm_s.xyz.shape[0]
        capacity = shard * n_dev
        g0 = (dev * shard).astype(jnp.int32)
        my_ids = g0 + jnp.arange(shard, dtype=jnp.int32)
        active_s = my_ids < gm_s.count
        ty0 = (dev * band_n_ty).astype(jnp.int32)
        y_off = (ty0 * tile_h).astype(jnp.float32)
        cam = kf.camera(intr, idx)
        gt = kf.images[idx].astype(jnp.float32) / 255.0
        m_local = max(_splat_budget_for(capacity, cfg) // n_dev, 1 << 10)
        m_pair = max(
            -(-int(cfg.bucket_overprovision * m_local) // n_dev) // 256 * 256,
            512,
        )
        sg = lax.stop_gradient

        def loss_fn(trainable):
            xyz = trainable["xyz"]
            scaling = jnp.exp(trainable["log_scale"])
            quat = trainable["quat"]
            rot = quat / (jnp.linalg.norm(quat, axis=-1, keepdims=True) + 1e-12)
            opa = jax.nn.sigmoid(trainable["opacity"])
            proj = project_gaussians(xyz, scaling, rot, cam)
            base_active = (proj.in_front & proj.det_valid
                           & (opa >= OPACITY_THRESHOLD) & active_s)
            radius = jnp.where(base_active, proj.radius, 0.0)
            visible_s = radius > 0.0
            dirs = xyz - cam.cam_center
            rgb = sh_ops.eval_sh_color(
                gm_s.sh_degree, trainable["dc"], trainable["sh_rest"], dirs
            )
            rows_s = _pack_rows(proj.xy, proj.conic, opa, rgb)  # (P/D, 16)
            rows_full = lax.all_gather(rows_s, axis_name, axis=0, tiled=True)
            # shift splat y into this band's local pixel space (the blend
            # kernel derives pixel coords from band-local tile indices)
            rows_band = rows_full.at[:, ROW_Y].add(-y_off)

            (sorted_gauss, tile_starts, tile_lens, cnt, _nv,
             budget_lost, truncated) = bin_gaussians_sharded(
                sg(proj.xy), sg(proj.depth), sg(proj.conic), sg(opa),
                sg(radius), base_active, grid,
                axis_name=axis_name, n_dev=n_dev, band_n_ty=band_n_ty,
                max_tiles_per_gaussian=K, m_pair=m_pair, align=CHUNK,
                sharded_inputs=True,
            )
            m_pad = sorted_gauss.shape[0]
            blend = _make_blend(grid.n_tx, band_n_ty, tile_h, tile_w, m_pad,
                                K, interpret)
            color_t, _ft_t, _nc = blend(
                rows_band, sorted_gauss, tile_starts, tile_lens, cnt
            )
            color_l = unswizzle_tiles(color_t, grid.n_tx, band_n_ty,
                                      tile_h, tile_w)
            if band_loss:
                # Band-local loss (no image all_gather, no replicated
                # full-image SSIM — that ~6 ms did not shrink with D): each
                # device computes its band's L1+SSIM partial sums after a
                # HALO-row exchange with its neighbors (SSIM's 11-tap window;
                # ppermute leaves zeros at the image borders — exactly the
                # blur's zero padding). Halo cotangents return to their owner
                # band through the ppermute AD transpose.
                image_b = color_l[:, :, :W]
                if cfg.apply_exposure:
                    exposure = trainable["exposure"]
                    band_h = band_n_ty * tile_h
                    flat = image_b.reshape(3, -1)
                    image_b = (
                        jnp.matmul(exposure[:, :3], flat,
                                   precision=jax.lax.Precision.HIGHEST)
                        + exposure[:, 3:]
                    ).reshape(3, band_h, W)
                halo = losses.HALO
                up = lax.ppermute(
                    image_b[:, -halo:, :], axis_name,
                    [(d, d + 1) for d in range(n_dev - 1)],
                )
                dn = lax.ppermute(
                    image_b[:, :halo, :], axis_name,
                    [(d + 1, d) for d in range(n_dev - 1)],
                )
                rendered_ext = jnp.concatenate([up, image_b, dn], axis=1)
                gt_pad = jnp.pad(gt, ((0, 0), (halo, halo), (0, 0)))
                gt_ext = lax.dynamic_slice_in_dim(
                    gt_pad, dev * (band_n_ty * tile_h),
                    band_n_ty * tile_h + 2 * halo, axis=1,
                )
                # psum(part) = training_loss(full) − λ; the λ shift is added
                # back to the reported metric below (constant — no gradient)
                loss_img = losses.training_loss_band_part(
                    rendered_ext, gt_ext, 3 * H * W, cfg.lambda_dssim
                )
            else:
                img = lax.all_gather(color_l, axis_name, axis=1, tiled=True)
                image = img[:, :H, :W]
                if cfg.apply_exposure:
                    exposure = trainable["exposure"]
                    flat = image.reshape(3, -1)
                    image = (
                        jnp.matmul(exposure[:, :3], flat,
                                   precision=jax.lax.Precision.HIGHEST)
                        + exposure[:, 3:]
                    ).reshape(3, H, W)
                # 1/D: the D identical image cotangents sum through the two
                # gather transposes (bands, row shards) to D × the true grad
                loss_img = losses.training_loss(image, gt, cfg.lambda_dssim) / n_dev
            loss = loss_img
            if cfg.lambda_erank > 0:
                from gaussian_lic_tpu.ops.erank import erank_regularizer

                # shard-local partial: grads flow only to this shard's scales;
                # psum(loss) reports the full-map regularizer value
                loss = loss + erank_regularizer(scaling, cfg.lambda_erank)
            return loss, (visible_s, budget_lost, truncated)

        trainable = {
            "xyz": gm_s.xyz, "dc": gm_s.dc, "sh_rest": gm_s.sh_rest,
            "opacity": gm_s.opa_logit, "log_scale": gm_s.log_scale,
            "quat": gm_s.quat,
        }
        if cfg.apply_exposure:
            trainable = dict(trainable, exposure=gm_s.exposure)
        (loss_p, (visible_s, budget_lost, truncated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainable)
        # No gradient psum: AD's all_gather transposes already summed each
        # band's contribution into the owner shard's cotangent.

        visible_s = visible_s & active_s
        new_trainable = {}
        new_opt = {}
        for name in ("xyz", "dc", "sh_rest", "opacity", "log_scale", "quat"):
            p, st = adam_ops.sparse_adam_update(
                trainable[name], grads[name], opt_state[name], visible_s,
                lr_map[name]
            )
            new_trainable[name] = p
            new_opt[name] = st
        gm_new = gm_s.replace(
            xyz=new_trainable["xyz"], dc=new_trainable["dc"],
            sh_rest=new_trainable["sh_rest"],
            opa_logit=new_trainable["opacity"],
            log_scale=new_trainable["log_scale"], quat=new_trainable["quat"],
        )
        if cfg.apply_exposure:
            # exposure is replicated; each device holds its band's partial
            # gradient (band-loss path) or 1/D of the full one (replicated
            # path) — the psum yields the total either way
            exp_grad = lax.psum(grads["exposure"], axis_name)
            exp_p, exp_st = adam_ops.dense_adam_update(
                trainable["exposure"], exp_grad, opt_state["exposure"],
                lr=cfg.exposure_lr, step_count=exp_step,
            )
            gm_new = gm_new.replace(exposure=exp_p)
            new_opt["exposure"] = exp_st
        elif "exposure" in opt_state:
            new_opt["exposure"] = opt_state["exposure"]

        bl = lax.psum(budget_lost, axis_name)
        tr = lax.psum(truncated, axis_name)
        metrics = {
            # band-local parts sum to loss − λ (training_loss_band_part);
            # restore the constant for the reported metric
            "loss": lax.psum(loss_p, axis_name)
            + (cfg.lambda_dssim if band_loss else 0.0),
            "n_visible": lax.psum(
                jnp.sum(visible_s.astype(jnp.int32)), axis_name
            ),
            "overflow": bl + tr,
            "budget_lost": bl,
            "truncated": tr,
        }
        if with_grads:
            metrics["grads"] = {
                name: lax.all_gather(grads[name], axis_name, axis=0, tiled=True)
                for name in ("xyz", "dc", "sh_rest", "opacity",
                             "log_scale", "quat")
            }
        return gm_new, new_opt, metrics

    return device_body, _gm_pspecs(cfg, axis_name), _opt_pspecs(cfg, axis_name)


def make_sharded_train_step(intr: Intrinsics, cfg: Params, mesh: Mesh,
                            axis_name: str = AXIS_TILES,
                            with_grads: bool = False):
    """Jitted SPMD train step, signature-compatible with the single-chip
    trainer._make_train_step product — (gm, opt_state, kf, idx, exp_step) →
    (gm', opt_state', metrics). `with_grads=True` adds the all-gathered
    pre-Adam gradient pytree to the metrics (parity checks only — see
    trainer._make_train_step). Design rationale in `_make_train_device_body`."""
    device_body, gm_specs, opt_specs = _make_train_device_body(
        intr, cfg, mesh, axis_name, with_grads
    )
    step = jax.shard_map(
        device_body,
        mesh=mesh,
        in_specs=(gm_specs, opt_specs, P(), P(), P()),
        out_specs=(gm_specs, opt_specs, P()),
        check_vma=False,
    )
    return jax.jit(step)


def make_sharded_train_bundle(intr: Intrinsics, cfg: Params, mesh: Mesh,
                              k: int, axis_name: str = AXIS_TILES):
    """k sharded train steps fused into ONE jitted SPMD dispatch via lax.scan
    inside shard_map — the multi-chip twin of trainer._make_train_bundle, with
    identical signature and metric aggregation: (gm, opt, kf, idxs (k,) int32,
    es0 () int32) → (gm', opt', metrics)."""
    device_body, gm_specs, opt_specs = _make_train_device_body(
        intr, cfg, mesh, axis_name
    )

    def device_bundle(gm_s: GaussianMap, opt_state, kf, idxs, es0):
        ess = es0 + jnp.arange(k, dtype=jnp.int32)

        def scan_body(carry, x):
            gm_s, opt_state = carry
            idx, es = x
            gm_s, opt_state, m = device_body(gm_s, opt_state, kf, idx, es)
            return (gm_s, opt_state), (
                m["loss"], m["n_visible"], m["budget_lost"], m["truncated"]
            )

        (gm_s, opt_state), (loss_h, vis_h, bl_h, tr_h) = lax.scan(
            scan_body, (gm_s, opt_state), (idxs, ess)
        )
        bl = jnp.max(bl_h)
        tr = jnp.max(tr_h)
        metrics = {
            "loss": loss_h[-1],
            "n_visible": vis_h[-1],
            "visible_sum": jnp.sum(vis_h),
            "budget_lost": bl,
            "truncated": tr,
            "overflow": bl + tr,
        }
        return gm_s, opt_state, metrics

    bundle = jax.shard_map(
        device_bundle,
        mesh=mesh,
        in_specs=(gm_specs, opt_specs, P(), P(), P()),
        out_specs=(gm_specs, opt_specs, P()),
        check_vma=False,
    )
    return jax.jit(bundle)


def make_sharded_render(intr: Intrinsics, cfg: Params, mesh: Mesh,
                        axis_name: str = AXIS_TILES):
    """Jitted SPMD forward render: (gm, kf, idx) → full (3, H, W) image.
    Tile bands in parallel across the mesh, stitched by one all_gather."""
    n_dev = int(mesh.devices.size)
    grid, band_n_ty = _band_geometry(intr, cfg, n_dev)
    tile_h, tile_w = grid.tile_h, grid.tile_w
    interpret = mesh_interpret(mesh)
    H, W = intr.height, intr.width

    def device_body(gm: GaussianMap, kf, idx):
        dev = lax.axis_index(axis_name)
        ty0 = (dev * band_n_ty).astype(jnp.int32)
        cam = kf.camera(intr, idx)
        m_local = max(_splat_budget_for(gm.capacity, cfg) // n_dev, 1 << 10)
        color_l, final_t_l, _vis, _bl, _tr = render_band(
            gm.xyz, gm.scaling, gm.rotation, gm.opacity, cam,
            dc=gm.dc, sh_rest=gm.sh_rest, sh_degree=gm.sh_degree,
            active=gm.active_mask(),
            band_ty0=ty0, band_n_ty=band_n_ty,
            tile_h=tile_h, tile_w=tile_w,
            max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
            max_total_splats=m_local,
            axis_name=axis_name, n_dev=n_dev,
            bucket_overprovision=cfg.bucket_overprovision,
            interpret=interpret,
        )
        img = lax.all_gather(color_l, axis_name, axis=1, tiled=True)[:, :H, :W]
        ft = lax.all_gather(final_t_l, axis_name, axis=0, tiled=True)[:H, :W]
        return img, ft

    fn = jax.shard_map(
        device_body,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)
