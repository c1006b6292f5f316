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
    P = xy.shape[0]
    K = max_tiles_per_gaussian
    assert P % n_dev == 0, "Gaussian capacity must divide the mesh"
    shard = P // n_dev
    num_tiles_local = band_n_ty * grid.n_tx
    rank_bits = tiles_ops.rank_bits_for(num_tiles_local)
    assert P <= (1 << rank_bits), "depth rank does not fit the band-local key"
    dev = lax.axis_index(axis_name)
    g0 = (dev * shard).astype(jnp.int32)

    live_all = active & (radius > 0.0)
    # global depth ranks on the replicated arrays (argsorts of P are cheap)
    d = jnp.where(live_all, depth, jnp.inf)
    order = jnp.argsort(d)
    rank = jnp.argsort(order).astype(jnp.uint32)

    sl = lambda a: lax.dynamic_slice_in_dim(a, g0, shard, axis=0)
    xy_s, conic_s, opa_s, rad_s = sl(xy), sl(conic), sl(opacity), sl(radius)
    live_s, rank_s = sl(live_all), sl(rank)

    tx, ty, slot_valid, in_rect, rect_info = tiles_ops.compute_slot_tiles(
        xy_s, conic_s, opa_s, rad_s, live_s, grid, K
    )
    # rect tiles whose row-major index ≥ K are never enumerated (slot
    # truncation) — count them over this device's Gaussian shard
    _rminy, _rmaxy, rect_w = rect_info
    rect_h = _rmaxy - _rminy
    rect_count = rect_w * rect_h
    enumerated = jnp.sum(in_rect.astype(jnp.int32), axis=1)
    truncated = jnp.sum(
        jnp.where(live_s, jnp.maximum(rect_count - enumerated, 0), 0)
    ).astype(jnp.int32)
    band = jnp.clip(ty // band_n_ty, 0, n_dev - 1)
    ty_local = ty - band * band_n_ty
    tile_local = (ty_local * grid.n_tx + tx).astype(jnp.uint32)
    packed = jnp.where(
        slot_valid,
        (tile_local << rank_bits) | rank_s[:, None],
        tiles_ops.INVALID_KEY,
    ).reshape(-1)
    band_key = jnp.where(slot_valid, band, n_dev).astype(jnp.uint32).reshape(-1)
    gauss = g0 + jax.lax.broadcasted_iota(jnp.int32, (shard, K), 0)
    slot_global = (gauss * K
                   + jax.lax.broadcasted_iota(jnp.int32, (shard, K), 1)).reshape(-1)

    # local sort groups by destination band (then tile, then depth)
    bk, pk, sk = jax.lax.sort((band_key, packed, slot_global), num_keys=2)

    # fixed-size per-band buckets (gather formulation; the q-side is tiny)
    edges = jnp.searchsorted(
        bk, jnp.arange(n_dev + 1, dtype=jnp.uint32), side="left"
    ).astype(jnp.int32)
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

    # merge the D sorted streams for MY band
    fk, fs = jax.lax.sort((recv_keys, recv_slots), num_keys=1)
    m_eff = n_dev * m_pair
    M_pad = ((m_eff + align - 1) // align) * align
    present = fk != tiles_ops.INVALID_KEY
    gauss_raw = jnp.where(present, fs // K, P).astype(jnp.int32)
    sorted_gauss = jnp.concatenate(
        [gauss_raw, jnp.full((M_pad - m_eff,), P, jnp.int32)]
    )
    sorted_tiles = (fk >> rank_bits).astype(jnp.int32)
    boundaries = jnp.arange(num_tiles_local + 1, dtype=jnp.int32)
    e2 = jnp.searchsorted(sorted_tiles, boundaries, side="left").astype(jnp.int32)
    tile_starts = e2[:-1]
    tile_lens = e2[1:] - e2[:-1]

    # per-Gaussian entry counts for the backward's carry-sort reduction:
    # mark slots present in MY band's list (one small scatter of M/D entries)
    slot_present = (
        jnp.zeros((P * K,), jnp.bool_)
        .at[jnp.where(present, fs, P * K)]
        .set(True, mode="drop", unique_indices=True)
    )
    cnt = jnp.sum(slot_present.reshape(P, K).astype(jnp.int32), axis=1)

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
        m_pair = max(-(-2 * max_total_splats // n_dev) // 256 * 256, 512)
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
    # pack splat rows by row gather, as in the single-chip path (band-local
    # list is M/D entries, so the gather is even cheaper here)
    rows = _pack_rows(sg(xy_local), sg(proj.conic), sg(opacity), sg(rgb))
    splat_rows = jnp.take(rows, sorted_gauss, axis=0, mode="fill", fill_value=0.0)
    blend = _make_blend(grid.n_tx, band_n_ty, tile_h, tile_w, m_list,
                        max_tiles_per_gaussian, interpret)
    # sg() stops the zero splat_rows cotangent from transposing the gather
    color_t, final_t_t, _n_contrib = blend(
        xy_local, proj.conic, opacity, rgb,
        sg(splat_rows), sorted_gauss, tile_starts, tile_lens,
        cnt,
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


def make_sharded_train_step(intr: Intrinsics, cfg: Params, mesh: Mesh,
                            axis_name: str = AXIS_TILES):
    """Jitted SPMD train step: signature-compatible with the single-chip
    trainer._make_train_step product — (gm, opt_state, kf, idx, exp_step) →
    (gm', opt_state', metrics)."""
    n_dev = int(mesh.devices.size)
    grid, band_n_ty = _band_geometry(intr, cfg, n_dev)
    tile_h, tile_w = grid.tile_h, grid.tile_w
    interpret = mesh_interpret(mesh)
    lrs = LearningRates.from_params(cfg)
    H, W = intr.height, intr.width
    lr_map = dict(
        xyz=lrs.xyz, dc=lrs.dc, sh_rest=lrs.sh_rest,
        opacity=lrs.opacity, log_scale=lrs.log_scale, quat=lrs.quat,
    )

    def device_body(gm: GaussianMap, opt_state, kf, idx, exp_step):
        dev = lax.axis_index(axis_name)
        ty0 = (dev * band_n_ty).astype(jnp.int32)
        cam = kf.camera(intr, idx)
        gt = kf.images[idx].astype(jnp.float32) / 255.0
        m_local = max(_splat_budget_for(gm.capacity, cfg) // n_dev, 1 << 10)

        def loss_fn(trainable):
            gm2 = gm.with_trainable(trainable)
            color_l, _ft, visible, budget_lost, truncated = render_band(
                gm2.xyz, gm2.scaling, gm2.rotation, gm2.opacity, cam,
                dc=gm2.dc, sh_rest=gm2.sh_rest, sh_degree=gm2.sh_degree,
                active=gm2.active_mask(),
                band_ty0=ty0, band_n_ty=band_n_ty,
                tile_h=tile_h, tile_w=tile_w,
                max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
                max_total_splats=m_local,
                axis_name=axis_name, n_dev=n_dev, interpret=interpret,
            )
            img = lax.all_gather(color_l, axis_name, axis=1, tiled=True)
            image = img[:, :H, :W]
            if cfg.apply_exposure:
                exposure = trainable["exposure"]
                flat = image.reshape(3, -1)
                image = (exposure[:, :3] @ flat + exposure[:, 3:]).reshape(3, H, W)
            loss = losses.training_loss(image, gt, cfg.lambda_dssim)
            if cfg.lambda_erank > 0:
                from gaussian_lic_tpu.ops.erank import erank_regularizer

                # the erank gradient is injected identically on every device;
                # the psum/n_dev normalization below keeps it at reference scale
                loss = loss + erank_regularizer(gm2.scaling, cfg.lambda_erank)
            return loss, (visible, budget_lost, truncated)

        trainable = gm.trainable()
        if cfg.apply_exposure:
            trainable = dict(trainable, exposure=gm.exposure)
        (loss, (visible, budget_lost, truncated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainable)
        # Every device recomputes the identical loss from the all-gathered image,
        # so the all_gather transpose sums D equal image cotangents: psum of the
        # per-device grads is D·(full gradient) — normalize by D.
        grads = jax.tree_util.tree_map(
            lambda g: lax.psum(g, axis_name) / n_dev, grads
        )

        visible = visible & gm.active_mask()
        new_trainable = {}
        new_opt = {}
        for name in ("xyz", "dc", "sh_rest", "opacity", "log_scale", "quat"):
            p, st = adam_ops.sparse_adam_update(
                trainable[name], grads[name], opt_state[name], visible, lr_map[name]
            )
            new_trainable[name] = p
            new_opt[name] = st
        gm_new = gm.with_trainable(new_trainable)
        if cfg.apply_exposure:
            exp_p, exp_st = adam_ops.dense_adam_update(
                trainable["exposure"], grads["exposure"], opt_state["exposure"],
                lr=cfg.exposure_lr, step_count=exp_step,
            )
            gm_new = gm_new.replace(exposure=exp_p)
            new_opt["exposure"] = exp_st
        elif "exposure" in opt_state:
            new_opt["exposure"] = opt_state["exposure"]

        bl = lax.psum(budget_lost, axis_name)
        tr = lax.psum(truncated, axis_name)
        metrics = {
            "loss": loss,
            "n_visible": jnp.sum(visible.astype(jnp.int32)),
            "overflow": bl + tr,
            "budget_lost": bl,
            "truncated": tr,
        }
        return gm_new, new_opt, metrics

    step = jax.shard_map(
        device_body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(step)


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
            axis_name=axis_name, n_dev=n_dev, interpret=interpret,
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
