"""Streaming mapping engine: initialize → per-keyframe extend + optimize → eval.

The TPU rebuild of the reference mapping thread (mapping.cpp:124-200) and the
training/densification free functions (gaussian.cpp:499-719):

  * `train_step` — one jit-compiled program per map capacity: render (tiled Pallas
    rasterizer) → 0.8·L1 + 0.2·(1−SSIM) (gaussian.cpp:691) → custom-VJP backward →
    visibility-masked sparse Adam on all six groups (optim_utils.h semantics).
    Fused end-to-end; there is no kernel-launch or autograd-tape overhead to bracket
    with timers, so phase timing reports whole steps (PhaseTimers; `--profile`
    in the CLI captures a jax.profiler trace for op-level detail).
  * `extend_step` — densification (extend, gaussian.cpp:499-638): alpha-only render
    of the newest keyframe, project accumulated LiDAR points, per-pixel min-depth
    dedup **on device via one sort** (replacing the CPU std::unordered_map round
    trip, gaussian.cpp:553-581 — a perf cliff the reference pays every keyframe),
    filter (in-image ∧ obs-depth>0 ∧ alpha<0.99), then masked append into the
    padded map (no optimizer-state splice needed; cf. C8).
  * `MappingEngine` — the host-side driver with the reference's keyframe cadence
    (every k-th frame trains, others become held-out test views, gaussian.cpp:75-108)
    and ≤100 random-past-keyframe optimization per keyframe (gaussian.cpp:640-719).
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_lic_tpu.camera import Camera, Intrinsics
from gaussian_lic_tpu.config import Params
from gaussian_lic_tpu.engine.dataset import (
    FrameInput,
    KeyframeBuffer,
    PointAccumulator,
    TestCamera,
    build_camera,
)
from gaussian_lic_tpu.models.gaussians import (
    GaussianMap,
    LearningRates,
    append_gaussians,
    initialize_map,
    point_attributes,
)
from gaussian_lic_tpu.ops import adam as adam_ops
from gaussian_lic_tpu.ops import losses
from gaussian_lic_tpu.ops.rasterize import _splat_budget_for, render_map

PARAM_GROUPS = ("xyz", "dc", "sh_rest", "opacity", "log_scale", "quat")


@dataclass
class PhaseTimers:
    """Reference-style accumulated phase timers (mapping.cpp:188-195)."""

    total_mapping: float = 0.0
    optimize_steps: float = 0.0
    adding: float = 0.0
    extending: float = 0.0
    compiles: int = 0


@functools.lru_cache(maxsize=8)
def _make_train_step_body(intr: Intrinsics, cfg: Params, with_grads: bool = False):
    """The raw (unjitted) train-step function — jitted directly by
    `_make_train_step` and scanned by `_make_train_bundle`. `with_grads=True`
    adds the raw pre-Adam gradient pytree to the metrics — used only by parity
    checks (the multichip dryrun compares gradients, which are
    reduction-order-robust, instead of post-Adam params, whose sparse-Adam
    update is sign(g)·lr-scaled and therefore chaotic where the true gradient
    is fp-cancellation noise)."""
    lrs = LearningRates.from_params(cfg)

    def train_step(gm: GaussianMap, opt_state, kf: KeyframeBuffer, idx, exp_step):
        cam = kf.camera(intr, idx)
        gt = kf.images[idx].astype(jnp.float32) / 255.0

        def loss_fn(trainable):
            gm2 = gm.with_trainable(trainable)
            if cfg.apply_exposure:
                gm2 = gm2.replace(exposure=trainable["exposure"])
            out = render_map(
                gm2, cam,
                apply_exposure=cfg.apply_exposure,
                tile_h=cfg.tile_h, tile_w=cfg.tile_w,
                max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
                max_total_splats=_splat_budget(gm.capacity, cfg),
            )
            loss = losses.training_loss(out.image, gt, cfg.lambda_dssim)
            if cfg.lambda_erank > 0:
                from gaussian_lic_tpu.ops.erank import erank_regularizer

                loss = loss + erank_regularizer(gm2.scaling, cfg.lambda_erank)
            return loss, out

        trainable = gm.trainable()
        if cfg.apply_exposure:
            trainable = dict(trainable, exposure=gm.exposure)
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)

        visible = out.visible & gm.active_mask()
        lr_map = dict(
            xyz=lrs.xyz, dc=lrs.dc, sh_rest=lrs.sh_rest,
            opacity=lrs.opacity, log_scale=lrs.log_scale, quat=lrs.quat,
        )
        new_trainable = {}
        new_opt = {}
        for name in PARAM_GROUPS:
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

        metrics = {
            "loss": loss,
            "n_visible": jnp.sum(visible.astype(jnp.int32)),
            "overflow": out.overflow,
            "budget_lost": out.budget_lost,
            "truncated": out.truncated,
        }
        if with_grads:
            metrics["grads"] = {name: grads[name] for name in PARAM_GROUPS}
        return gm_new, new_opt, metrics

    return train_step


@functools.lru_cache(maxsize=8)
def _make_train_step(intr: Intrinsics, cfg: Params, with_grads: bool = False):
    """One jitted train step (gm, opt, kf, idx, exp_step) → (gm', opt', metrics)."""
    return jax.jit(_make_train_step_body(intr, cfg, with_grads))


@functools.lru_cache(maxsize=16)
def _make_train_bundle(intr: Intrinsics, cfg: Params, k: int):
    """k train steps fused into ONE jitted dispatch via lax.scan.

    Through the axon tunnel every dispatch pays a ~5 ms floor (PERF.md), so the
    reference's 100-sequential-launch optimize loop (gaussian.cpp:674-713) costs
    ~0.5 s/keyframe in pure overhead if translated 1:1. Scanning the step body
    compiles it once and runs the k iterations device-side back-to-back.

    Signature: (gm, opt, kf, idxs (k,) int32, es0 () int32) →
    (gm', opt', metrics) with metrics aggregated across the bundle:
    loss/n_visible from the LAST step, visible_sum summed, budget_lost /
    truncated maxed (a mid-bundle binning overflow must trigger the engine's
    splat-budget growth even if the final step fit)."""
    body = _make_train_step_body(intr, cfg)

    @jax.jit
    def train_bundle(gm: GaussianMap, opt_state, kf: KeyframeBuffer, idxs, es0):
        ess = es0 + jnp.arange(k, dtype=jnp.int32)

        def scan_body(carry, x):
            gm, opt_state = carry
            idx, es = x
            gm, opt_state, m = body(gm, opt_state, kf, idx, es)
            return (gm, opt_state), (
                m["loss"], m["n_visible"], m["budget_lost"], m["truncated"]
            )

        (gm, opt_state), (loss_h, vis_h, bl_h, tr_h) = jax.lax.scan(
            scan_body, (gm, opt_state), (idxs, ess)
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
        return gm, opt_state, metrics

    return train_bundle


def _decompose_bundles(n: int, sizes: tuple) -> List[int]:
    """Greedy decomposition of n iterations into the configured bundle sizes
    (always terminates: a trailing 1 is implied)."""
    sizes = tuple(sorted(set(sizes) | {1}, reverse=True))
    out: List[int] = []
    for s in sizes:
        while n >= s:
            out.append(s)
            n -= s
    return out


_splat_budget = _splat_budget_for


@functools.lru_cache(maxsize=8)
def _make_extend_step(intr: Intrinsics, cfg: Params):
    W, H = intr.width, intr.height
    BIG = np.int32(1 << 30)

    @jax.jit
    def extend_step(
        gm: GaussianMap,
        kf: KeyframeBuffer,
        kf_idx,
        pts,        # (M,3) world points (padded)
        cols,       # (M,3)
        obs_depth,  # (M,) camera depth at observation frame
        pts_valid,  # (M,) bool
    ):
        cam = kf.camera(intr, kf_idx)
        out = render_map(
            gm, cam, no_color=True,
            tile_h=cfg.tile_h, tile_w=cfg.tile_w,
            max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
            max_total_splats=_splat_budget(gm.capacity, cfg),
        )
        alpha = 1.0 - out.final_T  # (H,W) (gaussian.cpp:507)

        # project into the newest keyframe (gaussian.cpp:541-551: x·fx/z + cx, floored)
        p_cam = jnp.matmul(pts, cam.pose.R_cw.T,
                           precision=jax.lax.Precision.HIGHEST) + cam.pose.t_cw
        z = p_cam[:, 2]
        safe_z = jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
        xpix = jnp.floor(p_cam[:, 0] * intr.fx / safe_z + intr.cx).astype(jnp.int32)
        ypix = jnp.floor(p_cam[:, 1] * intr.fy / safe_z + intr.cy).astype(jnp.int32)
        in_img = (xpix >= 0) & (xpix < W) & (ypix >= 0) & (ypix < H)
        xc = jnp.clip(xpix, 0, W - 1)
        yc = jnp.clip(ypix, 0, H - 1)
        not_opaque = alpha[yc, xc] < 0.99  # gaussian.cpp:599
        positive = obs_depth > 0.0         # gaussian.cpp:595

        cand = pts_valid & in_img
        # per-pixel min-camera-depth dedup via one two-key sort
        # (replaces the CPU hash map, gaussian.cpp:553-581)
        pix_id = jnp.where(cand, yc * W + xc, BIG)
        order_keys = jax.lax.sort(
            (pix_id, z, jnp.arange(pts.shape[0], dtype=jnp.int32)), num_keys=2
        )
        s_pid, _s_z, s_idx = order_keys
        first = jnp.concatenate(
            [jnp.ones((1,), bool), s_pid[1:] != s_pid[:-1]]
        )
        winner = first & (s_pid < BIG)

        # gather everything into sorted order; append in that order
        sp = pts[s_idx]
        sc = cols[s_idx]
        sd = obs_depth[s_idx]
        valid = (
            winner
            & cand[s_idx]
            & positive[s_idx]
            & not_opaque[s_idx]
        )
        focal = (intr.fx + intr.fy) / 2.0  # gaussian.cpp:547
        _, dc, _, log_scale, _, opa = point_attributes(
            sp, sc, sd, focal, cfg.scaling_scale, gm.sh_rest.shape[1]
        )
        gm_new = append_gaussians(gm, sp, dc, log_scale, opa, valid)
        return gm_new, jnp.sum(valid.astype(jnp.int32))

    return extend_step


class MappingEngine:
    """Host-side streaming driver (the mapping thread, mapping.cpp:124-185).

    Pass a `jax.sharding.Mesh` to run every training step tile-band-sharded
    across the mesh (parallel.sharded) — the single-chip and sharded steps are
    numerically interchangeable (tests/test_parallel.py)."""

    def __init__(self, cfg: Params, result_path: Optional[str] = None,
                 lpips_path: Optional[str] = None, mesh=None):
        self.cfg = cfg
        self.intr = Intrinsics(
            width=cfg.width, height=cfg.height,
            fx=cfg.fx, fy=cfg.fy, cx=cfg.cx, cy=cfg.cy,
            znear=cfg.znear, zfar=cfg.zfar,
        )
        self.mesh = mesh  # training dispatches via _get_bundle (scan bundles)
        self.result_path = result_path
        self.lpips_path = lpips_path
        self.gm: Optional[GaussianMap] = None
        self.opt_state: Optional[Dict] = None
        self.kf_buffer = KeyframeBuffer.empty(cfg.max_train_keyframes, self.intr)
        self.kf_count = 0
        self.test_cameras: List[TestCamera] = []
        self.accum = PointAccumulator()
        self.all_frame_num = 0
        self.exposure_steps = 0
        self.timers = PhaseTimers()
        self.rng = np.random.default_rng(cfg.seed)
        self.last_metrics: Dict[str, float] = {}
        self._overflow_warned = False
        self._kf_names: List[str] = []
        self._extend_shapes: set = set()
        self._bundles: Dict[int, object] = {}

    # ------------------------------------------------------------------ frames

    @property
    def initialized(self) -> bool:
        return self.gm is not None

    def add_frame(self, frame: FrameInput) -> bool:
        """Process one aligned frame; returns True if it became a keyframe
        (Dataset::addFrame + mapping loop steps [2]-[5])."""
        t0 = time.perf_counter()
        self.accum.add(frame)
        is_kf = (self.all_frame_num + 1) % self.cfg.select_every_k_frame == 0
        frame_id = self.all_frame_num
        self.all_frame_num += 1

        if not is_kf:
            self.test_cameras.append(
                TestCamera(
                    name=f"test_{frame_id:04d}",
                    R_wc=np.asarray(frame.R_wc, np.float32),
                    t_wc=np.asarray(frame.t_wc, np.float32),
                    image_u8=frame.image_u8(),
                )
            )
            return False

        # --- keyframe path ---
        cam = build_camera(self.intr, frame)
        if self.kf_count >= self.kf_buffer.images.shape[0]:
            # capacity-double the device keyframe buffer (one recompile of the
            # train step at the new shape, like GaussianMap.grow)
            self.kf_buffer = self.kf_buffer.grow(
                2 * self.kf_buffer.images.shape[0]
            )
            self.timers.compiles += 1
        self.kf_buffer = self.kf_buffer.set_frame(self.kf_count, cam, frame.image_u8())
        kf_idx = self.kf_count
        self.kf_count += 1
        self._kf_names.append(f"train_{frame_id:04d}")
        self.timers.adding += time.perf_counter() - t0

        if not self.initialized:
            self._initialize()
        else:
            t0 = time.perf_counter()
            self._extend(kf_idx)
            self.timers.extending += time.perf_counter() - t0
        t0 = time.perf_counter()
        self.optimize()
        self.timers.total_mapping += time.perf_counter() - t0
        return True

    # ------------------------------------------------------------- init/extend

    def _initialize(self) -> None:
        pts, cols, depths = self.accum.take()
        cfg = self.cfg
        self.gm = initialize_map(
            pts, cols, depths,
            focal=(cfg.fx + cfg.fy) / 2.0,
            scaling_scale=cfg.scaling_scale,
            sh_degree=cfg.sh_degree,
            capacity=cfg.initial_capacity,
            skybox_points_num=cfg.skybox_points_num,
            skybox_radius=cfg.skybox_radius,
            seed=cfg.seed,
        )
        self.opt_state = {
            name: adam_ops.AdamState(
                jnp.zeros_like(self.gm.trainable()[name]),
                jnp.zeros_like(self.gm.trainable()[name]),
            )
            for name in PARAM_GROUPS
        }
        if cfg.apply_exposure:
            self.opt_state["exposure"] = adam_ops.AdamState(
                jnp.zeros_like(self.gm.exposure), jnp.zeros_like(self.gm.exposure)
            )

    def _grow_if_needed(self, incoming: int) -> None:
        needed = int(self.gm.count) + incoming
        cap = self.gm.capacity
        if needed <= cap:
            return
        new_cap = cap
        while new_cap < needed:
            new_cap *= 2
        old = self.gm
        self.gm = self.gm.grow(new_cap)
        self.opt_state = {
            name: adam_ops.AdamState(
                _pad_like(st.exp_avg, self.gm.trainable()[name]),
                _pad_like(st.exp_avg_sq, self.gm.trainable()[name]),
            )
            if name in PARAM_GROUPS
            else st
            for name, st in self.opt_state.items()
        }
        self.timers.compiles += 1
        del old

    def _extend(self, kf_idx: int) -> int:
        cfg = self.cfg
        pts, cols, depths = self.accum.take()
        n = pts.shape[0]
        # Process ALL accumulated points — the reference projects and filters
        # every point each keyframe (gaussian.cpp:541-627), so no subsampling.
        # Pad to the next power-of-two bucket ≥ densify_budget: the jitted
        # extend_step then sees a bounded set of shapes (one compile per
        # bucket over the whole run, not one per keyframe).
        M = cfg.densify_budget
        while M < n:
            M *= 2
        if M not in self._extend_shapes:
            self._extend_shapes.add(M)
            self.timers.compiles += 1
        self._grow_if_needed(n)
        pad = M - n
        pts_p = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
        cols_p = np.concatenate([cols, np.zeros((pad, 3), np.float32)])
        dep_p = np.concatenate([depths, np.zeros((pad,), np.float32)])
        valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        extend_step = _make_extend_step(self.intr, cfg)
        self.gm, added = extend_step(
            self.gm, self.kf_buffer, jnp.asarray(kf_idx),
            jnp.asarray(pts_p), jnp.asarray(cols_p), jnp.asarray(dep_p),
            jnp.asarray(valid),
        )
        return int(added)

    # ---------------------------------------------------------------- optimize

    def _get_bundle(self, k: int):
        """Jitted k-step scan bundle for the current config (compiled once per
        distinct k; the cache is dropped when the config changes)."""
        fn = self._bundles.get(k)
        if fn is None:
            if self.mesh is not None:
                from gaussian_lic_tpu.parallel import make_sharded_train_bundle

                fn = make_sharded_train_bundle(self.intr, self.cfg, self.mesh, k)
            else:
                fn = _make_train_bundle(self.intr, self.cfg, k)
            self._bundles[k] = fn
            self.timers.compiles += 1
        return fn

    def optimize(self, max_iters: Optional[int] = None) -> float:
        """≤100 iterations over shuffled random past keyframes
        (optimize, gaussian.cpp:640-719). Returns mean #updated Gaussians.

        Iterations are dispatched as jitted lax.scan bundles (cfg.opt_bundle_sizes;
        100 → 4 dispatches) — the exact iteration count and keyframe order are
        unchanged, only the dispatch overhead is amortized (~5 ms/dispatch
        through the axon tunnel, PERF.md)."""
        cfg = self.cfg
        max_iters = max_iters or cfg.max_iters_per_keyframe
        n_kf = self.kf_count
        if n_kf == 0 or not self.initialized:
            return 0.0
        if n_kf <= max_iters:
            opt_list = np.arange(n_kf)
        else:
            opt_list = self.rng.choice(n_kf, size=max_iters, replace=False)
        self.rng.shuffle(opt_list)
        if len(opt_list) == 0:
            return 0.0
        opt_list = opt_list.astype(np.int32)

        visible_sums = []
        budget_losses = []
        truncations = []
        t0 = time.perf_counter()
        pos = 0
        for k in _decompose_bundles(len(opt_list), cfg.opt_bundle_sizes):
            bundle = self._get_bundle(k)
            idxs = jnp.asarray(opt_list[pos:pos + k])
            pos += k
            self.gm, self.opt_state, metrics = bundle(
                self.gm, self.opt_state, self.kf_buffer, idxs,
                jnp.asarray(self.exposure_steps + 1, jnp.int32),
            )
            self.exposure_steps += k
            # keep metrics on device: a host read here would sync with
            # execution (≥1 tunnel RTT per dispatch)
            visible_sums.append(metrics["visible_sum"])
            budget_losses.append(metrics["budget_lost"])
            truncations.append(metrics["truncated"])
        jax.block_until_ready(self.gm.xyz)
        self.timers.optimize_steps += time.perf_counter() - t0
        # one stacked device→host fetch per metric list
        updated = int(np.sum(np.asarray(jnp.stack(visible_sums))))
        self.last_metrics = {
            k_: float(v) for k_, v in metrics.items() if k_ != "visible_sum"
        }
        # Overflow is accumulated over EVERY step of the batch (a mid-batch
        # overflow must trigger growth this keyframe, not only when it happens
        # to recur on the final iteration).
        max_budget_lost = int(np.max(np.asarray(jnp.stack(budget_losses))))
        max_truncated = int(np.max(np.asarray(jnp.stack(truncations))))
        self.last_metrics["budget_lost"] = float(max_budget_lost)
        self.last_metrics["truncated"] = float(max_truncated)
        self.last_metrics["overflow"] = float(max_budget_lost + max_truncated)
        if max_budget_lost > 0 or max_truncated > 0:
            self._handle_overflow(max_budget_lost, max_truncated)
        return updated / max(len(opt_list), 1)

    def _handle_overflow(self, budget_lost: int, truncated: int) -> None:
        """Binning overflow → grow the splat-list budget ×1.5 and recompile at
        the new static shape (the reference resizes its splat buffers lazily the
        same way, rasterize_points.cu:40-48). Only `budget_lost` slots are
        fixable this way; `truncated` slots come from rects wider than the
        per-Gaussian K-slot limit — only a larger `max_tiles_per_gaussian`
        can fix those, so warn immediately instead of growing."""
        cfg = self.cfg
        if truncated > 0 and not self._overflow_warned:
            self._overflow_warned = True
            print(
                f"[gaussian-lic-tpu] WARNING: {truncated} rect tiles truncated "
                "at the per-Gaussian slot cap — large-footprint Gaussians "
                "(e.g. skybox) exceed max_tiles_per_gaussian="
                f"{cfg.max_tiles_per_gaussian}; raise it (16/32) to render "
                "them fully"
            )
        if budget_lost <= 0:
            return
        if cfg.splat_budget_factor < cfg.max_tiles_per_gaussian:
            # grow from the EFFECTIVE budget (the factor may sit below the
            # 4096-entry floor of _splat_budget_for at small capacities)
            cap = max(self.gm.capacity, 1)
            eff = _splat_budget(cap, cfg) / cap
            new_f = min(
                max(cfg.splat_budget_factor, eff) * 1.5,
                float(cfg.max_tiles_per_gaussian),
            )
            self.cfg = cfg.replace(splat_budget_factor=new_f)
            self.timers.compiles += 1
            self._bundles.clear()  # budget is baked into the compiled programs
            print(
                f"[gaussian-lic-tpu] binning overflow ({budget_lost} slots "
                "past the splat budget): splat budget grows "
                f"{cfg.splat_budget_factor:g} -> {new_f:g} entries/Gaussian "
                "(one recompile)"
            )
        elif not self._overflow_warned:
            self._overflow_warned = True
            print(
                f"[gaussian-lic-tpu] WARNING: binning overflow ({budget_lost} "
                "slots) with the splat budget already at the per-Gaussian "
                "slot cap — raise max_tiles_per_gaussian to grow further"
            )

    # ---------------------------------------------------------------- finalize

    def finalize(self) -> Dict[str, float]:
        """End-of-stream: stats, eval, PLY export (mapping.cpp:186-199)."""
        from gaussian_lic_tpu.engine.evaluate import evaluate_visual_quality
        from gaussian_lic_tpu.io.ply import save_map_ply

        results: Dict[str, float] = {}
        if not self.initialized:
            return results
        results.update(
            evaluate_visual_quality(
                self, result_path=self.result_path, lpips_path=self.lpips_path
            )
        )
        if self.result_path:
            import os

            os.makedirs(self.result_path, exist_ok=True)
            save_map_ply(f"{self.result_path}/point_cloud.ply", self.gm)
        results["num_gaussians"] = float(int(self.gm.count))
        return results

    def train_camera(self, idx: int) -> Camera:
        return self.kf_buffer.camera(self.intr, jnp.asarray(idx, jnp.int32))

    def measure_phase_split(self, iters: int = 5) -> Dict[str, float]:
        """Forward/backward/optimizer wall-time split per train iteration
        (the reference prints these live, mapping.cpp:188-195; gaussian.h:179).

        The production step is ONE fused XLA program — per-phase times are not
        observable during training without serializing it. This compiles two
        nested prefixes of the step (loss only; loss+gradients) once on the
        final map state and differences their timings: fwd = t(loss),
        bwd = t(grad) − t(loss), optim = t(step) − t(grad). There is no
        CPU2GPU phase by design: keyframes are device-resident (C4 redesign).
        Single-chip only (the sharded step's phases overlap with collectives).
        """
        if not self.initialized or self.kf_count == 0:
            return {}
        if self.mesh is not None:
            print("[phase-split] sharded step: phases overlap with ICI "
                  "collectives; reporting whole-step only")
            return {}
        cfg = self.cfg
        intr = self.intr

        @jax.jit
        def fwd_only(gm, kf, idx):
            cam = kf.camera(intr, idx)
            gt = kf.images[idx].astype(jnp.float32) / 255.0
            out = render_map(
                gm, cam, apply_exposure=cfg.apply_exposure,
                tile_h=cfg.tile_h, tile_w=cfg.tile_w,
                max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
                max_total_splats=_splat_budget(gm.capacity, cfg),
            )
            return losses.training_loss(out.image, gt, cfg.lambda_dssim)

        @jax.jit
        def fwd_bwd(gm, kf, idx):
            def loss_fn(trainable):
                gm2 = gm.with_trainable(trainable)
                out = render_map(
                    gm2, cam, apply_exposure=cfg.apply_exposure,
                    tile_h=cfg.tile_h, tile_w=cfg.tile_w,
                    max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
                    max_total_splats=_splat_budget(gm.capacity, cfg),
                )
                return losses.training_loss(out.image, gt, cfg.lambda_dssim)

            cam = kf.camera(intr, idx)
            gt = kf.images[idx].astype(jnp.float32) / 255.0
            loss, grads = jax.value_and_grad(loss_fn)(gm.trainable())
            return loss, grads

        step = _make_train_step(intr, cfg)
        idx = jnp.asarray(0, jnp.int32)
        es = jnp.asarray(max(self.exposure_steps, 1), jnp.int32)

        def timeit(fn):
            fn(self.gm, self.kf_buffer, idx)  # compile + warm
            eps = 0.0
            t0 = time.perf_counter()
            for _ in range(iters):
                eps += 1e-7  # fresh params per call → no dispatch memoization
                gm_j = self.gm.replace(xyz=self.gm.xyz + eps)
                out = fn(gm_j, self.kf_buffer, idx)
            jax.block_until_ready(out)
            return (time.perf_counter() - t0) / iters * 1e3

        t_fwd = timeit(fwd_only)
        t_fb = timeit(lambda gm, kf, i: fwd_bwd(gm, kf, i)[0])
        t_step = timeit(
            lambda gm, kf, i: step(gm, self.opt_state, kf, i, es)[0].xyz
        )
        split = {
            "forward_ms": round(t_fwd, 2),
            "backward_ms": round(max(t_fb - t_fwd, 0.0), 2),
            "optimizer_ms": round(max(t_step - t_fb, 0.0), 2),
            "whole_step_ms": round(t_step, 2),
        }
        print("===== per-phase step split (cf. mapping.cpp:188-195) =====")
        print(f"  forward   : {split['forward_ms']:.2f} ms")
        print(f"  backward  : {split['backward_ms']:.2f} ms")
        print(f"  optimizer : {split['optimizer_ms']:.2f} ms")
        print(f"  whole step: {split['whole_step_ms']:.2f} ms  "
              "(CPU2GPU: none — keyframes are device-resident)")
        return split


def _pad_like(x: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    extra = target.shape[0] - x.shape[0]
    if extra <= 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((extra,) + x.shape[1:], x.dtype)], axis=0
    )
