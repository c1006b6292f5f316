"""Evaluation harness (reference C19: evaluateVisualQuality, gaussian.cpp:721-831).

Renders every train keyframe and every held-out in-sequence test view, computes
PSNR / SSIM / LPIPS per split, and dumps render/ and gt/ image pairs. LPIPS uses
the same torchscript AlexNet-LPIPS artifact the reference loads (lpips_alex.pt via
lpips_path, gaussian.cpp:740-749); when absent the metric is skipped gracefully
(the reference would print a load error and crash later — we degrade instead).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_lic_tpu.ops.blend_pallas import CHUNK

from gaussian_lic_tpu.camera import make_camera
from gaussian_lic_tpu.ops import losses
from gaussian_lic_tpu.ops.rasterize import _splat_budget_for, render_map


class LpipsScorer:
    """Pure-JAX AlexNet-LPIPS fed [0,1] images, mirroring gaussian.cpp:740-765.
    Weights come from the lpips_path artifact (.npz / .pth / torchscript .pt —
    ops.lpips.load_lpips_params)."""

    def __init__(self, lpips_path: str):
        from gaussian_lic_tpu.ops.lpips import load_lpips_params, lpips_distance

        self.params = load_lpips_params(lpips_path)
        self._distance = lpips_distance

    def __call__(self, render: np.ndarray, gt: np.ndarray) -> float:
        return float(
            self._distance(
                self.params,
                jnp.asarray(render[None], jnp.float32),
                jnp.asarray(gt[None], jnp.float32),
            )[0]
        )


def _save_image_pair(result_path: str, name: str, render: np.ndarray, gt: np.ndarray):
    try:
        from PIL import Image
    except ImportError:
        return
    os.makedirs(os.path.join(result_path, "render"), exist_ok=True)
    os.makedirs(os.path.join(result_path, "gt"), exist_ok=True)

    def to_u8(img):
        return np.clip(np.transpose(img, (1, 2, 0)) * 255.0, 0, 255).astype(np.uint8)

    Image.fromarray(to_u8(render)).save(os.path.join(result_path, "render", name))
    Image.fromarray(to_u8(gt)).save(os.path.join(result_path, "gt", name))


def evaluate_visual_quality(
    engine,
    result_path: Optional[str] = None,
    lpips_path: Optional[str] = None,
    save_images: bool = True,
) -> Dict[str, Optional[float]]:
    """Returns {train,test}_{psnr,ssim,lpips} means (gaussian.cpp:784-789,824-829).
    lpips is explicitly None when no weights artifact is available — the metric
    is reported as skipped, never silently dropped."""
    cfg = engine.cfg
    intr = engine.intr
    gm = engine.gm
    results: Dict[str, Optional[float]] = {}

    lpips = None
    if lpips_path:
        try:
            lpips = LpipsScorer(lpips_path)
        except Exception as e:  # missing artifact → skip metric, keep evaluating
            print(f"[eval] LPIPS unavailable ({e}); reporting lpips=None — "
                  "export a weights artifact with tools/export_lpips.py "
                  "(see README, 'LPIPS weights')")
    else:
        print("[eval] LPIPS skipped: no lpips_path configured; reporting "
              "lpips=None (see README, 'LPIPS weights')")

    # Eval renders use the SAME splat budget as training (the reference evals
    # with identical rasterizer settings, gaussian.cpp:753) — including any
    # budget the trainer auto-grew mid-run via cfg.splat_budget_factor. A
    # render whose binning loses entries past the budget would silently
    # truncate the image and inflate/deflate PSNR, so budget overflow during
    # eval grows the budget and re-renders the view (one recompile per growth).
    budget = {"m": _splat_budget_for(gm.capacity, cfg)}

    @functools.partial(jax.jit, static_argnames=("m",))
    def _render_train(gm, kf, idx, m):
        cam = kf.camera(intr, idx)
        out = render_map(
            gm, cam,
            apply_exposure=cfg.apply_exposure,
            tile_h=cfg.tile_h, tile_w=cfg.tile_w,
            max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
            max_total_splats=m,
        )
        return jnp.clip(out.image, 0.0, 1.0), out.budget_lost, out.truncated

    def _render_clean(render_once):
        """Render, growing the splat budget until no entries are lost to it."""
        while True:
            image, budget_lost, truncated = render_once(budget["m"])
            if int(budget_lost) == 0:
                if int(truncated) > 0:
                    print(f"[eval] WARNING: {int(truncated)} rect tiles "
                          "truncated at the per-Gaussian slot cap during eval; "
                          "raise max_tiles_per_gaussian for full fidelity")
                return np.asarray(image)
            new_m = int(budget["m"] * 1.5 + CHUNK - 1) // CHUNK * CHUNK
            # P·K slots exist in total, so the budget can always reach clean
            new_m = min(new_m, gm.capacity * cfg.max_tiles_per_gaussian)
            print(f"[eval] splat budget overflow ({int(budget_lost)} entries "
                  f"lost): budget grows {budget['m']} -> {new_m}, re-rendering")
            budget["m"] = new_m

    def run_split(cameras, names, images, render_fn):
        psnrs, ssims, lpipss = [], [], []
        for i, name in enumerate(names):
            rendered = render_fn(i)
            gt = images[i].astype(np.float32) / 255.0
            gt = np.transpose(gt, (2, 0, 1)) if gt.ndim == 3 and gt.shape[-1] == 3 else gt
            gt = np.clip(gt, 0.0, 1.0)
            psnrs.append(float(losses.psnr(jnp.asarray(rendered), jnp.asarray(gt))))
            ssims.append(float(losses.ssim(jnp.asarray(rendered), jnp.asarray(gt))))
            if lpips is not None:
                lpipss.append(lpips(rendered, gt))
            if save_images and result_path:
                _save_image_pair(result_path, f"{name}.jpg".replace(".jpg", ".png"), rendered, gt)
        out = {}
        if psnrs:
            out["psnr"] = float(np.mean(psnrs))
            out["ssim"] = float(np.mean(ssims))
            # One of the reference's three headline metrics: never drop it
            # silently — None means "no weights artifact" (gaussian.cpp:740-749
            # loads lpips_alex.pt; ours comes from lpips_path, see README).
            out["lpips"] = float(np.mean(lpipss)) if lpipss else None
        return out

    # train split (device keyframe buffer)
    train_names = engine._kf_names
    train_imgs = [
        np.transpose(np.asarray(engine.kf_buffer.images[i]), (1, 2, 0))
        for i in range(engine.kf_count)
    ]
    tr = run_split(
        None, train_names, train_imgs,
        lambda i: _render_clean(
            lambda m: _render_train(
                gm, engine.kf_buffer, jnp.asarray(i, jnp.int32), m=m
            )
        ),
    )
    for k, v in tr.items():
        results[f"train_{k}"] = v

    # test split: one jitted (gm, R, t) → image with the pose as traced
    # arguments, so hundreds of held-out views render at kernel speed instead
    # of dispatching the projection/packing ops eagerly per camera
    @functools.partial(jax.jit, static_argnames=("m",))
    def _render_pose(gm, R_wc, t_wc, m):
        cam = make_camera(intr, R_wc, t_wc)
        out = render_map(
            gm, cam,
            apply_exposure=cfg.apply_exposure,
            tile_h=cfg.tile_h, tile_w=cfg.tile_w,
            max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
            max_total_splats=m,
        )
        return jnp.clip(out.image, 0.0, 1.0), out.budget_lost, out.truncated

    def render_test(i):
        tc = engine.test_cameras[i]
        return _render_clean(
            lambda m: _render_pose(
                gm, jnp.asarray(tc.R_wc, jnp.float32),
                jnp.asarray(tc.t_wc, jnp.float32), m=m,
            )
        )

    te = run_split(
        None,
        [tc.name for tc in engine.test_cameras],
        [tc.image_u8 for tc in engine.test_cameras],
        render_test,
    )
    for k, v in te.items():
        results[f"test_{k}"] = v
    return results
