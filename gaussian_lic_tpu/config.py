"""Configuration system.

Mirrors the reference's flat-YAML ``Params`` (mapping.h:53-118, 27 keys across camera
intrinsics, keyframe stride, GS hyper-parameters, learning rates, exposure/skybox
options) as a frozen dataclass, plus the TPU-specific rasterizer/runtime knobs that
have no reference counterpart (tile shape, slot budgets, capacities).

Dataset presets duplicate config/{fastlivo,r3live,mcd}.yaml, which differ only in
intrinsics/resolution (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional


@dataclass(frozen=True)
class Params:
    """All run configuration. Frozen → hashable → usable as a jit static arg."""

    # --- dataset / camera (reference: mapping.h:88-96) ---
    width: int = 640
    height: int = 512
    fx: float = 431.795259219
    fy: float = 431.550090267
    cx: float = 310.833037316
    cy: float = 266.985989326
    select_every_k_frame: int = 5

    # --- gaussian model (mapping.h:98-105) ---
    sh_degree: int = 3
    white_background: bool = False
    random_background: bool = False
    convert_SHs_python: bool = False    # accepted for config parity; unused (always kernel SH)
    compute_cov3D_python: bool = False  # accepted for config parity; unused
    lambda_erank: float = 0.0
    scaling_scale: float = 1.0

    # --- optimization (mapping.h:107-112) ---
    position_lr: float = 0.00016
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    lambda_dssim: float = 0.2

    # --- exposure / skybox (mapping.h:114-117) ---
    apply_exposure: bool = False
    exposure_lr: float = 0.001
    skybox_points_num: int = 100000
    skybox_radius: float = 1000.0

    # --- training loop (gaussian.cpp:645) ---
    max_iters_per_keyframe: int = 100
    # Jitted k-step bundle sizes for the per-keyframe optimization loop. The
    # reference's CUDA loop pays no launch-queueing cost (gaussian.cpp:674-713);
    # through the axon tunnel each XLA dispatch has a ~5 ms floor (PERF.md), so
    # 100 sequential dispatches burn ~0.5 s/keyframe — the whole stream period.
    # The engine decomposes the ≤100-iteration opt list greedily into lax.scan
    # bundles of these sizes (100 → 64+16+16+4 = 4 dispatches; exact iteration
    # count is preserved). Each distinct size compiles once per run.
    opt_bundle_sizes: tuple = (64, 16, 4, 1)

    # --- TPU rasterizer knobs (no reference counterpart; DESIGN.md §2) ---
    tile_h: int = 32             # image-tile height (tile_h*tile_w must be 1024)
    tile_w: int = 32             # square 32x32 tiles minimize splat-tile overlap;
                                 # kernels always compute on the (8,128) f32 vreg
    # Static K tile-slots per Gaussian. Exact culling leaves ~1.7 live
    # tiles/Gaussian on average; rects needing more than K slots are truncated
    # and counted in the render overflow metric. The P·K sorts and the slot-
    # gradient gather scale linearly in K.
    max_tiles_per_gaussian: int = 8
    splat_chunk: int = 16        # splats blended per vectorized step in the Pallas kernel
    # Sorted-splat-list budget as a multiple of capacity. Measured live entries
    # are ~1.4/Gaussian at 1M (32×32 tiles); 1.7 leaves ~24% headroom while
    # keeping the pack/reduction volumes (linear in the budget) tight. The
    # streaming engine auto-grows this ×1.5 (capped at max_tiles_per_gaussian)
    # and recompiles when a step reports binning overflow — the static-shape
    # analogue of the reference's lazy buffer resize (rasterize_points.cu:40-48).
    splat_budget_factor: float = 1.7
    # Multi-chip distributed binning: per-(source device, band) bucket budget as
    # a multiple of the uniform share (splat budget / D²). Buckets ride the
    # all_to_all and set the band splat-list length D·m_pair, which the band
    # merge/pack/blend/reduction volumes all scale with. Spatially clustered
    # Gaussian shards can skew per-pair loads; send-side loss is counted in
    # budget_lost and the engine's splat-budget auto-grow recovers it.
    bucket_overprovision: float = 1.5

    # --- capacity management (DESIGN.md §1) ---
    initial_capacity: int = 1 << 18     # Gaussian array capacity at startup
    # Base padded shape for keyframe extension: candidate point batches pad up
    # to the next power-of-two multiple of this (ALL accumulated points are
    # processed, matching gaussian.cpp:541-627 — this only buckets the compile
    # shapes, it never drops points).
    densify_budget: int = 1 << 16
    max_train_keyframes: int = 512      # capacity of the stacked train-camera buffer

    # --- misc ---
    znear: float = 0.01
    zfar: float = 100.0
    seed: int = 0

    def __post_init__(self) -> None:
        # YAML gives lists; Params must stay hashable (jit static arg)
        if not isinstance(self.opt_bundle_sizes, tuple):
            object.__setattr__(
                self, "opt_bundle_sizes", tuple(self.opt_bundle_sizes)
            )

    @property
    def num_sh_rest(self) -> int:
        return (self.sh_degree + 1) ** 2 - 1

    def replace(self, **kw: Any) -> "Params":
        return dataclasses.replace(self, **kw)


# Reference dataset presets: config/fastlivo.yaml, config/r3live.yaml, config/mcd.yaml.
PRESETS: Dict[str, Dict[str, Any]] = {
    "fastlivo": dict(
        width=640, height=512,
        fx=431.795259219, fy=431.550090267, cx=310.833037316, cy=266.985989326,
    ),
    "r3live": dict(
        width=640, height=512,
        fx=431.71205, fy=431.70855, cx=320.3404, cy=259.1696,
    ),
    "mcd": dict(
        width=640, height=480,
        fx=385.538839108671, fy=385.6733947077097,
        cx=328.2882031921083, cy=243.5295974916248,
    ),
}


def load_params(
    path: Optional[str] = None,
    preset: Optional[str] = None,
    **overrides: Any,
) -> Params:
    """Build Params from a YAML file (reference schema), a named preset, or kwargs.

    YAML keys follow the reference config files exactly (config/fastlivo.yaml:1-28);
    unknown keys raise to catch typos, matching the reference's eager YAML::as<T>
    failure mode (mapping.h:56-86).
    """
    fields = {f.name for f in dataclasses.fields(Params)}
    kw: Dict[str, Any] = {}
    if preset is not None:
        if preset not in PRESETS:
            raise KeyError(f"unknown preset {preset!r}; have {sorted(PRESETS)}")
        kw.update(PRESETS[preset])
    if path is not None:
        import yaml  # lazy: only needed for file configs

        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        unknown = set(raw) - fields
        if unknown:
            raise KeyError(f"unknown config keys in {path}: {sorted(unknown)}")
        kw.update(raw)
    unknown = set(overrides) - fields
    if unknown:
        raise KeyError(f"unknown config overrides: {sorted(unknown)}")
    kw.update(overrides)
    return Params(**kw)
