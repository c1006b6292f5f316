"""LPIPS (AlexNet backbone) as pure JAX — the eval-only perceptual metric.

Reference behavior (C19): a torchscript lpips_alex.pt is loaded from `lpips_path`
and fed [0,1]-clamped (1,3,H,W) image pairs directly (gaussian.cpp:740-765 — no
[-1,1] rescale). The network (reference src/lpips/lpipsPyTorch/modules/): z-score
with shift (−.030,−.088,−.188) / scale (.458,.448,.450), torchvision AlexNet
`features` taps after each of the five ReLUs, unit channel-norm per tap, squared
diff, 1×1 no-bias linear head per tap, spatial mean, sum over taps.

Weights come from an artifact (this environment has no network): either an .npz
produced by `tools/export_lpips.py`, or any torch checkpoint / torchscript module
containing the conv + lin parameters (extracted by shape and name order). When no
artifact is available the metric is skipped — exactly the reference's failure mode
(it prints "lpips model loading failed" and crashes on use; we degrade instead).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet `features` conv stack: (out_ch, in_ch, k, stride, pad)
_CONV_DEFS = [
    (64, 3, 11, 4, 2),
    (192, 64, 5, 1, 2),
    (384, 192, 3, 1, 1),
    (256, 384, 3, 1, 1),
    (256, 256, 3, 1, 1),
]
# max-pool (3, stride 2) sits before convs 1 and 2
_POOL_BEFORE = {1, 2}
N_CHANNELS = [64, 192, 384, 256, 256]


def _conv2d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
            stride: int, pad: int) -> jnp.ndarray:
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
    # HIGHEST: TPU convs otherwise run in bf16 on the MXU, drifting the metric
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)], dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST,
    )
    return y + b[None, :, None, None]


def _maxpool3s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(3, 2) — VALID (floor) padding."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, 3, 3), window_strides=(1, 1, 2, 2),
        padding="VALID",
    )


def _normalize_channels(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    return x / (norm + eps)


def alexnet_features(params: Dict[str, jnp.ndarray], x: jnp.ndarray) -> List[jnp.ndarray]:
    """Five unit-normalized feature taps for (B,3,H,W) input in [0,1]."""
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / jnp.asarray(_SCALE)[None, :, None, None]
    feats = []
    for i, (_o, _i, _k, stride, pad) in enumerate(_CONV_DEFS):
        if i in _POOL_BEFORE:
            x = _maxpool3s2(x)
        x = _conv2d(x, params[f"conv{i}_w"], params[f"conv{i}_b"], stride, pad)
        x = jax.nn.relu(x)
        feats.append(_normalize_channels(x))
    return feats


@functools.partial(jax.jit, static_argnums=())
def lpips_distance(params: Dict[str, jnp.ndarray],
                   a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """LPIPS between (B,3,H,W) images in [0,1]. Returns (B,)."""
    fa = alexnet_features(params, a)
    fb = alexnet_features(params, b)
    total = jnp.zeros((a.shape[0],), jnp.float32)
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        d = (xa - xb) ** 2
        lin = params[f"lin{i}_w"]  # (1, C, 1, 1)
        score = jnp.sum(d * lin[0, :, 0, 0][None, :, None, None], axis=1)
        total = total + jnp.mean(score, axis=(1, 2))
    return total


# ---------------------------------------------------------------------------
# Weight loading
# ---------------------------------------------------------------------------

_EXPECTED_CONV_SHAPES = [
    (o, i, k, k) for (o, i, k, _s, _p) in _CONV_DEFS
]


def _from_named_tensors(named) -> Dict[str, np.ndarray]:
    """Assemble the param dict from (name, array) pairs of any torch export:
    conv weights/biases matched by shape in stack order, lin heads by name order."""
    convs_w = {tuple(s): [] for s in _EXPECTED_CONV_SHAPES}
    biases: List[tuple] = []
    lins: List[tuple] = []
    for name, t in named:
        arr = np.asarray(t, np.float32)
        if arr.ndim == 4 and arr.shape[0] == 1 and arr.shape[2:] == (1, 1):
            lins.append((name, arr))
        elif arr.ndim == 4 and tuple(arr.shape) in convs_w:
            convs_w[tuple(arr.shape)].append((name, arr))
        elif arr.ndim == 1:
            biases.append((name, arr))

    params: Dict[str, np.ndarray] = {}
    bias_by_name = dict(biases)
    for i, shape in enumerate(_EXPECTED_CONV_SHAPES):
        cands = convs_w[tuple(shape)]
        if not cands:
            raise ValueError(f"missing conv{i} weight of shape {shape}")
        # two (256,256,3,3) convs: disambiguate by name order
        cands.sort(key=lambda kv: kv[0])
        name, w = cands.pop(0)
        params[f"conv{i}_w"] = w
        bname = name.replace("weight", "bias")
        if bname in bias_by_name:
            params[f"conv{i}_b"] = bias_by_name[bname]
        else:
            by_len = [b for _n, b in biases if b.shape[0] == shape[0]]
            if not by_len:
                raise ValueError(f"missing conv{i} bias ({shape[0]},)")
            params[f"conv{i}_b"] = by_len[0]
            biases = [nb for nb in biases if nb[1] is not params[f"conv{i}_b"]]
    lins.sort(key=lambda kv: kv[0])
    expect = [(1, c, 1, 1) for c in N_CHANNELS]
    lin_arrays = [a for _n, a in lins]
    if [tuple(a.shape) for a in lin_arrays] != expect:
        # fall back to matching by channel count, keeping name order for ties
        chosen = []
        pool = list(lin_arrays)
        for c in N_CHANNELS:
            for j, a in enumerate(pool):
                if a.shape[1] == c:
                    chosen.append(pool.pop(j))
                    break
            else:
                raise ValueError(f"missing lin head for {c} channels")
        lin_arrays = chosen
    for i, a in enumerate(lin_arrays):
        params[f"lin{i}_w"] = a
    return params


def load_lpips_params(path: str) -> Dict[str, jnp.ndarray]:
    """Load LPIPS-alex params from an .npz, a torch checkpoint (.pth state_dict),
    or a torchscript module (.pt) — e.g. the reference's lpips_alex.pt artifact.

    The sentinel path "randinit" (or "randinit:<seed>") builds a deterministic
    He-initialized instance in-process instead of reading a file — see
    randinit_lpips_params for what that metric is and is not."""
    if path == "randinit" or path.startswith("randinit:"):
        seed = int(path.split(":", 1)[1]) if ":" in path else 0
        print(
            "[lpips] using the RANDOM-INIT AlexNet-LPIPS metric "
            f"(seed {seed}): self-consistent perceptual distance, NOT "
            "comparable to published LPIPS numbers — supply a trained "
            "lpips_alex artifact for those (tools/export_lpips.py)"
        )
        return randinit_lpips_params(seed)
    if os.path.isdir(path):
        for cand in ("lpips_alex.npz", "lpips_alex.pt", "lpips_alex.pth"):
            p = os.path.join(path, cand)
            if os.path.exists(p):
                path = p
                break
        else:
            raise FileNotFoundError(f"no lpips_alex.{{npz,pt,pth}} under {path}")
    if path.endswith(".npz"):
        with np.load(path) as z:
            raw = {k: z[k] for k in z.files}
        if all(f"conv{i}_w" in raw for i in range(5)):
            params = raw
        else:
            params = _from_named_tensors(sorted(raw.items()))
    else:
        import torch  # CPU-only here; eval-time only

        try:
            mod = torch.jit.load(path, map_location="cpu")
            named = [(n, p.detach().numpy()) for n, p in mod.named_parameters()]
            named += [(n, b.detach().numpy()) for n, b in mod.named_buffers()
                      if b.ndim in (1, 4)]
        except RuntimeError:
            sd = torch.load(path, map_location="cpu", weights_only=True)
            named = [(n, t.numpy()) for n, t in sd.items()]
        params = _from_named_tensors(named)
    return {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}


def random_lpips_params(seed: int = 0) -> Dict[str, jnp.ndarray]:
    """Random-weight instance (for architecture tests — NOT a trained metric)."""
    rng = np.random.default_rng(seed)
    params: Dict[str, np.ndarray] = {}
    for i, (o, ic, k, _s, _p) in enumerate(_CONV_DEFS):
        params[f"conv{i}_w"] = rng.normal(0, 0.05, (o, ic, k, k)).astype(np.float32)
        params[f"conv{i}_b"] = rng.normal(0, 0.01, (o,)).astype(np.float32)
    for i, c in enumerate(N_CHANNELS):
        params[f"lin{i}_w"] = np.abs(rng.normal(0, 0.01, (1, c, 1, 1))).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in params.items()}


def randinit_lpips_params(seed: int = 0) -> Dict[str, jnp.ndarray]:
    """Deterministic randomly-initialized AlexNet-LPIPS (He-init convs, uniform
    1/C lin heads).

    Trained AlexNet weights are not obtainable in this offline environment
    (no torchvision, no cached checkpoints, zero egress), so this is the
    shippable fallback that keeps the full LPIPS pipeline (feature taps →
    channel-norm → squared diff → lin heads → spatial mean) end-to-end
    exercisable and produces a real float. Randomly-initialized CNN features
    are a known serviceable perceptual distance (Amir & Weiss, "Understanding
    and Simplifying Perceptual Distances", CVPR 2021): the metric is
    self-consistent and monotone in perceptual corruption, but its absolute
    values are NOT comparable to published LPIPS-alex numbers. When a trained
    artifact is available, convert it with tools/export_lpips.py and pass its
    path instead — every other code path is identical."""
    rng = np.random.default_rng(np.random.SeedSequence([0x1B1B5, seed]))
    params: Dict[str, np.ndarray] = {}
    for i, (o, ic, k, _s, _p) in enumerate(_CONV_DEFS):
        std = float(np.sqrt(2.0 / (ic * k * k)))  # He init for ReLU stacks
        params[f"conv{i}_w"] = rng.normal(0, std, (o, ic, k, k)).astype(np.float32)
        params[f"conv{i}_b"] = np.zeros((o,), np.float32)
    for i, c in enumerate(N_CHANNELS):
        # uniform non-negative heads: each tap contributes its mean squared
        # channel-normalized feature difference with weight 1/C
        params[f"lin{i}_w"] = np.full((1, c, 1, 1), 1.0 / c, np.float32)
    return {k: jnp.asarray(v) for k, v in params.items()}
