"""Mid-run checkpoint/resume — a capability the reference lacks (SURVEY.md §5:
"save-only, at end of run ... No loader, no optimizer-state checkpoint").

Snapshot = GaussianMap arrays + sparse-Adam moments + trainer bookkeeping, in one
compressed npz (portable, dependency-free). PLY export (io.ply) remains the
ecosystem-interop path; this is the exact-resume path.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_lic_tpu.models.gaussians import GaussianMap
from gaussian_lic_tpu.ops.adam import AdamState

_FORMAT_VERSION = 1


def save_checkpoint(path: str, gm: GaussianMap, opt_state: Optional[dict] = None,
                    extra: Optional[Dict[str, Any]] = None) -> None:
    payload: Dict[str, np.ndarray] = {
        "format_version": np.asarray(_FORMAT_VERSION),
        "sh_degree": np.asarray(gm.sh_degree),
        "skybox_count": np.asarray(gm.skybox_count),
        "count": np.asarray(gm.count),
        "xyz": np.asarray(gm.xyz),
        "dc": np.asarray(gm.dc),
        "sh_rest": np.asarray(gm.sh_rest),
        "log_scale": np.asarray(gm.log_scale),
        "quat": np.asarray(gm.quat),
        "opa_logit": np.asarray(gm.opa_logit),
        "exposure": np.asarray(gm.exposure),
    }
    if opt_state is not None:
        for name, st in opt_state.items():
            payload[f"opt_{name}_m"] = np.asarray(st.exp_avg)
            payload[f"opt_{name}_v"] = np.asarray(st.exp_avg_sq)
    if extra:
        for k, v in extra.items():
            payload[f"extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, **payload)


def load_checkpoint(path: str) -> Tuple[GaussianMap, Optional[dict], Dict[str, Any]]:
    z = np.load(path, allow_pickle=False)
    if int(z["format_version"]) != _FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {int(z['format_version'])}")
    gm = GaussianMap(
        xyz=jnp.asarray(z["xyz"]),
        dc=jnp.asarray(z["dc"]),
        sh_rest=jnp.asarray(z["sh_rest"]),
        log_scale=jnp.asarray(z["log_scale"]),
        quat=jnp.asarray(z["quat"]),
        opa_logit=jnp.asarray(z["opa_logit"]),
        count=jnp.asarray(z["count"], jnp.int32),
        exposure=jnp.asarray(z["exposure"]),
        sh_degree=int(z["sh_degree"]),
        skybox_count=int(z["skybox_count"]),
    )
    opt_names = sorted(
        {k[len("opt_"):-2] for k in z.files if k.startswith("opt_") and k.endswith("_m")}
    )
    opt_state = None
    if opt_names:
        opt_state = {
            name: AdamState(
                jnp.asarray(z[f"opt_{name}_m"]), jnp.asarray(z[f"opt_{name}_v"])
            )
            for name in opt_names
        }
    extra = {k[len("extra_"):]: z[k] for k in z.files if k.startswith("extra_")}
    return gm, opt_state, extra
