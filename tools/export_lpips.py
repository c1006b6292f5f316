"""Convert an LPIPS-alex torch artifact to the .npz consumed by ops.lpips.

Usage:
    python tools/export_lpips.py <lpips_alex.pt | alex.pth | dir> [out.npz]

Accepts the reference's torchscript export (src/lpips/save_alex.py product), the
official richzhang/PerceptualSimilarity v0.1 alex.pth lin-head checkpoint combined
with torchvision's pretrained AlexNet, or any state_dict containing the tensors.
Run offline wherever torch + weights are available; ship only the .npz.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    src = sys.argv[1]
    dst = sys.argv[2] if len(sys.argv) > 2 else "lpips_alex.npz"

    from gaussian_lic_tpu.ops.lpips import load_lpips_params

    params = load_lpips_params(src)
    np.savez(dst, **{k: np.asarray(v) for k, v in params.items()})
    print(f"wrote {dst} ({len(params)} tensors)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
