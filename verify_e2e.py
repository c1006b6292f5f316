"""Quick end-to-end smoke check of the streaming engine (the /verify surface 3).

Synthetic 10-frame sequence -> MappingEngine -> finalize(); asserts train PSNR
and the PLY/render artifacts. CPU-runnable: JAX_PLATFORMS=cpu python verify_e2e.py
"""
import numpy as np, tempfile, os
from gaussian_lic_tpu.config import Params
from gaussian_lic_tpu.engine.trainer import MappingEngine
from gaussian_lic_tpu.utils.synthetic import make_sequence, make_world

rng = np.random.default_rng(3)
world = make_world(rng, n_points=400)
frames = make_sequence(world, n_frames=10, points_per_frame=120, rng=rng)
intr = world.intr
W, H = intr.width, intr.height
cfg = Params(width=W, height=H, fx=intr.fx, fy=intr.fy, cx=intr.cx, cy=intr.cy,
             skybox_points_num=0, initial_capacity=4096, select_every_k_frame=2,
             max_iters_per_keyframe=10, max_train_keyframes=8)
out = tempfile.mkdtemp()
eng = MappingEngine(cfg, result_path=out)
for f in frames:
    eng.add_frame(f)
res = eng.finalize()
print("train_psnr:", round(float(res["train_psnr"]), 2),
      "test_psnr:", round(float(res.get("test_psnr", float("nan"))), 2),
      "num_gaussians:", int(res["num_gaussians"]))
assert res["train_psnr"] > 14, "train PSNR too low"
assert os.path.exists(os.path.join(out, "point_cloud.ply"))
print("e2e OK, artifacts in", out)
