from gaussian_lic_tpu.parallel.sharded import (
    AXIS_TILES,
    make_mesh,
    make_sharded_render,
    make_sharded_train_bundle,
    make_sharded_train_step,
    mesh_interpret,
    render_band,
)

__all__ = [
    "AXIS_TILES",
    "make_mesh",
    "make_sharded_render",
    "make_sharded_train_bundle",
    "make_sharded_train_step",
    "mesh_interpret",
    "render_band",
]
