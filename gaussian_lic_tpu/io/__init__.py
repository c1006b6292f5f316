"""I/O: PLY map export/import, checkpoints, recorded streams."""
