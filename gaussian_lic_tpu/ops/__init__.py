"""Compute ops: geometry, SH, rasterization, losses, optimizer kernels."""
