"""Streaming mapping engine: ingest, keyframe store, incremental training, eval."""

from gaussian_lic_tpu.engine.dataset import FrameInput, KeyframeBuffer, TestCamera
from gaussian_lic_tpu.engine.trainer import MappingEngine

__all__ = ["FrameInput", "KeyframeBuffer", "TestCamera", "MappingEngine"]
