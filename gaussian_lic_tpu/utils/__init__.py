"""Utilities: profiling, logging, synthetic scenes."""
