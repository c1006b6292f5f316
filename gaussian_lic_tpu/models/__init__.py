"""Model state: the incremental Gaussian map."""

from gaussian_lic_tpu.models.gaussians import GaussianMap, LearningRates

__all__ = ["GaussianMap", "LearningRates"]
