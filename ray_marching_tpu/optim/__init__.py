"""Optimization: inverse rendering of scene parameters from target images."""

from ray_marching_tpu.optim.inverse import InverseConfig, optimize

__all__ = ["InverseConfig", "optimize"]
