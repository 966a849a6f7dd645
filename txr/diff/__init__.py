"""Differentiable-rendering utilities: losses, scene-parameter gradients,
and gradient-descent scene optimisation (inverse rendering)."""

from txr.diff.optimize import scene_grad, image_loss, optimize_scene, select_params

__all__ = ["scene_grad", "image_loss", "optimize_scene", "select_params"]
