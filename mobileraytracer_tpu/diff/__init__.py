"""Differentiable-geometry extensions (vertex-position gradients)."""
from .geom import (factors_of_point, rays_from_factors,
                   scene_with_vertices, triangle_vertices,
                   vertex_grad)

__all__ = ["factors_of_point", "rays_from_factors", "scene_with_vertices",
           "triangle_vertices", "vertex_grad"]
