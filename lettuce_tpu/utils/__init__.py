from .utility import (get_subclasses, LettuceException, LettuceWarning,
                      InefficientCodeWarning, ExperimentalWarning,
                      jax_gradient, torch_gradient, grid_fine_to_coarse,
                      jax_jacobi, torch_jacobi, append_axes)
from .moments import (moment_tensor, get_default_moment_transform, Transform,
                      D1Q3Transform, D2Q9Lallemand, D2Q9Dellar, D3Q27Hermite,
                      D3Q19DHumieres, D3Q27CumulantTransform)

__all__ = ["get_subclasses", "LettuceException", "LettuceWarning",
           "InefficientCodeWarning", "ExperimentalWarning", "jax_gradient",
           "torch_gradient", "grid_fine_to_coarse", "jax_jacobi",
           "torch_jacobi", "append_axes", "moment_tensor",
           "get_default_moment_transform", "Transform", "D1Q3Transform",
           "D2Q9Lallemand", "D2Q9Dellar", "D3Q27Hermite", "D3Q19DHumieres",
           "D3Q27CumulantTransform"]
