from .precision import Policy, default_policy
from .mesh import make_mesh, data_axis_size

__all__ = ["Policy", "default_policy", "make_mesh", "data_axis_size"]
