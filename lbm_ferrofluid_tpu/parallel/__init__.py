"""Device meshes, sharding specs and halo-exchange utilities."""

from .mesh import auto_mesh_shape, initialize_distributed, make_mesh

__all__ = ["auto_mesh_shape", "initialize_distributed", "make_mesh"]
