"""Device meshes, sharding specs and halo-exchange utilities."""

__all__ = []
