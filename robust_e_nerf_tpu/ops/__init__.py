from . import composite, hash_grid, ray_march  # noqa: F401
