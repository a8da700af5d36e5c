from . import alignment, loss, lpips_jax, metric  # noqa: F401
