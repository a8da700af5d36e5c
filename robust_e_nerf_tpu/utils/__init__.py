from . import quaternions, transforms, tensor_ops, config, pytree  # noqa: F401
