from . import checkpoint, model, optimizers, train, trainer  # noqa: F401
