from . import (  # noqa: F401
    contraction,
    encoders,
    event_model,
    fields,
    nerf,
    occupancy,
    trajectory,
)
