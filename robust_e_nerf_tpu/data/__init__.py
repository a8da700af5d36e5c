from . import (  # noqa: F401
    camera_poses,
    events,
    pipeline,
    posed_images,
    samplers,
    synthetic,
)
