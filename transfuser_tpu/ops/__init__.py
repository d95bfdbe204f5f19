from . import centernet, image_ops  # noqa: F401
