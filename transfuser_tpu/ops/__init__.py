from . import centernet, dtypes, image_ops  # noqa: F401
