"""torchvision stub: reference model.py:15 imports `models` but never
uses it at runtime (verified by grep — the only `models.` hits are mmdet
import lines)."""

from . import models  # noqa: F401
