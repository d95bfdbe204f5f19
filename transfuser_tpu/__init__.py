"""TPU-native TransFuser framework (JAX/XLA/Pallas/pjit rewrite of
autonomousvision/transfuser)."""

from .config import GlobalConfig, config_for_backbone  # noqa: F401

__version__ = "0.1.0"
