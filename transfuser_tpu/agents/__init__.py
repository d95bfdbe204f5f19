from .base import AutonomousAgent, Track  # noqa: F401
