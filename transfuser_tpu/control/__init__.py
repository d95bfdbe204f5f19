from .pid import PIDController, control_pid  # noqa: F401
from .route_planner import RoutePlanner  # noqa: F401
