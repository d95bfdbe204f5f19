from .types import (BoundingBox, Location, Rotation, Transform,  # noqa: F401
                    VehicleControl)
