from .lidar_centernet import LidarCenterNet  # noqa: F401
