from .camera import (
    CameraModel,
    PinholeParams,
    EquidistantParams,
    MeiParams,
    make_camera,
)
