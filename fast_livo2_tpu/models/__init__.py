from .camera import Camera, make_camera  # noqa: F401
