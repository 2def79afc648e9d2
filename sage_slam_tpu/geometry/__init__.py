from . import se3, camera, interp  # noqa: F401
