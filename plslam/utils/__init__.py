from plslam.utils import geometry  # noqa: F401
