from . import admm  # noqa: F401
