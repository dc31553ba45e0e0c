from . import kvstore  # noqa: F401
