from . import crand  # noqa: F401
