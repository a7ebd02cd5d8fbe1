from .multistream import MultiStreamEngine, make_mesh  # noqa: F401
