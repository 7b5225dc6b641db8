from .pipeline import build_pipeline  # noqa: F401
