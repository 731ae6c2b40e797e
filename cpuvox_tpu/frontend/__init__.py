from .interactive import InteractiveSession  # noqa: F401
