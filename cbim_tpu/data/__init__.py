from .factory import get_dataset  # noqa: F401
