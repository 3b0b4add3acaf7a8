from .config import LIVOConfig, load_config  # noqa: F401
