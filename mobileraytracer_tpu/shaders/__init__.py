from .engine import trace_image_sample  # noqa: F401
