from .engines import get_inference, inference_sliding_window, inference_whole_image  # noqa: F401
