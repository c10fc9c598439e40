from .window_attention import fused_window_attention, pallas_available  # noqa: F401
