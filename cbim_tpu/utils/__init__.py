from .logging import AverageMeter, ProgressMeter, configure_logger, MetricWriter  # noqa: F401
from .compile_cache import enable_compile_cache  # noqa: F401
