from .logging import AverageMeter, ProgressMeter, configure_logger, MetricWriter  # noqa: F401
