from codenerf_tpu.utils.logging import MetricLogger, is_main_process

__all__ = ["MetricLogger", "is_main_process"]
