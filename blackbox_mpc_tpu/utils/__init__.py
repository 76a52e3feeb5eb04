from blackbox_mpc_tpu.utils.metrics import LatencyTimer, MetricsWriter

__all__ = ["LatencyTimer", "MetricsWriter"]
