from pldepth_tpu.obs.logging import MetricLogger
from pldepth_tpu.obs.profiling import profile_trace, step_timer

__all__ = ["MetricLogger", "profile_trace", "step_timer"]
