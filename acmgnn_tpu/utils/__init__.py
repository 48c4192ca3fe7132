from acmgnn_tpu.utils.logging import ExperimentLogger, RunStats
from acmgnn_tpu.utils.profiling import profile_trace, sync_devices, timed

__all__ = [
    "ExperimentLogger",
    "RunStats",
    "profile_trace",
    "sync_devices",
    "timed",
]
