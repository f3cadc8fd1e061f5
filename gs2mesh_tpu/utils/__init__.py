"""Shared utilities: profiling, stage timing, logging, debug dumps."""

from gs2mesh_tpu.utils.profiling import (MetricLogger, StageTimer,
                                         profile_trace, time_block)
from gs2mesh_tpu.utils.debug import debug_dump, check_finite_tree

__all__ = ["MetricLogger", "StageTimer", "profile_trace", "time_block", "debug_dump",
           "check_finite_tree"]
