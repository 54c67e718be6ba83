"""Profiling utilities tests (utils/profiling.py)."""

import time

from robot_aware_control_tpu.utils.profiling import StepTimer, device_memory_stats


def test_step_timer_ema_and_throughput():
    t = StepTimer(alpha=0.5)
    for _ in range(3):
        with t:
            time.sleep(0.01)
    assert t.ema_s is not None and t.ema_s > 0.005
    assert t.throughput(100) > 0


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    # CPU backends may expose nothing; when present, fields are ints
    for d in stats.values():
        assert "bytes_in_use" in d
