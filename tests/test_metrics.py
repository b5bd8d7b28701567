"""Metrics/observability (SURVEY §5: counters + per-stage timing)."""
import time

from gr_bluetooth_tpu.utils.metrics import Metrics, profile


def test_counters_and_stages():
    m = Metrics()
    m.count("hits", 3)
    m.count("hits")
    with m.stage("demod"):
        time.sleep(0.01)
    with m.stage("demod"):
        pass
    snap = m.snapshot()
    assert snap["counters"]["hits"] == 4
    st = snap["stages"]["demod"]
    assert st["calls"] == 2 and st["total_s"] >= 0.01
    assert "demod" in m.report() and "hits: 4" in m.report()
    m.reset()
    assert m.snapshot()["counters"] == {}


def test_profile_noop():
    with profile(None):
        x = 1
    assert x == 1


def test_frontend_populates_metrics():
    import numpy as np
    from gr_bluetooth_tpu.models.frontend import FrontEnd
    from gr_bluetooth_tpu.utils.metrics import metrics

    metrics.reset()
    fe = FrontEnd(2e6, 2441e6, block_slots=8)
    x = np.zeros(fe.block_samples, dtype=np.complex64)
    list(fe.stream(x))
    snap = metrics.snapshot()
    assert snap["counters"]["blocks"] >= 1
    assert snap["counters"]["samples_in"] >= fe.step_samples
    assert snap["stages"]["device_step"]["calls"] >= 1
