"""Serving metrics: registry semantics + Prometheus text rendering.

The reference only logs per-request RTF lines
(/root/reference/utilities/audio_generation_pipeline.py PerformanceTimer);
/metrics is a new aggregate surface (serving/metrics.py), so these tests pin
OUR format contract: counter/histogram TYPE lines, cumulative buckets with a
+Inf terminator, and _sum/_count series.
"""

import threading

from zonos_tpu.serving.metrics import (
    RTF_BUCKETS,
    Registry,
    _Histogram,
)


def test_counter_accumulates_and_renders():
    r = Registry()
    r.counter_inc("zonos_requests_total", {"endpoint": "/generate", "status": "200"})
    r.counter_inc("zonos_requests_total", {"endpoint": "/generate", "status": "200"})
    r.counter_inc("zonos_requests_total", {"endpoint": "/stream", "status": "500"})
    text = r.render()
    assert "# TYPE zonos_requests_total counter" in text
    assert 'zonos_requests_total{endpoint="/generate",status="200"} 2' in text
    assert 'zonos_requests_total{endpoint="/stream",status="500"} 1' in text
    # TYPE emitted once per metric name, not per label set.
    assert text.count("# TYPE zonos_requests_total") == 1


def test_histogram_buckets_are_cumulative_with_inf():
    h = _Histogram((1.0, 2.0, 4.0))
    for v in (0.5, 1.5, 3.0, 100.0):
        h.observe(v)
    assert h.counts == [1, 1, 1, 1]  # per-bucket raw
    assert h.count == 4 and h.sum == 105.0

    r = Registry()
    for v in (0.5, 1.5, 3.0, 100.0):
        r.histogram_observe("zonos_rtf", v, buckets=(1.0, 2.0, 4.0))
    text = r.render()
    assert 'zonos_rtf_bucket{le="1"} 1' in text
    assert 'zonos_rtf_bucket{le="2"} 2' in text
    assert 'zonos_rtf_bucket{le="4"} 3' in text
    assert 'zonos_rtf_bucket{le="+Inf"} 4' in text
    assert "zonos_rtf_sum 105" in text
    assert "zonos_rtf_count 4" in text


def test_boundary_value_lands_in_its_bucket():
    # Prometheus buckets are upper-inclusive: observe(1.0) -> le="1".
    r = Registry()
    r.histogram_observe("h", 1.0, buckets=(1.0, 2.0))
    assert 'h_bucket{le="1"} 1' in r.render()


def test_observe_helpers_feed_module_registry():
    from zonos_tpu.serving import metrics

    metrics.REGISTRY.reset()
    try:
        metrics.observe_request("/generate", 200, 0.12)
        metrics.observe_generation(rtf=4.0, audio_seconds=10.0, batch_size=8)
        text = metrics.REGISTRY.render()
        assert 'zonos_requests_total{endpoint="/generate",status="200"} 1' in text
        assert "zonos_audio_seconds_total 10" in text
        assert "zonos_rtf_count 1" in text
        assert 'zonos_batch_size_bucket{le="8"} 1' in text
        assert "# HELP zonos_requests_total" in text
        # Buckets chosen so a 4x-realtime request is resolvable.
        assert 4.0 in RTF_BUCKETS
    finally:
        metrics.REGISTRY.reset()


def test_thread_safety_under_contention():
    r = Registry()

    def worker():
        for _ in range(500):
            r.counter_inc("c")
            r.histogram_observe("h", 1.0, buckets=(2.0,))

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    text = r.render()
    assert "c 4000" in text
    assert "h_count 4000" in text
