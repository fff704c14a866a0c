"""Metrics UI parity: fixed-bin latency histogram, percentile-bin stats,
5-minute throughput window, HubProtocol wire encoding, and the streaming
listener feeding them — against the reference's contract
(`core/metrics/histogram.pony`, `hub/hub_protocol.pony:99-125`,
`metrics-ui.md:46-73`)."""

import json
import struct

from pyspark.sql import functions as F

from wallaroo_spark import metrics as M


def test_histogram_binning_matches_reference_get_idx():
    """Pony: idx = 64 - clz(v) — 3 -> bin 4, 5 -> bin 8 (and 4 -> bin 8:
    we replicate get_idx's arithmetic, not the class comment)."""
    assert M.bin_idx(0) == 0
    assert M.bin_idx(1) == 1 and M.bin_upper(1) == 2
    assert M.bin_idx(3) == 2 and M.bin_upper(2) == 4
    assert M.bin_idx(4) == 3  # 64 - clz(4) = 3
    assert M.bin_idx(5) == 3 and M.bin_upper(3) == 8
    assert M.bin_idx(2**40 + 1) == 41
    assert M.bin_idx(2**200) == M.N_BINS - 1  # clamped like u64

    h = M.Histogram()
    for v in (3, 4, 5, 1_000_000):
        h.apply(v)
    assert h.size() == 4 and h.min == 3 and h.max == 1_000_000
    assert h.counts[2] == 1 and h.counts[3] == 2 and h.counts[20] == 1


def test_percentile_bins_and_stats_line():
    """UI stat line: upper limit of the bin that pct% of events fall in."""
    h = M.Histogram()
    for _ in range(90):
        h.apply(100)  # idx 7, bin 128
    for _ in range(9):
        h.apply(10_000)  # idx 14, bin 16384
    h.apply(10_000_000)  # idx 24, bin 16777216
    assert h.percentile_bin(50.0) == 128
    assert h.percentile_bin(90.0) == 128
    assert h.percentile_bin(95.0) == 16384
    assert h.percentile_bin(99.0) == 16384
    assert h.percentile_bin(99.9) == 16777216

    t = M.ThroughputHistory()
    for sec, n in [(100, 50), (101, 70), (102, 60)]:
        t.record(sec, n)
    line = M.stats_line(h, t)
    assert line == {
        "latency_bins": {
            "50.0": 128, "90.0": 128, "95.0": 16384,
            "99.0": 16384, "99.9": 16777216,
        },
        "throughput": {"min": 50.0, "median": 60.0, "max": 70.0},
    }


def test_throughput_window_evicts_past_five_minutes():
    t = M.ThroughputHistory()
    t.record(0, 1000)  # will fall out of the window
    for sec in range(300, 310):
        t.record(sec, 10)
    assert t.stats() == {"min": 10.0, "median": 10.0, "max": 10.0}
    # same-second records accumulate
    t.record(309, 5)
    assert t.stats()["max"] == 15.0


def test_wire_encoding_roundtrip_and_layout():
    """encode_metric must produce HubProtocol.metrics' exact layout:
    u32 size | 4 len-prefixed strings (name, category, worker, pipeline) |
    u16 id | 65 x u64 bins | min | max | period | period_ends_at."""
    h = M.Histogram()
    for v in (3, 5, 900):
        h.apply(v)
    frame = M.encode_metric(
        "CheckTransaction", "computation", "Alerts", "initializer",
        7, h, 2_000_000_000, 1_700_000_000_000_000_000,
    )
    d = M.decode_metric(frame)
    assert d["name"] == "CheckTransaction" and d["category"] == "computation"
    assert d["worker"] == "initializer" and d["pipeline"] == "Alerts"
    assert d["id"] == 7 and d["min"] == 3 and d["max"] == 900
    assert d["period"] == 2_000_000_000
    assert d["counts"] == h.counts and len(d["counts"]) == M.N_BINS

    # byte-level: size prefix is the true byte count; first string is name
    (size,) = struct.unpack(">I", frame[:4])
    assert size == len(frame) - 4
    (nlen,) = struct.unpack(">I", frame[4:8])
    assert frame[8 : 8 + nlen] == b"CheckTransaction"

    # unknown category refused
    try:
        M.encode_metric("x", "nope", "p", "w", 0, h, 1, 1)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_dashboard_json_shape_equality():
    c = M.MetricsCollector("Alerts App")
    for v in (100, 100, 10_000):
        c.report("computation", "CheckTransaction", "Alerts", duration_ns=v)
    c.report("pipeline-ingestion", "Alerts", "Alerts", events=45_000, at_s=1000.0)
    c.report("pipeline-ingestion", "Alerts", "Alerts", events=47_000, at_s=1001.0)
    assert json.loads(c.dashboard_json()) == {
        "app": "Alerts App",
        "categories": {
            "computation": {
                "CheckTransaction": {
                    "pipeline": "Alerts",
                    "latency_bins": {
                        "50.0": 128, "90.0": 16384, "95.0": 16384,
                        "99.0": 16384, "99.9": 16384,
                    },
                    "throughput": {"min": 0.0, "median": 0.0, "max": 0.0},
                }
            },
            "pipeline-ingestion": {
                "Alerts": {
                    "pipeline": "Alerts",
                    "latency_bins": {
                        "50.0": None, "90.0": None, "95.0": None,
                        "99.0": None, "99.9": None,
                    },
                    "throughput": {
                        "min": 45000.0, "median": 46000.0, "max": 47000.0,
                    },
                }
            },
        },
    }
    frames = c.encode_all(period_s=2, period_ends_at_s=1002)
    assert len(frames) == 2
    assert {M.decode_metric(f)["category"] for f in frames} == {
        "computation", "pipeline-ingestion",
    }


def test_streaming_listener_feeds_collector(spark, tmp_path):
    """Live wiring: a real micro-batch query's progress lands in the
    collector — trigger latency in start-to-end, rows in ingestion."""
    import time

    from pyspark.sql import Row

    src = str(tmp_path / "in")
    spark.createDataFrame([Row(v=i) for i in range(100)]).write.parquet(src)

    c = M.MetricsCollector("listener-app")
    listener = M.streaming_listener(c)
    spark.streams.addListener(listener)
    try:
        q = (
            spark.readStream.schema("v long")
            .parquet(src)
            .groupBy((F.col("v") % 10).alias("k"))
            .count()
            .writeStream.format("noop")
            .outputMode("complete")
            .queryName("metrics_e2e")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # listener callbacks are async — wait for delivery
        for _ in range(100):
            d = json.loads(c.dashboard_json())
            ing = d["categories"].get("pipeline-ingestion", {}).get("metrics_e2e")
            s2e = d["categories"].get("start-to-end", {}).get("metrics_e2e")
            if ing and s2e and s2e["latency_bins"]["50.0"]:
                break
            time.sleep(0.1)
        assert ing["throughput"]["max"] >= 100  # the 100 input rows were counted
        assert s2e["latency_bins"]["50.0"] >= 1  # some real trigger latency
    finally:
        spark.streams.removeListener(listener)
