"""alerts_windowed ported onto the user `Aggregation` class facade.

Reference: `examples/python/alerts_windowed/alerts.py:74-91` —
`TotalAggregation(wallaroo.Aggregation)` with initial_accumulator / update /
combine / output over 9s sliding windows (slide 3s), emitting Deposit /
Withdrawal alerts when the windowed total crosses ±threshold; `output`
returning None suppresses the window.

Here the same four-method class runs over the events table through
`range_windows(...).with_slide(...).over(...)` — identical API shape, Spark
execution (window assignment native, per-window fold in Arrow batches).

Run: python examples/alerts_windowed_agg.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from wallaroo_spark.api.aggregation import Aggregation
from wallaroo_spark.api.pipeline import Pipeline, range_windows
from wallaroo_spark.session import get_spark
from wallaroo_spark.sources import read_table

DEPOSIT_THRESHOLD = 200.0


class TotalAggregation(Aggregation):
    """Port of alerts.py's TotalAggregation: accumulate transaction amounts,
    alert only when the window total crosses the threshold."""

    def initial_accumulator(self):
        return {"total": 0.0}

    def update(self, transaction, acc):
        acc["total"] += float(transaction["value"])

    def combine(self, t1, t2):
        return {"total": t1["total"] + t2["total"]}

    def output(self, user, acc):
        if acc["total"] > DEPOSIT_THRESHOLD:
            return {"alert": f"DepositAlert for {user}: {acc['total']:.2f}"}
        return None  # no alert -> no output for this window


def alerts(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    return (
        Pipeline.source_df(ev, ts_col="ts")
        .key_by("user_id")
        .to(range_windows(9 * 900).with_slide(3 * 900).over(TotalAggregation(), "alert string"))
        .df
    )


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("alerts_windowed_agg", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = alerts(spark, sf)
    rows = out.collect()
    print(f"{len(rows)} alerts")
    for r in rows[:5]:
        print(r.alert)
