"""Port of the reference's topology_tester correctness app
(`testing/correctness/apps/topology_tester/{topology_tester,components}.py`):
systematically build every (pre, computation, post) topology combination
from PRE = {none, key-by} x COMPS = {stateless, state} x POST = {none,
filter, multi} on the Pipeline facade and validate each against a
straight-line Python simulation — tag chains, state snapshots (last two
(key, value) pairs per key), filter semantics (state still updates on
dropped rows), and OneToN fan-out key suffixing."""

import datetime as dt
import itertools

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from wallaroo_spark.api import Pipeline

T0 = dt.datetime(2024, 1, 1)
KEYS = ["k0", "k1", "k2"]
N = 30
PRE = [None, "key_by"]
COMPS = ["stateless", "state"]
POST = [None, "filter", "multi"]


def _input_rows():
    return [
        Row(key=KEYS[i % len(KEYS)], ts=T0 + dt.timedelta(seconds=i), value=i)
        for i in range(N)
    ]


def _simulate(pre, comp, post):
    """The reference's semantics in straight-line Python, per-key in event
    order (key = real key when keyed, one global bucket otherwise)."""
    out = []
    states = {}
    for r in sorted(_input_rows(), key=lambda r: r.ts):
        skey = r.key if pre == "key_by" else "_all"
        tag = f"tag__{comp}"
        if comp == "state":
            a, b = states.get(skey, (None, None))
            a, b = b, (skey, r.value)
            states[skey] = (a, b)
            snapshot = f"{a}|{b}"
        else:
            snapshot = ""
        if post == "filter" and r.value % 2 == 1:
            continue  # dropped AFTER the state update, like the flow_mod
        if post == "multi":
            for i in range(2):
                out.append((f"{r.key}.{i}", r.value, tag, snapshot))
        else:
            out.append((r.key, r.value, tag, snapshot))
    return sorted(out)


@pytest.mark.parametrize("pre,comp,post", list(itertools.product(PRE, COMPS, POST)))
def test_topology_combination(spark, pre, comp, post):
    df = spark.createDataFrame(_input_rows())
    p = Pipeline.source_df(df, ts_col="ts")
    p = p.key_by("key") if pre == "key_by" else p.collect_all()

    if comp == "state":

        def stateful(row, state):
            a, b = state.get("a"), state.get("b")
            skey = row["key"] if pre == "key_by" else "_all"
            a, b = b, (skey, row["value"])
            state["a"], state["b"] = a, b
            snapshot = f"{a}|{b}"
            if post == "filter" and row["value"] % 2 == 1:
                return []  # state updated, emission suppressed
            rows = [{"key": row["key"], "value": row["value"],
                     "tag": "tag__state", "snapshot": snapshot}]
            if post == "multi":
                return [
                    {**r, "key": f"{r['key']}.{i}"} for r in rows for i in range(2)
                ]
            return rows

        out = p.to_state(
            stateful, dict, "key string, value long, tag string, snapshot string"
        ).df
    else:
        base = p.df.select(
            "key", "value",
            F.lit("tag__stateless").alias("tag"),
            F.lit("").alias("snapshot"),
        )
        if post == "filter":
            base = base.filter(F.col("value") % 2 == 0)
        if post == "multi":
            base = base.withColumn(
                "key", F.explode(F.array(*[F.concat("key", F.lit(f".{i}")) for i in range(2)]))
            )
        out = base

    got = sorted((r.key, r.value, r.tag, r.snapshot) for r in out.collect())
    assert got == _simulate(pre, comp, post), (pre, comp, post)


def test_multi_pipeline_independent_sinks(spark, tmp_path):
    """Port of multi_pipeline (celsius x2): two independent pipelines in
    one app, each with its own source and its own sink — both convert
    independently and neither interferes with the other."""
    c1 = spark.createDataFrame([Row(c=float(i)) for i in range(50)])
    c2 = spark.createDataFrame([Row(c=float(i) / 2) for i in range(40)])
    outs = []
    for i, src in enumerate((c1, c2)):
        p = Pipeline.source_df(src).to({"f": F.col("c") * 1.8 + 32.0})
        path = str(tmp_path / f"sink{i}")
        p.df.write.mode("overwrite").parquet(path)
        outs.append(sorted(r.f for r in spark.read.parquet(path).collect()))
    assert outs[0] == [i * 1.8 + 32.0 for i in range(50)]
    assert outs[1] == [i / 2 * 1.8 + 32.0 for i in range(40)]
