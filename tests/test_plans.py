"""Physical-plan assertions: the engine's scale contract, tested.

Each assertion encodes a 'would this survive 100 TB' property: pushdown
reaching the scan, dims broadcast (no fact-side shuffle), bounded exchange
counts, no Python in native paths.
"""

from wallaroo_spark.plans import audit
from wallaroo_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_filter_pushes_to_scan(spark):
    a = audit(QUERIES["tpch_q6_forecast_revenue"](spark, SF))
    assert a.scans == 1
    assert a.pushed_filters and "l_shipdate" in a.pushed_filters[0]
    assert a.read_cols == [4]  # only the 4 referenced columns leave the scan
    assert a.python_ops == 0


def test_star_join_broadcasts_all_dims(spark):
    a = audit(QUERIES["tpch_q5_local_supplier"](spark, SF))
    assert a.broadcast_joins == 5
    assert a.sort_merge_joins == 0  # fact-fact join also broadcast at this SF (AQE)
    assert a.python_ops == 0


def test_window_agg_single_shuffle(spark):
    a = audit(QUERIES["tumbling_window_sum"](spark, SF))
    assert a.exchanges == 1  # one hash shuffle on (key, window); partial agg map-side
    assert a.scans == 1 and a.python_ops == 0


def test_column_pruning_word_count(spark):
    a = audit(QUERIES["word_count"](spark, SF))
    assert a.read_cols == [1]  # only `text` read from a 5-column table
    assert a.python_ops == 0


def test_native_paths_have_no_python(spark):
    for name in [
        "sliding_window_sum", "running_total", "session_window_agg", "asof_enrich",
        "minhash_lsh_pairs", "simhash_docs", "similarity_topk_bruteforce",
        "text_quality_score", "late_policy_drop",
    ]:
        assert audit(QUERIES[name](spark, SF)).python_ops == 0, name


def test_broadcast_query_side_in_topk(spark):
    a = audit(QUERIES["similarity_topk_bruteforce"](spark, SF))
    # corpus streams unshuffled through a broadcast nested-loop against the
    # tiny query set; the only hash exchange is the per-query top-k window
    assert a.nested_loop_joins == 1
    assert a.exchanges <= 1
