"""CI plan gate: the headline physical-plan properties from the
EXPLAIN.md audit (tools/explain_audit.py), wired into pytest so a plan
regression FAILS the suite instead of only discoloring a report.

What is gated (the properties that matter at 100 TB):

* the bucketed tier rollup is shuffle-free (no Exchange — the cascade's
  scaling story);
* filtered event scans carry PushedFilters and pruned ReadSchema;
* the dimension-chain join broadcasts (no SortMergeJoin on a dim);
* the expensive pair-search / graph / sketch queries are free of
  CartesianProduct, BroadcastNestedLoopJoin and any Python row eval
  (BatchEvalPython / ArrowEvalPython would mean a per-row UDF crept
  into a hot path);
* the single-pass metric transforms stay single-Exchange.

Also self-checks the probe: injecting a ``.repartition(1)`` into the
shuffle-free cascade must flip the gate — proving the assertion would
catch a real regression.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"

FORBIDDEN_EVERYWHERE = (
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
)

#: registry entries whose plans must stay free of cross products and
#: Python row eval — the queries a 100 TB run would feel first.  The
#: bool says whether BroadcastNestedLoopJoin is ALSO forbidden: pair
#: searches and joins must never nested-loop (that is the all-pairs
#: explosion the banded designs exist to avoid), while the scalar
#: screens legitimately broadcast a 1-row aggregate through a BNLJ
#: (a constant-size build side — not a scale hazard).
HOT_QUERIES = {
    "simhash_pairs": True,
    "minhash_pairs": True,
    "embed_near_dup": True,
    "bloom_prune_join": True,
    "asof_nearest": True,
    "dedup_clusters": True,
    "heavy_hitters_1d": False,
    "range_busy_windows": False,
    "triangle_copurchase": False,
    "pagerank_copurchase": True,
    "hll_md5_cascade_1d": True,
    # r4 additions: the trig-table join must broadcast (never BNLJ a
    # 504-row dim against events), and the MK pair join must stay an
    # equi-join over the day grid
    "lomb_scargle": True,
    "mk_seasonal": False,
    "nw_trend": False,
    # r4h-r4j additions: the link-prediction wedge join is a pair
    # search (never nested-loop); the inference screens join fits /
    # marginals back by key (equi) and may broadcast 1-row medians
    # or tiny day*type grids through a BNLJ
    "link_prediction": True,
    "degree_powerlaw": False,
    "breusch_pagan": False,
    "chow_break": False,
    "cochran_q": False,
    "icc_oneway": False,
    "cohens_d": False,
    "partial_corr": False,
    "cusum_squares": False,
    "higuchi_fd": False,
    "littles_law": False,
    "readability": False,
    "cox_stuart": False,
    "cronbach_alpha": False,
    "kendalls_w": False,
    "transfer_entropy": False,
    "bowker_symmetry": False,
    # r4k: the siegel day-pair self-join must stay a key equi-join
    "siegel_slopes": True,
    "turning_points": False,
    "von_neumann": False,
    "orc_roundtrip": False,
    "csv_roundtrip": False,
    # r4l: inequality/concentration screens — key equi-joins only
    "hoover_index": False,
    "atkinson_index": False,
    "hhi_daily": False,
    "rolling_beta_7d": False,
    "winsorized_mean": False,
}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_transcripts(spark, tmp_path_factory):
    from tsaug_spark.datagen import generate_transcripts

    loc = str(tmp_path_factory.mktemp("gate") / "transcripts_b8")
    generate_transcripts(
        spark, n_convs=120, avg_turns=40, seed=7
    ).write.bucketBy(8, "conv_id").sortBy("conv_id", "turn_idx").option(
        "path", loc
    ).mode("overwrite").saveAsTable("gate_transcripts_tmp")
    spark.sql("DROP TABLE IF EXISTS gate_transcripts_tmp")
    spark.sql("DROP TABLE IF EXISTS gate_transcripts")
    spark.sql(
        "CREATE TABLE gate_transcripts (conv_id string, turn_idx int, "
        "role string, text string, tool string, ts timestamp) USING "
        "PARQUET CLUSTERED BY (conv_id) SORTED BY (conv_id, turn_idx) "
        f"INTO 8 BUCKETS LOCATION '{loc}'"
    )
    yield spark.table("gate_transcripts")
    spark.sql("DROP TABLE IF EXISTS gate_transcripts")


def test_bucketed_rollup_shuffle_free(spark, bucketed_transcripts):
    from tsaug_spark.plans.rollup import rollup_transcripts

    p = _plan(rollup_transcripts(bucketed_transcripts, "1m"))
    assert "HashAggregate" in p
    assert "SelectedBucketsCount" in p
    assert "Exchange" not in p


def test_injected_repartition_flips_the_gate(spark, bucketed_transcripts):
    """The gate must be able to fail: the same plan with a smuggled
    repartition(1) shows an Exchange — so test_bucketed_rollup_
    shuffle_free would catch a real plan regression."""
    from tsaug_spark.plans.rollup import rollup_transcripts

    p = _plan(
        rollup_transcripts(bucketed_transcripts.repartition(1), "1m")
    )
    assert "Exchange" in p


def test_filtered_scan_pushdown_and_pruning(spark):
    from tsaug_spark.plans.rollup import rollup_events

    ev = spark.read.parquet(f"{SF}/events.parquet")
    filtered = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    p = _plan(rollup_events(filtered, "1h"))
    assert "PushedFilters: [IsNotNull(event_type), " \
           "EqualTo(event_type,click)]" in p
    assert "HashAggregate" in p
    # column pruning: the scan must not read the text-heavy columns
    assert "ReadSchema" in p and "event_type" in p
    assert "payload" not in p.split("ReadSchema", 1)[1][:400]


def test_dim_chain_join_broadcasts(spark):
    import __spark_entry__ as em

    df = em.queries()["nation_revenue"](spark, SF)
    p = _plan(df)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


@pytest.mark.parametrize("name", sorted(HOT_QUERIES))
def test_hot_query_free_of_cross_products_and_python(spark, name):
    import __spark_entry__ as em

    qs = em.queries()
    if name not in qs:
        pytest.skip(f"{name} not in registry")
    p = _plan(qs[name](spark, SF))
    forbidden = FORBIDDEN_EVERYWHERE
    if HOT_QUERIES[name]:
        forbidden = forbidden + ("BroadcastNestedLoopJoin",)
    for frag in forbidden:
        assert frag not in p, f"{name}: plan contains {frag}"


def test_metric_transforms_single_exchange(spark):
    from tsaug_spark.plans.metrics import (
        counter_rate,
        heartbeat_uptime,
        m4_downsample,
        time_weighted_avg,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    for mname, mdf in [
        ("time_weighted_avg", time_weighted_avg(ev, "1h")),
        ("counter_rate", counter_rate(ev, "1h", order_col="event_id")),
        ("m4_downsample", m4_downsample(ev, "1d")),
        ("heartbeat_uptime", heartbeat_uptime(ev, "1h")),
    ]:
        p = _plan(mdf)
        n_ex = p.count("Exchange")
        assert n_ex <= 1, f"{mname}: {n_ex} Exchanges"
        for frag in ("BatchEvalPython", "ArrowEvalPython"):
            assert frag not in p, f"{mname}: {frag}"
