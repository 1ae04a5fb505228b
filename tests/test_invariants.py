"""Per-row invariant (BASELINE.json input_hint): the engine never
perturbs transcript rows — per-turn text equality under stable
(conv_id, turn_idx) ordering after a full pipeline run."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tsaug_spark.plans.rollup import cascade
from tsaug_spark.sources.checkpoint import RollupJob


def _snapshot(df) -> pd.DataFrame:
    return (
        df.select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )


def test_per_turn_text_stable_through_pipeline(spark, transcripts, tmp_path):
    before = _snapshot(transcripts)

    # run the full tier cascade and a checkpointed rollup job
    tiers = cascade(transcripts)
    for df in tiers.values():
        df.count()
    job = RollupJob(spark, str(tmp_path / "inv"), n_partitions=2,
                    source_snapshot="s")
    job.run(transcripts, "1m")

    after = _snapshot(transcripts)
    pd.testing.assert_frame_equal(before, after)
    # ordering key is unique: (conv_id, turn_idx) identifies every turn
    dup = (
        transcripts.groupBy("conv_id", "turn_idx")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0


def test_skew_report_shares_and_ordering(spark):
    """Shares sum to the heavy keys' mass, cum_share is monotone, and
    the heaviest key leads (validated against a pandas groupby)."""
    from tsaug_spark.plans.skew import skew_report

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    rows = skew_report(ev, key="user_id", top=10).collect()
    assert [r.rnk for r in rows] == list(range(1, 11))
    pdf = ev.groupBy("user_id").count().toPandas()
    total = pdf["count"].sum()
    top = pdf.sort_values(
        ["count", "user_id"], ascending=[False, True]
    ).head(10)
    assert [r.key for r in rows] == top.user_id.tolist()
    for r, (_i, t) in zip(rows, top.iterrows()):
        assert r.cnt == t["count"]
        assert abs(r.share - t["count"] / total) < 1e-12
    cums = [r.cum_share for r in rows]
    assert all(b > a for a, b in zip(cums, cums[1:]))
