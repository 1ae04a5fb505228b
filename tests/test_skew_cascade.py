"""The planner's skew path: the balanced cascade must be bit-identical
to the bucket-aligned one on a skewed corpus, and the salt planner must
actually fire on it (round-5 skewed-input evidence, engine-side)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _checksum(df):
    return tuple(
        df.agg(
            F.count(F.lit(1)),
            F.sum("turn_rate"),
            F.sum("tool_usage"),
            F.sum("text_len"),
            F.sum(
                F.xxhash64(
                    "conv_id", "bucket_ts", "turn_rate",
                    "tool_usage", "text_len",
                ).cast("decimal(38,0)")
            ),
        ).collect()[0]
    )


def test_balanced_cascade_matches_plain_on_skewed_input(spark):
    from tsaug_spark.datagen import generate_transcripts
    from tsaug_spark.plans.rollup import cascade
    from tsaug_spark.plans.skew import cascade_balanced, plan_salts

    raw = generate_transcripts(
        spark, n_convs=60, avg_turns=40, hot_convs=2,
        hot_turns=150_000, seed=11,
    )
    # the planner fires: the hot conversations exceed the per-task
    # target, so the balanced path is the one it would choose
    assert plan_salts(raw) > 1
    plain = cascade(raw)
    balanced = cascade_balanced(raw)
    for tier in ("1m", "1h", "1d"):
        assert _checksum(plain[tier]) == _checksum(balanced[tier]), tier


def test_salted_rollup_matches_plain_on_skewed_input(spark):
    from tsaug_spark.datagen import generate_transcripts
    from tsaug_spark.plans.rollup import rollup_transcripts
    from tsaug_spark.plans.skew import plan_salts, rollup_salted

    raw = generate_transcripts(
        spark, n_convs=40, avg_turns=40, hot_convs=1,
        hot_turns=120_000, seed=13,
    )
    n = plan_salts(raw)
    assert n > 1
    assert _checksum(rollup_transcripts(raw, "1m")) == _checksum(
        rollup_salted(raw, "1m", n)
    )
