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
