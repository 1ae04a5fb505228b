"""Shared test fixtures: one session-scoped SparkSession on local[*]."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from tsaug_spark.session import get_spark

    s = get_spark(app_name="tsaug_spark-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(params=["parquet_snapshot", "iceberg_semantics"])
def table_cls(request):
    """Both table backends: the in-sandbox ParquetSnapshotTable and the
    Iceberg-semantics double (tests/iceberg_double.py) — RollupJob /
    streaming-sink semantics tests run against each."""
    from tests.iceberg_double import InPlaceLazyTable
    from tsaug_spark.sources.tables import ParquetSnapshotTable

    return (
        ParquetSnapshotTable
        if request.param == "parquet_snapshot"
        else InPlaceLazyTable
    )


@pytest.fixture(scope="session")
def transcripts(spark):
    """Small deterministic transcript table shared across tests."""
    from tsaug_spark.datagen import generate_transcripts

    df = generate_transcripts(
        spark, n_convs=30, avg_turns=60, hot_convs=2, hot_turns=600, seed=42
    ).cache()
    df.count()
    return df
