"""ORC / CSV sink+source round-trips (sources/formats.py)."""

from __future__ import annotations

import pytest


@pytest.mark.parametrize("fmt", ["orc", "csv"])
def test_roundtrip_preserves_rows_and_schema(spark, tmp_path, fmt):
    from tsaug_spark.sources.formats import write_read_roundtrip

    df = spark.createDataFrame(
        [
            (1, 1704067200, 3, 12.3456),
            (2, 1704070800, 5, -0.1),
            (3, 1704074400, 0, 0.0001),
        ],
        "user_id long, bucket_s long, cnt long, sum_value double",
    )
    back = write_read_roundtrip(
        df, str(tmp_path / f"rt_{fmt}"), fmt
    )
    assert back.schema == df.schema
    assert sorted(back.collect()) == sorted(df.collect())


def test_csv_roundtrip_double_bit_stability(spark, tmp_path):
    """Shortest-repr doubles must read back to identical bits."""
    from tsaug_spark.sources.formats import write_read_roundtrip

    vals = [0.1, 1 / 3, 2.5e-12, 9007199254740993.0, -0.0001]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, v double"
    )
    back = {
        r["i"]: r["v"]
        for r in write_read_roundtrip(
            df, str(tmp_path / "rt_bits"), "csv"
        ).collect()
    }
    for i, v in enumerate(vals):
        assert back[i] == v


def test_roundtrip_overwrite_is_idempotent(spark, tmp_path):
    from tsaug_spark.sources.formats import write_read_roundtrip

    p = str(tmp_path / "rt_over")
    df1 = spark.createDataFrame([(1, 1.0)], "i long, v double")
    df2 = spark.createDataFrame(
        [(2, 2.0), (3, 3.0)], "i long, v double"
    )
    write_read_roundtrip(df1, p, "orc")
    back = write_read_roundtrip(df2, p, "orc")
    assert sorted(r["i"] for r in back.collect()) == [2, 3]
