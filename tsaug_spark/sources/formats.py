"""Multi-format sink/source round-trips.

The engine's persistent tier store is parquet (sources/tables.py) with
the Gorilla chunk codec (codec/) for cold data; this module proves the
*interchange* surface — ORC and CSV, the two formats warehouse
neighbors most often hand over — with write -> read-back round-trips
whose results are oracle-checked against the same rollup computed
straight from the source table.  A value-hash match certifies both the
sink and the source path for the format (schema fidelity, timestamp
granularity, float round-trip).

Float contract: CSV is text, so doubles survive only because Spark
writes shortest-round-trip representations (Ryu) and reads them back
to the identical IEEE double; the rollup values are additionally
rounded to 4 decimals BEFORE the write — the same normalization the
rollup oracles already apply — so the round-trip is bit-stable in
both engines.

Scale: the written artifact is a ROLLUP tier (retention-bounded rows),
never raw events; `coalesce` keeps the file count at the bounded
default unless the caller overrides, and reads prune columns through
the format's native reader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_read_roundtrip(
    df: DataFrame,
    path: str,
    fmt: str,
    n_files: int = 4,
) -> DataFrame:
    """Write ``df`` to ``path`` in ``fmt`` (overwrite) and read it
    back with the schema preserved.  CSV carries no embedded schema,
    so the read applies the writer frame's schema explicitly (the
    production contract: tier schemas are owned by the catalog, not
    inferred per file)."""
    spark = df.sparkSession
    writer = df.coalesce(n_files).write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true").schema(df.schema)
    return reader.load(path)


def roundtrip_dir(sf_dir: str, name: str) -> str:
    """Per-run scratch location for a round-trip artifact — keyed by
    the FULL sf-dir path (not just its basename, so distinct trees
    sharing a basename never collide) plus this process's pid, so two
    concurrent sweeps at the same scale write disjoint directories
    and neither can read the other's partially rewritten artifact."""
    import hashlib

    norm = os.path.normpath(sf_dir)
    base = os.path.basename(norm)
    tok = hashlib.md5(norm.encode()).hexdigest()[:8]
    return f"/tmp/tsaug_spark_fmt/{base}-{tok}-{os.getpid()}/{name}"
