"""Table-format abstraction: Iceberg in production, Parquet + snapshot
manifest in-sandbox (no Iceberg runtime jars available here — SURVEY.md
§7.4 R4).

Both formats expose the same three operations the engine needs:

* ``read(spark)``                 -> DataFrame of the current snapshot
* ``append(df)`` / ``overwrite(df)`` -> atomically advance the snapshot
* ``snapshot_id()``              -> lineage token recorded in checkpoints

``ParquetSnapshotTable`` implements snapshot isolation the way Iceberg's
metadata layer does, scaled down: every write lands in a fresh
``data/<snapshot>/`` directory, then a tiny JSON pointer file is renamed
into place (rename is the atomic commit).  Readers resolve the pointer
first, so concurrent writers never corrupt a read.  ``IcebergTable`` is a
thin wrapper over ``spark.read.format('iceberg')`` / ``writeTo`` for
clusters that have the runtime; it is import-guarded and untested in this
sandbox.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ParquetSnapshotTable:
    """Parquet directory + atomic JSON snapshot pointer."""

    path: str

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_SNAPSHOT.json")

    def _resolve(self) -> dict | None:
        try:
            with open(self._pointer) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return None

    def exists(self) -> bool:
        return self._resolve() is not None

    def snapshot_id(self) -> str | None:
        meta = self._resolve()
        return meta["snapshot_id"] if meta else None

    def read(self, spark: SparkSession) -> DataFrame:
        meta = self._resolve()
        if meta is None:
            raise FileNotFoundError(f"no snapshot at {self.path}")
        return spark.read.parquet(meta["data_path"])

    def _commit(self, df: DataFrame, parents: list[str]) -> str:
        snap = f"{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
        data_path = os.path.join(self.path, "data", snap)
        df.write.mode("errorifexists").parquet(data_path)
        tmp = self._pointer + f".tmp.{uuid.uuid4().hex[:8]}"
        os.makedirs(self.path, exist_ok=True)
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "snapshot_id": snap,
                    "data_path": data_path,
                    "parents": parents,
                    "committed_at": time.time(),
                },
                fh,
            )
        os.replace(tmp, self._pointer)  # atomic commit
        return snap

    def overwrite(self, df: DataFrame) -> str:
        parent = self.snapshot_id()
        return self._commit(df, [parent] if parent else [])

    def overwrite_partitions(
        self,
        df: DataFrame,
        partition_col: str = "partition_id",
        partitions: "list | None" = None,
    ) -> str:
        """Replace exactly the given ``partitions`` (default: those
        present in ``df``) with ``df``'s rows — value-keyed dynamic
        partition overwrite.  Untouched partitions keep their rows.
        Passing ``partitions`` explicitly with an empty ``df`` CLEARS
        those partitions (a replacement that produced zero rows must
        not leave stale data behind).  Safe against self-derived plans
        here because the commit writes a FRESH data directory before
        the pointer flip — the lazy read keeps resolving the old
        snapshot."""
        meta = self._resolve()
        if meta is None:
            return self._commit(df, [])
        spark = df.sparkSession
        if partitions is None:
            touched = df.select(partition_col).distinct()
        else:
            touched = spark.createDataFrame(
                [(p,) for p in partitions], f"{partition_col} int"
            )
        existing = spark.read.parquet(meta["data_path"])
        kept = existing.join(touched, partition_col, "left_anti")
        return self._commit(
            kept.unionByName(df, allowMissingColumns=True),
            [meta["snapshot_id"]],
        )

    def append(self, df: DataFrame) -> str:
        meta = self._resolve()
        if meta is None:
            return self._commit(df, [])
        spark = df.sparkSession
        # allowMissingColumns: schema evolution on append — a table
        # written before a column was added (e.g. an old manifest
        # missing range_start_ts) gets NULLs for the new column instead
        # of failing the resume with an AnalysisException
        merged = spark.read.parquet(meta["data_path"]).unionByName(
            df, allowMissingColumns=True
        )
        return self._commit(merged, [meta["snapshot_id"]])


class IcebergTable:
    """Iceberg-backed variant (requires the Iceberg runtime on the
    cluster; not exercisable in this sandbox)."""

    def __init__(self, identifier: str):
        self.identifier = identifier

    def exists(self) -> bool:
        spark = SparkSession.getActiveSession()
        return spark.catalog.tableExists(self.identifier)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.format("iceberg").load(self.identifier)

    def snapshot_id(self) -> str | None:
        spark = SparkSession.getActiveSession()
        rows = (
            spark.read.format("iceberg")
            .load(f"{self.identifier}.snapshots")
            .orderBy("committed_at", ascending=False)
            .limit(1)
            .collect()
        )
        return str(rows[0]["snapshot_id"]) if rows else None

    def append(self, df: DataFrame) -> str | None:
        df.writeTo(self.identifier).append()
        return self.snapshot_id()

    def overwrite(self, df: DataFrame) -> str | None:
        # Iceberg resolves the scan snapshot lazily, so a plan derived
        # from read() of THIS table would re-read the post-replace
        # state at action time (ADVICE r2: the enforce_retention stale-
        # read hazard).  Materialize the replacement content first.
        df = df.localCheckpoint(eager=True)
        df.writeTo(self.identifier).replace()
        return self.snapshot_id()

    def overwrite_partitions(
        self,
        df: DataFrame,
        partition_col: str = "partition_id",
        partitions: "list | None" = None,
    ) -> str | None:
        """VALUE-KEYED dynamic overwrite: replace exactly the rows
        whose ``partition_col`` is in ``partitions`` (default: the
        values present in ``df``) with ``df``'s rows, via Iceberg's
        condition-based ``overwrite`` — NOT ``overwritePartitions``,
        which keys on the table's own partition SPEC and would replace
        the whole table when the spec doesn't match ``partition_col``
        (e.g. an unpartitioned tier table).  On a table that IS
        partitioned by ``partition_col`` the condition prunes to a
        metadata-level partition replacement.  Passing ``partitions``
        explicitly with an empty ``df`` clears those partitions.  The
        input is materialized first (localCheckpoint) so self-derived
        plans cannot re-read the overwritten table (same hazard as
        above); only the replacement rows are materialized, never the
        whole table."""
        from pyspark.sql import functions as F

        df = df.localCheckpoint(eager=True)
        if partitions is None:
            partitions = [
                r[0] for r in df.select(partition_col).distinct().collect()
            ]
        df.writeTo(self.identifier).overwrite(
            F.col(partition_col).isin(list(partitions))
        )
        return self.snapshot_id()
