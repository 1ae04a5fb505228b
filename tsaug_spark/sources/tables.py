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

from tsaug_spark.lineage import truncate_lineage


@dataclass
class ParquetSnapshotTable:
    """Parquet directory + atomic JSON snapshot pointer.

    ``bloom_cols`` opts selected columns into parquet bloom filters
    (``parquet.bloom.filter.enabled#<col>``) on every write through
    :meth:`_commit` — the needle-in-haystack point-lookup index for
    columns too high-cardinality to dictionary-encode (a ``conv_id``
    probe at 10^12 turns touches only the row groups whose bloom
    admits the key; parquet-mr skips the bloom and keeps the exact
    dictionary filter when a chunk stays fully dictionary-encoded, so
    the option is safe to leave on).  ``bloom_ndv`` sizes the filter
    (bits ~= 10 x ndv at the default 1% fpp).
    """

    path: str
    bloom_cols: tuple = ()
    bloom_ndv: int = 1_000_000

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

    @property
    def _meta_dir(self) -> str:
        return os.path.join(self.path, "meta")

    def _commit(self, df: DataFrame, parents: list[str]) -> str:
        snap = f"{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
        data_path = os.path.join(self.path, "data", snap)
        writer = df.write.mode("errorifexists")
        for c in self.bloom_cols:
            writer = writer.option(
                f"parquet.bloom.filter.enabled#{c}", "true"
            ).option(
                f"parquet.bloom.filter.expected.ndv#{c}",
                str(self.bloom_ndv),
            )
        writer.parquet(data_path)
        meta = {
            "snapshot_id": snap,
            "data_path": data_path,
            "parents": parents,
            "committed_at": time.time(),
        }
        # durable per-snapshot metadata (the Iceberg metadata-file
        # analogue) — the pointer only ever holds the CURRENT snapshot,
        # so history/time-travel resolve through meta/<snap>.json
        os.makedirs(self._meta_dir, exist_ok=True)
        with open(os.path.join(self._meta_dir, f"{snap}.json"), "w") as fh:
            json.dump(meta, fh)
        tmp = self._pointer + f".tmp.{uuid.uuid4().hex[:8]}"
        os.makedirs(self.path, exist_ok=True)
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, self._pointer)  # atomic commit
        return snap

    # ---- time travel (Iceberg VERSION AS OF / rollback parity) ----

    def history(self) -> list[dict]:
        """All retained snapshots, newest first — the audit trail a
        training run pins its inputs to.  Resolves through the durable
        per-snapshot metadata files; a table written before meta/
        existed degrades to just the current pointer."""
        try:
            names = sorted(os.listdir(self._meta_dir), reverse=True)
        except FileNotFoundError:
            cur = self._resolve()
            return [cur] if cur else []
        out = []
        for n in names:
            if n.endswith(".json"):
                with open(os.path.join(self._meta_dir, n)) as fh:
                    out.append(json.load(fh))
        return out

    def _meta_of(self, snapshot_id: str) -> dict:
        p = os.path.join(self._meta_dir, f"{snapshot_id}.json")
        try:
            with open(p) as fh:
                meta = json.load(fh)
        except FileNotFoundError:
            raise LookupError(
                f"snapshot {snapshot_id} unknown at {self.path} "
                "(never committed, or expired)"
            )
        if not os.path.isdir(meta["data_path"]):
            raise LookupError(
                f"snapshot {snapshot_id} data expired at {self.path}"
            )
        return meta

    def read_as_of(
        self, spark: SparkSession, snapshot_id: str
    ) -> DataFrame:
        """Time-travel read: the table exactly as of ``snapshot_id``
        (Iceberg ``VERSION AS OF``).  Raises LookupError if the
        snapshot was never committed or its data has been expired."""
        return spark.read.parquet(
            self._meta_of(snapshot_id)["data_path"]
        )

    def rollback(self, snapshot_id: str) -> str:
        """Repoint the table at an earlier retained snapshot (Iceberg
        ``rollback_to_snapshot``).  Pure metadata — no data is copied;
        subsequent commits chain from the rolled-back snapshot."""
        meta = self._meta_of(snapshot_id)
        tmp = self._pointer + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, self._pointer)
        return snapshot_id

    def expire_snapshots(self, keep_last: int = 3) -> list[str]:
        """Garbage-collect all but the newest ``keep_last`` snapshots
        (Iceberg ``expire_snapshots``): their data directories and
        metadata files are deleted; the CURRENT snapshot is always
        retained regardless of age.  Returns the expired ids."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        current = self.snapshot_id()
        hist = self.history()
        expired = []
        for meta in hist[keep_last:]:
            snap = meta["snapshot_id"]
            if snap == current:
                continue
            shutil.rmtree(meta["data_path"], ignore_errors=True)
            try:
                os.remove(
                    os.path.join(self._meta_dir, f"{snap}.json")
                )
            except FileNotFoundError:
                pass
            expired.append(snap)
        return expired

    def data_files(self) -> list[tuple[str, int]]:
        """(path, bytes) of the CURRENT snapshot's parquet data files."""
        meta = self._resolve()
        if meta is None:
            return []
        out = []
        for root, _dirs, names in os.walk(meta["data_path"]):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(root, n)
                    out.append((p, os.path.getsize(p)))
        return out

    def compact(
        self,
        spark: SparkSession,
        target_file_mb: int = 128,
        sort_by: "list[str] | None" = None,
    ) -> dict:
        """Rewrite the current snapshot into ~``target_file_mb`` files
        (Iceberg ``rewrite_data_files`` / Delta ``OPTIMIZE`` analogue).

        Every ``append`` here rewrites old+new files into the next
        snapshot, so file counts grow monotonically under streaming
        ingest and incremental maintenance; compaction bin-packs them
        back.  Pure rewrite — row content is unchanged, the previous
        snapshot stays time-travelable until ``expire_snapshots``.
        Skipped (no new snapshot) when the table is already at or
        below the target file count — unless ``sort_by`` is given.

        ``sort_by`` additionally CLUSTERS the rewrite (Iceberg
        ``rewrite_data_files`` with a sort strategy / Delta ``OPTIMIZE
        ZORDER BY`` analogue): ``repartitionByRange`` + in-partition
        sort gives files DISJOINT key ranges, so per-file and
        row-group min/max statistics become decisive for point and
        range reads — the file-level twin of the chunk store's zone
        maps.  Row multiset is unchanged; order within the table is
        not part of the contract."""
        meta = self._resolve()
        if meta is None:
            raise FileNotFoundError(f"no snapshot at {self.path}")
        files = self.data_files()
        total = sum(sz for _p, sz in files)
        import math

        n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
        if n >= len(files) and not sort_by:
            return {
                "before_files": len(files),
                "after_files": len(files),
                "bytes": total,
                "compacted": False,
            }
        df = spark.read.parquet(meta["data_path"])
        if sort_by:
            from pyspark.sql import functions as F

            df = df.repartitionByRange(
                n, *[F.col(c) for c in sort_by]
            ).sortWithinPartitions(*sort_by)
        else:
            df = df.coalesce(n)
        snap = self._commit(df, [meta["snapshot_id"]])
        return {
            "before_files": len(files),
            "after_files": len(self.data_files()),
            "bytes": total,
            "compacted": True,
            "snapshot_id": snap,
        }

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

    def read_as_of(
        self, spark: SparkSession, snapshot_id: str
    ) -> DataFrame:
        """Time-travel read via Iceberg's snapshot-id scan option
        (``VERSION AS OF``)."""
        return (
            spark.read.format("iceberg")
            .option("snapshot-id", snapshot_id)
            .load(self.identifier)
        )

    def rollback(self, snapshot_id: str) -> str:
        spark = SparkSession.getActiveSession()
        spark.sql(
            "CALL system.rollback_to_snapshot"
            f"('{self.identifier}', {snapshot_id})"
        )
        return snapshot_id

    def history(self) -> list[dict]:
        spark = SparkSession.getActiveSession()
        return [
            r.asDict()
            for r in spark.read.format("iceberg")
            .load(f"{self.identifier}.snapshots")
            .orderBy("committed_at", ascending=False)
            .collect()
        ]

    def compact(
        self, spark: SparkSession, target_file_mb: int = 128
    ) -> dict:
        """Bin-pack small data files via Iceberg's maintenance
        procedure (``rewrite_data_files``); pure rewrite, snapshot
        history preserved."""
        rows = spark.sql(
            "CALL system.rewrite_data_files(table => "
            f"'{self.identifier}', options => map("
            "'target-file-size-bytes', "
            f"'{target_file_mb * 1024 * 1024}'))"
        ).collect()
        d = rows[0].asDict() if rows else {}
        return {
            "before_files": d.get("rewritten_data_files_count"),
            "after_files": d.get("added_data_files_count"),
            "bytes": d.get("rewritten_bytes_count"),
            "compacted": bool(d.get("rewritten_data_files_count")),
        }

    def append(self, df: DataFrame) -> str | None:
        df.writeTo(self.identifier).append()
        return self.snapshot_id()

    def overwrite(self, df: DataFrame) -> str | None:
        # Iceberg resolves the scan snapshot lazily, so a plan derived
        # from read() of THIS table would re-read the post-replace
        # state at action time (ADVICE r2: the enforce_retention stale-
        # read hazard).  Materialize the replacement content first.
        df = df.transform(truncate_lineage)
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

        df = df.transform(truncate_lineage)
        if partitions is None:
            partitions = [
                r[0] for r in df.select(partition_col).distinct().collect()
            ]
        df.writeTo(self.identifier).overwrite(
            F.col(partition_col).isin(list(partitions))
        )
        return self.snapshot_id()
