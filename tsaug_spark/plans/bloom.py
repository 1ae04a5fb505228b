"""Bloom-filter runtime pruning for selective fact-to-dim joins.

The 100 TB shape this solves: a huge fact table joins a dimension whose
*filtered* key set is small (a date-range slice of orders, the active
subset of conversations, one tenant's ids), but the fact side still
pays a full shuffle before the join can drop its misses.  A Bloom
filter built from the filtered dim keys, applied to the fact table as a
pure projection BEFORE the shuffle, removes almost every miss at scan
speed — the same trick Spark's own ``InjectRuntimeFilter`` plays for
shuffle joins, expressed here explicitly so the pruning is visible,
tunable, and engine-independent.

Design:

* k=4 hash positions per key come from ONE md5 (four 8-hex-digit
  slices mod ``m_bits``) — deterministic, engine-independent, no
  JVM-private expressions (``bloom_filter_agg`` / ``might_contain``
  are not public SQL surface).
* The filter is materialized as ``m_bits / 32`` 32-bit words.  Small
  filters fold into a LITERAL array in the probe expression
  (driver-side control plane, bounded by m — the same contract as the
  IVF centroid literal); bigger filters broadcast-join the word table
  on ``word_idx``, one broadcast hash join per hash position — either
  way the fact side never shuffles before the filter.
* The probe is a narrow projection: ``word[pos / 32] & (1 << pos % 32)``
  for each of the k slices, ANDed.  False positives are removed by the
  exact join that follows, so results are IDENTICAL to the unpruned
  join — the filter only moves work off the shuffle.

Scale: build side is one explode + one hash aggregate over the
(already filtered, small) dim, output capped by the filter size, never
the key count; the probe adds zero shuffles and zero joins to the fact
scan.  Choose ``m_bits >= 16 * |keys|`` for a ~1% false-positive rate
at k=4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_K = 4  # md5 yields four independent 32-bit slices


def _positions(key_col: F.Column, m_bits: int) -> list[F.Column]:
    """k deterministic bit positions in [0, m_bits) from one md5."""
    h = F.md5(key_col.cast("string"))
    return [
        F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long")
        % F.lit(m_bits)
        for i in range(_K)
    ]


def bloom_build(
    dim: DataFrame, key_col: str, m_bits: int = 1 << 15
) -> DataFrame:
    """Aggregate the dim keys into ``m_bits / 32`` bitmap words
    (``word_idx``, ``word``); absent words are all-zero and omitted."""
    pos = F.explode(
        F.array(*_positions(F.col(key_col), m_bits))
    ).alias("pos")
    return (
        dim.select(pos)
        .select(
            (F.col("pos") / 32).cast("long").alias("word_idx"),
            (F.col("pos") % 32).cast("int").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(
            F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").alias(
                "word"
            )
        )
    )


def bloom_prune(
    fact: DataFrame,
    words: DataFrame,
    key_col: str,
    m_bits: int = 1 << 15,
    max_literal_words: int = 1024,
) -> DataFrame:
    """Filter ``fact`` to rows whose ``key_col`` passes the filter.

    Two probe modes, picked by filter size:

    * **literal** (<= ``max_literal_words`` words): the word table is
      collected (bounded by ``m_bits / 32`` rows — driver-side control
      plane) and folded into one array literal, so the probe is a pure
      narrow projection — no join, no exchange of any kind.
    * **broadcast-join** (larger filters): one broadcast hash join per
      hash position against the (word_idx, word) table — still zero
      fact-side shuffles (measured ~6x faster than a 16k-element
      literal, whose per-row array handling dominates).

    Keys that pass may still be false positives; follow with the
    exact join.
    """
    n_words = m_bits // 32
    positions = _positions(F.col(key_col), m_bits)
    if n_words <= max_literal_words:
        dense = [0] * n_words
        for r in words.collect():  # bounded by n_words, never dim size
            dense[int(r["word_idx"])] = int(r["word"])
        # F.lit(list) folds to ONE array literal; F.array(*lits) would
        # leave a per-row CreateArray expression (~3x slower, measured)
        arr = F.lit(dense)
        probed = fact.withColumn("_bwords", arr)
        keep = F.lit(True)
        for i, p in enumerate(positions):
            probed = probed.withColumn(f"_bp{i}", p)
            keep = keep & (
                F.expr(
                    f"element_at(_bwords, CAST(_bp{i} / 32 AS INT) + 1) "
                    f"& shiftleft(CAST(1 AS BIGINT), "
                    f"CAST(_bp{i} % 32 AS INT))"
                )
                != 0
            )
        return probed.filter(keep).drop(
            "_bwords", *[f"_bp{i}" for i in range(_K)]
        )

    probed = fact
    keep = F.lit(True)
    helper = []
    for i, p in enumerate(positions):
        w_i = words.select(
            F.col("word_idx").alias(f"_wi{i}"),
            F.col("word").alias(f"_w{i}"),
        )
        probed = probed.withColumn(f"_bp{i}", p).join(
            F.broadcast(w_i),
            F.expr(f"CAST(_bp{i} / 32 AS BIGINT)") == F.col(f"_wi{i}"),
            "left",
        )
        helper += [f"_bp{i}", f"_wi{i}", f"_w{i}"]
        keep = keep & F.coalesce(
            F.expr(
                f"(_w{i} & shiftleft(CAST(1 AS BIGINT), "
                f"CAST(_bp{i} % 32 AS INT))) != 0"
            ),
            F.lit(False),
        )
    return probed.filter(keep).drop(*helper)


def sized_m_bits(n_keys: int, bits_per_key: int = 16) -> int:
    """Power-of-two filter size for ~1% false positives at k=4:
    >= ``bits_per_key`` bits per key, floor 2^15."""
    m = 1 << 15
    while m < bits_per_key * max(1, n_keys):
        m <<= 1
    return m


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int | None = None,
) -> DataFrame:
    """Exact inner join of ``fact`` to ``dim``, with the fact side
    Bloom-pruned first.  Result rows are identical to the plain join;
    only the shuffle volume changes.  When ``m_bits`` is None the
    filter is sized from a driver-side count of the dim keys (a
    control-plane scan of the already-filtered small side) — an
    undersized filter saturates and stops pruning."""
    if m_bits is None:
        m_bits = sized_m_bits(dim.count())
    words = bloom_build(dim, dim_key, m_bits)
    pruned = bloom_prune(fact, words, fact_key, m_bits)
    return pruned.join(
        dim, pruned[fact_key] == dim[dim_key], "inner"
    )
