"""Deterministic synthetic transcript generator (Spark-native, seedless RNG).

Produces the engine's input table per BASELINE.json `input_hint`:

    transcripts(conv_id: string, turn_idx: int, role: string,
                text: string, tool: string, ts: timestamp)

Everything is a pure hash of (seed, conv_id, turn_idx) computed with
built-in column functions — no Python RNG, no UDFs — so the same call is
bit-identical across runs, partitionings, and cluster sizes, and the
generator itself scales: it is `spark.range(n_convs)` + an exploded
per-conversation turn sequence, both distributed.

Skew: a configurable head of "hot" conversations gets `hot_turns` turns
(default 100x the typical conversation) to exercise the engine's salted
aggregation and AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: epoch seconds for 2026-01-01 00:00:00 UTC — the synthetic corpus start
_BASE_EPOCH = 1767225600

_ROLES = ["user", "assistant", "assistant", "tool"]
_TOOLS = ["search", "code_exec", "browser", "calculator", "retrieval"]
_WORDS = [
    "the", "model", "ran", "a", "query", "over", "sharded", "data",
    "and", "returned", "rows", "with", "schema", "checks", "passing",
]


def _h(*cols, seed: int):
    """Deterministic non-negative 64-bit hash of the given columns."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    avg_turns: int = 40,
    hot_convs: int = 2,
    hot_turns: int = 4000,
    seed: int = 42,
    mean_gap_s: int = 45,
    partitions: int | None = None,
) -> DataFrame:
    """Build the deterministic transcript DataFrame.

    Turn counts: conversation i < hot_convs gets exactly ``hot_turns``
    turns; others get ``avg_turns/2 .. 3*avg_turns/2`` by hash.  Turn
    timestamps step by ``1 .. 2*mean_gap_s`` seconds, also by hash, so
    per-conversation series have realistic irregular spacing and gaps.
    """
    convs = spark.range(n_convs).withColumnRenamed("id", "conv_seq")
    if partitions:
        convs = convs.repartition(partitions, "conv_seq")

    lo = max(1, avg_turns // 2)
    span = max(1, avg_turns)
    convs = convs.select(
        "conv_seq",
        F.format_string("conv-%08d", F.col("conv_seq")).alias("conv_id"),
        F.when(F.col("conv_seq") < hot_convs, F.lit(hot_turns))
        .otherwise(
            (lo + F.pmod(_h(F.col("conv_seq"), seed=seed), F.lit(span)))
        )
        .cast("int")
        .alias("n_turns"),
    )

    turns = convs.select(
        "conv_id",
        "conv_seq",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias(
            "turn_idx"
        ),
    )

    gap = 1 + F.pmod(
        _h(F.col("conv_id"), F.col("turn_idx"), seed=seed + 1),
        F.lit(2 * mean_gap_s),
    )
    # cumulative irregular gaps ~ turn_idx * (avg gap) + bounded jitter:
    # start offset per conversation spreads starts over ~one day
    conv_start = _BASE_EPOCH + F.pmod(
        _h(F.col("conv_id"), seed=seed + 2), F.lit(86400)
    )
    ts_epoch = (
        conv_start
        + F.col("turn_idx") * F.lit(mean_gap_s)
        + F.pmod(gap * F.col("turn_idx"), F.lit(4 * mean_gap_s))
    )

    role = F.element_at(
        F.array(*[F.lit(r) for r in _ROLES]),
        (
            F.pmod(
                _h(F.col("conv_id"), F.col("turn_idx"), seed=seed + 3),
                F.lit(len(_ROLES)),
            )
            + 1
        ).cast("int"),
    )
    tool_hash = _h(F.col("conv_id"), F.col("turn_idx"), seed=seed + 4)
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(*[F.lit(t) for t in _TOOLS]),
            (F.pmod(tool_hash, F.lit(len(_TOOLS))) + 1).cast("int"),
        ),
    ).otherwise(F.lit(None).cast("string"))

    n_words = 3 + F.pmod(
        _h(F.col("conv_id"), F.col("turn_idx"), seed=seed + 5), F.lit(60)
    )
    word = F.element_at(
        F.array(*[F.lit(w) for w in _WORDS]),
        (F.pmod(tool_hash, F.lit(len(_WORDS))) + 1).cast("int"),
    )
    text = F.concat(
        F.format_string("[%s#%d] ", F.col("conv_id"), F.col("turn_idx")),
        F.repeat(F.concat(word, F.lit(" ")), n_words.cast("int")),
    )

    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.timestamp_seconds(ts_epoch).alias("ts"),
    )


def generate_docs(
    spark: SparkSession,
    n_docs: int,
    seed: int = 7,
    n_templates: int | None = None,
    doc_len: int = 32,
    vocab: int = 4096,
    mutation_pct: int = 6,
    exact_pct: int = 25,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic near-duplicate document corpus for dedup benchmarks.

    Each doc copies one of ``n_templates`` word templates (template t's
    word j is a pure hash of (seed, t, j) into ``vocab``); a doc is
    either VERBATIM (``exact_pct``% of docs — exact-duplicate clusters,
    the mass ``exact_dedup``/``cap_hot_buckets`` must route around) or
    MUTATED (each position independently rewritten with probability
    ``mutation_pct``% to a doc-unique word — same-template Jaccard stays
    high, cross-template ~0, the LSH near-dup target).  Everything is a
    hash of (seed, doc_id, j): bit-identical across runs, partitionings
    and cluster sizes, and generated distributed (range + transform, no
    Python RNG, no UDFs).

    Returns (doc_id: bigint, template_id: bigint, is_exact: int,
    text: string).
    """
    if n_templates is None:
        n_templates = max(n_docs // 8, 1)
    d = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    if partitions:
        d = d.repartition(partitions, "doc_id")
    d = d.select(
        "doc_id",
        F.pmod(_h(F.col("doc_id"), seed=seed), F.lit(n_templates)).alias(
            "template_id"
        ),
        (
            F.pmod(_h(F.col("doc_id"), seed=seed + 1), F.lit(100))
            < exact_pct
        )
        .cast("int")
        .alias("is_exact"),
    )
    tpl_word = lambda j: F.format_string(  # noqa: E731
        "w%04d",
        F.pmod(_h(F.col("template_id"), j, seed=seed + 2), F.lit(vocab)),
    )
    mut_word = lambda j: F.format_string(  # noqa: E731
        "m%012d", _h(F.col("doc_id"), j, seed=seed + 3) % F.lit(10**12)
    )
    mutate = lambda j: (  # noqa: E731
        F.pmod(_h(F.col("doc_id"), j, seed=seed + 4), F.lit(100))
        < mutation_pct
    ) & (F.col("is_exact") == 0)
    words = F.transform(
        F.sequence(F.lit(0), F.lit(doc_len - 1)),
        lambda j: F.when(mutate(j), mut_word(j)).otherwise(tpl_word(j)),
    )
    return d.withColumn("text", F.concat_ws(" ", words))
