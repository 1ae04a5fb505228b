"""Engine benchmark: rolled-up points/sec across the 1m/1h/1d tier
cascade plus headline queries.

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "points_per_sec": ..., ...}

The cascade runs over a conv_id-bucketed transcript table (the 100 TB
layout: Iceberg bucket-partitioned by conversation), which makes every
tier rollup **shuffle-free** — `.explain` shows no Exchange; the only
passes are bucket-local scan + hash aggregate + bucketed write.

Env knobs:
    SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS     local[...] core count (default 32)
    BENCH_TURNS          approximate synthetic transcript turns (~2M default)
    BENCH_SCALING=1      also run the cascade at the BENCH_SCALE_LEVELS
                         parallelism pair and report scaling efficiency
    BENCH_SCALE_LEVELS   "N,4N" pair, default "2,8" (see BENCH/BASELINE.md:
                         this VM's single-core turbo caps wall-clock core
                         scaling; a CPU control measures the attainable
                         ceiling and the normalized efficiency)
"""

from __future__ import annotations

import json
import multiprocessing
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

CHANNELS = 3
BENCH_DIR = "/tmp/tsaug_bench"
WAREHOUSE = f"{BENCH_DIR}/warehouse"
TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
TIER_DDL = (
    "conv_id string, bucket_ts timestamp, turn_rate bigint, "
    "tool_usage bigint, text_len bigint"
)
N_BUCKETS = int(os.environ.get("BENCH_BUCKETS", "64"))


def _session(cpus: str):
    from tsaug_spark.session import get_spark

    return get_spark(
        "tsaug_spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) if cpus != "*" else 32, 8),
        extra_conf={
            "spark.sql.warehouse.dir": WAREHOUSE,
            # applies at first JVM launch in this process; ample heap
            # keeps GC out of the scaling measurement
            "spark.driver.memory": os.environ.get("BENCH_DRIVER_MEM", "8g"),
        },
    )


def _register(spark, name: str, ddl: str, loc: str, sort_cols: str) -> None:
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({ddl}) USING PARQUET "
        f"CLUSTERED BY (conv_id) SORTED BY ({sort_cols}) "
        f"INTO {N_BUCKETS} BUCKETS LOCATION '{loc}'"
    )


def _ensure_transcripts(spark, n_convs: int, avg_turns: int) -> str:
    """Materialize the deterministic transcripts as a bucketed table."""
    loc = f"{BENCH_DIR}/transcripts_b{N_BUCKETS}_{n_convs}_{avg_turns}"
    name = f"bench_transcripts_{n_convs}_{avg_turns}"
    if not os.path.exists(f"{loc}/_SUCCESS"):
        from tsaug_spark.datagen import generate_transcripts

        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(loc, ignore_errors=True)
        df = generate_transcripts(
            spark,
            n_convs=n_convs,
            avg_turns=avg_turns,
            hot_convs=3,
            hot_turns=avg_turns * 50,
            seed=42,
        )
        (
            df.write.bucketBy(N_BUCKETS, "conv_id")
            .sortBy("conv_id", "turn_idx")
            .option("path", loc)
            .mode("overwrite")
            .saveAsTable(name)
        )
    else:
        _register(spark, name, TRANSCRIPT_DDL, loc, "conv_id, turn_idx")
    return name


def _write_tier(df, name: str, loc: str) -> None:
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(loc, ignore_errors=True)
    (
        df.write.bucketBy(N_BUCKETS, "conv_id")
        .sortBy("conv_id", "bucket_ts")
        .option("path", loc)
        .mode("overwrite")
        .saveAsTable(name)
    )


def run_cascade(spark, table: str) -> dict:
    """raw -> 1m -> 1h -> 1d over bucketed tables (shuffle-free)."""
    from tsaug_spark.plans.rollup import reaggregate, rollup_transcripts

    raw = spark.table(table)
    t0 = time.time()
    tier_rows = {}
    _write_tier(
        rollup_transcripts(raw, "1m"), "bench_tier_1m",
        f"{BENCH_DIR}/tier_1m",
    )
    tier_rows["1m"] = spark.table("bench_tier_1m").count()
    _write_tier(
        reaggregate(spark.table("bench_tier_1m"), "1m", "1h"),
        "bench_tier_1h",
        f"{BENCH_DIR}/tier_1h",
    )
    tier_rows["1h"] = spark.table("bench_tier_1h").count()
    _write_tier(
        reaggregate(spark.table("bench_tier_1h"), "1h", "1d"),
        "bench_tier_1d",
        f"{BENCH_DIR}/tier_1d",
    )
    tier_rows["1d"] = spark.table("bench_tier_1d").count()
    wall = time.time() - t0
    turns = raw.count()
    points = sum(tier_rows.values()) * CHANNELS
    return {
        "wall_s": wall,
        "turns": turns,
        "tier_rows": tier_rows,
        "points": points,
        "points_per_sec": points / wall,
        "turns_per_sec": turns / wall,
    }


def run_queries(spark, sf_dir: str) -> dict:
    """Headline engine queries, each timed to completion."""
    import __spark_entry__ as em
    from tsaug_spark.codec.chunks import compress_tier
    from tsaug_spark.operators import Pool
    from tsaug_spark.plans.pack import apply_operator

    timings = {}

    def timed(name, thunk):
        t0 = time.time()
        thunk()
        timings[name] = round(time.time() - t0, 3)

    # Pre-warm the Python worker pool: the first pandas-UDF stage in a
    # session pays one numpy/pandas/pyarrow import per worker (~14 s for
    # 32 workers on this VM), after which workers are reused
    # (spark.python.worker.reuse).  On a long-lived cluster this is a
    # one-off per executor; keeping it out of the per-query timings
    # measures the steady state.  Wall-clock cost still lands in the
    # reported total.
    n_workers = spark.sparkContext.defaultParallelism
    spark.range(0, n_workers, 1, n_workers).mapInPandas(
        lambda it: it, "id long"
    ).count()

    timed("rollup_1m_events", lambda: em.q_rollup_1m(spark, sf_dir).count())
    timed("cascade_1d_events", lambda: em.q_cascade_1d(spark, sf_dir).count())
    timed("gapfill_locf", lambda: em.q_gapfill_locf(spark, sf_dir).count())
    timed(
        "gapfill_interp", lambda: em.q_gapfill_interp(spark, sf_dir).count()
    )
    timed("pool_ave", lambda: em.q_pool_ave(spark, sf_dir).count())
    timed(
        "quantize_uniform",
        lambda: em.q_quantize_uniform(spark, sf_dir).count(),
    )
    timed("tpch_pricing", lambda: em.q_tpch_pricing(spark, sf_dir).count())
    timed(
        "nation_revenue", lambda: em.q_nation_revenue(spark, sf_dir).count()
    )
    timed("minhash_sig", lambda: em.q_minhash_sig(spark, sf_dir).count())
    timed("simhash16", lambda: em.q_simhash16(spark, sf_dir).count())
    timed(
        "simhash_pairs", lambda: em.q_simhash_pairs(spark, sf_dir).count()
    )
    timed("embed_cosine", lambda: em.q_embed_cosine(spark, sf_dir).count())
    timed(
        "range_busy_windows",
        lambda: em.q_range_busy_windows(spark, sf_dir).count(),
    )
    timed(
        "hash_split_strata",
        lambda: em.q_hash_split_strata(spark, sf_dir).count(),
    )
    timed("twa_1h", lambda: em.q_twa_1h(spark, sf_dir).count())
    timed("m4_daily", lambda: em.q_m4_daily(spark, sf_dir).count())
    timed(
        "heavy_hitters_1d",
        lambda: em.q_heavy_hitters_1d(spark, sf_dir).count(),
    )
    timed(
        "cohort_retention",
        lambda: em.q_cohort_retention(spark, sf_dir).count(),
    )
    timed(
        "funnel",
        lambda: em.q_funnel_signup_purchase(spark, sf_dir).count(),
    )
    timed(
        "cusum_changepoint",
        lambda: em.q_cusum_changepoint_1h(spark, sf_dir).count(),
    )
    timed(
        "hll_md5_cascade_1d",
        lambda: em.q_hll_md5_cascade_1d(spark, sf_dir).count(),
    )
    timed(
        "seasonal_decompose",
        lambda: em.q_seasonal_decompose(spark, sf_dir).count(),
    )
    timed(
        "asof_nearest", lambda: em.q_asof_nearest(spark, sf_dir).count()
    )
    timed("pacf_24", lambda: em.q_pacf_24(spark, sf_dir).count())
    timed(
        "bloom_prune_join",
        lambda: em.q_bloom_prune_join(spark, sf_dir).count(),
    )
    timed(
        "triangle_copurchase",
        lambda: em.q_triangle_copurchase(spark, sf_dir).count(),
    )
    timed(
        "page_hinkley", lambda: em.q_page_hinkley(spark, sf_dir).count()
    )
    timed(
        "kmv_cascade_1d",
        lambda: em.q_kmv_cascade_1d(spark, sf_dir).count(),
    )
    timed(
        "pagerank_copurchase",
        lambda: em.q_pagerank_copurchase(spark, sf_dir).count(),
    )

    tier = spark.table("bench_tier_1m").select(
        "conv_id",
        F.unix_timestamp("bucket_ts").alias("bucket_idx"),
        F.col("turn_rate").cast("double"),
        F.col("tool_usage").cast("double"),
        F.col("text_len").cast("double"),
    )
    timed(
        "kernel_pool_subseed",
        lambda: apply_operator(
            tier,
            Pool(size=4, seed=0),
            ["turn_rate", "tool_usage", "text_len"],
            mode="subseed",
        ).count(),
    )
    from tsaug_spark.codec.chunks import decompress_tier

    chunks = compress_tier(
        spark.table("bench_tier_1m"),
        ["turn_rate", "tool_usage", "text_len"],
    ).persist()
    timed(
        "gorilla_compress",
        lambda: chunks.agg(F.sum("bytes_compressed")).collect(),
    )
    # decode parallelizes at chunk granularity (one conversation per
    # chunk row); this line proves decode keeps up with encode at the
    # 1m tier — the read path of the compressed retention store
    timed(
        "gorilla_decompress",
        lambda: decompress_tier(
            chunks, ["turn_rate", "tool_usage", "text_len"]
        ).count(),
    )
    chunks.unpersist()
    return timings


def run_stream_ingest(spark, loc: str, turns: int) -> dict:
    """Streaming ingest throughput with a mid-stream checkpoint resume.

    Half the transcript files are ingested via the availableNow
    structured-streaming path (watermarked 1m stream rollup ->
    foreachBatch merge into the RollupJob tier store), then the
    remaining files "arrive" and a SECOND query resumes from the SAME
    checkpoint — the file-source checkpoint skips everything already
    committed, so the resume processes only the new files.  Reports
    sustained turns/s across both phases and the caught-up tier row
    count vs the batch rollup (must match exactly).
    """
    import glob as _glob
    import tempfile

    from pyspark.sql.types import _parse_datatype_string

    from tsaug_spark.plans.rollup import rollup_transcripts
    from tsaug_spark.sources.checkpoint import RollupJob
    from tsaug_spark.streaming.stream_sink import run_stream_ingest_once

    schema = _parse_datatype_string(TRANSCRIPT_DDL)
    work = tempfile.mkdtemp(prefix="stream_bench_", dir=BENCH_DIR)
    src = os.path.join(work, "src")
    os.makedirs(src)
    # stage the transcripts as TIME-ORDERED files with disjoint ts
    # ranges (repartitionByRange): a streaming source delivers data
    # roughly in event-time order, and disjoint ranges mean no batch
    # can contain rows behind the watermark of a previous batch — the
    # bucketed bench table's conv-hash file layout would scramble time
    # and trip late-row drops instead.  Staging cost is source prep,
    # excluded from the measured ingest wall.
    staged = os.path.join(work, "staged")
    (
        spark.read.schema(schema)
        .parquet(loc)
        .repartitionByRange(16, "ts")
        .sortWithinPartitions("ts")
        .write.parquet(staged)
    )
    files = sorted(_glob.glob(os.path.join(staged, "part-*.parquet")))
    half = max(1, len(files) // 2)
    # default 8: fewer-larger micro-batches halve the per-batch fixed
    # cost (state-store + merge + checkpoint commits) — measured 2.5x
    # over fpt=4 same-window (BENCH/BASELINE.md round-5 streaming)
    fpt = int(os.environ.get("BENCH_STREAM_FPT", "8"))

    def arrive(batch):
        for f in batch:
            os.link(f, os.path.join(src, os.path.basename(f)))

    job = RollupJob(
        spark, os.path.join(work, "job"), source_snapshot="stream-bench"
    )
    ckpt = os.path.join(work, "ckpt")

    arrive(files[:half])
    t0 = time.time()
    run_stream_ingest_once(
        spark, src, schema, job, "1m", watermark="1 hour",
        max_files_per_trigger=fpt, checkpoint_dir=ckpt,
    )
    phase1 = time.time() - t0

    arrive(files[half:])  # late arrivals; resume from the checkpoint
    t1 = time.time()
    run_stream_ingest_once(
        spark, src, schema, job, "1m", watermark="1 hour",
        max_files_per_trigger=fpt, checkpoint_dir=ckpt,
    )
    wall = time.time() - t1 + phase1

    got = job.read_tier("1m").count()
    want = (
        rollup_transcripts(
            spark.read.schema(schema).parquet(loc), "1m"
        ).count()
    )
    shutil.rmtree(work, ignore_errors=True)
    return {
        "wall_s": round(wall, 3),
        "phase1_s": round(phase1, 3),
        "resume_s": round(wall - phase1, 3),
        "turns_per_sec": round(turns / wall),
        "tier_rows": got,
        "matches_batch_rollup": got == want,
        "knobs": {
            "maxFilesPerTrigger": fpt,
            "staged_files": len(files),
            "watermark": "1 hour",
        },
    }


def run_dedup_pipeline(spark, n_docs: int) -> dict:
    """End-to-end near-dup survivorship chain at corpus scale:

        signatures -> LSH candidate pairs -> exact-Jaccard verify ->
        connected components -> survivors

    over the deterministic template-mutation corpus
    (``datagen.generate_docs``: ~n_docs/8 near-dup cliques, 25% exact
    copies).  Every stage is the production path from
    ``pipeline/dedup.py`` — banded equi-joins (never all-pairs),
    hot-bucket capping with observable drop stats, pointer-jumping
    components — so the reported docs/s is the real curation-pass
    rate, not a single stage in isolation.  Corpus generation +
    write are source prep, excluded from the measured wall.
    """
    from tsaug_spark.datagen import generate_docs
    from tsaug_spark.pipeline.dedup import (
        dedup_clusters,
        hot_bucket_stats,
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
        shingles,
    )

    loc = f"{BENCH_DIR}/docs_{n_docs}"
    if not os.path.exists(f"{loc}/_SUCCESS"):
        generate_docs(spark, n_docs).write.mode("overwrite").parquet(loc)
    docs = spark.read.parquet(loc).select("doc_id", "text")

    stages = {}

    def timed(name, thunk):
        t0 = time.time()
        out = thunk()
        stages[name] = round(time.time() - t0, 3)
        return out

    n_bands, max_bucket = 4, 256
    sh = shingles(docs).persist()
    sig = minhash_signatures(sh, n_bands=n_bands).persist()
    timed("signatures", sig.count)
    pairs = lsh_candidate_pairs(
        sig, n_bands=n_bands, max_bucket=max_bucket
    ).persist()
    n_pairs = timed("lsh_pairs", pairs.count)
    # the same band frame lsh_candidate_pairs capped, re-derived for the
    # observable drop counter (one cheap pass over the tiny signatures)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.col(f"sig{b}").alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("band.band_idx", "band.band_val")
    dropped = hot_bucket_stats(
        bands, ["band_idx", "band_val"], max_bucket
    ).agg(
        F.count(F.lit(1)).alias("buckets"),
        F.coalesce(F.sum("bucket_size"), F.lit(0)).alias("rows"),
    ).first()
    verified = ngram_jaccard_pairs(
        sh, threshold=0.4, candidates=pairs
    ).persist()
    n_verified = timed("verify", verified.count)
    labels = timed(
        "components", lambda: dedup_clusters(verified, max_iters=30)
    )
    dupes = labels.filter(F.col("component") != F.col("doc_id")).persist()
    n_dupes = timed("survivors_mark", dupes.count)
    survivors = timed(
        "survivors",
        lambda: docs.join(dupes, "doc_id", "left_anti").count(),
    )
    n_components = labels.select("component").distinct().count()
    wall = sum(stages.values())
    for df in (sh, sig, pairs, verified, dupes):
        df.unpersist()
    return {
        "wall_s": round(wall, 3),
        "stages_s": stages,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / wall),
        "candidate_pairs": n_pairs,
        "verified_pairs": n_verified,
        "dup_clusters": n_components,
        "docs_removed": n_dupes,
        "survivors": survivors,
        "dropped_hot_buckets": {
            "buckets": int(dropped["buckets"]),
            "rows": int(dropped["rows"]),
        },
    }


def run_cascade_update(spark, table: str) -> dict:
    """Incremental continuous-aggregate refresh vs full re-roll.

    Rolls the first ~95% of the transcripts into a RollupJob tier
    store (1m, then a FULL 1m->1h cascade — the timed full-re-roll
    baseline), lands the late 5% tail via the fine-tier incremental
    ``update()``, then times ``cascade_update`` — which re-aggregates
    only the watermark-grace tail of each partition and rewrites only
    touched rows.  Verifies the refreshed coarse tier equals the
    direct full reaggregation (row count) and reports the
    incremental-vs-full speedup.
    """
    import tempfile

    from tsaug_spark.plans.rollup import reaggregate
    from tsaug_spark.sources.checkpoint import RollupJob

    raw = spark.table(table)
    lo, hi = raw.agg(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).first()
    cutoff = F.timestamp_seconds(F.lit(int(lo + 0.95 * (hi - lo))))
    work = tempfile.mkdtemp(prefix="cupd_", dir=BENCH_DIR)
    job = RollupJob(
        spark, work, n_partitions=4, source_snapshot="bench-early"
    )
    job.run(raw.filter(F.col("ts") < cutoff), "1m")

    t0 = time.time()
    job.cascade_tier("1m", "1h")
    t_full = time.time() - t0
    wm_before = min(
        r["watermark_ts"]
        for r in job.watermarks("1h").collect()
    )

    t0 = time.time()
    job.update(
        raw, "1m", grace="2 hours", new_snapshot="bench-late"
    )
    t_fine_update = time.time() - t0

    t0 = time.time()
    job.cascade_update(
        "1m", "1h", grace="2 hours", new_snapshot="bench-late"
    )
    t_incr = time.time() - t0

    coarse = job.read_tier("1h")
    rows_after = coarse.count()
    refresh_floor = F.timestamp_seconds(
        F.floor(
            (F.unix_timestamp(F.lit(wm_before)) - 7200) / 3600
        ).cast("long")
        * 3600
    )
    rows_rerolled = coarse.filter(
        F.col("bucket_ts") >= refresh_floor
    ).count()
    matches = rows_after == reaggregate(
        job.read_tier("1m"), "1m", "1h"
    ).count()
    shutil.rmtree(work, ignore_errors=True)
    return {
        "full_reroll_s": round(t_full, 3),
        "fine_update_s": round(t_fine_update, 3),
        "incremental_s": round(t_incr, 3),
        "speedup_vs_full": round(t_full / t_incr, 2),
        "coarse_rows": rows_after,
        "rows_rerolled": rows_rerolled,
        "matches_full_reaggregate": matches,
    }


def _burn(_):
    """Cache-resident integer workload for the CPU control (module-level
    so multiprocessing can pickle it)."""
    import numpy as np

    a = np.arange(50_000)
    x = 0
    for _ in range(800):
        x += int((a * 3 + 1).sum() % 97)
    return x


def _cpu_control(levels: tuple[int, int]) -> dict:
    """Measure this VM's attainable core-scaling ceiling with a
    cache-resident integer workload (no Spark, no memory pressure)."""
    burn = _burn
    out = {}
    for n in levels:
        with multiprocessing.Pool(n) as p:
            t0 = time.time()
            p.map(burn, range(n * 2))
            out[n] = n * 2 / (time.time() - t0)
    lo, hi = levels
    return {
        "throughput": {str(k): round(v, 2) for k, v in out.items()},
        "attainable_speedup": round(out[hi] / out[lo], 3),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    turns_target = int(os.environ.get("BENCH_TURNS", "2000000"))
    avg_turns = 200
    n_convs = max(turns_target // (avg_turns + 30), 100)

    os.makedirs(BENCH_DIR, exist_ok=True)
    spark = _session(cpus)
    table = _ensure_transcripts(spark, n_convs, avg_turns)

    if os.environ.get("BENCH_WARMUP", "1") == "1":
        # first pass pays JIT + page-cache faults + parquet footer reads;
        # report the steady-state pass (the scaling protocol below always
        # warms up per level for the same reason)
        run_cascade(spark, table)
    cascade = run_cascade(spark, table)
    t0 = time.time()
    queries = run_queries(spark, sf_dir)
    total = round(cascade["wall_s"] + (time.time() - t0), 3)

    result = {
        "metric": "tier_cascade_and_headline_queries",
        "value": total,
        "unit": "sec",
        "queries": dict(
            {"tier_cascade": round(cascade["wall_s"], 3)}, **queries
        ),
        "sf": sf_dir,
        "cpus": cpus,
        "turns": cascade["turns"],
        "tier_rows": cascade["tier_rows"],
        "points_rolled": cascade["points"],
        "points_per_sec": round(cascade["points_per_sec"]),
        "turns_per_sec": round(cascade["turns_per_sec"]),
    }

    # per-query regression gate vs the newest committed BENCH_r*.json
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    prevs = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    if prevs:
        try:
            with open(prevs[-1]) as fh:
                prev = json.load(fh)
            parsed = prev.get("parsed") or prev
            prev_q = parsed.get("queries", {})
            prev_turns = parsed.get("turns", 0)
            # only comparable at the same input size: the cascade and
            # kernel timings scale with BENCH_TURNS
            if prev_turns and abs(prev_turns - cascade["turns"]) > (
                0.1 * prev_turns
            ):
                prev_q = {}
            ratio = {
                k: round(v / prev_q[k], 2)
                for k, v in result["queries"].items()
                if prev_q.get(k)
            }
            result["vs_prev"] = {
                "baseline": os.path.basename(prevs[-1]),
                "ratio": ratio,
                # flag needs BOTH a 1.3x ratio and >0.5s absolute slip:
                # this host's allocation drifts 2-3x on a minutes
                # timescale, so sub-second queries trip pure ratios
                # randomly (BENCH/BASELINE.md)
                "regressions_gt_1.3x": sorted(
                    k
                    for k, r in ratio.items()
                    if r > 1.3
                    and result["queries"][k] - prev_q[k] > 0.5
                ),
            }
        except (OSError, json.JSONDecodeError, KeyError):
            pass

    # streaming ingest line (skipped inside scaling runs: those measure
    # the cascade and would pay the staging cost at every level)
    if (
        os.environ.get("BENCH_STREAM", "1") == "1"
        and os.environ.get("BENCH_SCALING") != "1"
    ):
        loc = f"{BENCH_DIR}/transcripts_b{N_BUCKETS}_{n_convs}_{avg_turns}"
        result["streaming"] = run_stream_ingest(
            spark, loc, cascade["turns"]
        )

    # end-to-end dedup survivorship chain (sig -> LSH -> verify ->
    # components -> survivors) on the template-mutation corpus
    if (
        os.environ.get("BENCH_DEDUP", "1") == "1"
        and os.environ.get("BENCH_SCALING") != "1"
    ):
        n_docs = int(os.environ.get("BENCH_DOCS", "200000"))
        result["dedup_pipeline"] = run_dedup_pipeline(spark, n_docs)

    # incremental continuous-aggregate refresh vs full re-roll
    if (
        os.environ.get("BENCH_CASCADE_UPDATE", "1") == "1"
        and os.environ.get("BENCH_SCALING") != "1"
    ):
        result["cascade_update"] = run_cascade_update(spark, table)

    if os.environ.get("BENCH_SCALING") == "1":
        levels = tuple(
            int(x)
            for x in os.environ.get("BENCH_SCALE_LEVELS", "2,8").split(",")
        )
        rounds = int(os.environ.get("BENCH_SCALE_ROUNDS", "3"))
        spark.stop()
        lo, hi = levels
        loc = f"{BENCH_DIR}/transcripts_b{N_BUCKETS}_{n_convs}_{avg_turns}"

        def measure(level: int) -> dict:
            s = _session(str(level))
            _register(s, table, TRANSCRIPT_DDL, loc, "conv_id, turn_idx")
            run_cascade(s, table)  # warm-up (JIT, page cache)
            m = run_cascade(s, table)
            s.stop()
            return m

        # this VM's effective CPU allocation drifts on a minutes
        # timescale, so the two levels are interleaved per round and the
        # speedup is the per-round ratio (median across rounds) — a
        # sequential A...A B...B protocol confounds level with drift
        per_round = []
        details = {lo: [], hi: []}
        for _ in range(rounds):
            m_lo = measure(lo)
            m_hi = measure(hi)
            details[lo].append(m_lo)
            details[hi].append(m_hi)
            per_round.append(
                m_hi["points_per_sec"] / m_lo["points_per_sec"]
            )
        per_round.sort()
        speedup = per_round[len(per_round) // 2]
        best = {
            k: max(v, key=lambda m: m["points_per_sec"])
            for k, v in details.items()
        }
        control = _cpu_control(levels)
        result["scaling"] = {
            f"local{lo}": {
                "points_per_sec": round(best[lo]["points_per_sec"]),
                "turns_per_sec": round(best[lo]["turns_per_sec"]),
                "walls_s": [
                    round(m["wall_s"], 3) for m in details[lo]
                ],
            },
            f"local{hi}": {
                "points_per_sec": round(best[hi]["points_per_sec"]),
                "turns_per_sec": round(best[hi]["turns_per_sec"]),
                "walls_s": [
                    round(m["wall_s"], 3) for m in details[hi]
                ],
            },
            "per_round_speedups": [round(x, 3) for x in per_round],
            "speedup": round(speedup, 3),
            "efficiency": round(speedup / (hi / lo), 3),
            "cpu_control": control,
            "efficiency_vs_attainable": round(
                speedup / control["attainable_speedup"], 3
            ),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
