"""Skewed-input scaling evidence (round-5 ask #1).

Stages a transcript corpus where a handful of hot conversations carry
20-30% of all turns (datagen's hot-conversation knob turned up), then:

1. reports the skew shape (top-10 share, hot share, planned salt factor
   from ``plans.skew.plan_salts``);
2. proves the skew machinery ENGAGES and stays exact on this input:
   - ``plans.skew.rollup_salted`` (salt factor from ``plan_salts``)
     produces bit-identical tier rows to the plain rollup;
   - ``plans.skew.salted_two_phase`` spreads the hot conversations'
     holistic per-conversation aggregate over ``n_salts`` tasks and
     matches the direct aggregate exactly;
   - ``plans.chunked.pool_chunked`` / ``convolve_chunked`` split each
     hot conversation's ~1M-bucket series into parallel chunk tasks
     and match the single-task whole-series result row-for-row — and
     the whole-series-vs-chunked TIMING at full parallelism shows the
     skew win directly (whole-series = one task per hot conversation);
3. runs the interleaved N-vs-4N scaling protocol (per-round lo/hi
   pairs so CPU-allocation drift on this VM cancels; median per-round
   speedup) on the skewed workload: the production tier cascade
   (algebraic — map-side partial aggregation neutralizes hot keys, see
   plans/rollup.py scale notes), the chunked kernels over the hot
   conversations, and the salted holistic aggregate.

The hot-conversation dense series is staged ONCE (untimed) as the
kernels' input table — in production the 1m tier store carries the
bucket ordinal; re-deriving it per measurement would time a
per-conversation sort instead of the kernels.

Writes BENCH/scaling_r5_skew.json.  Usage::

    python tools/skew_scaling.py [--turns 26000000] [--hot-share 0.25] \
        [--levels 8,32] [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: sessions, tier writers)
import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

BENCH_DIR = bench.BENCH_DIR
CHUNK_LEN = 16384
POOL_SIZE = 4
TAPS = [1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0]  # symmetric 7-tap window
SERIES_COLS = ["turn_rate", "tool_usage", "text_len"]
#: skewed-input scans split at 16 MB so a hot conversation's oversized
#: file fans out over many map tasks instead of riding one straggler —
#: the planner's first skew lever (plans/skew.py module docs)
SPLIT_BYTES = 16 * 1024 * 1024


def _stage_skewed(spark, turns_target: int, hot_share: float,
                  hot_convs: int, avg_turns: int) -> tuple:
    """Materialize the skewed transcripts as a bucketed table."""
    hot_turns = int(turns_target * hot_share / hot_convs)
    cold_turns = turns_target - hot_turns * hot_convs
    n_convs = hot_convs + max(cold_turns // avg_turns, 10)
    loc = (
        f"{BENCH_DIR}/transcripts_skew_b{bench.N_BUCKETS}"
        f"_{n_convs}_{avg_turns}_{hot_convs}x{hot_turns}"
    )
    name = f"bench_transcripts_skew_{hot_convs}x{hot_turns}_{n_convs}"
    if not os.path.exists(f"{loc}/_SUCCESS"):
        from tsaug_spark.datagen import generate_transcripts

        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(loc, ignore_errors=True)
        df = generate_transcripts(
            spark,
            n_convs=n_convs,
            avg_turns=avg_turns,
            hot_convs=hot_convs,
            hot_turns=hot_turns,
            seed=42,
        )
        (
            df.write.bucketBy(bench.N_BUCKETS, "conv_id")
            .sortBy("conv_id", "turn_idx")
            .option("path", loc)
            .mode("overwrite")
            .saveAsTable(name)
        )
    else:
        bench._register(
            spark, name, bench.TRANSCRIPT_DDL, loc, "conv_id, turn_idx"
        )
    return name, loc


def _skew_shape(spark, table: str, n_hot: int) -> dict:
    from tsaug_spark.plans.skew import plan_salts, skew_report

    raw = spark.table(table)
    rep = skew_report(raw, key="conv_id", top=max(10, n_hot)).collect()
    n_salts = plan_salts(raw)
    # hot = the staged head (top-n by construction), floor-checked
    # (>= 5x the tail of the top list) so a uniform corpus yields an
    # empty hot set rather than a fake one
    floor = 5 * rep[-1]["cnt"]
    hot = [r for r in rep[:n_hot] if r["cnt"] >= floor]
    return {
        "turns": raw.count(),
        "top10_cum_share": round(rep[-1]["cum_share"], 4),
        "hot_convs": len(hot),
        "hot_share": round(sum(r["share"] for r in hot), 4),
        "max_conv_rows": rep[0]["cnt"],
        "planned_salt_factor": n_salts,
        "hot_ids": [r["key"] for r in hot],
    }


def _tier_checksum(df) -> tuple:
    """Order-insensitive exact checksum of a tier frame."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("turn_rate").alias("tr"),
        F.sum("tool_usage").alias("tu"),
        F.sum("text_len").alias("tl"),
        F.sum(
            F.xxhash64("conv_id", "bucket_ts", "turn_rate",
                       "tool_usage", "text_len").cast("decimal(38,0)")
        ).alias("h"),
    ).collect()[0]
    return tuple(row)


SERIES_LOC = f"{BENCH_DIR}/skew_hot_series"  # suffixed per input table


def _stage_hot_series(spark, table: str, hot_ids: list) -> None:
    """One-time: the hot conversations' 1m series on a dense per-conv
    ordinal grid, written as the kernels' input table.  The
    per-conversation ``row_number`` is the inherently serial step (one
    task per conversation — the exact skew the chunked kernels then
    dissolve), so it runs once here, untimed, as the production tier
    store would carry the ordinal already."""
    from pyspark.sql import Window

    from tsaug_spark.plans.rollup import rollup_transcripts

    if os.path.exists(f"{SERIES_LOC}/_SUCCESS"):
        return
    tier = rollup_transcripts(
        spark.table(table).filter(F.col("conv_id").isin(hot_ids)), "1m"
    )
    w = Window.partitionBy("conv_id").orderBy("bucket_ts")
    series = tier.select(
        "conv_id",
        (F.row_number().over(w) - 1).cast("int").alias("bucket_idx"),
        *[F.col(c).cast("double").alias(c) for c in SERIES_COLS],
    )
    # 64-way layout: the kernels' map side (scan + shuffle write) must
    # not be bounded by a handful of fat files
    series.repartition(64).write.mode("overwrite").parquet(SERIES_LOC)


def _salted_tool_profile(raw, n_salts: int):
    """Per-conversation holistic profile via the salted two-phase plan:
    distinct tools + exact turn count — the hot conversation's rows
    spread over ``n_salts`` phase-1 tasks instead of one."""
    from tsaug_spark.plans.skew import salted_two_phase

    return salted_two_phase(
        raw.select("conv_id", "turn_idx", "tool"),
        ["conv_id"],
        partial_aggs=[
            F.collect_set("tool").alias("p_tools"),
            F.count(F.lit(1)).alias("p_n"),
        ],
        merge_aggs=[
            F.size(
                F.array_distinct(F.flatten(F.collect_list("p_tools")))
            ).alias("n_tools"),
            F.sum("p_n").alias("n_turns"),
        ],
        n_salts=n_salts,
    )


def _profile_checksum(df) -> tuple:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_tools").alias("st"),
        F.sum("n_turns").alias("sn"),
        F.sum(
            F.xxhash64("conv_id", "n_tools", "n_turns")
            .cast("decimal(38,0)")
        ).alias("h"),
    ).collect()[0]
    return tuple(row)


def _verify_exactness(spark, table: str, n_salts: int) -> dict:
    """One-time: salted == plain rollup; salted holistic == direct;
    chunked kernels == whole-series."""
    from tsaug_spark.plans.chunked import convolve_chunked, pool_chunked
    from tsaug_spark.plans.rollup import rollup_transcripts
    from tsaug_spark.plans.skew import rollup_salted

    raw = spark.table(table)
    plain = _tier_checksum(rollup_transcripts(raw, "1m"))
    salted = _tier_checksum(rollup_salted(raw, "1m", n_salts))
    assert plain == salted, (plain, salted)

    direct = raw.groupBy("conv_id").agg(
        F.count_distinct("tool").cast("int").alias("n_tools"),
        F.count(F.lit(1)).alias("n_turns"),
    )
    a = _profile_checksum(direct)
    b = _profile_checksum(_salted_tool_profile(raw, n_salts))
    assert a == b, (a, b)

    series = spark.read.parquet(SERIES_LOC).cache()
    t_max = series.agg(F.max("bucket_idx")).collect()[0][0] + 1
    taps = np.asarray(TAPS)
    checks = {"salted_rollup": "bit-identical",
              "salted_holistic": "exact-match"}
    for label, chunked_df, whole_df in (
        (
            "pool",
            pool_chunked(series, "ave", POOL_SIZE, SERIES_COLS,
                         CHUNK_LEN),
            pool_chunked(series, "ave", POOL_SIZE, SERIES_COLS, t_max),
        ),
        (
            "convolve",
            convolve_chunked(series, taps, SERIES_COLS, CHUNK_LEN),
            convolve_chunked(series, taps, SERIES_COLS, t_max),
        ),
    ):
        diff = chunked_df.exceptAll(whole_df).count()
        rdiff = whole_df.exceptAll(chunked_df).count()
        assert diff == 0 and rdiff == 0, (label, diff, rdiff)
        checks[label] = "bit-identical"
    series.unpersist()
    return checks


def _time_kernels(spark, chunk_len, only_conv: str | None = None) -> tuple:
    """Chunked pool + convolve over the staged hot series; returns
    (wall_s, rows).  ``only_conv`` scopes to one conversation — the
    per-series LATENCY view, where the whole-series path is exactly
    one task."""
    from tsaug_spark.plans.chunked import convolve_chunked, pool_chunked

    series = spark.read.parquet(SERIES_LOC)
    if only_conv is not None:
        series = series.filter(F.col("conv_id") == only_conv)
    t0 = time.time()
    rows = pool_chunked(
        series, "ave", POOL_SIZE, SERIES_COLS, chunk_len
    ).count()
    rows += convolve_chunked(
        series, np.asarray(TAPS), SERIES_COLS, chunk_len
    ).count()
    return time.time() - t0, rows


def _run_balanced_cascade(spark, loc: str) -> dict:
    """The planner's SKEW cascade: when ``plan_salts`` detects hot
    conversations, the bucket-aligned scan/write (whose one-task-per-
    bucket contract turns a hot conversation into a straggler on both
    the scan and the write side) is swapped for a size-split scan
    (16 MB splits fan the hot file over many map tasks), an
    AQE-balanced hash-shuffle aggregate (the (conv, bucket) keys are
    fine-grained, so reducers balance), and a plain time-ordered
    parquet tier write.  Trade-off: downstream re-aggregation and
    kernels shuffle — exact, and at 100 TB far cheaper than
    straggler-bound tiers."""
    from tsaug_spark.plans.rollup import reaggregate, rollup_transcripts

    raw = spark.read.parquet(loc)
    t0 = time.time()
    tier_rows = {}
    out = f"{BENCH_DIR}/skewbal"
    rollup_transcripts(raw, "1m").write.mode("overwrite").parquet(
        f"{out}_1m"
    )
    t1m = spark.read.parquet(f"{out}_1m")
    tier_rows["1m"] = t1m.count()
    reaggregate(t1m, "1m", "1h").write.mode("overwrite").parquet(
        f"{out}_1h"
    )
    t1h = spark.read.parquet(f"{out}_1h")
    tier_rows["1h"] = t1h.count()
    reaggregate(t1h, "1h", "1d").write.mode("overwrite").parquet(
        f"{out}_1d"
    )
    tier_rows["1d"] = spark.read.parquet(f"{out}_1d").count()
    wall = time.time() - t0
    turns = raw.count()
    points = sum(tier_rows.values()) * bench.CHANNELS
    return {
        "wall_s": wall,
        "turns": turns,
        "tier_rows": tier_rows,
        "points": points,
        "points_per_sec": points / wall,
        "turns_per_sec": turns / wall,
    }


def _run_skew_leg(spark, table: str, loc: str, n_salts: int) -> dict:
    """The timed skewed workload at one parallelism level: the
    planner's balanced cascade + chunked kernels + salted holistic
    aggregate."""
    raw = spark.table(table)
    cascade = _run_balanced_cascade(spark, loc)
    cascade_s = cascade["wall_s"]

    kernel_s, kernel_rows = _time_kernels(spark, CHUNK_LEN)

    t2 = time.time()
    n_profiles = _salted_tool_profile(raw, n_salts).count()
    salted_s = time.time() - t2

    wall = cascade_s + kernel_s + salted_s
    return {
        "wall_s": wall,
        "cascade_s": cascade_s,
        "kernel_s": kernel_s,
        "salted_s": salted_s,
        "turns": cascade["turns"],
        "tier_rows": cascade["tier_rows"],
        "points": cascade["points"],
        "points_per_sec": cascade["points_per_sec"],
        "turns_per_sec": cascade["turns_per_sec"],
        "kernel_rows": kernel_rows,
        "kernel_rows_per_sec": kernel_rows / kernel_s,
        "n_profiles": n_profiles,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=26_000_000)
    ap.add_argument("--hot-share", type=float, default=0.25)
    ap.add_argument("--hot-convs", type=int, default=6)
    ap.add_argument("--avg-turns", type=int, default=200)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default="BENCH/scaling_r5_skew.json")
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.levels.split(","))

    os.makedirs(BENCH_DIR, exist_ok=True)
    spark = bench._session(str(hi))
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(SPLIT_BYTES)
    )
    # key the staged hot-series by the input shape so a rerun at a
    # different --turns never reuses a stale series
    global SERIES_LOC
    SERIES_LOC = (
        f"{BENCH_DIR}/skew_hot_series_{args.turns}_{args.hot_convs}"
    )
    table, loc = _stage_skewed(
        spark, args.turns, args.hot_share, args.hot_convs, args.avg_turns
    )
    shape = _skew_shape(spark, table, args.hot_convs)
    print("skew shape:", json.dumps(shape), flush=True)
    n_salts = shape["planned_salt_factor"]
    hot_ids = shape.pop("hot_ids")

    _stage_hot_series(spark, table, hot_ids)
    exact = _verify_exactness(spark, table, n_salts)
    print("exactness:", json.dumps(exact), flush=True)

    # the skew-handling win, stated directly: the whole-series kernel
    # path is one task per hot conversation; the chunked path is
    # thousands of balanced tasks.  Timed at full parallelism.
    series = spark.read.parquet(SERIES_LOC)
    t_max = series.agg(F.max("bucket_idx")).collect()[0][0] + 1
    n_chunks = series.select(
        "conv_id",
        F.floor(
            F.col("bucket_idx") / (-(-CHUNK_LEN // POOL_SIZE) * POOL_SIZE)
        ).alias("c"),
    ).distinct().count()
    whole_s, _ = _time_kernels(spark, t_max)
    chunked_s, _ = _time_kernels(spark, CHUNK_LEN)
    # per-series latency: one pathological conversation — whole-series
    # = ONE task end-to-end, chunked = ~T/chunk_len balanced tasks.
    # This is the number a hot conversation actually stalls a
    # partition by.
    hot1 = hot_ids[0]
    hot1_rows = series.filter(F.col("conv_id") == hot1).count()
    whole1_s, _ = _time_kernels(spark, t_max, only_conv=hot1)
    chunk1_s, _ = _time_kernels(spark, CHUNK_LEN, only_conv=hot1)
    kernel_cmp = {
        "whole_series_tasks": len(hot_ids),
        "chunk_tasks": n_chunks,
        "whole_series_s": round(whole_s, 3),
        "chunked_s": round(chunked_s, 3),
        "chunked_speedup": round(whole_s / chunked_s, 2),
        "single_conv": {
            "conv_rows": hot1_rows,
            "whole_series_s": round(whole1_s, 3),
            "chunked_s": round(chunk1_s, 3),
            "chunked_speedup": round(whole1_s / chunk1_s, 2),
        },
    }
    print("kernel cmp:", json.dumps(kernel_cmp), flush=True)
    spark.stop()

    def measure(level: int) -> dict:
        s = bench._session(str(level))
        s.conf.set(
            "spark.sql.files.maxPartitionBytes", str(SPLIT_BYTES)
        )
        # fresh in-memory catalog per session: re-register the input
        bench._register(
            s, table, bench.TRANSCRIPT_DDL, loc, "conv_id, turn_idx"
        )
        m = _run_skew_leg(s, table, loc, n_salts)  # warm-up
        m = _run_skew_leg(s, table, loc, n_salts)
        s.stop()
        return m

    per_round, details = [], {lo: [], hi: []}
    comp_rounds = {"cascade_s": [], "kernel_s": [], "salted_s": []}
    for _ in range(args.rounds):
        m_lo = measure(lo)
        m_hi = measure(hi)
        details[lo].append(m_lo)
        details[hi].append(m_hi)
        per_round.append(m_lo["wall_s"] / m_hi["wall_s"])
        for c in comp_rounds:
            comp_rounds[c].append(m_lo[c] / m_hi[c])
        print(f"round: lo={m_lo['wall_s']:.1f}s hi={m_hi['wall_s']:.1f}s "
              f"speedup={per_round[-1]:.3f}", flush=True)
    per_round.sort()
    speedup = per_round[len(per_round) // 2]

    def med(xs):
        return sorted(xs)[len(xs) // 2]

    ratio = hi / lo
    components = {
        c: {
            "per_round_speedups": [round(x, 3) for x in comp_rounds[c]],
            "speedup": round(med(comp_rounds[c]), 3),
            "efficiency": round(med(comp_rounds[c]) / ratio, 3),
        }
        for c in comp_rounds
    }
    control = bench._cpu_control((lo, hi))

    def summarize(ms):
        best = min(ms, key=lambda m: m["wall_s"])
        return {
            "wall_s": round(best["wall_s"], 3),
            "cascade_s": round(best["cascade_s"], 3),
            "kernel_s": round(best["kernel_s"], 3),
            "salted_s": round(best["salted_s"], 3),
            "points_per_sec": round(best["points_per_sec"]),
            "kernel_rows_per_sec": round(best["kernel_rows_per_sec"]),
            "walls_s": [round(m["wall_s"], 3) for m in ms],
        }

    result = {
        "protocol": (
            f"interleaved local[{lo}] vs local[{hi}], {args.rounds} "
            "rounds, per-round speedup ratio, median; skewed input; "
            "timed leg = planner's balanced skew cascade (16MB "
            "splits, AQE shuffle agg, plain tier write) + chunked "
            "hot-series kernels + salted holistic aggregate"
        ),
        "skew_shape": shape,
        "exactness": exact,
        "salt_factor": n_salts,
        "kernel_whole_vs_chunked": kernel_cmp,
        f"local{lo}": summarize(details[lo]),
        f"local{hi}": summarize(details[hi]),
        "tier_rows": details[hi][0]["tier_rows"],
        "per_round_speedups": [round(x, 3) for x in per_round],
        "speedup": round(speedup, 3),
        "efficiency": round(speedup / (hi / lo), 3),
        # north-rule headline: rolled-up points/sec scaling — the
        # CASCADE component (same definition as the uniform-input
        # protocol in bench.py BENCH_SCALING mode).  The kernel
        # component under-reads in local-mode proxying: its pandas
        # workers are EXTRA processes outside the local[N] thread cap,
        # so the lo level borrows cores the JVM doesn't have and the
        # ratio compresses — called out rather than hidden.
        "components": components,
        "cpu_control": control,
        "efficiency_vs_attainable": round(
            speedup / control["attainable_speedup"], 3
        ),
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
