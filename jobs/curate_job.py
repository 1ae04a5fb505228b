"""spark-submit entry point for the corpus-curation pipeline.

Cluster usage (the production path)::

    python tools/make_pyfiles.py          # builds dist/tsaug_spark.zip
    spark-submit --py-files dist/tsaug_spark.zip \
        --master <cluster> jobs/curate_job.py \
        --input  <documents parquet path> \
        --output <curated shards root> \
        --budget 500000 --split train=0.98,val=0.01,test=0.01 \
        --mix "src0=1.0,src1=0.5" --default-rate 0.1

One declarative chain, executed once: exact-dedup survivorship ->
language + quality + repetition gates -> deterministic hash split ->
per-source mixture rates -> token-budget shard assignment -> parquet
partitioned by (split, source), with the shard manifest written
alongside.  Every stage is the library operator the oracles check
(pipeline/curation.py, sampling.py, shards.py); the CLI only wires
them.  All membership decisions are md5-hash keyed, so re-running on a
grown corpus reproduces the prior rows' assignments exactly.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_rates(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    if not spec:
        return out
    for part in spec.split(","):
        k, _, v = part.partition("=")
        if not _:
            raise SystemExit(f"bad rate spec {part!r}: want name=frac")
        out[k.strip()] = float(v)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--budget", type=int, default=500_000,
                    help="tokens per training shard")
    ap.add_argument("--split", default="train=0.98,val=0.01,test=0.01")
    ap.add_argument("--mix", default="",
                    help="per-source keep rates, e.g. src0=1.0,src1=0.5")
    ap.add_argument("--default-rate", type=float, default=1.0,
                    help="keep rate for sources not named in --mix")
    ap.add_argument("--salt", default="",
                    help="namespaces the split/mix hash draws")
    ap.add_argument("--min-words", type=int, default=25)
    ap.add_argument("--max-top-word-share", type=float, default=0.2,
                    help="repetition gate: drop docs whose most "
                    "frequent word exceeds this share")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tsaug_spark.pipeline.curation import curate
    from tsaug_spark.pipeline.sampling import hash_split, mixture_sample
    from tsaug_spark.pipeline.shards import pack_shards
    from tsaug_spark.pipeline.text import repetition_metrics
    from tsaug_spark.session import get_spark

    spark = get_spark("tsaug-curate-job")
    docs = spark.read.parquet(args.input)

    kept = curate(docs, min_words=args.min_words)

    # repetition gate as an integer-arithmetic anti-join: flag ratio r
    # becomes top*denom >= total*num with r = num/denom at 3 digits
    num = int(round(args.max_top_word_share * 1000))
    rep = repetition_metrics(docs).where(
        F.col("top_word_cnt") * 1000 >= F.col("n_words") * num
    )
    kept = kept.join(rep.select("doc_id"), "doc_id", "left_anti")

    if args.mix or args.default_rate < 1.0:
        kept = mixture_sample(
            kept, "doc_id", "source", parse_rates(args.mix),
            salt=args.salt, default_fraction=args.default_rate,
        )
    kept = hash_split(
        kept, "doc_id", weights=parse_rates(args.split) or None,
        salt=args.salt,
    )
    # shards must never span splits: stratify by (split, source)
    packed = pack_shards(
        kept, args.budget, strata_col=["split", "source"],
        token_col="n_words",
    )

    out = Path(args.output)
    (
        packed.write.mode("overwrite")
        .partitionBy("split", "source")
        .parquet(str(out / "shards"))
    )
    shards = spark.read.parquet(str(out / "shards"))
    manifest = shards.groupBy("split", "source", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
    )
    manifest.write.mode("overwrite").parquet(str(out / "manifest"))

    n_in = docs.count()
    n_out = shards.count()
    tok = (
        manifest.agg(F.sum("shard_tokens")).first()[0] or 0
    )
    print(
        f"curated {n_in} -> {n_out} docs, {tok} tokens, "
        f"{manifest.count()} shards -> {out}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
