"""Text analysis operators: quality metrics, token counts, language id,
document fingerprints.  All Catalyst-native (no Python UDFs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: ordered (code, marker) rules — first hit wins, fallback 'en'
LANG_RULES = [
    ("zh", "的"),
    ("es", " el "),
    ("de", " der "),
    ("fr", " le "),
]


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features: token count, punctuation density,
    average word length — the usual cheap quality-filter signals."""
    n_words = F.size(F.split(F.col(text_col), " "))
    n_punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit("[.,!?;]"), 0)
    )
    charlen = F.length(text_col)
    return df.select(
        "doc_id",
        n_words.alias("n_words"),
        charlen.alias("n_chars_live"),
        F.round(n_punct / charlen.cast("double"), 5).alias("punct_ratio"),
        F.round(charlen / n_words.cast("double"), 4).alias(
            "chars_per_word"
        ),
    )


def token_counts(
    df: DataFrame, group_cols=("source", "lang"), text_col: str = "text"
) -> DataFrame:
    """Whitespace-token totals per group (corpus sizing)."""
    toks = F.size(F.split(F.col(text_col), " "))
    return df.groupBy(*group_cols).agg(
        F.sum(toks).alias("tokens"),
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_chars").alias("chars"),
    )


#: GPT-2-flavoured pre-tokenizer pattern, restricted to the Java-regex /
#: RE2 common subset (no lookarounds): a token is an optionally
#: space-prefixed letter run, digit run, or punctuation run
BPE_TOKEN_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def token_counts_bpe(
    df: DataFrame, group_cols=("source", "lang"), text_col: str = "text"
) -> DataFrame:
    """BPE-ish regex token totals per group — the subword-style sizing
    companion to the whitespace ``token_counts`` (regexp_extract_all is
    Catalyst-native; the same pattern runs verbatim in the oracle)."""
    toks = F.size(
        F.regexp_extract_all(
            F.col(text_col), F.lit(BPE_TOKEN_PATTERN), 0
        )
    )
    return df.groupBy(*group_cols).agg(
        F.sum(toks).cast("long").alias("bpe_tokens"),
        F.count(F.lit(1)).alias("docs"),
    )


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc repetition signals: most-frequent-word count and total
    word count (the Gopher-style 'top n-gram share' filter at n=1).

    explode -> (doc, word) partial-aggregated counts -> per-doc
    max/sum: the word fan-out collapses map-side before either
    shuffle, and both shuffles are keyed by the doc id.  Counts stay
    integers; callers compare ``top_word_cnt * k >= n_words`` instead
    of materializing a float ratio, so the gate is exact and
    engine-independent.
    """
    words = df.select(
        id_col,
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    freq = words.groupBy(id_col, "word").agg(
        F.count(F.lit(1)).alias("c")
    )
    return freq.groupBy(id_col).agg(
        F.max("c").alias("top_word_cnt"),
        F.sum("c").alias("n_words"),
    )


def lang_pred(text_col: str = "text"):
    """The marker-word language-prediction column (CASE chain), shared
    by lang_id and the curation pipeline."""
    pred = None
    for code, marker in LANG_RULES:
        cond = F.instr(F.col(text_col), marker) > 0
        pred = F.when(cond, code) if pred is None else pred.when(cond, code)
    return pred.otherwise("en")


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic; returns the confusion table
    against the ``lang`` ground-truth column."""
    pred = lang_pred(text_col)
    return (
        df.select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


#: conservative English stopword set for ratio features (kept tiny and
#: fixed so the oracle can embed the same list)
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "was", "at", "by", "that", "this",
)

#: scrub patterns applied in order (Java regex == RE2-safe subset so
#: DuckDB's regexp_replace agrees): emails first so their host part
#: is not half-eaten by the URL rule
SCRUB_RULES = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def scrub_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Mask emails/URLs/phone numbers — the standard pre-training scrub
    pass, pure Catalyst ``regexp_replace`` (single projection, no UDF,
    no shuffle)."""
    out = F.col(text_col)
    for pat, repl in SCRUB_RULES:
        out = F.regexp_replace(out, pat, repl)
    return df.select(
        F.col(id_col),
        out.alias("scrubbed"),
        (out != F.col(text_col)).alias("was_scrubbed"),
    )


def stopword_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fraction of whitespace tokens that are stopwords (lowercased) —
    a cheap fluency/quality signal; near-zero flags keyword soup."""
    words = F.split(F.lower(F.col(text_col)), " ")
    stops = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(
        F.filter(words, lambda w: F.array_contains(stops, w))
    )
    return df.select(
        F.col(id_col),
        F.round(
            n_stop / F.size(words).cast("double"), 5
        ).alias("stopword_ratio"),
    )


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Order-sensitive polynomial rolling hash over the word sequence.

    ``fp = fold(words, h -> h * 31 + hash(word) mod 2^31-1)`` — a
    sequential fold (deterministic), cheap re-fingerprinting primitive
    for incremental dedup.  The modulus keeps ``acc * 31 + h`` under
    2^36, safely inside int64 for ANSI-mode arithmetic.
    """
    MOD = (1 << 31) - 1
    words = F.split(F.col(text_col), " ")
    word_h = lambda w: F.pmod(
        F.conv(F.substring(F.md5(w), 1, 14), 16, 10).cast("long"), F.lit(MOD)
    )
    fp = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: F.pmod(acc * 31 + word_h(w), F.lit(MOD)),
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))


def unigram_surprisal(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unigram language-model quality score per document — the cheap
    perplexity proxy behind CCNet/Gopher-style LM quality filtering:
    documents whose tokens are improbable under the corpus's own
    unigram distribution (gibberish, boilerplate soup, wrong-language
    text) score high-surprisal and can be gated.

    Two passes, all Catalyst: (1) corpus unigram counts — one
    vocabulary-bounded hash aggregate over exploded lowercase letter
    runs (map-side combine ships the vocab, not the tokens); (2) each
    token's SURPRISAL in integer centibits::

        cb(tok) = floor(100 * (log2(total) - log2(count(tok))))

    joined back (the frequency table is vocab-sized → broadcast; at
    web scale with a >10M-type vocab switch to a shuffle join, salting
    the stopword head), then one per-doc aggregate.  MLE needs no
    smoothing: every scored token exists in the corpus by
    construction.

    Determinism: quantizing PER VOCABULARY TYPE (not per doc) makes
    the per-doc sum an exact-integer aggregate — a 1-ulp ``log2``
    disagreement between engines could only flip a floor at ~1e-13
    distance from an integer, a per-type (not per-token) event with
    vocab-scale probability ~1e-9 — so ``sum_cb`` is exact and
    ``avg_cb`` is one division of exact integers.

    Output: doc_id, n_tokens, sum_cb, avg_cb (centibits/token; 100 cb
    = 1 bit).  Token-less documents are not emitted.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit("[a-z]+"), 0
            )
        ).alias("tok"),
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("total"))
    cb = F.floor(
        F.lit(100.0)
        * (
            F.log2(F.col("total").cast("double"))
            - F.log2(F.col("c").cast("double"))
        )
    ).alias("cb")
    cb_table = freq.crossJoin(F.broadcast(total)).select("tok", cb)
    return (
        toks.join(F.broadcast(cb_table), "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("cb").alias("sum_cb"),
            (
                F.sum("cb").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_cb"),
        )
    )


def type_token_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Type-token ratio per document — the lexical-diversity quality
    gate (Gopher-style): boilerplate and keyword-stuffed pages repeat
    a tiny vocabulary, so a low distinct-token share flags them.

    One narrow projection, everything exact: token and distinct-token
    counts are integers from the same lowercase-letter-run
    tokenization the other text gates use; the ratio is one division.
    Token-less documents are not emitted.

    Output: doc_id, n_tokens, n_types, ttr.
    """
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z]+"), 0
    )
    base = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_types"),
    ).filter(F.col("n_tokens") > 0)
    return base.select(
        id_col,
        "n_tokens",
        "n_types",
        (
            F.col("n_types").cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("ttr"),
    )


def tfidf_topk(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k keywords per document by TF-IDF — the classic keyword /
    salient-term extractor for corpus triage and index cards.

    Scoring is ALL integer arithmetic: idf is quantized per vocabulary
    TYPE to centibits (``floor(100 * (log2(N+1) - log2(df+1)))`` —
    smoothed so corpus-universal tokens score 0, never negative), and
    the document score is the exact product ``tf * idf_cb``.  Ranking
    ties break on the token string, so the top-k set is
    bit-reproducible across engines (the same centibit idiom as
    :func:`unigram_surprisal`: a 1-ulp log2 disagreement would have to
    land within ~1e-13 of an integer for a PER-TYPE floor flip).

    Scale: one (doc, token) hash aggregate, one vocab-sized document-
    frequency aggregate joined back broadcast (shuffle-join + salt the
    stopword head past ~10M types), one per-doc top-k window.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit("[a-z]+"), 0
            )
        ).alias("tok"),
    )
    tf = toks.groupBy(id_col, "tok").agg(
        F.count(F.lit(1)).alias("tf")
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    docfreq = tf.groupBy("tok").agg(
        F.count(F.lit(1)).alias("df")
    )
    idf = docfreq.crossJoin(F.broadcast(n_docs)).select(
        "tok",
        F.floor(
            F.lit(100.0)
            * (
                F.log2(F.col("n_docs").cast("double") + F.lit(1.0))
                - F.log2(F.col("df").cast("double") + F.lit(1.0))
            )
        )
        .cast("long")
        .alias("idf_cb"),
    )
    scored = tf.join(F.broadcast(idf), "tok").select(
        id_col,
        "tok",
        "tf",
        "idf_cb",
        (F.col("tf") * F.col("idf_cb")).alias("score_cb"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_cb").desc(), F.col("tok").asc()
    )
    return (
        scored.select(
            id_col,
            "tok",
            "tf",
            "idf_cb",
            "score_cb",
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= k)
    )


def zipf_slope(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Zipf power-law fit per corpus slice: the OLS slope of
    log2(frequency) against log2(rank) over the token frequency
    table.  Natural corpora sit near slope -1; generated/boilerplate
    slices drift — a one-number corpus-health screen.

    Both logs are quantized per TYPE to exact centibit integers
    (``floor(100 * log2(.))``) so the OLS sufficient statistics are
    exact BIGINT sums and the slope / R^2 are shared final-division
    expressions — same determinism contract as ``tfidf_topk``.
    Ranks order by (frequency DESC, token ASC), dense ties broken
    lexicographically.

    Scale: one (slice, token) hash aggregate (vocabulary-bounded), a
    per-slice rank window over the vocabulary, one slice aggregate.
    """
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit("[a-z]+"), 0
            )
        ).alias("tok"),
    )
    freq = toks.groupBy("grp", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("c").desc(), F.col("tok").asc()
    )
    ranked = freq.select(
        "grp",
        F.row_number().over(w).alias("rank"),
        "c",
    ).select(
        "grp",
        F.floor(F.lit(100.0) * F.log2(F.col("rank").cast("double")))
        .cast("long")
        .alias("x"),
        F.floor(F.lit(100.0) * F.log2(F.col("c").cast("double")))
        .cast("long")
        .alias("y"),
    )
    agg = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).filter(F.col("n") >= 2)
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dxx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dyy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.filter(dxx > 0).select(
        F.col("grp").alias(group_col),
        F.col("n").alias("n_types"),
        (num.cast("double") / dxx.cast("double")).alias("zipf_slope"),
        F.when(
            dyy > 0,
            (num.cast("double") * num.cast("double"))
            / (dxx.cast("double") * dyy.cast("double")),
        ).alias("r2"),
    )


def heaps_law(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Heaps'-law vocabulary-growth fit per corpus slice: the OLS
    slope of log2(distinct types seen) against log2(tokens seen),
    accumulated doc-by-doc in ``id_col`` order.  Natural text grows
    vocabulary as V = K * n^beta with beta ~ 0.4-0.6; templated or
    looping corpora flatten (beta -> 0) while random-ish noise keeps
    minting types (beta -> 1) — the growth-curve complement to the
    frequency-table screen in :func:`zipf_slope`.

    Each token type is charged to the FIRST doc that introduces it
    (min doc id per (slice, token) — one vocabulary-bounded hash
    aggregate), so the per-doc new-type counts and token counts are
    exact BIGINTs; the cumulative curve is two integer window sums
    over doc order; both logs are quantized per DOC to exact centibit
    integers so the OLS sufficient statistics are exact BIGINT sums
    and slope / R^2 are shared final-division expressions (the
    ``zipf_slope`` determinism contract).

    Scale: tokenize once (narrow), one (slice, token) aggregate
    bounded by vocabulary, one (slice, doc) aggregate, then windows
    over docs-per-slice rows.  The per-slice cumulative window is
    docs-bounded, not token-bounded; at extreme corpus sizes the
    curve would be sampled at log-spaced doc ranks before the fit.
    """
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit("[a-z]+"), 0
            )
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    new_types = (
        toks.groupBy("grp", "tok")
        .agg(F.min("doc").alias("doc"))
        .groupBy("grp", "doc")
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    doc_tokens = toks.groupBy("grp", "doc").agg(
        F.count(F.lit(1)).alias("n_toks")
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("doc")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = doc_tokens.join(new_types, ["grp", "doc"], "left").select(
        "grp",
        "doc",
        F.sum("n_toks").over(w).alias("cum_toks"),
        F.sum(F.coalesce(F.col("new_types"), F.lit(0)))
        .over(w)
        .alias("cum_types"),
    )
    pts = cum.filter(
        (F.col("cum_toks") >= 1) & (F.col("cum_types") >= 1)
    ).select(
        "grp",
        F.floor(F.lit(100.0) * F.log2(F.col("cum_toks").cast("double")))
        .cast("long")
        .alias("x"),
        F.floor(
            F.lit(100.0) * F.log2(F.col("cum_types").cast("double"))
        )
        .cast("long")
        .alias("y"),
    )
    agg = pts.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).filter(F.col("n") >= 2)
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dxx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dyy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.filter(dxx > 0).select(
        F.col("grp").alias(group_col),
        F.col("n").alias("n_docs"),
        (num.cast("double") / dxx.cast("double")).alias("heaps_beta"),
        F.when(
            dyy > 0,
            (num.cast("double") * num.cast("double"))
            / (dxx.cast("double") * dyy.cast("double")),
        ).alias("r2"),
    )


def rake_keywords(
    df: DataFrame,
    top_k: int = 15,
    max_words: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) over the corpus:
    candidate phrases are maximal stopword-free word runs, each word
    scores degree/frequency over all candidates (degree = summed
    length of the phrases it appears in), and a phrase scores the sum
    of its word scores — the classic unsupervised keyphrase baseline
    that, unlike TF-IDF, surfaces multi-word terms.  Runs longer than
    ``max_words`` are discarded (the standard candidate cap — unbounded
    stopword-free runs are boilerplate, not keyphrases).

    Determinism: word degree/frequency are exact BIGINTs, each word
    score is one shared division, and the per-phrase sum folds in word
    order (sorted fold) — identical accumulation in both engines.
    Ranking is (score DESC, phrase ASC).

    Scale: tokenize once (posexplode, narrow), phrase islands from one
    per-doc window, then every aggregate is keyed on the bounded word
    / phrase vocabulary — document volume only touches the first two
    passes.
    """
    words = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), r"[^a-z]+")
        ).alias("pos", "w"),
    )
    stops = F.array(*[F.lit(w) for w in STOPWORDS])
    flagged = words.withColumn(
        "is_stop",
        (F.col("w") == "") | F.array_contains(stops, F.col("w")),
    )
    wnd = Window.partitionBy("doc").orderBy("pos")
    runs = flagged.select(
        "doc",
        "pos",
        "w",
        "is_stop",
        F.sum(F.when(F.col("is_stop"), 1).otherwise(0))
        .over(wnd.rowsBetween(Window.unboundedPreceding, 0))
        .alias("phrase_id"),
    ).filter(~F.col("is_stop"))
    ph = runs.groupBy("doc", "phrase_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s["w"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    ).filter(F.col("plen") <= max_words)  # standard RAKE candidate cap
    occ = runs.join(ph, ["doc", "phrase_id"]).select("w", "plen")
    ws = occ.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("deg"),
    ).select(
        "w",
        (F.col("deg").cast("double") / F.col("freq").cast("double"))
        .alias("wscore"),
    )
    scored = (
        runs.join(ph, ["doc", "phrase_id"])
        .join(ws, "w")
        .groupBy("phrase")
        .agg(
            (
                F.count(F.lit(1)) / F.max("plen")
            ).cast("long").alias("occurrences"),
            F.max("plen").alias("n_words"),
            (
                F.aggregate(
                    F.array_sort(
                        F.collect_list(F.struct("doc", "phrase_id",
                                                "pos", "wscore"))
                    ),
                    F.lit(0.0),
                    lambda a, s: a + s["wscore"],
                )
                / (F.count(F.lit(1)) / F.max("plen")).cast("double")
            ).alias("score"),
        )
    )
    wt = Window.orderBy(F.col("score").desc(), F.col("phrase").asc())
    return scored.select(
        "phrase",
        "n_words",
        "occurrences",
        "score",
        F.row_number().over(wt).alias("rank"),
    ).filter(F.col("rank") <= top_k)


def textrank_keywords(
    df: DataFrame,
    top_k: int = 30,
    n_iters: int = 10,
    min_len: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): corpus-
    level keywords are the highest-PageRank nodes of the word
    co-occurrence graph — an edge links words ADJACENT in the
    stopword-filtered token sequence of any document (window 2, the
    paper's default).  Complements RAKE (frequency/degree heuristics,
    multi-word phrases) with the graph-centrality view: a word ranks
    high for being a hub of many distinct contexts, not for raw count.

    Built on the INTEGER PageRank (plans/graph.py::pagerank), so every
    rank is an exact int64 in 1e-12 units and the (pr DESC, word ASC)
    ordering is fully deterministic — no floating tie hazards.

    Scale: tokenize + one lag window per doc (narrow, document-
    volume-sized), then everything downstream is keyed on the bounded
    word vocabulary — the same vocabulary-bounded iteration contract
    as markov_stationary.  The final top-k window is over the vocab,
    not the corpus.
    """
    from tsaug_spark.plans.graph import pagerank

    words = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), r"[^a-z]+")
        ).alias("pos", "w"),
    )
    kept = words.filter(
        (F.col("w") != "")
        & (F.length("w") >= min_len)
        & (~F.col("w").isin(*STOPWORDS))
    )
    w_seq = Window.partitionBy("doc").orderBy("pos")
    adj = kept.withColumn("pw", F.lag("w").over(w_seq)).filter(
        F.col("pw").isNotNull() & (F.col("pw") != F.col("w"))
    )
    edges = adj.select(
        F.least("pw", "w").alias("u"),
        F.greatest("pw", "w").alias("v"),
    ).distinct()
    pr = pagerank(edges, n_iters=n_iters)
    rw = Window.orderBy(F.col("pr_micro").desc(), F.col("word").asc())
    return (
        pr.select(F.col("node").alias("word"), "degree", "pr_micro")
        .withColumn("rank", F.row_number().over(rw).cast("int"))
        .filter(F.col("rank") <= top_k)
    )


def bigram_nll(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Add-one-smoothed bigram language-model score per document —
    the next step up from :func:`unigram_surprisal` in the
    CCNet/KenLM-style quality-filter ladder: word salad with plausible
    unigrams but impossible transitions (shuffled text, boilerplate
    stitching) scores high here and is invisible there.

    Per bigram TYPE the smoothed surprisal in integer centibits is

        cb(x, y) = floor(100 * (log2(c_x + V) - log2(c_xy + 1)))

    with c_xy the corpus bigram count, c_x = Sum_y c_xy its context
    total, V the corpus vocabulary size.  Quantizing per TYPE (the
    unigram_surprisal idiom) makes each document's score an exact
    integer sum of (doc bigram count x cb) — a last-ULP log2
    disagreement is a vocab^2-scale, not token-scale, event.

    Bigrams are adjacent space-split words, formed by zipping the
    word array against its own tail (NULL-padded, so the pairing is
    structural and identical in any engine — no window, no
    re-pairing around empty tokens, which are filtered as pairs).

    Scale: the corpus bigram table is vocabulary^2-bounded and built
    by one hash aggregate with map-side combine; the doc-grain join
    ships doc bigram COUNTS (not tokens).  Output: doc_id, n_bigrams,
    sum_cb, avg_cb; documents with no bigram are not emitted.
    """
    ws = F.split(F.col(text_col), " ")
    zipped = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.arrays_zip(
                ws.alias("x"),
                F.slice(ws, 2, F.size(ws)).alias("y"),
            )
        ).alias("p"),
    )
    bg = zipped.select(
        "doc_id", F.col("p.x").alias("x"), F.col("p.y").alias("y")
    ).filter(
        F.col("y").isNotNull() & (F.col("x") != "") & (F.col("y") != "")
    )
    c = bg.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c_xy"))
    cx = c.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    vv = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .agg(F.count_distinct("w").alias("v"))
    )
    cb = (
        c.join(cx, "x")
        .crossJoin(F.broadcast(vv))
        .select(
            "x",
            "y",
            F.floor(
                F.lit(100)
                * (
                    F.log2(F.col("c_x") + F.col("v"))
                    - F.log2(F.col("c_xy") + F.lit(1))
                )
            )
            .cast("long")
            .alias("cb"),
        )
    )
    d = bg.groupBy("doc_id", "x", "y").agg(
        F.count(F.lit(1)).alias("d_xy")
    )
    return (
        d.join(cb, ["x", "y"])
        .groupBy("doc_id")
        .agg(
            F.sum("d_xy").cast("long").alias("n_bigrams"),
            F.sum(F.col("d_xy") * F.col("cb"))
            .cast("long")
            .alias("sum_cb"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_cb",
            (
                F.col("sum_cb").cast("double")
                / F.col("n_bigrams").cast("double")
            ).alias("avg_cb"),
        )
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Top collocations by pointwise mutual information (Church &
    Hanks 1990) — the "which word pairs are a UNIT" extractor behind
    phrase detection and tokenizer-merge candidates:

        PMI(x, y) = log2( c_xy * T / (c_x * c_y) )

    with c_xy the corpus bigram count, c_x / c_y unigram occurrence
    counts as bigram left/right totals, T the total bigram count.

    Determinism: the log2 argument is an exact integer RATIO and the
    score is quantized per TYPE to integer centibits (the
    :func:`unigram_surprisal` idiom); ordering and the top-k cut use
    (pmi_cb DESC, x, y) — fully tie-broken, so ranks are identical in
    both engines.  The ``min_count`` floor kills the
    singleton-pair PMI explosion (a pair seen once between two rare
    words maxes the score), the standard practice.

    Scale: same vocabulary^2-bounded bigram aggregate as
    :func:`bigram_nll`; ranking is one window over the filtered
    candidate set.
    """
    ws = F.split(F.col(text_col), " ")
    zipped = df.select(
        F.explode(
            F.arrays_zip(
                ws.alias("x"),
                F.slice(ws, 2, F.size(ws)).alias("y"),
            )
        ).alias("p")
    )
    bg = zipped.select(
        F.col("p.x").alias("x"), F.col("p.y").alias("y")
    ).filter(
        F.col("y").isNotNull() & (F.col("x") != "") & (F.col("y") != "")
    )
    c = bg.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c_xy"))
    cx = c.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    cy = c.groupBy("y").agg(F.sum("c_xy").alias("c_y"))
    tt = c.agg(F.sum("c_xy").alias("t"))
    scored = (
        c.filter(F.col("c_xy") >= int(min_count))
        .join(cx, "x")
        .join(cy, "y")
        .crossJoin(F.broadcast(tt))
        .select(
            "x",
            "y",
            "c_xy",
            "c_x",
            "c_y",
            F.floor(
                F.lit(100)
                * (
                    F.log2(F.col("c_xy") * F.col("t"))
                    - F.log2(F.col("c_x") * F.col("c_y"))
                )
            )
            .cast("long")
            .alias("pmi_cb"),
        )
    )
    w = Window.orderBy(
        F.col("pmi_cb").desc(), F.col("x").asc(), F.col("y").asc()
    )
    return (
        scored.select(
            "x",
            "y",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.col("c_x").cast("long").alias("c_x"),
            F.col("c_y").cast("long").alias("c_y"),
            "pmi_cb",
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= int(top_k))
    )


def flesch_kincaid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch reading-ease and Flesch–Kincaid grade level per doc
    (Kincaid et al. 1975) — the classic readability pair every
    text-quality pipeline reports next to the raw length/punctuation
    features of :func:`quality_metrics`.

        grade = 0.39*(W/S) + 11.8*(Syll/W) - 15.59
        ease  = 206.835 - 1.015*(W/S) - 84.6*(Syll/W)

    W = alphabetic word runs, S = sentence-terminator runs (min 1),
    Syll = vowel-cluster count (the standard dictionary-free syllable
    proxy).  All three are exact integers from Catalyst-native
    regexp_extract_all; the two scores are single shared float
    expressions — no UDFs, and the identical regexes run in the
    DuckDB oracle.

    Scale: embarrassingly parallel per-document map — no shuffle.

    Output: doc_id, n_words, n_sentences, n_syllables, fk_grade,
    fk_ease.
    """
    t = F.col(text_col)
    words = F.size(F.regexp_extract_all(t, F.lit("[A-Za-z]+"), 0))
    sents = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all(t, F.lit("[.!?]+"), 0))
    )
    syll = F.size(
        F.regexp_extract_all(t, F.lit("[aeiouyAEIOUY]+"), 0)
    )
    out = df.select(
        "doc_id",
        words.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sentences"),
        syll.cast("long").alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    ws = F.col("n_words").cast("double") / F.col("n_sentences").cast(
        "double"
    )
    sw = F.col("n_syllables").cast("double") / F.col("n_words").cast(
        "double"
    )
    return out.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (
            F.lit(0.39) * ws + F.lit(11.8) * sw - F.lit(15.59)
        ).alias("fk_grade"),
        (
            F.lit(206.835) - F.lit(1.015) * ws - F.lit(84.6) * sw
        ).alias("fk_ease"),
    )


#: the stopword octet of the Gopher quality rules (Rae et al. 2021,
#: "Scaling Language Models: ... Gopher", appendix A1.1)
GOPHER_STOPWORDS = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher document-quality rule set per doc (Rae et al. 2021,
    A1.1) — the published heuristic filter battery large-scale LLM
    corpora are screened with; reported per rule so the pass/fail
    mix is auditable, plus the combined verdict.

    Rules (all Catalyst-native integer counts, each ratio ONE shared
    float division):
      * word count in [min_words, max_words]
      * mean alphabetic word length in [3, 10]
      * symbol-to-word ratio (# or ellipsis) <= 0.1
      * lines starting with a bullet <= 90%
      * lines ending in an ellipsis <= 30%
      * >= 80% of whitespace tokens contain a letter
      * >= 2 distinct stopwords from the Gopher octet

    Scale: embarrassingly parallel per-document map — no shuffle.

    Output: doc_id, n_words, mean_word_len, symbol_ratio,
    bullet_frac, ellipsis_frac, alpha_word_frac, stop_hits, passes.
    """
    t = F.col(text_col)
    # whitespace-run tokenization (non-space runs): repeated spaces
    # contribute no empty tokens and newlines/tabs separate words,
    # matching the Gopher paper's any-whitespace word definition
    toks = F.regexp_extract_all(t, F.lit("\\S+"), 0)
    w = F.size(toks)
    alpha_words = F.size(F.regexp_extract_all(t, F.lit("[A-Za-z]+"), 0))
    alpha_chars = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    symbols = F.size(
        F.regexp_extract_all(t, F.lit("#|\\.\\.\\.|…"), 0)
    )
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    bullets = F.size(
        F.filter(
            lines,
            lambda l: l.startswith("-")
            | l.startswith("*")
            | l.startswith("•"),
        )
    )
    ell_end = F.size(
        F.filter(
            lines,
            lambda l: l.endswith("...") | l.endswith("…"),
        )
    )
    alpha_toks = F.size(
        F.filter(toks, lambda x: x.rlike("[A-Za-z]"))
    )
    padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    stop_hits = None
    for sw_ in GOPHER_STOPWORDS:
        hit = F.when(
            padded.contains(f" {sw_} "), F.lit(1)
        ).otherwise(F.lit(0))
        stop_hits = hit if stop_hits is None else stop_hits + hit
    base = df.select(
        "doc_id",
        w.cast("long").alias("n_words"),
        alpha_words.cast("long").alias("aw"),
        alpha_chars.cast("long").alias("ac"),
        symbols.cast("long").alias("sym"),
        n_lines.cast("long").alias("nl"),
        bullets.cast("long").alias("bl"),
        ell_end.cast("long").alias("el"),
        alpha_toks.cast("long").alias("at"),
        stop_hits.cast("long").alias("stop_hits"),
    ).filter((F.col("n_words") > 0) & (F.col("aw") > 0))
    mwl = F.col("ac").cast("double") / F.col("aw").cast("double")
    symr = F.col("sym").cast("double") / F.col("n_words").cast("double")
    bf = F.col("bl").cast("double") / F.col("nl").cast("double")
    ef = F.col("el").cast("double") / F.col("nl").cast("double")
    af = F.col("at").cast("double") / F.col("n_words").cast("double")
    passes = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (mwl >= 3.0)
        & (mwl <= 10.0)
        & (symr <= 0.1)
        & (bf <= 0.9)
        & (ef <= 0.3)
        & (af >= 0.8)
        & (F.col("stop_hits") >= 2)
    )
    return base.select(
        "doc_id",
        "n_words",
        mwl.alias("mean_word_len"),
        symr.alias("symbol_ratio"),
        bf.alias("bullet_frac"),
        ef.alias("ellipsis_frac"),
        af.alias("alpha_word_frac"),
        "stop_hits",
        passes.alias("passes"),
    )


def cohen_kappa(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Cohen's kappa agreement between the marker-word language
    prediction (:func:`lang_pred`) and the labeled ``lang`` column
    (Cohen 1960) — the chance-corrected accuracy that turns
    :func:`lang_id`'s confusion table into one scalar.

        kappa = (p_o - p_e) / (1 - p_e)

    with p_o the exact agreement fraction and
    p_e = sum_k r_k*c_k / N^2 the chance agreement from the margins.
    Every count and the r_k*c_k products are exact BIGINTs (plain
    integer sums — order-free), so both probabilities and kappa are
    single shared float expressions.

    Scale: one (truth, pred) hash aggregate over a vocabulary-sized
    table, two margin aggregates, one broadcast combine — no folds.

    Output (1 row): n_docs, agree, po, pe, kappa.
    """
    conf = (
        df.select(
            F.col("lang").alias("truth"),
            lang_pred(text_col).alias("pred"),
        )
        .groupBy("truth", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = conf.groupBy("truth").agg(F.sum("n").alias("rt"))
    cols = conf.groupBy("pred").agg(F.sum("n").alias("ct"))
    tot = conf.agg(
        F.sum("n").alias("nn"),
        F.sum(
            F.when(F.col("truth") == F.col("pred"), F.col("n"))
            .otherwise(F.lit(0))
        ).alias("agree"),
    )
    pe_num = (
        rows.join(
            cols, rows["truth"] == cols["pred"], "inner"
        )
        # decimal(38,0): the margin cross-products stay exact at
        # 10^12-doc scale (int64 would overflow near 1e19); DuckDB's
        # SUM widens to HUGEINT likewise
        .agg(
            F.sum(
                F.col("rt").cast("decimal(19,0)")
                * F.col("ct").cast("decimal(19,0)")
            ).alias("pe_num")
        )
    )
    out = tot.crossJoin(F.broadcast(pe_num))
    nn = F.col("nn").cast("double")
    po = F.col("agree").cast("double") / nn
    pe = F.col("pe_num").cast("double") / (nn * nn)
    return out.filter(F.col("nn") > 0).select(
        F.col("nn").cast("long").alias("n_docs"),
        F.col("agree").cast("long").alias("agree"),
        po.alias("po"),
        pe.alias("pe"),
        F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe)).alias(
            "kappa"
        ),
    )


def gunning_fog(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gunning fog readability index per doc (Gunning 1952) — the
    complex-word-based companion to :func:`flesch_kincaid`'s
    syllable-rate form; the two disagreeing flags documents whose
    difficulty is concentrated in a few jargon terms.

        fog = 0.4 * (W/S + 100 * C/W)

    W = alphabetic word runs, S = sentence-terminator runs (min 1),
    C = "complex" words with >= 3 vowel clusters — counted with a
    higher-order array filter whose inner regexp runs identically in
    the DuckDB oracle.  All integers exact; fog is ONE shared float
    expression.

    Scale: embarrassingly parallel per-document map — no shuffle.

    Output: doc_id, n_words, n_sentences, n_complex, fog_index.
    """
    t = F.col(text_col)
    words_arr = F.regexp_extract_all(t, F.lit("[A-Za-z]+"), 0)
    words = F.size(words_arr)
    sents = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all(t, F.lit("[.!?]+"), 0))
    )
    complex_ = F.size(
        F.filter(
            words_arr,
            lambda w: F.size(
                F.regexp_extract_all(
                    w, F.lit("[aeiouyAEIOUY]+"), 0
                )
            )
            >= 3,
        )
    )
    out = df.select(
        "doc_id",
        words.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sentences"),
        complex_.cast("long").alias("n_complex"),
    ).filter(F.col("n_words") > 0)
    ws = F.col("n_words").cast("double") / F.col("n_sentences").cast(
        "double"
    )
    cw = (
        F.lit(100.0) * F.col("n_complex").cast("double")
        / F.col("n_words").cast("double")
    )
    return out.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_complex",
        (F.lit(0.4) * (ws + cw)).alias("fog_index"),
    )


def readability_indices(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The character-count readability triple per doc — Coleman-Liau
    (1975), Automated Readability Index (Senter & Smith 1967) and
    SMOG (McLaughlin 1969) — the three classic grade-level formulas
    that do NOT need the syllable-per-word ratio Flesch-Kincaid
    uses, so together with :func:`flesch_kincaid` /
    :func:`gunning_fog` the corpus gets all five standard scores:

        CLI  = 0.0588*L - 0.296*S - 15.8
               (L = letters per 100 words, S = sentences per 100 words)
        ARI  = 4.71*(letters/words) + 0.5*(words/sentences) - 21.43
        SMOG = 1.043*sqrt(polysyllables * 30 / sentences) + 3.1291

    Letters, alphabetic word runs, sentence-terminator runs and
    polysyllabic words (>= 3 vowel clusters, counted with a
    higher-order filter over the word array — still Catalyst, no
    UDF) are exact integers; each score is one shared float
    expression, and the identical regexes run in the DuckDB oracle.

    Scale: embarrassingly parallel per-document map — no shuffle.

    Output: doc_id, n_letters, n_words, n_sentences, n_poly, cli,
    ari, smog.
    """
    t = F.col(text_col)
    warr = F.regexp_extract_all(t, F.lit("[A-Za-z]+"), 0)
    letters = F.size(F.regexp_extract_all(t, F.lit("[A-Za-z]"), 0))
    words = F.size(warr)
    sents = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all(t, F.lit("[.!?]+"), 0))
    )
    poly = F.size(
        F.filter(
            warr,
            lambda w: F.size(
                F.regexp_extract_all(
                    w, F.lit("[aeiouyAEIOUY]+"), 0
                )
            )
            >= F.lit(3),
        )
    )
    out = df.select(
        "doc_id",
        letters.cast("long").alias("n_letters"),
        words.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sentences"),
        poly.cast("long").alias("n_poly"),
    ).filter(F.col("n_words") > 0)
    lw = F.col("n_letters").cast("double") / F.col("n_words").cast(
        "double"
    )
    ws = F.col("n_words").cast("double") / F.col(
        "n_sentences"
    ).cast("double")
    lper100 = lw * F.lit(100.0)
    sper100 = (
        F.col("n_sentences").cast("double")
        / F.col("n_words").cast("double")
    ) * F.lit(100.0)
    return out.select(
        "doc_id",
        "n_letters",
        "n_words",
        "n_sentences",
        "n_poly",
        (
            F.lit(0.0588) * lper100
            - F.lit(0.296) * sper100
            - F.lit(15.8)
        ).alias("cli"),
        (
            F.lit(4.71) * lw + F.lit(0.5) * ws - F.lit(21.43)
        ).alias("ari"),
        (
            F.lit(1.043)
            * F.sqrt(
                F.col("n_poly").cast("double")
                * F.lit(30.0)
                / F.col("n_sentences").cast("double")
            )
            + F.lit(3.1291)
        ).alias("smog"),
    )
