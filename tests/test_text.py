

def test_rake_keywords_textbook_scoring(spark):
    # "red apple" run vs single words: deg/freq hand-computed.
    # doc: "red apple and the red apple of red" ->
    # candidates: [red apple], [red apple], [red]
    # freq(red)=3, deg(red)=2+2+1=5 -> s=5/3; freq(apple)=2, deg=4 -> 2
    # phrase "red apple" score = 5/3 + 2 = 11/3; "red" = 5/3
    from tsaug_spark.pipeline.text import rake_keywords
    df = spark.createDataFrame(
        [(0, "red apple and the red apple of red")],
        "doc_id long, text string",
    )
    out = {r.phrase: r for r in rake_keywords(df).collect()}
    assert set(out) == {"red apple", "red"}
    assert out["red apple"].rank == 1
    assert out["red apple"].occurrences == 2
    assert abs(out["red apple"].score - 11 / 3) < 1e-12
    assert abs(out["red"].score - 5 / 3) < 1e-12


def test_rake_keywords_max_words_cap(spark):
    from tsaug_spark.pipeline.text import rake_keywords
    df = spark.createDataFrame(
        [(0, "one two three four five of six")],
        "doc_id long, text string",
    )
    out = rake_keywords(df, max_words=4).collect()
    # the 5-word run is discarded; only "six" survives
    assert [r.phrase for r in out] == ["six"]


def test_textrank_matches_integer_replay(spark):
    """TextRank is the integer PageRank over the window-2 word graph:
    replay tokenization + recurrence in plain Python, demand exact
    pr_micro equality and identical ranking."""
    import re

    import pandas as pd
    from tsaug_spark.pipeline.text import STOPWORDS, textrank_keywords

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "quick brown foxes and lazy dogs keep jumping quick",
        "a dog is not a fox but both are animals",
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(3), "text": texts})
    )
    got = {
        r.word: (r.degree, r.pr_micro, r.rank)
        for r in textrank_keywords(df, top_k=50, n_iters=10).collect()
    }

    adj = {}
    for t in texts:
        toks = [
            w
            for w in re.split("[^a-z]+", t.lower())
            if w and len(w) >= 3 and w not in STOPWORDS
        ]
        for a, b in zip(toks, toks[1:]):
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
    nn = len(adj)
    scale = 10**12
    pr = {w: scale // nn for w in adj}
    base = (scale * 15) // (100 * nn)
    for _ in range(10):
        pr = {
            w: base
            + sum((pr[y] * 85) // (100 * len(adj[y])) for y in adj[w])
            for w in adj
        }
    order = sorted(adj, key=lambda w: (-pr[w], w))
    want = {
        w: (len(adj[w]), pr[w], i + 1) for i, w in enumerate(order)
    }
    assert got == want
