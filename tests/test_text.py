

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
