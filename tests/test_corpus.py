import pyspark.sql.functions as F


def test_determinism(spark):
    from vector_spark.corpus import sequences

    a = sequences(spark, 300, seed=42, partitions=2)
    b = sequences(spark, 300, seed=42, partitions=7)  # partitioning-independent
    ah = a.select("doc_id", F.xxhash64("tokens", "message", "source").alias("h"))
    bh = b.select("doc_id", F.xxhash64("tokens", "message", "source").alias("h"))
    assert ah.exceptAll(bh).count() == 0 and bh.exceptAll(ah).count() == 0


def test_ntok_consistency(corpus):
    assert corpus.filter(F.size("tokens") != F.col("n_tok")).count() == 0


def test_token_range(corpus):
    from vector_spark.corpus import MAX_TOKENS, VOCAB_SIZE

    bad = corpus.filter(
        (F.array_max("tokens") >= VOCAB_SIZE)
        | (F.array_min("tokens") < 0)
        | (F.col("n_tok") < 1)
        | (F.col("n_tok") > MAX_TOKENS)
    )
    assert bad.count() == 0


def test_source_skew(corpus):
    rows = dict(corpus.groupBy("source").count().collect())
    assert rows["app"] > rows["proxy"] * 5  # Zipf head is heavy


def test_all_formats_present(corpus):
    fmts = {r["fmt"] for r in corpus.select("fmt").distinct().collect()}
    assert fmts == {0, 1, 2, 3}
