"""token_jaccard_pairs: the two physical plans (small-vocab bitmask vs
general PPJoin) must produce identical results — they are plan choices,
not semantics choices."""

from fuzzy_matching_spark.operators import textops


def _collect(df):
    return {
        (r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()
    }


def test_bitmask_and_ppjoin_plans_agree(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for threshold in (0.5, 0.8):
        fast = textops.token_jaccard_pairs(docs, threshold=threshold)
        general = textops.token_jaccard_pairs(
            docs, threshold=threshold, bitmask_vocab_limit=0
        )
        assert _collect(fast) == _collect(general)


def test_handles_empty_and_single_token_docs(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, ""), (4, ""), (5, "a")],
        schema="doc_id long, text string",
    )
    got = _collect(textops.token_jaccard_pairs(docs, threshold=0.99))
    # identical token sets pair up; ""-token docs pair with each other
    assert (1, 2, 1.0) in got
    assert (3, 4, 1.0) in got
    assert not any((a, b) == (1, 5) or (a, b) == (5, 1) for a, b, _ in got)
