"""Round-8 optimization pins: each rewrite must be RESULT-identical to
the shape it replaced.

- dedup_clusters: the size-gated driver union-find must label exactly
  like the distributed min-label loop (forced via local_threshold=0).
- strip_boilerplate: the map-side broadcast-lexicon form must
  reproduce the explode/anti-join semantics (order preserved, fully
  boilerplate docs -> empty string, empty lexicon -> identity).
- _digit_chars_col: the translate() subtraction must equal the
  regexp_replace count for adversarial inputs (unicode digits,
  surrogate pairs, empty, null).
- dsir_weights(target_filter=...) must equal the two-frame form.
- hashed-shingle Jaccard must equal string-shingle Jaccard.
"""

from pyspark.sql import Row, functions as F


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_dedup_clusters_local_matches_distributed(spark):
    from toshi_spark.pipeline.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4), (40, 41)],
        "a long, b long",
    )
    local = dedup_clusters(pairs)  # 7 edges -> driver union-find
    dist = dedup_clusters(pairs, local_threshold=0)  # force the loop
    assert _rows(local) == _rows(dist)
    # min-label property: cluster_id is the component minimum
    got = {r["doc_id"]: r["cluster_id"] for r in local.collect()}
    assert got[4] == 1 and got[22] == 20 and got[41] == 40


def test_strip_boilerplate_map_side_semantics(spark):
    from toshi_spark.pipeline.webtext import strip_boilerplate

    pages = spark.createDataFrame(
        [
            Row(doc_id=0, text="keep one\nfooter\nkeep two"),
            Row(doc_id=1, text="footer\n  footer  \nfooter"),  # all boiler
            Row(doc_id=2, text=""),
            Row(doc_id=3, text="a\n\nb"),  # empty line survives ('' not in lex)
        ]
    )
    boiler = spark.createDataFrame([Row(line="footer")])
    out = {r["doc_id"]: r["clean"]
           for r in strip_boilerplate(pages, boiler).collect()}
    assert out[0] == "keep one\nkeep two"
    assert out[1] == ""  # trimmed match drops every line
    assert out[2] == ""
    assert out[3] == "a\n\nb"
    # empty lexicon -> identity
    empty = boiler.filter(F.lit(False))
    out2 = {r["doc_id"]: r["clean"]
            for r in strip_boilerplate(pages, empty).collect()}
    assert out2[0] == pages.collect()[0]["text"] or out2[0] == "keep one\nfooter\nkeep two"


def test_digit_chars_translate_equals_regexp(spark):
    from toshi_spark.pipeline.textstats import _digit_chars_col

    docs = spark.createDataFrame(
        [
            Row(text="abc123def45"),
            Row(text=""),
            Row(text=None),
            Row(text="no digits here"),
            Row(text="٣٤٥ unicode digits 12"),  # Arabic-Indic not [0-9]
            Row(text="emoji \U0001F600 7 pair"),  # astral char
            Row(text="0123456789" * 5),
        ]
    )
    out = docs.select(
        _digit_chars_col(F.col("text")).alias("t"),
        F.length(F.regexp_replace(F.col("text"), "[^0-9]", "")).alias("r"),
    ).collect()
    for r in out:
        assert r["t"] == r["r"], (r["t"], r["r"])


def test_dsir_target_filter_equals_target_frame(spark):
    from toshi_spark.pipeline.training import dsir_weights

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta w{i % 7} gamma w{i % 3} delta")
         for i in range(60)]
    )
    target = docs.filter(F.col("doc_id") % 13 == 0)
    a = dsir_weights(docs, target, n_buckets=64)
    b = dsir_weights(docs, n_buckets=64,
                     target_filter=F.col("doc_id") % 13 == 0)
    assert _rows(a) == _rows(b)


def test_hashed_shingle_jaccard_equals_string_form(spark):
    from toshi_spark.pipeline.dedup import (
        ngram_jaccard_pairs, shingles_col, tokens_col,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="the quick brown fox jumps over the dog"),
            Row(doc_id=1, text="the quick brown fox leaps over the dog"),
            Row(doc_id=2, text="completely different content here now"),
            Row(doc_id=3, text="the quick brown fox jumps over the dog"),
        ]
    )
    cands = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 3)], "a long, b long"
    )
    got = {(r["a"], r["b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs, cands, threshold=0.0).collect()}
    # string-shingle reference computed inline
    sh = docs.select(
        "doc_id",
        F.array_distinct(shingles_col(tokens_col("text"), 3)).alias("sh"),
    )
    ref = (
        cands.join(sh.select(F.col("doc_id").alias("a"),
                             F.col("sh").alias("_sa")), "a")
        .join(sh.select(F.col("doc_id").alias("b"),
                        F.col("sh").alias("_sb")), "b")
        .withColumn("ni", F.size(F.array_intersect("_sa", "_sb")))
        .select(
            "a", "b",
            F.round(
                F.col("ni")
                / (F.size("_sa") + F.size("_sb") - F.col("ni")), 4
            ).alias("j"),
        )
    )
    want = {(r["a"], r["b"]): r["j"] for r in ref.collect()}
    assert got == want
