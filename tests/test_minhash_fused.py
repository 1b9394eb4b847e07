"""MinHash absorbed into text_profile (round 7, 50-key contract).

`add_minhash_cols` appends the signature columns map-only so the fused
profile never pays a join-back; these tests pin

  1. bit-identity with `minhash_signatures` (the row-dropping form) on
     non-empty docs,
  2. NULL signatures for empty/whitespace-only docs (the LEFT-JOIN
     convention the composed oracle relies on),
  3. the fused q_text_profile plan stays Exchange-free with the
     signature stages inside,
  4. all input columns pass through unchanged.
"""

from pyspark.sql import Row, functions as F

from toshi_spark.pipeline.dedup import (
    add_minhash_cols,
    minhash_signatures,
    tokens_col,
)


def _docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=0, text="alpha beta gamma delta epsilon"),
         Row(doc_id=1, text="alpha beta gamma delta zeta"),
         Row(doc_id=2, text="x"),
         Row(doc_id=3, text="   "),          # tokenizes to []
         Row(doc_id=4, text="one two")]
    )


def test_add_minhash_cols_matches_signatures(spark):
    docs = _docs(spark).withColumn("toks", tokens_col("text"))
    want = {r["doc_id"]: tuple(r[f"mh_{i}"] for i in range(4))
            for r in minhash_signatures(
                docs, n_hashes=4, toks_col="toks").collect()}
    got = {r["doc_id"]: tuple(r[f"mh_{i}"] for i in range(4))
           for r in add_minhash_cols(
               docs, toks_col="toks", n_hashes=4).collect()}
    # non-empty docs: bit-identical signatures
    for d, sig in want.items():
        assert got[d] == sig, d
    # empty-token doc: NULL signature instead of a dropped row
    assert 3 not in want
    assert got[3] == (None, None, None, None)


def test_add_minhash_cols_passes_columns_through(spark):
    docs = _docs(spark).withColumn("toks", tokens_col("text"))
    out = add_minhash_cols(docs, toks_col="toks", n_hashes=2)
    assert set(out.columns) == {"doc_id", "text", "toks", "mh_0", "mh_1"}
    base = {(r["doc_id"], r["text"]) for r in docs.collect()}
    assert {(r["doc_id"], r["text"]) for r in out.collect()} == base


def test_fused_profile_plan_stays_map_only(spark):
    from toshi_spark.pipeline.textstats import text_profile

    docs = add_minhash_cols(
        _docs(spark).withColumn("toks", tokens_col("text")),
        toks_col="toks", n_hashes=4,
    )
    prof = text_profile(docs, simhash_bits=16, toks_col="toks",
                        passthrough=[f"mh_{i}" for i in range(4)])
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    for i in range(4):
        assert f"mh_{i}" in prof.columns
