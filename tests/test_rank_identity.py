"""Rank identity: Spark engine vs the pinned pure-Python BM25 oracle.

SURVEY.md §5.2 / BASELINE.md: top-k docIDs and scores must match the
pinned oracle exactly on a reference-style query mix (head/torso/tail
terms, OR-unions) over the synthetic webtext corpus.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from oracle_bm25 import OracleIndex
from toshi_spark.fixtures import synth_webtext
from toshi_spark.index.builder import build_index
from toshi_spark.index.docmap import assign_doc_ids
from toshi_spark.scoring import bm25_score, topk

N_DOCS = 400
K = 20


@pytest.fixture(scope="module")
def corpus_and_index(spark):
    corpus = assign_doc_ids(
        synth_webtext(spark, N_DOCS, seed=42), order_col="url"
    ).persist()
    ix = build_index(corpus, id_col="doc_id", text_fields="text")
    docs = {r["doc_id"]: r["text"] for r in corpus.select("doc_id", "text").collect()}
    oracle = OracleIndex(docs)
    return corpus, ix, oracle


def spark_topk(ix, terms, k, tf_mode):
    matched = ix.postings.filter(
        (F.col("field") == "text") & F.col("term").isin(terms)
    )
    scored = bm25_score(
        matched, ix.doclens, ix.termstats, ix.n_docs, ix.fieldstats,
        tf_mode=tf_mode, as_f32=True,
    )
    return [(r.doc_id, r.score) for r in topk(scored, k).collect()]


QUERY_MIX = [
    ["w0"],            # head
    ["w5"],            # head/torso
    ["w100"],          # torso
    ["w1500"],         # tail
    ["w0", "w3"],      # OR union of heads
    ["w10", "w200", "w1999"],  # mixed union
    ["marker00000042"],        # unique
    ["zzz_absent"],            # no hits
]


@pytest.mark.parametrize("terms", QUERY_MIX, ids=["-".join(t) for t in QUERY_MIX])
def test_topk_rank_identity_full_tf(corpus_and_index, terms):
    _, ix, oracle = corpus_and_index
    got = spark_topk(ix, terms, K, tf_mode="full")
    want = oracle.topk_terms(terms, K, tf_mode="full")
    assert [d for d, _ in got] == [d for d, _ in want]
    got_scores = np.array([s for _, s in got], dtype=np.float32)
    want_scores = np.array([s for _, s in want], dtype=np.float32)
    # engine computes in f64 then rounds to f32; oracle is f32 throughout —
    # identical to within 1 ulp of f32
    np.testing.assert_allclose(got_scores, want_scores, rtol=2e-7, atol=0)


@pytest.mark.parametrize("terms", [["w0"], ["w100"], ["w0", "w3"]])
def test_topk_rank_identity_basic_tf(corpus_and_index, terms):
    """Toshi's term query treats tf as 1 (IndexRecordOption::Basic)."""
    _, ix, oracle = corpus_and_index
    got = spark_topk(ix, terms, K, tf_mode="basic")
    want = oracle.topk_terms(terms, K, tf_mode="basic")
    assert [d for d, _ in got] == [d for d, _ in want]


@pytest.fixture(scope="module")
def quantized_index(spark, corpus_and_index):
    corpus, _, _ = corpus_and_index
    ix = build_index(corpus, id_col="doc_id", text_fields="text",
                     quantize_fieldnorms=True)
    docs = {r["doc_id"]: r["text"]
            for r in corpus.select("doc_id", "text").collect()}
    from oracle_bm25 import OracleIndex

    return ix, OracleIndex(docs, quantize=True)


@pytest.mark.parametrize("terms", QUERY_MIX, ids=["-".join(t) for t in QUERY_MIX])
def test_topk_rank_identity_quantized(quantized_index, terms):
    """Quantized-fieldnorm mode: engine vs the independently-implemented
    quantized oracle — docIds exact, scores within 1 f32 ulp."""
    ix, oracle = quantized_index
    got = spark_topk(ix, terms, K, tf_mode="full")
    want = oracle.topk_terms(terms, K, tf_mode="full")
    assert [d for d, _ in got] == [d for d, _ in want]
    got_scores = np.array([s for _, s in got], dtype=np.float32)
    want_scores = np.array([s for _, s in want], dtype=np.float32)
    np.testing.assert_allclose(got_scores, want_scores, rtol=2e-7, atol=0)


def test_quantization_actually_changes_a_score(corpus_and_index,
                                               quantized_index):
    """A doc whose length quantizes lossy (len>=40 in this corpus) must
    score differently in quantized mode — guards against the option
    silently doing nothing."""
    _, ix_exact, oracle = corpus_and_index
    ix_q, _ = quantized_index
    from oracle_bm25 import quantize_fieldnorm

    lossy = sorted(d for d, n in oracle.doclens.items()
                   if quantize_fieldnorm(n) != n)
    assert lossy, "corpus has no doc with a lossy-quantizing length"
    exact = dict(spark_topk(ix_exact, ["w0"], N_DOCS, "full"))
    quant = dict(spark_topk(ix_q, ["w0"], N_DOCS, "full"))
    changed = [d for d in exact if d in quant and exact[d] != quant[d]]
    assert changed, "quantized mode produced identical scores everywhere"


def test_fieldnorm_table_golden():
    """Committed 256-entry decode table pins the quantization scheme."""
    import json
    import os

    from toshi_spark.index.fieldnorm import (FIELD_NORMS_TABLE,
                                             fieldnorm_to_id)

    path = os.path.join(os.path.dirname(__file__), "golden",
                        "fieldnorm_table.json")
    with open(path) as f:
        golden = json.load(f)["table"]
    assert FIELD_NORMS_TABLE == golden
    assert fieldnorm_to_id(2**31 - 1) == 255
    # encode/decode round-trip: table[id(n)] <= n < table[id(n)+1]
    for n in list(range(0, 4096)) + [10**5, 10**7]:
        i = fieldnorm_to_id(n)
        assert golden[i] <= n
        if i < 255:
            assert n < golden[i + 1]
    # oracle-side re-implementation agrees everywhere
    from oracle_bm25 import quantize_fieldnorm

    from toshi_spark.index.fieldnorm import quantize

    for n in range(0, 70000):
        assert quantize(n) == quantize_fieldnorm(n)


def test_doclens_match_oracle(corpus_and_index):
    _, ix, oracle = corpus_and_index
    got = {r.doc_id: r.doc_len for r in ix.doclens.collect()}
    assert got == oracle.doclens


def test_df_match_oracle(corpus_and_index):
    _, ix, oracle = corpus_and_index
    got = {r.term: r.df for r in ix.termstats.collect()}
    want = {t: len(d) for t, d in oracle.postings.items()}
    assert got == want
