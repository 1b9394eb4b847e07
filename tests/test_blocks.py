"""Block codec round-trips + block-max top-k rank identity."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from toshi_spark.fixtures import synth_webtext
from toshi_spark.index.blocks import (
    decode_blocks_df,
    encode_blocks_df,
    encode_run,
    varint_decode,
    varint_encode,
)
from toshi_spark.index.builder import build_index, salted_postings
from toshi_spark.query.blockmax import blockmax_topk
from toshi_spark.index.docmap import assign_doc_ids
from toshi_spark.scoring import bm25_score, topk


def test_varint_roundtrip_small():
    vals = np.array([0, 1, 127, 128, 300, 2**20, 2**35, 2**63 - 1], dtype=np.uint64)
    assert (varint_decode(varint_encode(vals)) == vals).all()


def test_varint_empty():
    assert varint_decode(varint_encode(np.empty(0, dtype=np.uint64))).size == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
def test_varint_roundtrip_hypothesis(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert (varint_decode(varint_encode(vals)) == vals).all()


def test_encode_run_blocks_and_maxes():
    docs = np.arange(0, 300, dtype=np.int64) * 7 + 3
    tfs = (docs % 5 + 1).astype(np.int64)
    dls = (docs % 90 + 10).astype(np.int64)
    avgdl = float(dls.mean())
    blocks = encode_run(docs, tfs, dls, avgdl)
    assert len(blocks) == 3  # 300 postings / 128
    b0 = blocks[0]
    assert b0[1] == 3 and b0[2] == docs[127] and b0[3] == 128
    assert b0[4] == int(tfs[:128].max())
    assert b0[5] == int(tfs[:128].min())
    assert b0[6] == int(dls[:128].min())
    assert b0[7] == int(dls[:128].max())
    # exact impact stats at the reference avgdl
    tfn = tfs[:128] * 2.2 / (
        tfs[:128] + 1.2 * (0.25 + 0.75 * dls[:128] / avgdl)
    )
    assert abs(b0[8] - tfn.max()) < 1e-12
    assert abs(b0[9] - np.sort(tfn)[-16]) < 1e-12
    # round trip doc ids + doc lens of block 0
    deltas = varint_decode(b0[10]).astype(np.int64)
    assert (np.cumsum(deltas) + b0[1] == docs[:128]).all()
    assert (varint_decode(b0[12]).astype(np.int64) == dls[:128]).all()


@pytest.fixture(scope="module")
def built(spark):
    corpus = assign_doc_ids(synth_webtext(spark, 300, seed=42), order_col="url")
    ix = build_index(corpus, id_col="doc_id", text_fields="text")
    salted = salted_postings(ix.postings, ix.termstats, df_threshold=150,
                             n_salts=4)
    avgdl = {r["field"]: float(r["avgdl"]) for r in ix.fieldstats.collect()}
    blocks = encode_blocks_df(salted, avgdl).persist()
    return ix, blocks


def test_blocks_roundtrip_full_postings(spark, built):
    ix, blocks = built
    decoded = decode_blocks_df(blocks)
    a = sorted(
        tuple(r) for r in decoded.select("term", "doc_id", "tf").collect()
    )
    b = sorted(
        tuple(r) for r in ix.postings.select("term", "doc_id", "tf").collect()
    )
    assert a == b


def test_salting_splits_head_terms(spark, built):
    ix, blocks = built
    n_salts = (
        blocks.filter(F.col("term") == "w0")
        .select("salt").distinct().count()
    )
    assert n_salts > 1  # w0 is a head term (df > 150 out of 300)


@pytest.mark.parametrize("terms", [["w0"], ["w1", "w7"], ["w0", "w100", "w1999"]])
def test_blockmax_rank_identity(spark, built, terms):
    ix, blocks = built
    k = 15
    got = blockmax_topk(
        blocks, ix.termstats, ix.doclens, ix.fieldstats, ix.n_docs,
        "text", terms, k,
    ).collect()
    matched = ix.postings.filter(F.col("term").isin(terms))
    want = topk(
        bm25_score(matched, ix.doclens, ix.termstats, ix.n_docs, ix.fieldstats),
        k,
    ).collect()
    assert [(r.doc_id) for r in got] == [(r.doc_id) for r in want]
    for g, w in zip(got, want):
        assert abs(g.score - w.score) < 1e-12


def test_prune_stats_skewed_corpus_prunes(spark):
    """Block pruning is corpus-shaped: on a tf-skewed corpus (a few
    docs repeat the query term many times) the metadata-only τ from
    the skewed blocks exceeds flat blocks' upper bounds and the stats
    helper reports real pruning; results stay identical to the full
    path."""
    from toshi_spark.engine import FullTextIndex
    from toshi_spark.index.blocks import encode_blocks_df
    from toshi_spark.index.builder import salted_postings
    from toshi_spark.query.blockmax import blockmax_prune_stats, blockmax_topk
    from toshi_spark.schema import FieldSpec, IndexSchema

    rows = []
    # 2000 flat docs: one 'needle' + filler (tf=1, uniform length)
    for i in range(2000):
        rows.append((i, "needle " + " ".join(f"pad{j}" for j in range(20))))
    # 64 skewed docs: 'needle' repeated — high tf concentrates impact;
    # ≥ HI_RANK of them share a block so hi_tfn certifies the skew
    for i in range(2000, 2064):
        rows.append((i, " ".join(["needle"] * 30) + " tail"))
    docs = spark.createDataFrame(rows, "doc_id long, body string")
    schema = IndexSchema([FieldSpec("body", "text", stored=True,
                                    indexed=True, positions=True)])
    ix = FullTextIndex.build(spark, docs, schema, id_col="doc_id",
                             name="skew")
    avgdl = {r["field"]: float(r["avgdl"])
             for r in ix.fieldstats.collect()}
    # no salting: keep the doc-ordered run contiguous so the skewed
    # docs co-locate in blocks (salting would shard them below HI_RANK)
    salted = salted_postings(ix.postings, ix.termstats,
                             df_threshold=100_000, n_salts=4)
    blocks = encode_blocks_df(salted, avgdl)
    stats = blockmax_prune_stats(blocks, ix.termstats, ix.fieldstats,
                                 ix.n_docs, "body", ["needle"], 5)
    st = stats["terms"]["needle"]
    assert st["blocks"] > 4  # 2008 postings → ≥16 blocks of 128
    assert st["survivors"] < st["blocks"]  # pruning actually engaged
    # and the pruned path returns the exact same top-k as full decode
    got = blockmax_topk(blocks, ix.termstats, ix.doclens, ix.fieldstats,
                        ix.n_docs, "body", ["needle"], 5).collect()
    assert {r["doc_id"] for r in got} <= set(range(2000, 2064))
    assert len(got) == 5


def test_blockmax_prunes_on_sitewise_skewed_webtext(spark):
    """The headline scale claim, measured: on a corpus with crawl-order
    host locality (synth_webtext_skewed — per-site page-length classes
    and topic bursts), block-max pruning cuts most postings for
    head-term queries AND for unions (via the seed-θ + overlap-rest
    machinery), with rank identity against the full-decode path."""
    from toshi_spark.fixtures import synth_webtext_skewed
    from toshi_spark.index.blocks import encode_blocks_df
    from toshi_spark.index.builder import build_index, salted_postings
    from toshi_spark.index.docmap import assign_doc_ids
    from toshi_spark.query.blockmax import (
        blockmax_prune_stats,
        blockmax_topk,
    )

    corpus = assign_doc_ids(
        synth_webtext_skewed(spark, 20000, seed=42), order_col="url"
    )
    ix = build_index(corpus, id_col="doc_id", text_fields="text")
    salted = salted_postings(ix.postings, ix.termstats,
                             df_threshold=8000, n_salts=4)
    avgdl = {r["field"]: float(r["avgdl"])
             for r in ix.fieldstats.collect()}
    blocks = encode_blocks_df(salted, avgdl).repartition(4).persist()
    try:
        # mid+mid floor pins the round-5 conjunction-pair seeding:
        # pre-pair θ discovery measured 0% pruned on this shape
        for terms, min_pruned in [(["w0"], 0.5), (["w0", "w1"], 0.2),
                                  (["w97", "w99"], 0.2)]:
            st = blockmax_prune_stats(
                blocks, ix.termstats, ix.fieldstats, ix.n_docs,
                "text", terms, 20,
            )
            tp = sum(v["postings"] for v in st["terms"].values())
            sp = sum(v["surviving_postings"]
                     for v in st["terms"].values())
            pruned = 1 - sp / tp
            assert pruned >= min_pruned, (terms, pruned, st)
            got = blockmax_topk(
                blocks, ix.termstats, ix.doclens, ix.fieldstats,
                ix.n_docs, "text", terms, 20,
            ).collect()
            matched = ix.postings.filter(F.col("term").isin(terms))
            want = topk(
                bm25_score(matched, ix.doclens, ix.termstats,
                           ix.n_docs, ix.fieldstats),
                20,
            ).collect()
            assert [r.doc_id for r in got] == [r.doc_id for r in want]
            for g, w in zip(got, want):
                assert abs(g.score - w.score) < 1e-9
    finally:
        blocks.unpersist()


@pytest.fixture(scope="module")
def fuzz_ix(spark):
    """Skewed random corpus for pruning-path fuzzing: mixed doc
    lengths, heavy-repeat docs (tf skew), multi-salt head terms."""
    rng = np.random.default_rng(777)
    vocab = [f"t{i}" for i in range(12)]
    rows = []
    for i in range(800):
        kind = rng.random()
        if kind < 0.5:
            n = int(rng.integers(3, 15))
        elif kind < 0.85:
            n = int(rng.integers(30, 90))
        else:
            n = int(rng.integers(200, 400))
        words = [vocab[int(j)] for j in
                 rng.integers(0, len(vocab), n)]
        if kind >= 0.97:  # bursty docs: one term repeated a lot
            words += [vocab[int(rng.integers(0, 3))]] * int(
                rng.integers(30, 80))
        rows.append((i, " ".join(words)))
    from toshi_spark.index.builder import build_index, salted_postings
    from toshi_spark.index.blocks import encode_blocks_df

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ix = build_index(docs, id_col="doc_id", text_fields="text")
    salted = salted_postings(ix.postings, ix.termstats,
                             df_threshold=300, n_salts=3)
    avgdl = {r["field"]: float(r["avgdl"])
             for r in ix.fieldstats.collect()}
    blocks = encode_blocks_df(salted, avgdl).persist()
    blocks.count()
    return ix, blocks


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    terms=st.sets(
        st.sampled_from([f"t{i}" for i in range(12)]),
        min_size=1, max_size=4,
    ),
    k=st.integers(min_value=1, max_value=25),
    tf_mode=st.sampled_from(["full", "basic"]),
)
def test_blockmax_fuzz_rank_identity(spark, fuzz_ix, terms, k, tf_mode):
    """Property: for ANY term subset, k and tf mode, the pruned
    compressed path returns exactly the full-decode BM25 top-k — the
    seed-θ + overlap-rest machinery must never drop a true result."""
    from toshi_spark.scoring import bm25_score

    ix, blocks = fuzz_ix
    terms = sorted(terms)
    got = blockmax_topk(
        blocks, ix.termstats, ix.doclens, ix.fieldstats, ix.n_docs,
        "text", terms, k, tf_mode=tf_mode,
    ).collect()
    matched = ix.postings.filter(F.col("term").isin(terms))
    full = bm25_score(matched, ix.doclens, ix.termstats, ix.n_docs,
                      ix.fieldstats, tf_mode=tf_mode)
    want = topk(full, k).collect()
    full_map = {r["doc_id"]: r["score"] for r in full.collect()}
    # tolerance-aware identity: docs with mathematically EQUAL scores
    # can swap order between the two plans (different summation order
    # flips the last ulp, flipping the doc_id tiebreak — found by this
    # fuzzer on a 3-way tie), so assert the score PROFILE matches and
    # every returned doc carries its true full-decode score; exact
    # doc_id order is asserted only where scores are strictly apart.
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert abs(g.score - w.score) < 1e-9
        assert abs(full_map[g.doc_id] - g.score) < 1e-9
    kth = want[-1].score
    strictly_above = {r.doc_id for r in want if r.score > kth + 1e-9}
    assert strictly_above <= {r.doc_id for r in got}


def test_seed_gate_skips_on_flat_and_runs_on_skewed(spark):
    """Adaptive seed-θ gate (r4 VERDICT #1): on a flat corpus (uniform
    tf/doc-length → near-uniform block bounds) the metadata-only
    estimate predicts no prunable mass, the seed decode job is
    skipped, and θ falls back to τ; on a tf-skewed corpus the gate
    lets the seed pass run and θ tightens past τ.  Rank identity on
    the flat corpus is covered by the oracle query + fuzzer; this
    pins the GATE decision itself via the θ/τ relation."""
    from toshi_spark.engine import FullTextIndex
    from toshi_spark.index.blocks import encode_blocks_df
    from toshi_spark.index.builder import salted_postings
    from toshi_spark.query.blockmax import (
        _BOUND_GUARD,
        blockmax_prune_stats,
    )
    from toshi_spark.schema import FieldSpec, IndexSchema

    schema = IndexSchema([FieldSpec("body", "text", stored=True,
                                    indexed=True, positions=True)])

    # flat: every doc identical shape, tf=1 — no θ can prune
    flat_rows = [
        (i, "alpha beta " + " ".join(f"pad{j}" for j in range(10)))
        for i in range(1500)
    ]
    docs = spark.createDataFrame(flat_rows, "doc_id long, body string")
    ix = FullTextIndex.build(spark, docs, schema, id_col="doc_id",
                             name="gateflat")
    avgdl = {r["field"]: float(r["avgdl"])
             for r in ix.fieldstats.collect()}
    salted = salted_postings(ix.postings, ix.termstats,
                             df_threshold=100_000, n_salts=4)
    blocks = encode_blocks_df(salted, avgdl)
    st = blockmax_prune_stats(blocks, ix.termstats, ix.fieldstats,
                              ix.n_docs, "body", ["alpha", "beta"], 10)
    # seed skipped ⇒ θ is exactly τ − guard (no decoded partial won)
    assert st["theta"] == pytest.approx(st["tau"] - _BOUND_GUARD)

    # skewed: tf-concentrated docs — the gate must let seed run and
    # the decoded θ must beat τ (the cross-term partial sums)
    skew_rows = [
        (i, "alpha beta " + " ".join(f"pad{j}" for j in range(10)))
        for i in range(1500)
    ] + [
        (1500 + i, " ".join(["alpha"] * 25 + ["beta"] * 25))
        for i in range(64)
    ]
    docs2 = spark.createDataFrame(skew_rows, "doc_id long, body string")
    ix2 = FullTextIndex.build(spark, docs2, schema, id_col="doc_id",
                              name="gateskew")
    avgdl2 = {r["field"]: float(r["avgdl"])
              for r in ix2.fieldstats.collect()}
    salted2 = salted_postings(ix2.postings, ix2.termstats,
                              df_threshold=100_000, n_salts=4)
    blocks2 = encode_blocks_df(salted2, avgdl2)
    st2 = blockmax_prune_stats(blocks2, ix2.termstats, ix2.fieldstats,
                               ix2.n_docs, "body", ["alpha", "beta"],
                               10)
    assert st2["theta"] > st2["tau"]
    tp = sum(v["postings"] for v in st2["terms"].values())
    sp = sum(v["surviving_postings"] for v in st2["terms"].values())
    assert sp < tp  # and it actually prunes
