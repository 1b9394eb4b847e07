"""Unit tests for pipeline.training: decontamination, sequence
packing, corpus-LM scoring, host blocklist."""

import math

from pyspark.sql import Row, functions as F

from toshi_spark.pipeline.training import (
    blocklist_filter,
    contamination,
    lm_score,
    pack_sequences,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_contamination_flags_shared_ngram(spark):
    eval_gram = "a b c d"
    docs = _docs(spark, [
        f"x y {eval_gram} z w",          # contaminated (contains gram)
        "p q r s t u v",                 # clean
        f"{eval_gram}",                  # exactly the gram
        "a b c x d",                     # broken gram: clean
    ])
    ev = spark.createDataFrame([Row(gram=eval_gram)])
    out = {r["doc_id"]: r for r in
           contamination(docs, ev, n=4).collect()}
    assert out[0]["contaminated"] and out[0]["n_hits"] == 1
    assert not out[1]["contaminated"] and out[1]["n_hits"] == 0
    assert out[2]["contaminated"] and out[2]["n_grams"] == 1
    assert not out[3]["contaminated"]
    # n_grams is len - n + 1
    assert out[0]["n_grams"] == 8 - 4 + 1


def test_contamination_short_doc_zero_grams(spark):
    docs = _docs(spark, ["a b", ""])
    ev = spark.createDataFrame([Row(gram="a b c d")])
    out = {r["doc_id"]: r for r in
           contamination(docs, ev, n=4).collect()}
    assert out[0]["n_grams"] == 0 and not out[0]["contaminated"]
    assert out[1]["n_grams"] == 0 and not out[1]["contaminated"]


def test_pack_sequences_offsets_and_spans(spark):
    # token counts: 3, 0, 5, 2  ->  exclusive offsets 0, 3, 3, 8
    docs = _docs(spark, ["a b c", "", "d e f g h", "i j"])
    out = {r["doc_id"]: r for r in
           pack_sequences(docs, seq_len=4).collect()}
    assert [out[i]["tok_offset"] for i in range(4)] == [0, 3, 3, 8]
    assert out[0]["seq_first"] == 0 and out[0]["seq_last"] == 0
    # doc 2 spans tokens 3..7 -> seqs 0..1
    assert (out[2]["seq_first"], out[2]["seq_last"],
            out[2]["n_seqs"]) == (0, 1, 2)
    # empty doc occupies no sequence but keeps a position
    assert out[1]["n_seqs"] == 0
    # doc 3 spans tokens 8..9 -> seq 2 only
    assert (out[3]["seq_first"], out[3]["seq_last"],
            out[3]["n_seqs"]) == (2, 2, 1)


def test_pack_sequences_partition_invariant(spark):
    texts = [f"tok{i} " * (i % 7) for i in range(101)]
    docs = _docs(spark, texts)
    a = sorted(map(tuple, pack_sequences(
        docs, seq_len=16, num_partitions=1).collect()))
    b = sorted(map(tuple, pack_sequences(
        docs, seq_len=16, num_partitions=13).collect()))
    assert a == b
    # global invariant: offsets are a true prefix sum in doc_id order
    rows = sorted(a)
    run = 0
    for r in rows:
        assert r[2] == run
        run += r[1]


def test_lm_score_hand_computed(spark):
    # corpus: "a b a b" + "a b" -> bigrams: (a,b)x3, (b,a)x1
    # unigrams: a x3, b x3; V = 2
    docs = _docs(spark, ["a b a b", "a b"])
    out = {r["doc_id"]: r for r in lm_score(docs).collect()}
    p_ab = (3 + 1.0) / (3 + 2.0)
    p_ba = (1 + 1.0) / (3 + 2.0)
    exp0 = round(-(2 * math.log(p_ab) + math.log(p_ba)) / 3, 4)
    exp1 = round(-math.log(p_ab), 4)
    assert out[0]["n_bigrams"] == 3
    assert abs(out[0]["lm_nll"] - exp0) < 1e-9
    assert abs(out[1]["lm_nll"] - exp1) < 1e-9


def test_lm_score_short_docs_zero(spark):
    docs = _docs(spark, ["solo", ""])
    out = {r["doc_id"]: r for r in lm_score(docs).collect()}
    for i in (0, 1):
        assert out[i]["n_bigrams"] == 0 and out[i]["lm_nll"] == 0.0


def test_blocklist_strips_port_and_aliases(spark):
    pages = spark.createDataFrame([
        Row(doc_id=0, url="HTTP://WWW.Evil.COM:80/x"),
        Row(doc_id=1, url="https://evil.com:8443/y"),
        Row(doc_id=2, url="https://good.com/z"),
    ])
    blocked = spark.createDataFrame([Row(host="evil.com")])
    kept = blocklist_filter(pages, blocked).select("doc_id").collect()
    assert [r["doc_id"] for r in kept] == [2]


def test_gopher_filter_rules(spark):
    from toshi_spark.pipeline.textstats import gopher_filter

    good = ("the data of a table is that it and for queries " * 3)
    docs = _docs(spark, [
        good,                               # passes everything
        "word " * 20,                       # mode_frac = 1 -> r_mode fails
        "1 2 3 4 5 6 7 8 9 10 11 12",       # all digits -> r_digit fails
        "a b",                              # too short -> r_len fails
    ])
    out = {r["doc_id"]: r for r in gopher_filter(docs).collect()}
    assert out[0]["keep"]
    assert not out[1]["r_mode"] and not out[1]["keep"]
    assert not out[2]["r_digit"] and not out[2]["keep"]
    assert not out[3]["r_len"] and not out[3]["keep"]
    # per-rule attribution: doc 1 fails ONLY the rules it should
    assert out[1]["r_len"] and out[1]["r_digit"]


def test_unigram_entropy_known_values(spark):
    from toshi_spark.pipeline.textstats import unigram_entropy

    docs = spark.createDataFrame(
        [
            (0, "a a b b"),       # two types, uniform -> H = 1.0
            (1, "a b c d"),       # four types, uniform -> H = 2.0
            (2, "a a a"),         # degenerate -> H = 0.0
            (3, ""),              # empty -> zeros
            (4, "a a a b"),       # H = 2 - 0.75*log2(3) = 0.8113
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unigram_entropy(docs).collect()}
    assert out[0]["entropy"] == 1.0 and out[0]["n_types"] == 2
    assert out[1]["entropy"] == 2.0 and out[1]["ttr"] == 1.0
    assert out[2]["entropy"] == 0.0 and out[2]["n_types"] == 1
    assert out[3]["n_tokens"] == 0 and out[3]["entropy"] == 0.0
    assert out[4]["entropy"] == 0.8113 and out[4]["ttr"] == 0.5


def test_host_cap_quota_and_determinism(spark):
    from pyspark.sql import functions as F
    from toshi_spark.pipeline.webtext import host_cap

    pages = spark.createDataFrame(
        [(i, "big.com" if i < 15 else "small.com") for i in range(18)],
        "doc_id long, host string",
    )
    out = host_cap(pages, cap=10)
    counts = {r["host"]: r["c"] for r in
              out.groupBy("host").agg(F.count("*").alias("c")).collect()}
    assert counts == {"big.com": 10, "small.com": 3}
    # deterministic: same kept set on a re-run
    kept1 = sorted(r["doc_id"] for r in out.collect())
    kept2 = sorted(r["doc_id"] for r in host_cap(pages, cap=10).collect())
    assert kept1 == kept2
    assert max(r["host_rank"] for r in out.collect()) <= 10


def test_mix_weights_temperature_math(spark):
    from toshi_spark.pipeline.training import mix_weights

    docs = spark.createDataFrame(
        [(i, "en" if i < 80 else "fr") for i in range(100)],
        "doc_id long, lang string",
    )
    out = {r["lang"]: r for r in
           mix_weights(docs, alpha=0.5).collect()}
    # p = .8/.2; q = sqrt(p)/Z with Z = sqrt(.8)+sqrt(.2)
    import math
    z = math.sqrt(0.8) + math.sqrt(0.2)
    assert out["en"]["p"] == 0.8 and out["fr"]["p"] == 0.2
    assert out["en"]["q"] == round(math.sqrt(0.8) / z, 6)
    assert out["fr"]["q"] == round(math.sqrt(0.2) / z, 6)
    # tail language is UP-weighted, head down-weighted
    assert out["fr"]["sample_weight"] > 1.0 > out["en"]["sample_weight"]


def test_dsir_weights_prefers_target_like_docs(spark):
    from toshi_spark.pipeline.training import dsir_weights

    # target talks about cats; raw corpus has cat-docs and dog-docs
    docs = _docs(spark, [
        "the cat sat on the mat",        # target-like
        "the dog ran in the park",       # off-target
        "a cat sat here",                # every bigram in the target
        "x",                             # <2 tokens: no features
    ])
    target = _docs(spark, [
        "the cat sat on the mat", "a cat sat here",
    ])
    out = {r["doc_id"]: r for r in
           dsir_weights(docs, target, n_buckets=256).collect()}
    # cat-docs outscore the dog-doc; featureless doc is exactly 0
    assert out[0]["log_weight"] > out[1]["log_weight"]
    assert out[2]["log_weight"] > out[1]["log_weight"]
    assert out[3]["n_feats"] == 0 and out[3]["log_weight"] == 0.0
    assert out[0]["n_feats"] == 5  # 6 tokens -> 5 bigrams


def test_dsir_weights_hand_computed_single_bucket(spark):
    """One shared bigram: weight = c * [ln p_t - ln p_r] exactly."""
    import math

    from toshi_spark.pipeline.training import dsir_weights

    docs = _docs(spark, ["a b", "c d"])
    target = _docs(spark, ["a b"])
    B = 4096
    out = {r["doc_id"]: r for r in
           dsir_weights(docs, target, n_buckets=B).collect()}
    # raw: 2 bigrams total, each bucket count 1; target: 1 bigram
    w_ab = math.log((1 + 1) / (1 + B)) - math.log((1 + 1) / (2 + B))
    w_cd = math.log((0 + 1) / (1 + B)) - math.log((1 + 1) / (2 + B))
    assert out[0]["log_weight"] == round(w_ab, 4)
    assert out[1]["log_weight"] == round(w_cd, 4)


def test_dsir_resample_deterministic_topk(spark):
    from toshi_spark.pipeline.training import dsir_resample, dsir_weights

    docs = _docs(spark, [f"tok{i} tok{i+1} tok{i+2}" for i in range(40)])
    target = _docs(spark, ["tok0 tok1 tok2"])
    w = dsir_weights(docs, target)
    s1 = [r["doc_id"] for r in dsir_resample(w, k=5, seed=7).collect()]
    s2 = [r["doc_id"] for r in dsir_resample(w, k=5, seed=7).collect()]
    assert s1 == s2 and len(s1) == 5
    # a different seed draws different Gumbel noise
    s3 = [r["doc_id"] for r in dsir_resample(w, k=5, seed=8).collect()]
    assert s1 != s3
    # keys come back sorted descending
    keys = [r["gumbel_key"] for r in dsir_resample(w, k=5, seed=7).collect()]
    assert keys == sorted(keys, reverse=True)


def test_score_thresholds_and_apply(spark):
    from toshi_spark.pipeline.training import (
        apply_thresholds,
        score_thresholds,
    )

    # lang A scores 1..10, lang B scores 101..110: per-group cutoffs
    rows = [(i, "A", float(i)) for i in range(1, 11)] + \
           [(i + 10, "B", float(100 + i)) for i in range(1, 11)]
    scored = spark.createDataFrame(
        rows, "doc_id long, lang string, quality double")
    th = {r["lang"]: r for r in
          score_thresholds(scored, keep_rate=0.7, group_col="lang",
                           score_col="quality").collect()}
    # (1-0.7)-quantile of 1..10 with linear interpolation: 3.7
    assert th["A"]["threshold"] == 3.7
    assert th["B"]["threshold"] == 103.7
    assert th["A"]["n_docs"] == 10
    kept = apply_thresholds(
        scored,
        score_thresholds(scored, keep_rate=0.7, group_col="lang",
                         score_col="quality"),
        score_col="quality", group_col="lang")
    per = {r["lang"]: r["c"] for r in
           kept.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    # scores >= 3.7 within 1..10 -> 4..10 = 7 docs (exactly 70%)
    assert per == {"A": 7, "B": 7}


def test_score_thresholds_lower_keep_and_approx(spark):
    from toshi_spark.pipeline.training import score_thresholds

    rows = [(i, "A", float(i)) for i in range(1, 11)]
    scored = spark.createDataFrame(
        rows, "doc_id long, lang string, quality double")
    lo = score_thresholds(scored, keep_rate=0.3, group_col="lang",
                          score_col="quality", keep="lower").collect()[0]
    # 0.3-quantile of 1..10: 3.7 (keep lowest 30%: scores <= 3.7)
    assert lo["threshold"] == 3.7
    ap = score_thresholds(scored, keep_rate=0.3, group_col="lang",
                          score_col="quality", keep="lower",
                          exact=False).collect()[0]
    # sketch returns an observed value near the exact quantile
    assert 3.0 <= ap["threshold"] <= 4.0
    import pytest
    with pytest.raises(ValueError):
        score_thresholds(scored, keep_rate=0.5, keep="sideways")


def test_fuzzy_contamination_catches_paraphrase(spark):
    from toshi_spark.pipeline.training import fuzzy_contamination

    base = ("the quick brown fox jumps over the lazy dog while "
            "seven wizards brew strong potions at midnight")
    docs = _docs(spark, [
        base,                                   # verbatim eval copy
        base.replace("midnight", "noon"),       # near-dup of eval 0
        "completely unrelated text about trains and stations here",
    ])
    ev = spark.createDataFrame([Row(doc_id=100, text=base)])
    out = {(r["doc_id"], r["eval_id"]): r["jaccard"] for r in
           fuzzy_contamination(docs, ev, threshold=0.5).collect()}
    assert out[(0, 100)] == 1.0          # exact copy
    assert (1, 100) in out and out[(1, 100)] >= 0.5   # paraphrase
    assert not any(d == 2 for d, _ in out)            # unrelated clean


def test_fuzzy_contamination_eval_bucket_cap(spark):
    from toshi_spark.pipeline.training import fuzzy_contamination

    boiler = "lorem ipsum dolor sit amet " * 3
    docs = _docs(spark, [boiler])
    # 5 identical boilerplate eval docs: with the cap below the bucket
    # size every band bucket is dropped, so nothing is flagged
    ev = spark.createDataFrame(
        [Row(doc_id=100 + i, text=boiler) for i in range(5)])
    capped = fuzzy_contamination(docs, ev, max_eval_bucket=4).collect()
    assert capped == []
    full = fuzzy_contamination(docs, ev, max_eval_bucket=100).collect()
    assert len(full) == 5


def test_new_ops_tolerate_null_and_empty_text(spark):
    """Crawl reality: null text (failed extraction), empty strings,
    and non-ASCII must flow through without crashing and land in the
    documented zero/absent buckets."""
    from toshi_spark.pipeline.training import (
        dsir_weights,
        fuzzy_contamination,
    )

    docs = spark.createDataFrame(
        [(0, None), (1, ""), (2, "héllo wörld naïve café breve über"),
         (3, "plain ascii words repeated words here")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100, "plain ascii words repeated words here")],
        "doc_id long, text string",
    )
    w = {r["doc_id"]: r for r in dsir_weights(docs, target).collect()}
    # every input doc keeps a row; null/empty have no features
    assert set(w) == {0, 1, 2, 3}
    assert w[0]["n_feats"] == 0 and w[0]["log_weight"] == 0.0
    assert w[1]["n_feats"] == 0
    assert w[3]["log_weight"] > w[2]["log_weight"]

    fz = fuzzy_contamination(docs, target, threshold=0.5).collect()
    flagged = {(r["doc_id"], r["eval_id"]) for r in fz}
    assert (3, 100) in flagged          # the verbatim copy
    assert all(d not in (0, 1) for d, _ in flagged)  # null/empty clean


def test_ngrams_col_matches_python_reference(spark):
    """Property: the Generate-barrier + transform n-gram construction
    equals the obvious Python sliding window for arbitrary token
    lists and n — this function was rewritten twice for the
    CollapseProject pathology (see ngrams_col docstring), so its
    semantics are pinned independently of any plan shape."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from toshi_spark.pipeline.training import ngrams_col, tokens_barrier

    @settings(max_examples=20, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(
        toks=st.lists(
            st.sampled_from(["a", "bb", "ccc", "dd", "e"]),
            min_size=0, max_size=12,
        ),
        n=st.integers(min_value=2, max_value=5),
    )
    def check(toks, n):
        docs = spark.createDataFrame(
            [Row(doc_id=0, text=" ".join(toks))])
        out = (
            tokens_barrier(docs)
            .select(ngrams_col(F.col("_t"), n).alias("g"))
            .collect()[0]["g"]
        )
        expect = [
            " ".join(toks[i:i + n])
            for i in range(len(toks) - n + 1)
        ] if len(toks) >= n else []
        assert out == expect

    check()


def test_fuzzy_contamination_recall_floor(spark):
    """Quantitative recall pin (like embedding_neardup's >=0.9): 40
    planted paraphrase pairs (one token edit on 40-token docs, true
    shingle jaccard ~0.85) must be recalled at >=0.9 by the default
    dials (8 hashes x 4 bands, threshold 0.5); measured recall on
    this corpus is 0.975.  The corpus and hashing are fully
    deterministic, so the measured recall is a fixed number — this
    pins the band/hash dials, not luck."""
    from pyspark.sql import Row
    from toshi_spark.pipeline.training import fuzzy_contamination

    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima",
             "mike", "november", "oscar", "papa", "quebec", "romeo",
             "sierra", "tango"]
    n_pairs = 40
    evals, trains = [], []
    for i in range(n_pairs):
        toks = [words[(i * 7 + j * 3) % len(words)]
                + str((i * 5 + j) % 13) for j in range(40)]
        evals.append(Row(doc_id=1000 + i, text=" ".join(toks)))
        para = list(toks)
        para[5] = "swapped" + str(i)
        trains.append(Row(doc_id=i, text=" ".join(para)))
    docs = spark.createDataFrame(trains)
    ev = spark.createDataFrame(evals)
    out = fuzzy_contamination(docs, ev, threshold=0.5).collect()
    flagged = {(r["doc_id"], r["eval_id"]) for r in out}
    recall = sum(
        (i, 1000 + i) in flagged for i in range(n_pairs)
    ) / n_pairs
    assert recall >= 0.9, f"recall {recall} over {sorted(flagged)}"


def test_fuzzy_contamination_artifact_path_identical(spark):
    """The precomputed eval artifact must give bit-identical results
    to the direct eval_docs path."""
    from pyspark.sql import Row
    from toshi_spark.pipeline.training import (
        eval_contamination_artifact,
        fuzzy_contamination,
    )

    base = ("the quick brown fox jumps over the lazy dog while "
            "seven wizards brew strong potions at midnight")
    docs = _docs(spark, [
        base,
        base.replace("midnight", "noon"),
        "completely unrelated text about trains and stations here",
    ])
    ev = spark.createDataFrame([Row(doc_id=100, text=base)])
    direct = sorted(
        tuple(r) for r in fuzzy_contamination(docs, ev,
                                              threshold=0.5).collect()
    )
    bands, shingles = eval_contamination_artifact(ev)
    via_artifact = sorted(
        tuple(r) for r in fuzzy_contamination(
            docs, eval_artifact=(bands.persist(), shingles.persist()),
            threshold=0.5,
        ).collect()
    )
    assert direct == via_artifact and len(direct) == 2


def test_score_thresholds_approx_path_within_rank_error(spark):
    """Oracle for the crawl-scale sketch path (round-6 stretch): the
    driver gate pins exact=True (hash equality needs exactness), so
    the exact=False percentile_approx path gets its own DuckDB-backed
    attestation here.  percentile_approx guarantees rank error
    <= 1/accuracy; the assertion brackets Spark's approx threshold
    between the exact corpus values at ranks (p - eps) and (p + eps),
    computed independently by DuckDB on the same parquet — a
    tolerance-banded oracle rather than hash equality."""
    import duckdb
    from toshi_spark.pipeline.textstats import quality_score
    from toshi_spark.pipeline.training import score_thresholds

    sf_dir = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    scored = quality_score(docs, keep_cols=("lang",))
    accuracy = 1000
    approx = {
        r["lang"]: r["threshold"]
        for r in score_thresholds(
            scored, keep_rate=0.7, score_col="quality",
            group_col="lang", keep="upper", exact=False,
            accuracy=accuracy,
        ).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    # exact per-group quality values, recomputed from first principles
    rows = con.sql("""
WITH arr AS (
  SELECT doc_id, lang, text,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS a
  FROM documents
),
q AS (
  SELECT lang, round(
    (CASE WHEN len(a) BETWEEN 10 AND 5000 THEN 0.5 ELSE 0.0 END)
    + least(CASE WHEN len(a) > 0 THEN
        len(list_filter(a, t -> list_contains(
          ['the','a','of','and','in','to','is','it','that','for'], t)))
        * 1.0 / len(a) ELSE 0.0 END * 5.0, 0.3)
    - least(CASE WHEN length(text) > 0 THEN
        (length(text) - length(regexp_replace(lower(text),
                                              '[^a-z0-9]', '', 'g')))
        * 1.0 / length(text) ELSE 0.0 END, 0.2), 4) AS quality
  FROM arr
)
SELECT lang, list_sort(list(quality)) AS vals FROM q GROUP BY lang
""").fetchall()
    p, eps = 0.3, 1.0 / accuracy
    for lang, vals in rows:
        n = len(vals)
        lo = vals[max(0, int((p - eps) * n) - 1)]
        hi = vals[min(n - 1, int((p + eps) * n) + 1)]
        got = approx[lang]
        assert lo - 1e-9 <= got <= hi + 1e-9, (
            f"{lang}: approx {got} outside exact rank band "
            f"[{lo}, {hi}] (n={n})"
        )
