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


def test_contamination_fingerprint_equals_md5_gram_form(spark):
    """The xxhash64-pair gram keys must flag exactly what md5'd gram
    STRINGS flagged (short docs, repeated grams, other-length eval
    grams that may never match)."""
    from toshi_spark.pipeline.training import (
        contamination, ngrams_col, tokens_barrier,
    )

    docs = spark.createDataFrame(
        [
            (0, "a b c d e a b c d e"),
            (1, "a b c d e f g h i j"),          # shares 5-grams w/ 0? (n=4)
            (2, "x y z"),                        # shorter than n
            (3, ""),                             # empty
            (4, "a b c d a b c d a b c d"),      # repeated grams
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [("a b c d",), ("q r s t",), ("too short",), ("e f g h",)],
        "gram string",
    )
    got = contamination(docs, ev, n=4).orderBy("doc_id")

    # reference: the old md5-string form, inline
    base = tokens_barrier(docs, "doc_id", "text")
    grams = base.select(
        "doc_id", ngrams_col(F.col("_t"), 4).alias("_grams")
    )
    ev_h = ev.select(
        F.md5(F.encode("gram", "utf-8")).alias("_gh")
    ).distinct()
    hits = (
        grams.select("doc_id", F.explode("_grams").alias("gram"))
        .withColumn("_gh", F.md5(F.encode("gram", "utf-8")))
        .join(F.broadcast(ev_h), "_gh")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    n_toks = F.size(F.col("_t"))
    per_doc = base.select(
        "doc_id",
        F.when(n_toks >= 4, n_toks - 3).otherwise(F.lit(0))
        .cast("long").alias("n_grams"),
    )
    want = (
        per_doc.join(hits, "doc_id", "left")
        .select(
            "doc_id", "n_grams",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )
    assert _rows(got) == _rows(want)


def test_substring_dedup_fingerprint_equals_md5_form(spark):
    """Window fingerprints (xxhash64 pair over token hashes) must pick
    the same lexicon groups, spans and clean text as md5'd window
    strings."""
    from pyspark.sql import Window
    from toshi_spark.pipeline.dedup import substring_dedup

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "something else entirely here the quick brown fox jumps over the lazy dog today"),
            (2, "short doc"),
            (3, "the quick brown fox jumps over the lazy dog today"),
        ],
        "doc_id long, text string",
    )
    got = substring_dedup(docs, k=4).orderBy("doc_id")

    # reference: old md5-window form, inline
    k = 4
    toks = docs.select(
        "doc_id",
        F.split(F.coalesce(F.col("text"), F.lit("")), " ").alias("_t"),
    )
    wins = toks.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.size("_t") >= k,
                F.transform(
                    F.sequence(F.lit(0), F.size("_t") - k),
                    lambda i: F.md5(
                        F.encode(
                            F.array_join(F.slice("_t", i + 1, k), " "),
                            "utf-8",
                        )
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos", "_h"),
    )
    occ_key = (F.col("doc_id") * F.lit(1 << 30) + F.col("pos"))
    lex = (
        wins.groupBy("_h")
        .agg(F.count("*").alias("_occ"), F.min(occ_key).alias("_fk"))
        .where(F.col("_occ") >= 2)
    )
    dup = wins.join(lex, "_h").where(occ_key != F.col("_fk"))
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    islands = (
        dup.select("doc_id", "pos", (F.col("pos") + (k - 1)).alias("_e"))
        .withColumn("_pm", F.max("_e").over(
            w_doc.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("_new", (F.col("_pm").isNull()
                             | (F.col("pos") > F.col("_pm") + 1))
                    .cast("long"))
        .withColumn("_isl", F.sum("_new").over(w_doc))
    )
    spans = (
        islands.groupBy("doc_id", "_isl")
        .agg(F.min("pos").alias("s"), F.max("_e").alias("e"))
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("s", "e")).alias("_spans"),
             F.count("*").alias("n_spans"),
             F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"))
    )
    want = (
        toks.join(spans, "doc_id", "left")
        .select(
            "doc_id",
            F.size("_t").cast("long").alias("n_tokens"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long")
            .alias("dup_tokens"),
            F.array_join(
                F.transform(
                    F.filter(
                        F.transform(
                            "_t",
                            lambda x, i: F.struct(x.alias("tok"),
                                                  i.alias("i")),
                        ),
                        lambda s: ~F.coalesce(
                            F.exists(
                                "_spans",
                                lambda sp: (s["i"] >= sp["s"])
                                & (s["i"] <= sp["e"]),
                            ),
                            F.lit(False),
                        ),
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("clean_text"),
        )
        .orderBy("doc_id")
    )
    assert _rows(got) == _rows(want)


def test_struct_band_buckets_equal_md5_buckets(spark):
    """Struct-of-minhash buckets must produce the identical candidate
    pair set as md5-of-concat buckets (bucket identity is all that is
    consumed)."""
    from pyspark.sql import Window
    from toshi_spark.pipeline.dedup import (
        _signatures_from_tokens, lsh_candidate_pairs, tokens_col,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} common tokens shared by many docs number {i % 3}")
         for i in range(60)],
        "doc_id long, text string",
    )
    toks = docs.select(
        "doc_id", tokens_col("text").alias("_toks"))
    sigs = _signatures_from_tokens(toks, 8, 3)
    got = lsh_candidate_pairs(sigs, 8, 4)

    # reference: md5 banding inline
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.encode(
                F.concat_ws("|", f"mh_{2 * b}", f"mh_{2 * b + 1}"),
                "utf-8")).alias("bucket"),
        )
        for b in range(4)
    ])
    banded = sigs.select(
        "doc_id", F.explode(band_structs).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))
    sized = banded.withColumn(
        "bucket_n",
        F.count("*").over(Window.partitionBy("band", "bucket")),
    ).filter(F.col("bucket_n") <= 1000)
    a = sized.select("band", "bucket", F.col("doc_id").alias("a"))
    b = sized.select("band", "bucket", F.col("doc_id").alias("b"))
    want = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    assert _rows(got) == _rows(want)


def test_bigram_zip_forms_equal_ngrams_col(spark):
    """The two-slice zip bigram builders must emit exactly the windows
    ngrams_col(toks, 2) emits — values AND order — including 0/1-token
    docs (empty array)."""
    from toshi_spark.pipeline.training import (
        _bigram_grams_col, _bigram_pairs_col, ngrams_col, tokens_col,
    )

    docs = spark.createDataFrame(
        [(0, "a b c d e"), (1, "solo"), (2, ""), (3, "x y"),
         (4, "r r r r r r")],
        "doc_id long, text string",
    )
    t = tokens_col(F.col("text"))
    out = docs.select(
        "doc_id",
        ngrams_col(t, 2).alias("ref"),
        _bigram_grams_col(t).alias("grams"),
        F.transform(
            _bigram_pairs_col(t),
            lambda s: F.concat(s["w1"], F.lit(" "), s["w2"]),
        ).alias("pairs_joined"),
    ).collect()
    for r in out:
        assert r["grams"] == r["ref"], (r["doc_id"], r["grams"], r["ref"])
        assert r["pairs_joined"] == r["ref"], r["doc_id"]


def test_minhash_md5_once_bit_identity(spark):
    """The Generate-barrier md5-once signature kernel must reproduce
    the double-hash family bit-for-bit against an independent Python
    reference (hashlib + integer polynomials)."""
    import hashlib

    from toshi_spark.pipeline.dedup import minhash_signatures, tokens_col

    docs = spark.createDataFrame(
        [(i, f"w{i % 5} alpha beta w{i % 3} gamma delta epsilon zeta")
         for i in range(30)] + [(99, "a b")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: [r[f"mh_{i}"] for i in range(8)]
           for r in minhash_signatures(docs, n_hashes=8).collect()}
    toks = {r["doc_id"]: r["t"]
            for r in docs.select(
                "doc_id", tokens_col("text").alias("t")).collect()}
    for d, t in toks.items():
        ab = [(int(hashlib.md5(x.encode()).hexdigest()[:7], 16),
               int(hashlib.md5(x.encode()).hexdigest()[8:15], 16))
              for x in t]
        aa = [a for a, _ in ab]
        bb = [b for _, b in ab]

        def g(arr, j):
            return arr[j] if j < len(arr) else 0

        idxs = range(0, max(len(ab) - 3, 0) + 1)
        h1 = [(g(aa, j) * 131 + g(aa, j + 1)) * 131 + g(aa, j + 2)
              for j in idxs]
        h2 = [(((g(bb, j) * 137 + g(bb, j + 1)) * 137 + g(bb, j + 2)) | 1)
              for j in idxs]
        want = [min(x + i * y for x, y in zip(h1, h2)) for i in range(8)]
        assert got[d] == want, d


def test_parsed_array_literal_is_bit_exact(spark):
    """The array(<repr>D, …) parsed literal (the DSIR LUT path) must
    round-trip every double bit-exactly vs per-element F.lit."""
    import math
    import random

    rng = random.Random(7)
    vals = [rng.uniform(-60, 60) for _ in range(512)] + [
        0.0, -0.0, 1e-300, -1e-300, math.pi, 1 / 3,
    ]
    parsed = F.expr("array(" + ",".join(f"{x!r}D" for x in vals) + ")")
    lit = F.array(*[F.lit(float(x)) for x in vals])
    row = spark.range(1).select(parsed.alias("p"), lit.alias("l")).collect()[0]
    import struct as _s
    assert [_s.pack("d", x) for x in row["p"]] == \
           [_s.pack("d", x) for x in row["l"]]


def test_lm_score_matches_python_reference(spark):
    """The single-join probed-model lm_score (explode_outer spine,
    V-as-literal) vs a brute-force Python bigram LM — including empty
    and 1-token docs (n_bigrams 0, lm_nll 0.0)."""
    import math
    from collections import Counter

    from toshi_spark.pipeline.training import lm_score

    texts = {
        0: "the cat sat on the mat",
        1: "the cat ran",
        2: "solo",
        3: "",
        4: "the cat sat on the mat again and again",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["lm_nll"])
           for r in lm_score(docs).collect()}

    toks = {d: [x for x in t.lower().split() if x] for d, t in texts.items()}
    bigr = {d: list(zip(t, t[1:])) for d, t in toks.items()}
    bc = Counter(b for bs in bigr.values() for b in bs)
    uc = Counter(w for t in toks.values() for w in t)
    v = float(len(uc))
    for d, bs in bigr.items():
        if not bs:
            assert got[d] == (0, 0.0), d
            continue
        nll = [-math.log((bc[b] + 1.0) / (uc[b[0]] + v)) for b in bs]
        assert got[d][0] == len(bs), d
        assert abs(got[d][1] - round(sum(nll) / len(nll), 4)) <= 1e-9, d


def test_jaccard_size_prefilter_is_lossless(spark):
    """The min>=t*max prefilter may only drop pairs that cannot reach
    the threshold — verified pairs must be identical with and without
    it, including exact-boundary ratios (sizes 1:2 at t=0.5)."""
    from toshi_spark.pipeline.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g h"),
            (1, "a b c d e f g h"),            # J=1 with 0
            (2, "a b c d"),                    # subset of 0: |A|=2,|B|=6
            (3, "a b c d e f x y"),            # partial overlap
            (4, "p q r s t u v w"),            # disjoint
        ],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (1, 3), (2, 3)],
        "a long, b long",
    )
    got = ngram_jaccard_pairs(docs, cands, shingle_k=3, threshold=0.5)
    # reference: brute force in python
    import itertools
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    def sh(t):
        tk = [x for x in t.lower().split() if x]
        if len(tk) >= 3:
            return {" ".join(tk[i:i + 3]) for i in range(len(tk) - 2)}
        return {" ".join(tk)}
    want = []
    for a, b in [(0, 1), (0, 2), (0, 3), (0, 4), (1, 3), (2, 3)]:
        A, B = sh(texts[a]), sh(texts[b])
        j = len(A & B) / len(A | B)
        if j >= 0.5:
            want.append((a, b, round(j, 4)))
    assert _rows(got) == sorted(want)
