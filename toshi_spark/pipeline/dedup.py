"""Deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design notes for 100 TB:
- exact dedup is a hash groupBy (map-side partial agg → one shuffle of
  (hash, id) pairs, not documents).
- MinHash signatures are computed entirely JVM-side: tokens → word
  shingles (higher-order array ops) → per-hash min of md5(i:shingle).
  No UDF, no shuffle until the band join.
- LSH banding turns all-pairs similarity into an equi-join on
  (band_id, band_hash): the classic trick that makes near-dup
  detection linear-ish in corpus size.  The band join IS the shuffle;
  skewed buckets (boilerplate text) can be capped via
  ``max_bucket_size``.
- SimHash packs a 32-bit signature with per-bit weighted sums —
  one explode + one groupBy (partial-agg friendly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

TOKENIZE_PATTERN = "[^a-z0-9]+"


def _cut_lineage(df: DataFrame) -> DataFrame:
    """Eagerly materialize ``df`` and truncate its lineage.

    ``localCheckpoint`` stores NON-replicated blocks: fast, but an
    executor loss after the cut is unrecoverable (the lineage needed to
    recompute is gone) — fatal for a long connected-components loop on
    a real cluster.  When the session has a checkpoint directory
    configured (``sc.setCheckpointDir``), use RELIABLE checkpointing
    (HDFS/object-store backed, survives executor loss) instead; local
    mode and ad-hoc sessions keep the cheap local path.

    Storage note: Spark does not delete reliable checkpoint data by
    itself — a long-lived session running repeated dedups accumulates
    files under the checkpoint dir.  Set
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (Spark's
    GC-driven cleaner) or periodically clear the directory between
    jobs; intermediate rounds' files are safe to delete once the final
    labels have been consumed.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint()


def tokens_col(text_col: str = "text") -> Column:
    """ASCII-lowered token array (JVM-side analyzer for pipeline ops)."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKENIZE_PATTERN),
        lambda t: t != "",
    )


def shingles_col(tokens: Column, k: int = 3) -> Column:
    """Word k-gram shingles: slice windows joined by a space."""
    n = F.size(tokens)
    return F.when(n >= k, F.transform(
        F.sequence(F.lit(0), n - k),
        lambda j: F.array_join(F.slice(tokens, j + 1, k), " "),
    )).otherwise(F.array(F.array_join(tokens, " ")))


def hashed_shingle_sets(
    df: DataFrame,
    toks_col: str,
    k: int = 3,
    out_col: str = "sh",
    keep: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(keep…, out_col): per-row DISTINCT hashed-shingle array built
    from per-token xxhash64s — the shingle STRING is never built.

    Set sizes and intersections are invariant under any injective map
    of the shingles, and every consumer compares hashed sets from THIS
    function on both sides of a pair, so exact-Jaccard verification is
    unchanged up to a ~n²/2⁶⁴ per-pair collision (the same odds the
    previous xxhash64-of-string form already accepted).  What changes
    is the cost: the string form copied every token k times and joined
    them into a fresh string per window; here each token hashes once
    (behind a Generate barrier, so the map cannot be inlined into the
    per-window lambda) and each window combines k fixed-width longs.
    Docs with fewer than k tokens fold their whole token-hash array
    into one chained xxhash64 (the analogue of the one whole-doc
    shingle the string form emits)."""
    th = df.select(
        *keep,
        F.explode(F.array(
            F.transform(F.col(toks_col), lambda t: F.xxhash64(t))
        )).alias("_th"),
    )
    n = F.size(F.col("_th"))
    win = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda j: F.xxhash64(
            *[F.get(F.col("_th"), j + F.lit(i)) for i in range(k)]
        ),
    )
    whole = F.array(F.aggregate(
        F.col("_th"), F.lit(k).cast("long"),
        lambda acc, h: F.xxhash64(acc, h),
    ))
    return th.select(
        *keep,
        F.array_distinct(
            F.when(n >= k, win).otherwise(whole)
        ).alias(out_col),
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(content_hash, keeper, n_copies): one row per distinct content."""
    return (
        docs.groupBy(
            F.md5(F.encode(F.col(text_col), "utf-8")).alias("content_hash")
        )
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n_copies"))
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    shingle_k: int = 3,
    toks_col: str | None = None,
) -> DataFrame:
    """Per-doc MinHash signature columns mh_0..mh_{n-1} (bigints).

    ``toks_col`` — pre-tokenized column on ``docs`` (the shared
    analyzed-corpus artifact): skips the scan-side re-tokenize.

    Double hashing (Broder): ONE md5 per token yields two 28-bit ints;
    shingle hashes combine k of them with an integer polynomial
    (h1 base 131, h2 base 137 forced odd); family member i is
    ``h1 + i·h2`` (fits signed 64-bit for i ≤ ~100 — no overflow
    divergence between engines).  8× cheaper than hashing per family.

    The whole computation is ARRAY-SIDE per document — token md5s,
    k-gram polynomial combine (null-safe ``F.get`` pads short docs'
    head window with zeros, matching the previous window-based
    semantics bit-for-bit), and per-family ``array_min`` — so the
    operator is map-only with ZERO shuffles.  The previous
    posexplode + lead()-window + groupBy form shuffled every token
    twice; at crawl scale that exchange was the whole cost, and even
    at bench scale the rewrite is ~2× faster end-to-end.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(toks_col) if toks_col is not None
         else tokens_col(text_col)).alias("_toks"),
    )
    return _signatures_from_tokens(base, n_hashes, shingle_k)


def add_minhash_cols(
    docs: DataFrame,
    toks_col: str,
    n_hashes: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Append mh_0..mh_{n-1} signature columns to ``docs`` — map-only,
    every existing column passes through (so a fused per-doc profile
    can carry the signature without a join-back, which would be a
    doc_id exchange).  Docs with an EMPTY/NULL token array get NULL
    signatures (the row-dropping form below filters them instead; the
    composed oracles LEFT JOIN, so both conventions agree)."""
    zero = F.lit(0).cast("long")
    # ONE md5 per token: the md5 map runs inside a single nested
    # transform whose inner array is evaluated once, and the result
    # lands behind a Generate barrier (explode of a 1-element array)
    # so CollapseProject cannot substitute the map into the h1/h2
    # consumers below — the previous two-column form re-evaluated the
    # md5 transform once per half (a second full crypto pass over
    # every token of the corpus).
    mh_ab = F.transform(
        F.transform(F.col(toks_col),
                    lambda t: F.md5(F.encode(t, "utf-8"))),
        lambda s: F.struct(
            F.conv(F.substring(s, 1, 7), 16, 10).cast("long").alias("a"),
            F.conv(F.substring(s, 9, 7), 16, 10).cast("long").alias("b"),
        ),
    )
    with_m = docs.select(
        "*", F.explode(F.array(mh_ab)).alias("_mh_ab")
    )
    with_h = with_m.withColumns({
        "_mh_a": F.transform(F.col("_mh_ab"), lambda s: s["a"]),
        "_mh_b": F.transform(F.col("_mh_ab"), lambda s: s["b"]),
    })
    # complete k-windows only (0..n-k), except the head window of a
    # shorter-than-k doc, whose missing terms pad with 0
    idxs = F.sequence(
        F.lit(0),
        F.greatest(F.size("_mh_a") - F.lit(shingle_k), F.lit(0)),
    )

    def poly(arr: str, mult: int):
        def h(j):
            acc = None
            for t in range(shingle_k):
                v = F.coalesce(F.get(F.col(arr), j + F.lit(t)), zero)
                acc = v if acc is None else (
                    acc * F.lit(mult).cast("long") + v
                )
            return acc

        return F.transform(idxs, lambda j: h(j))

    sh = with_h.withColumns({
        "_mh_h1": poly("_mh_a", 131),
        "_mh_h2": F.transform(
            poly("_mh_b", 137), lambda x: x.bitwiseOR(F.lit(1).cast("long"))
        ),
    })
    nonempty = F.size(F.col(toks_col)) > 0
    out = sh.withColumns({
        f"mh_{i}": F.when(
            nonempty,
            F.array_min(
                F.zip_with(
                    F.col("_mh_h1"), F.col("_mh_h2"),
                    lambda x, y: x + F.lit(i).cast("long") * y,
                )
            ),
        )
        for i in range(n_hashes)
    })
    return out.drop("_mh_ab", "_mh_a", "_mh_b", "_mh_h1", "_mh_h2")


def _signatures_from_tokens(
    toks: DataFrame, n_hashes: int, shingle_k: int
) -> DataFrame:
    """MinHash signature kernel over a (doc_id, _toks) table — split
    out so a fused pipeline (``minhash_dedup``) can tokenize ONCE and
    feed both the signature and the shingle-verify stages from the
    same persisted token table instead of re-scanning the corpus."""
    base = toks.filter(F.size("_toks") > 0)
    out = add_minhash_cols(base, "_toks", n_hashes, shingle_k)
    return out.select("doc_id", *[f"mh_{i}" for i in range(n_hashes)])


def band_buckets(
    signatures: DataFrame, n_hashes: int, n_bands: int
) -> DataFrame:
    """(doc_id, band, bucket): each signature's n_bands band keys —
    bucket = STRUCT of the band's minhashes themselves.

    Bucket identity is all downstream consumers use (size cap, equi-
    join), and any injective image of the minhash tuple yields the
    same collisions — md5-of-concat was paying a crypto hash per
    (doc, band) and shuffling/probing 32-char strings where r longs
    compare field-wise (measured ~0.4 s off the candidate chain at
    50k docs, pair set identical).

    ONE explode, not an n_bands-way union: each union branch would
    re-evaluate the upstream signature plan (map-only, no exchange to
    reuse) — measured as an ~8× recompute of the signature kernel
    when a downstream self-join doubles it again."""
    rows_per_band = n_hashes // n_bands
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.struct(*[
                F.col(f"mh_{b * rows_per_band + r}").alias(f"v{r}")
                for r in range(rows_per_band)
            ]).alias("bucket"),
        )
        for b in range(n_bands)
    ])
    return signatures.select(
        "doc_id", F.explode(band_structs).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    n_hashes: int = 8,
    n_bands: int = 4,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Band the signatures and self-join buckets → candidate (a, b) pairs.

    rows_per_band = n_hashes / n_bands; a pair collides if any band's
    concatenated minhashes match.  Buckets above ``max_bucket_size``
    (boilerplate) are dropped — the standard skew guard; at 100 TB this
    is what keeps one "lorem ipsum" bucket from producing 10^12 pairs.
    """
    banded = band_buckets(signatures, n_hashes, n_bands)
    sized = banded.withColumn(
        "bucket_n",
        F.count("*").over(Window.partitionBy("band", "bucket")),
    ).filter(F.col("bucket_n") <= max_bucket_size)
    a = sized.select("band", "bucket", F.col("doc_id").alias("a"))
    b = sized.select("band", "bucket", F.col("doc_id").alias("b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
    tokens: DataFrame | None = None,
) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard.

    ``tokens`` — optional pre-tokenized (doc_id, _toks) table (e.g. the
    one the signature stage already computed, persisted): shingles are
    derived from it instead of re-scanning + re-tokenizing ``docs``.

    Per-doc DISTINCT shingle ARRAYS joined to the pair table twice
    (a-side, b-side), then |A∩B| = ``size(array_intersect(..))`` as a
    single map-side expression per pair (JVM hash-set, O(|A|+|B|)) and
    |A∪B| = |A|+|B|−|A∩B|.  No (pair, shingle) explode: the previous
    form shipped one row per (pair, shingle) through a join + groupBy
    — same bytes, ~|shingles| more rows, and one extra shuffle — and
    was the bench's slowest stage (4.2-6.3 s → this form ~halves it).
    Only candidate pairs are verified (LSH prunes the quadratic
    blowup), and only candidate DOCS are shingled — the semi-join
    keeps the verify cost proportional to the candidate set, not the
    corpus.
    """
    # persist the (small, bounded) pair table: it feeds both the
    # doc-restriction and the per-pair join below, and recomputing it
    # means re-running the whole MinHash+LSH pipeline per reference
    candidates = candidates.select("a", "b").persist()
    # no .distinct(): LEFT SEMI dedupes the probe side by construction,
    # and the distinct's exchange was a measurable extra stage
    cand_ids = candidates.select(
        F.explode(F.array(F.col("a"), F.col("b"))).alias(id_col)
    )
    if tokens is not None:
        base = tokens.join(
            cand_ids.withColumnRenamed(id_col, "doc_id"),
            "doc_id", "left_semi",
        )
    else:
        base = docs.join(cand_ids, id_col, "left_semi").select(
            F.col(id_col).alias("doc_id"),
            tokens_col(text_col).alias("_toks"),
        )
    # one shingle-array row per candidate doc; persist so the doc scan
    # + tokenize runs ONCE across the two pair-side joins (the verify
    # working set, sized by candidate docs — spills rather than OOMs).
    # Shingle sets are hashed-long sets from per-token hashes
    # (hashed_shingle_sets): |A∩B| / |A| / |B| are preserved under any
    # injective mapping (a 64-bit collision inside one candidate
    # pair's ~10² shingles is ~10²·10²/2⁶⁴ ≈ 1e-16 per pair — below
    # any realistic corpus event), the verify rows shrink ~2.5×
    # (8-byte elements vs shingle strings), and the shingle string is
    # never even built.
    sh = hashed_shingle_sets(base, "_toks", shingle_k).persist()
    # size-ratio prefilter (exact-safe): J = I/(|A|+|B|−I) with
    # I ≤ min(|A|,|B|) implies J ≤ min/max, so any pair with
    # min < t·max cannot reach the threshold — drop it BEFORE the
    # shingle arrays are joined on.  The size table is two longs per
    # candidate doc (the arrays' payload is what the verify joins
    # shuffle), and the 1e-9 slack keeps boundary pairs when t·max
    # rounds up in floating point (sizes are integers, so no
    # legitimately-passing pair sits within 1e-9 of the boundary).
    sizes = sh.select("doc_id", F.size("sh").alias("_n"))
    slim = (
        candidates.join(
            sizes.select(F.col("doc_id").alias("a"),
                         F.col("_n").alias("_na")), "a")
        .join(
            sizes.select(F.col("doc_id").alias("b"),
                         F.col("_n").alias("_nb")), "b")
        .filter(
            F.least("_na", "_nb").cast("double")
            >= F.lit(float(threshold)) * F.greatest("_na", "_nb")
            - F.lit(1e-9)
        )
        .select("a", "b")
    )
    # the intersect lands behind a Generate barrier (explode of a
    # 1-element array): without it, predicate pushdown folds the
    # jaccard filter into the verify JOIN's condition while the
    # projection recomputes n_inter — array_intersect evaluated TWICE
    # per candidate pair (measured in the physical plan; the intersect
    # is the per-pair verify cost)
    out = (
        slim.join(
            sh.select(F.col("doc_id").alias("a"),
                      F.col("sh").alias("_sha")), "a")
        .join(
            sh.select(F.col("doc_id").alias("b"),
                      F.col("sh").alias("_shb")), "b")
        .select(
            "a", "b",
            F.size("_sha").alias("_sa"), F.size("_shb").alias("_sb"),
            F.explode(
                F.array(F.size(F.array_intersect("_sha", "_shb")))
            ).alias("n_inter"),
        )
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("_sa") + F.col("_sb") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 4).alias("jaccard"))
    )
    # materialize the (small) verified pairs eagerly so the two
    # intermediates can be RELEASED — returning a lazy plan over them
    # would pin both cache entries for the context's lifetime, leaking
    # a shingle table per invocation
    out = _cut_lineage(out)
    candidates.unpersist()
    sh.unpersist()
    return out


def minhash_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    n_bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
    tokens: DataFrame | None = None,
) -> DataFrame:
    """Full near-dup pipeline: signatures → LSH candidates → Jaccard.

    Fused: the corpus is scanned and tokenized ONCE into a persisted
    (doc_id, _toks) working set feeding both the signature kernel and
    the shingle-verify stage — the two-pass form re-ran the scan +
    tokenize per stage, which at crawl scale doubles the dominant I/O
    and was the measured bulk of the bench's slowest query.  The token
    table is MEMORY_AND_DISK via persist(): at 100 TB it spills rather
    than OOMs, and the trade (disk for a second full scan + tokenize)
    is the standard one for materialized dedup intermediates.

    ``tokens`` — ALREADY-MATERIALIZED (doc_id, _toks) table (the
    shared analyzed-corpus artifact): no persist here and no
    unpersist of a frame the caller owns; ``docs`` is then unused.
    """
    own_toks = tokens is None
    if own_toks:
        toks = docs.select(
            F.col(id_col).alias("doc_id"),
            tokens_col(text_col).alias("_toks"),
        ).persist()
    else:
        toks = tokens.select("doc_id", "_toks")
    sigs = _signatures_from_tokens(toks, n_hashes, shingle_k)
    cands = lsh_candidate_pairs(sigs, n_hashes, n_bands)
    out = ngram_jaccard_pairs(
        docs, cands, id_col, text_col, shingle_k, threshold,
        tokens=toks,
    )
    # out is eagerly materialized (_cut_lineage) — safe to release
    if own_toks:
        toks.unpersist()
    return out


def simhash_col(tokens: Column, bits: int = 32) -> Column:
    """SimHash signature as a pure COLUMN expression over a token array.

    The classic formulation sums ±tf per bit over DISTINCT tokens; but
    Σ_distinct tf·(±1) ≡ Σ_occurrences (±1), so the tf-weighted bit
    sums reduce to per-bit counts over the RAW token array:

        s_b = 2·|{i : bit_b(h(tok_i)) = 1}| − n

    Token hash = first 8 hex chars of md5 (32 bits), computed ONCE per
    token by a single ``transform`` (the fold below only does integer
    bit tests, so md5 is never re-evaluated per bit); all ``bits``
    counters accumulate in one ``aggregate`` pass.  Map-only — the
    previous explode + groupBy(doc, tok) + groupBy(doc) form shuffled
    every token of the corpus twice to compute what never leaves its
    row.
    """
    hashes = F.transform(
        tokens,
        lambda t: F.conv(
            F.substring(F.md5(F.encode(t, "utf-8")), 1, 8), 16, 10
        ).cast("long"),
    )
    counters = F.aggregate(
        hashes,
        F.struct(*[F.lit(0).alias(f"c{b}") for b in range(bits)]),
        lambda acc, h: F.struct(
            *[
                (acc[f"c{b}"]
                 + F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("int")
                 ).alias(f"c{b}")
                for b in range(bits)
            ]
        ),
    )
    n = F.size(tokens)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        # s_b > 0  ⇔  2·c_b − n > 0
        sig = sig + F.when(
            counters[f"c{b}"] * 2 > n, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0))
    return sig


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """Per-doc SimHash signature (bigint): sign of tf-weighted bit sums.

    Docs whose token array is empty hash to 0 (no bit sum is positive),
    matching the previous groupBy form's absence-of-rows semantics only
    for non-empty docs — empty docs now get an explicit 0 row, which is
    the more useful contract for a map-only operator.
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        simhash_col(tokens_col(text_col), bits).alias("simhash"),
    )


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 20,
    local_threshold: int = 200_000,
) -> DataFrame:
    """Connected components over near-dup candidate pairs →
    (doc_id, cluster_id) with cluster_id = min doc id in the component.

    This is the step a dedup pipeline needs AFTER pair generation
    (MinHash-LSH / SimHash / embedding bands): transitive closure so
    A≈B, B≈C collapse into one cluster and one survivor (min id) can
    be kept.  Pairwise filters alone under-delete chains.

    Min-label propagation: every vertex starts labeled with itself;
    each round takes the min label over the 1-hop neighborhood;
    converges in O(component diameter) rounds — near-dup components
    are short chains in practice, so a handful of rounds.  Each round
    is ONE join + ONE partial-aggregated groupBy on the edge list
    (both sides hash-partitioned on vertex id — at crawl scale this is
    the standard alternating-star shape, skew-safe because candidate
    generation already caps bucket sizes upstream).  Lineage is cut
    every round (``_cut_lineage``: reliable checkpoint when the session
    has a checkpoint dir, else localCheckpoint) so the driver loop does
    not compound plans; the convergence check piggybacks on the same
    action that materializes the round's labels (one job per round,
    no extra pass).
    """
    # Size-gated local solve (the broadcast-join principle applied to
    # connected components): a graph of ≤ local_threshold edges — a
    # RUNTIME probe via limit(), not a config — is solved on the driver
    # with union-find-by-min, which yields exactly the min-label
    # components the distributed loop converges to.  Every round of the
    # loop costs ~4 jobs + 2 lineage cuts regardless of size (measured
    # 3.8 s for a 2.5k-edge graph whose labels fit in a dict), while
    # 200k edges are ~3 MB of driver memory.  Larger edge lists take
    # the distributed loop unchanged.
    head = (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .limit(local_threshold + 1)
        .collect()
    )
    if len(head) <= local_threshold and all(
        isinstance(r["a"], int) and isinstance(r["b"], int) for r in head
    ):
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in head:
            u, v = r["a"], r["b"]
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                if rv < ru:
                    ru, rv = rv, ru
                # union by MIN id: the root IS the component minimum,
                # matching the distributed min-label fixed point
                parent[rv] = ru
        rows = sorted((v, find(v)) for v in parent)
        return pairs.sparkSession.createDataFrame(
            rows, "doc_id long, cluster_id long"
        )

    # single-pass symmetrization (explode, not a self-union — a union
    # would evaluate the upstream pair pipeline twice)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(a_col).alias("u"), F.col(b_col).alias("v")),
                    F.struct(F.col(b_col).alias("u"), F.col(a_col).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("u").alias("v_id"))
        .distinct()
        .withColumn("label", F.col("v_id"))
    )
    labels = _cut_lineage(labels)
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges["v"] == labels["v_id"])
            .groupBy("u")
            .agg(F.min("label").alias("nl"))
        )
        stepped = (
            labels.join(neigh, labels["v_id"] == neigh["u"], "left")
            .select(
                "v_id",
                F.col("label").alias("old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nl"), F.col("label"))
                ).alias("label"),
            )
        )
        stepped = _cut_lineage(stepped)
        # pointer jumping: label ← label(label).  Each round then halves
        # the remaining propagation distance, so convergence is
        # O(log diameter) rounds — a 2^20-long chain fits in the default
        # max_iter instead of silently timing out at diameter 20.
        lab_map = stepped.select(
            F.col("v_id").alias("m_v"), F.col("label").alias("m_l")
        )
        jumped = (
            stepped.join(lab_map, stepped["label"] == lab_map["m_v"],
                         "left")
            .select(
                "v_id",
                "old",
                F.least(
                    F.col("label"), F.coalesce(F.col("m_l"), F.col("label"))
                ).alias("label"),
            )
        )
        jumped = _cut_lineage(jumped)
        changed = jumped.filter(F.col("label") != F.col("old")).count()
        labels = jumped.select("v_id", "label")
        if changed == 0:
            break
    else:
        edges.unpersist()
        raise RuntimeError(
            f"dedup_clusters did not converge within max_iter={max_iter} "
            "rounds — returning partial labels would split components "
            "and under-deduplicate; raise max_iter"
        )
    edges.unpersist()
    return labels.select(
        F.col("v_id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    para_tokens: int = 12,
) -> DataFrame:
    """Paragraph-level exact dedup (the CCNet/Gopher web-pipeline
    stage: boilerplate paragraphs repeat across pages far more often
    than whole pages do, so dedup below document granularity recovers
    unique content page-level dedup cannot).

    Documents are split on single spaces into fixed-width
    ``para_tokens``-token paragraphs (a deterministic stand-in for
    newline paragraphs, which the synthetic corpus lacks); only the
    globally FIRST occurrence of each distinct paragraph — ordered by
    (doc_id, para_idx) — is retained.  Returns one row per input doc:

        (doc_id, n_paras, n_kept, kept_text)

    where ``kept_text`` is the surviving paragraphs re-joined in
    original order ('' when every paragraph was seen earlier).

    Scale shape: split/slice/posexplode are map-only whole-stage
    codegen; the first-occurrence choice is a ``min(struct)`` groupBy
    on the paragraph hash (map-side partial agg — duplicate-heavy
    corpora collapse BEFORE the shuffle, so the exchange carries one
    row per distinct paragraph) followed by one hash-join back and a
    map-side-combinable groupBy(doc).  No windows, no driver state; a
    boilerplate paragraph repeated a billion times is one row after
    partial aggregation, so key skew is absorbed map-side.
    """
    paras = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
            .alias("_t"),
        )
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.ceil(
                            F.size("_t") / F.lit(float(para_tokens))
                        ).cast("int")
                        - 1,
                    ),
                    lambda i: F.array_join(
                        F.slice(
                            F.col("_t"),
                            i * para_tokens + 1,
                            para_tokens,
                        ),
                        " ",
                    ),
                )
            ).alias("para_idx", "para"),
        )
    )
    # first occurrence per distinct paragraph content; join on a pair
    # of xxhash64 fingerprints (16 fixed-width bytes, ~2⁻¹²⁸ collision
    # — the window-fingerprint convention above) rather than the
    # paragraph text, and encode the (doc_id, para_idx) order key as
    # ONE long: min(struct) is not hash-aggregable and forced a
    # SortAggregate (two extra per-partition sorts of the paragraph
    # stream); the long keeps it a HashAggregate with map-side partial
    # agg.  2^30 paragraphs per doc bounds para_idx by construction.
    occ_key = (F.col("doc_id") * F.lit(1 << 30) + F.col("para_idx"))
    firsts = (
        paras.groupBy(
            F.xxhash64("para").alias("_p1"),
            F.xxhash64("para", F.lit(1)).alias("_p2"),
        )
        .agg(F.min(occ_key).alias("_first_key"))
    )
    marked = paras.withColumns({
        "_p1": F.xxhash64("para"),
        "_p2": F.xxhash64("para", F.lit(1)),
    }).join(firsts, ["_p1", "_p2"]).withColumn(
        "_kept", occ_key == F.col("_first_key")
    )
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_paras"),
        F.sum(F.col("_kept").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_kept"),
                            F.struct("para_idx", "para"),
                        )
                    )
                ),
                lambda s: s["para"],
            ),
            " ",
        ).alias("kept_text"),
    )


def substring_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Exact substring-level dedup (the ExactSubstr stage of Lee et
    al. 2021, "Deduplicating Training Data Makes Language Models
    Better": any >= k-token span that appears verbatim elsewhere in
    the corpus is removed, keeping the globally first occurrence).

    The paper builds one suffix array over the concatenated corpus —
    a global sort, inherently sequential to query.  The distributed
    equivalent fingerprints every k-token window and works on the
    duplicate stream only:

      1. windows: every k-token window per doc as (doc_id, pos,
         fingerprint(window)) — map-only flatMap fused into the scan
         (two xxhash64-combine keys over per-token hashes; see below).
      2. lexicon: groupBy(hash) -> (occurrences, first occurrence by
         min(struct(doc_id, pos))), filtered to occurrences >= 2.
         This is the ONE corpus-scale shuffle; map-side partial agg
         collapses boilerplate-heavy corpora before the exchange, and
         the paper's suffix array needs a strictly heavier global
         sort of the same token stream.
      3. duplicate windows: hash-join windows against the lexicon
         (count >= 2) and drop the canonical first occurrence.  The
         join key is the 16-byte fingerprint pair, so the lexicon side
         is fixed-width; AQE broadcasts it when small.
      4. spans: merge each doc's duplicate windows [pos, pos+k-1]
         into maximal contiguous duplicated regions (overlapping OR
         adjacent windows fuse).  Runs on the duplicate stream only
         — two windows + a groupBy over rows that are typically a
         tiny fraction of the corpus, partitioned by doc_id.
      5. clean: left-join spans back to docs (spans table << corpus)
         and drop covered token positions with a map-only
         higher-order filter; no per-token shuffle.

    Window width ``k`` is the paper's 50-token dial (default 8 here:
    the synthetic docs average ~50 tokens).  Docs shorter than k
    tokens produce no windows and pass through unchanged.

    Returns one row per input doc:
        (doc_id, n_tokens, n_spans, dup_tokens, clean_text)
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.coalesce(F.col(text_col), F.lit("")), " ").alias("_t"),
    )
    # Window fingerprints from per-token hashes, never window STRINGS:
    # the old form array_join'd + md5'd every k-token window, copying
    # every token k times and crypto-hashing ~k·corpus bytes.  Here
    # each token hashes ONCE (two independent xxhash64s, behind a
    # Generate barrier so CollapseProject cannot inline the maps into
    # the per-window lambda), and each window combines k fixed-width
    # longs with xxhash64.  Two independent 64-bit keys ≈ 128-bit
    # equality: window-group identity is preserved up to a ~2⁻¹²⁸
    # cross-window collision (the hashed-shingle convention; md5 was
    # already a fingerprint, just a slower one).
    from .training import _gram_fp_col

    hashed = toks.select(
        "doc_id",
        F.explode(F.array(F.struct(
            F.transform("_t", lambda t: F.xxhash64(t)).alias("h1"),
            F.transform("_t", lambda t: F.xxhash64(t, F.lit(1)))
            .alias("h2"),
        ))).alias("_ha"),
    )
    wins = hashed.select(
        "doc_id",
        F.posexplode(
            F.zip_with(
                _gram_fp_col(F.col("_ha.h1"), k),
                _gram_fp_col(F.col("_ha.h2"), k),
                lambda a, b: F.struct(a.alias("f1"), b.alias("f2")),
            )
        ).alias("pos", "_w"),
    ).select("doc_id", "pos", F.col("_w.f1").alias("_h1"),
             F.col("_w.f2").alias("_h2"))
    # first-occurrence key encoded as ONE long (doc_id * 2^30 + pos)
    # instead of min(struct(...)): structs are not hash-aggregable,
    # and a SortAggregate here would per-partition-sort the whole
    # corpus window stream; the long keeps the aggregation a
    # HashAggregate with map-side partial agg.  2^30 token positions
    # per doc is the same per-doc bound the block codec assumes.
    occ_key = (F.col("doc_id") * F.lit(1 << 30) + F.col("pos"))
    lexicon = (
        wins.groupBy("_h1", "_h2")
        .agg(
            F.count("*").alias("_occ"),
            F.min(occ_key).alias("_first_key"),
        )
        .where(F.col("_occ") >= 2)
    )
    dup = (
        wins.join(lexicon, ["_h1", "_h2"])
        .where(occ_key != F.col("_first_key"))
    )
    # maximal-span merge: classic islands — a window starts a new
    # island iff its start exceeds (running max end of earlier
    # windows) + 1, i.e. it neither overlaps nor touches the region
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    islands = (
        dup.select("doc_id", "pos", (F.col("pos") + (k - 1)).alias("_e"))
        .withColumn(
            "_prev_max",
            F.max("_e").over(w_doc.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn(
            "_new",
            (F.col("_prev_max").isNull()
             | (F.col("pos") > F.col("_prev_max") + 1)).cast("long"),
        )
        .withColumn("_isl", F.sum("_new").over(w_doc))
    )
    spans = (
        islands.groupBy("doc_id", "_isl")
        .agg(F.min("pos").alias("s"), F.max("_e").alias("e"))
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("s", "e")).alias("_spans"),
            F.count("*").alias("n_spans"),
            F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"),
        )
    )
    cleaned = (
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
                            lambda x, i: F.struct(
                                x.alias("tok"), i.alias("i")
                            ),
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
    )
    return cleaned
