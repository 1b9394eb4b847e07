"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force baseline — one broadcast of the
  query vector, JVM-side zip_with/aggregate dot products, distributed
  TakeOrdered top-k.  At 100 TB this scans everything (the correctness
  baseline).
- ``rh_signatures`` / ``lsh_cosine_topk``: the scale path — random
  hyperplane LSH.  Plane coefficients are ±1 derived deterministically
  from md5 parity (reproducible on any engine, incl. the SQL oracle);
  vectors hash to a ``n_planes``-bit bucket; queries only score their
  own bucket (optionally multi-probe neighbors at hamming distance 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec: list[float] | None = None,
) -> DataFrame:
    """Exact cosine top-k vs one stored vector (brute force).

    ``query_vec`` optionally supplies the query embedding as driver-side
    values — the scoring pass then inlines it (and its norm) as
    LITERALS, so the plan is a single map-over-scan + distributed top-k
    with no broadcast subplan to schedule.  Callers that already hold
    the vector (e.g. the IVF probe) should pass it; the default path
    reads it from the candidate set via a 1-row broadcast.
    """
    v = _as_double(F.col(vec_col))
    if query_vec is None:
        qvec = emb.filter(F.col(id_col) == query_vec_id).select(
            _as_double(F.col(vec_col)).alias("qe")
        )
        base = emb.crossJoin(F.broadcast(qvec))
        qe = F.col("qe")
        qnorm = F.sqrt(_dot(qe, qe))
    else:
        base = emb
        qe = F.array(*[F.lit(float(x)) for x in query_vec])
        # same left-to-right fold as the SQL aggregate
        acc = 0.0
        for x in query_vec:
            acc += float(x) * float(x)
        qnorm = F.lit(acc ** 0.5)
    scored = base.select(
        F.col(id_col).alias("vec_id"),
        (_dot(v, qe) / (F.sqrt(_dot(v, v)) * qnorm)).alias("cos_sim"),
    )
    return (
        scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", F.round("cos_sim", 4).alias("cos_sim"))
    )


def plane_coef(p, i):
    """Deterministic ±1 coefficient for plane p, dimension i (md5 parity)."""
    first_byte = F.conv(
        F.substring(
            F.md5(F.encode(F.concat_ws(":", p.cast("string"),
                                       i.cast("string")), "utf-8")),
            1, 2,
        ),
        16, 10,
    ).cast("int")
    return F.when(first_byte % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def _plane_matrix(n_planes: int, dim: int):
    """±1 plane coefficients from md5 parity — the same deterministic
    rule as ``plane_coef`` (and the SQL oracle), computed driver-side."""
    import hashlib

    import numpy as np

    return np.array(
        [
            [
                1.0
                if int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:2], 16)
                % 2 == 0
                else -1.0
                for i in range(dim)
            ]
            for p in range(n_planes)
        ]
    )


def rh_signatures(
    emb: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket): random-hyperplane sign bucket per vector.

    Plane p's projection = Σ_i coef(p,i)·v[i]; bit p = projection > 0.

    Computed as a ``mapInArrow`` numpy matmul: each Arrow batch's
    vectors become one (n × dim) matrix, ``V @ P.T`` gives all plane
    projections at once, and the sign bits pack into the bucket —
    zero shuffle, zero intermediate rows.  The previous column-algebra
    form (posexplode rows×dim + broadcast plane join + two groupBys)
    materialized ~dim× the input; at 100 TB that intermediate IS the
    job, so the batched kernel is the scale shape.

    The embedding dimension is inferred INSIDE the kernel per batch
    (plane matrix memoized per dim on each worker) — no driver-side
    ``.first()`` action before the real job.
    """
    import numpy as np
    import pyarrow as pa

    weights = (np.int64(1) << np.arange(n_planes, dtype=np.int64))

    out_schema = pa.schema(
        [pa.field("vec_id", pa.int64()), pa.field("bucket", pa.int64())]
    )

    def kernel(batches):
        import pyarrow.compute as pc

        planes_by_dim: dict[int, np.ndarray] = {}
        expect_dim: int | None = None
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            ids = b.column(0).to_numpy(zero_copy_only=False).astype("int64")
            lists = b.column(1)
            # exact per-row validation: a divisibility check alone lets
            # a null/ragged column whose flattened size happens to
            # divide n reshape silently into WRONG buckets (silent
            # recall loss); check row lengths + nulls explicitly, and
            # pin the dim across batches of this partition
            if lists.null_count:
                raise ValueError(
                    f"embedding column has {lists.null_count} null "
                    "vector(s); drop or impute them before hashing"
                )
            lens = pc.list_value_length(lists).to_numpy(
                zero_copy_only=False
            )
            dim = int(lens[0])
            if (lens != dim).any():
                bad = int(lens[lens != dim][0])
                raise ValueError(
                    f"ragged embedding column: row lengths {dim} and "
                    f"{bad} in one batch"
                )
            if expect_dim is None:
                expect_dim = dim
            elif dim != expect_dim:
                raise ValueError(
                    f"embedding dim changed across batches: "
                    f"{expect_dim} then {dim}"
                )
            flat = lists.flatten().to_numpy(zero_copy_only=False)
            if dim not in planes_by_dim:
                planes_by_dim[dim] = _plane_matrix(n_planes, dim).T
            v = flat.astype(np.float64, copy=False).reshape(n, dim)
            proj = v @ planes_by_dim[dim]  # (n, n_planes)
            buckets = ((proj > 0).astype(np.int64) * weights).sum(axis=1)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()),
                 pa.array(buckets, type=pa.int64())],
                schema=out_schema,
            )

    return emb.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col)
    ).mapInArrow(kernel, "vec_id long, bucket long")


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 48,
    n_bands: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = 100_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via BANDED LSH blocking.

    All-pairs cosine is O(n²) scans at 100 TB; random-hyperplane
    buckets make it an equi-join (same shape as MinHash-LSH for text).
    A single AND of all bits has hopeless recall — at cos=0.95 a true
    pair agrees on one bit w.p. 1−θ/π ≈ 0.899, so 16 bits collide w.p.
    0.899^16 ≈ 0.18.  Banding ORs n_bands groups of r = n_planes/n_bands
    bits (exactly the MinHash-LSH construction in
    dedup.lsh_candidate_pairs): with the default 6 bands × 8 bits,
    a cos=0.95 pair collides w.p. 1−(1−0.899⁸)⁶ ≈ 0.96 while a RANDOM
    pair collides w.p. ≈ 6/2⁸ ≈ 2% — the band width r is the
    precision dial (r=4 would make every 16th random pair a candidate
    and the verify join quadratic-ish; r=8 keeps candidates ~linear).
    Only same-(band, sub-bucket) pairs get an exact cosine, then filter
    ≥ threshold; buckets above ``max_bucket_size`` are dropped
    (boilerplate skew guard).  Returns (a, b, cos_sim).
    """
    if n_planes % n_bands:
        raise ValueError("n_planes must be divisible by n_bands")
    r = n_planes // n_bands
    mask = (1 << r) - 1
    sigs = rh_signatures(emb, n_planes, id_col, vec_col)
    # One explode, not a union of n_bands selects — a union re-evaluates
    # the signature kernel (a full corpus scan) once per band.
    band_structs = F.array(*[
        F.struct(
            F.lit(band).alias("band"),
            F.shiftright(F.col("bucket"), band * r).bitwiseAND(
                F.lit(mask).cast("long")
            ).alias("bb"),
        )
        for band in range(n_bands)
    ])
    banded = (
        sigs.select("vec_id", F.explode(band_structs).alias("x"))
        .select("vec_id", F.col("x.band").alias("band"),
                F.col("x.bb").alias("bb"))
    )
    # bucket-size skew cap via groupBy + BROADCAST join back: the
    # (band, bb) count table is bounded by n_bands·2^r rows (the bit-
    # bucket space is fixed by the parameters, NOT by corpus size), so
    # the broadcast is scale-safe — unlike the previous
    # Window.partitionBy(band, bb) count, which shuffled AND sorted
    # every banded row just to attach a per-bucket count.
    ok_buckets = (
        banded.groupBy("band", "bb")
        .agg(F.count("*").alias("_bn"))
        .filter(F.col("_bn") <= max_bucket_size)
        .select("band", "bb")
    )
    sized = banded.join(F.broadcast(ok_buckets), ["band", "bb"])
    a = sized.select("band", "bb", F.col("vec_id").alias("a"))
    b = sized.select("band", "bb", F.col("vec_id").alias("b"))
    # NO .distinct() on the candidate stream: band collisions rarely
    # repeat across bands, so the distinct removed almost nothing yet
    # exchanged the full (quadratic-in-bucket-size) pair stream.  The
    # exact cosine is computed per occurrence map-side (identical
    # expression → identical value), the ≥threshold filter shrinks the
    # stream to the true near-dups, and the dedup runs on THAT
    # output-sized set instead.
    pairs = (
        a.join(b, ["band", "bb"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    # per-VECTOR norms hoisted out of the per-pair expression: one norm
    # fold per vector instead of two per candidate pair (the fold is
    # interpreted — at 5M candidates × dim 128 that is the verify cost)
    ea = emb.select(F.col(id_col).alias("a"),
                    _as_double(F.col(vec_col)).alias("va"))
    ea = ea.select("a", "va",
                   F.sqrt(_dot(F.col("va"), F.col("va"))).alias("na"))
    eb = emb.select(F.col(id_col).alias("b"),
                    _as_double(F.col(vec_col)).alias("vb"))
    eb = eb.select("b", "vb",
                   F.sqrt(_dot(F.col("vb"), F.col("vb"))).alias("nb"))
    joined = pairs.join(ea, "a").join(eb, "b")
    # NOTE: predicate pushdown folds the ≥threshold filter into the
    # verify join's condition, and the projection recomputes cos_sim
    # for SURVIVORS — at this threshold survivors are ~0, so the
    # "double" evaluation is effectively single.  The Generate-barrier
    # form used by the jaccard verifies (which keeps the expression
    # evaluated once but materializes every candidate row through an
    # extra operator) was measured 0.3 s SLOWER here — the pushed-down
    # condition doubles as an in-join row filter, which wins when the
    # pass rate is tiny.
    cos = joined.select(
        "a", "b",
        (
            _dot(F.col("va"), F.col("vb"))
            / (F.col("na") * F.col("nb"))
        ).alias("cos_sim"),
    )
    return cos.filter(F.col("cos_sim") >= threshold).select(
        "a", "b", F.round("cos_sim", 4).alias("cos_sim")
    ).distinct()


def _collect_centroids(emb_with_cell: DataFrame, vec_col: str):
    """cell means → {cell: numpy vector}.

    One mapInArrow pass emits PER-PARTITION partial sums (cell, n,
    sum-vector) — at most k_cells rows per partition — which the driver
    combines in numpy.  The collect is metadata-scale (partitions ×
    k_cells × dim, like fieldstats); the old posexplode form
    materialized a rows×dim intermediate, the exact shape the LSH
    signature kernel eliminated ("at 100 TB that intermediate IS the
    job").
    """
    import numpy as np
    import pyarrow as pa

    out_schema = pa.schema(
        [
            pa.field("cell", pa.int64()),
            pa.field("n", pa.int64()),
            pa.field("s", pa.list_(pa.float64())),
        ]
    )

    def kernel(batches):
        acc: dict[int, tuple[int, "np.ndarray"]] = {}
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            cells = b.column(0).to_numpy(zero_copy_only=False).astype("int64")
            flat = b.column(1).flatten().to_numpy(zero_copy_only=False)
            dim = flat.size // n
            v = flat.astype(np.float64, copy=False).reshape(n, dim)
            for c in np.unique(cells):
                mask = cells == c
                cnt, s = acc.get(int(c), (0, np.zeros(dim)))
                acc[int(c)] = (cnt + int(mask.sum()), s + v[mask].sum(axis=0))
        if not acc:
            return
        ks = sorted(acc)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ks, type=pa.int64()),
                pa.array([acc[c][0] for c in ks], type=pa.int64()),
                pa.array([acc[c][1].tolist() for c in ks],
                         type=pa.list_(pa.float64())),
            ],
            schema=out_schema,
        )

    partials = (
        emb_with_cell.select(F.col("cell").cast("long"), F.col(vec_col))
        .mapInArrow(kernel, "cell long, n long, s array<double>")
        .collect()
    )
    totals: dict[int, tuple[int, "np.ndarray"]] = {}
    for r in partials:
        cnt, s = totals.get(int(r["cell"]), (0, None))
        sv = np.asarray(r["s"], dtype=np.float64)
        totals[int(r["cell"])] = (
            cnt + int(r["n"]), sv if s is None else s + sv
        )
    return {c: s / max(cnt, 1) for c, (cnt, s) in totals.items()}


def _assign_cells(emb: DataFrame, centroids: dict, id_col: str,
                  vec_col: str) -> DataFrame:
    """(vec_id, cell): nearest centroid by cosine (ties → smallest cell
    id) via one mapInArrow matmul per batch."""
    import numpy as np
    import pyarrow as pa

    cell_ids = np.array(sorted(centroids), dtype=np.int64)
    C = np.stack([centroids[int(c)] for c in cell_ids])  # (k, dim)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
    dim = C.shape[1]

    def kernel(batches):
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            ids = b.column(0).to_numpy(zero_copy_only=False).astype("int64")
            flat = b.column(1).flatten().to_numpy(zero_copy_only=False)
            v = flat.astype(np.float64, copy=False).reshape(n, dim)
            vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True),
                                1e-300)
            sims = vn @ Cn.T  # (n, k); argmax takes the FIRST max → the
            # smallest cell id wins ties (cell_ids is sorted)
            best = cell_ids[np.argmax(sims, axis=1)]
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()),
                 pa.array(best, type=pa.int64())],
                names=["vec_id", "cell"],
            )

    return emb.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col)
    ).mapInArrow(kernel, "vec_id long, cell long")


def ivf_assign(
    emb: DataFrame,
    k_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 1,
):
    """IVF coarse quantizer: deterministic seeded k-means.

    Seeding is data-defined (cell = pmod(vec_id, k_cells) → cell means)
    so the whole construction — seed centroids, ``n_iter`` Lloyd
    refinements, final assignment — is reproducible on any engine,
    including the SQL oracle (which replicates the default
    ``n_iter=1``).  Returns (assignment DF (vec_id, cell), refined
    centroids dict) — the centroids are metadata (k_cells × dim),
    broadcast to the probe step.

    ``n_iter`` is the build-quality dial: each extra iteration is one
    more full assignment + centroid pass over the corpus and tightens
    the cells (higher recall at fixed nprobe — measured recall/nprobe
    rows in BASELINE.md).  A cell that empties out simply drops from
    the centroid dict, as in a standard Lloyd run.

    Scale shape: assignment is a mapInArrow matmul per batch; centroid
    (re)computation is a map-side partial-sum kernel collected as
    ≤ k_cells rows — the classic IVF build, one pass per iteration.
    """
    seeded = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col),
        F.pmod(F.col(id_col).cast("long"), F.lit(k_cells)).alias("cell"),
    )
    c = _collect_centroids(seeded, vec_col)
    for _ in range(max(n_iter, 0)):
        a = _assign_cells(emb, c, id_col, vec_col)
        with_cell = emb.select(
            F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col)
        ).join(a, "vec_id")
        c = _collect_centroids(with_cell, vec_col)
    return _assign_cells(emb, c, id_col, vec_col), c


def ivf_cluster(
    emb: DataFrame,
    assign: DataFrame,
    k_cells: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """The IVF SERVING artifact: vectors co-located by cell (FAISS
    inverted lists).  A probe then reads only the probed cells'
    partitions/batches instead of semi-joining ids across the whole
    corpus — at 100 TB this is the difference between scanning
    nprobe/k_cells of the data and shuffling all of it.  Persist (or
    write partitioned by ``cell``) and hand to ``ivf_topk``."""
    vec_col = [c for c in emb.columns if c != id_col][0]
    return (
        emb.join(assign, emb[id_col] == assign["vec_id"])
        .select(assign["vec_id"], emb[vec_col], assign["cell"])
        .repartition(k_cells, "cell")
    )


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    k_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: tuple | None = None,
    clustered: DataFrame | None = None,
) -> DataFrame:
    """ANN via IVF: probe the nprobe cells whose centroids are nearest
    the query (cosine, ties → smallest cell id), exact cosine inside.

    ``index`` optionally supplies a prebuilt ``ivf_assign(...)`` result
    — the IVF structure is an INDEX artifact (built once, served many
    times), so query paths should not pay the k-means build per query.

    At 100 TB only ~nprobe/k_cells of the corpus is scanned; the
    centroid table is metadata.  Brute-force `cosine_topk` is the
    recall baseline; this is the scale path alongside the LSH variant.

    Cell ranking happens DRIVER-SIDE (the blockmax job-1 pattern): the
    centroids are already a ≤k_cells driver-side dict, so the only
    cluster work before the probe is ONE pushed-filter collect of the
    1-row query vector — metadata-scale, like a dictionary lookup.
    The probed cell ids and the query vector then inline as LITERALS:
    the probe job is filter(assign) → semi-join → map → top-k with no
    broadcast subplans to schedule (a crossJoin+orderBy+limit centroid
    subplan added ~1 s of pure scheduling overhead per query at local
    scale, and its exchanges would be dead weight on a cluster too).
    """
    assign, centroids = (
        index if index is not None
        else ivf_assign(emb, k_cells, id_col, vec_col)
    )
    spark = emb.sparkSession
    qrows = emb.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qe")
    ).head(1)
    if not qrows:
        raise ValueError(
            f"query_vec_id {query_vec_id} not found in {id_col}"
        )
    q = [float(x) for x in qrows[0]["qe"]]
    ranked = []
    for c, v in sorted(centroids.items()):
        dot = 0.0
        sq = 0.0
        for x, y in zip(q, v):  # same fold as the SQL aggregate
            dot += x * float(y)
            sq += float(y) * float(y)
        ranked.append((-(dot / (sq ** 0.5 + 1e-300)), int(c)))
    cells = [c for _, c in sorted(ranked)[:nprobe]]
    if clustered is not None:
        # inverted-list path: ONE fused filter+score stage over the
        # cell-clustered table; the `vec_id == query` OR keeps the
        # query row a candidate even if a float tie ever ranked its
        # own cell out (same safeguard as the oracle's OR vec_id = q)
        cand = clustered.filter(
            F.col("cell").isin(cells)
            | (F.col("vec_id") == query_vec_id)
        ).select(F.col("vec_id").alias(id_col), vec_col)
        return cosine_topk(cand, query_vec_id, k, id_col, vec_col,
                           query_vec=q)
    probe_ids = assign.filter(
        F.col("cell").isin(cells)
    ).select("vec_id")
    # the query vector itself always qualifies
    cand_ids = probe_ids.unionByName(
        spark.createDataFrame([(int(query_vec_id),)], "vec_id long")
    )
    # broadcast the candidate ids: without the hint the semi-join
    # shuffles the FULL embedding table on vec_id — at 100 TB that
    # shuffle is the whole corpus, while the probed ids are ~nprobe/
    # k_cells of it (cells are sized ~sqrt(n) in a real deployment)
    cand = emb.join(
        F.broadcast(cand_ids), emb[id_col] == cand_ids["vec_id"],
        "left_semi"
    )
    return cosine_topk(cand, query_vec_id, k, id_col, vec_col,
                       query_vec=q)


def lsh_cosine_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multi_probe: bool = False,
) -> DataFrame:
    """ANN: score only vectors sharing the query's LSH bucket.

    ``multi_probe=True`` additionally probes every bucket at hamming
    distance 1 from the query's (flip each plane bit) — the standard
    recall/cost dial: candidates grow ~(n_planes+1)×, still a tiny
    fraction of the corpus.
    """
    sigs = rh_signatures(emb, n_planes, id_col, vec_col)
    qb = sigs.filter(F.col("vec_id") == query_vec_id).select(
        F.col("bucket").alias("qbucket")
    )
    probes = qb.select(F.col("qbucket").alias("probe"))
    if multi_probe:
        flips = [
            qb.select(
                F.col("qbucket").bitwiseXOR(
                    F.lit(1 << p).cast("long")
                ).alias("probe")
            )
            for p in range(n_planes)
        ]
        for fdf in flips:
            probes = probes.unionByName(fdf)
    cand_ids = (
        sigs.join(F.broadcast(probes), sigs["bucket"] == probes["probe"],
                  "left_semi")
        .select(F.col("vec_id").alias("cand_id"))
    )
    cand = emb.join(cand_ids, emb[id_col] == cand_ids["cand_id"],
                    "left_semi")
    return cosine_topk(cand, query_vec_id, k, id_col, vec_col)
