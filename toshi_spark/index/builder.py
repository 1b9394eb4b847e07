"""Inverted-index build: corpus → postings / doclens / termstats.

Spark-first rebuild of the ingest pipeline described in SURVEY.md §3.2
(reference: ``toshi-server/src/handlers/bulk.rs:56-135`` streams NDJSON
through parse workers into a single Tantivy writer).  Here the "parse
thread pool" is executor parallelism and the single-writer mutex
dissolves into deterministic docId assignment + a shuffle-by-term:

    corpus ──mapInPandas(analyze)──► per-(doc,term) rows   [map-side
      │                                                      partial agg]
      ├─► doclens   (groupBy doc_id — partial agg'd)
      ├─► termstats (groupBy field,term → df — partial agg'd)
      └─► postings  repartition(field, term[, salt]) + sortWithinPartitions
                    → parquet segment sorted by (field, term, doc_id)

Skew: head terms (stopword-like, df ~ N) are salted —
``salt = doc_id % n_salts`` for terms whose df exceeds a threshold —
so no single reducer receives an entire head-term posting run
(north-rule requirement).  Salts merge back at query time with a
cheap re-aggregation (scores are additive per doc).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..analyzer import ANALYZE_SCHEMA, analyze_partition


@dataclass
class IndexTables:
    """In-memory (lazy DataFrame) view of one built index/segment."""

    postings: DataFrame  # field, term, doc_id, tf, positions
    doclens: DataFrame  # doc_id, doc_len
    termstats: DataFrame  # field, term, df
    n_docs: int
    avgdl: float


def analyze_corpus(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    field: str = "text",
) -> DataFrame:
    """corpus → per-(doc, term) rows with tf, positions, doc_len."""
    proj = corpus.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )
    return proj.mapInPandas(
        lambda it: analyze_partition(it, id_col="doc_id", text_col="text", field=field),
        ANALYZE_SCHEMA,
    )


def build_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    field: str = "text",
    cache: bool = True,
) -> IndexTables:
    """Build the three index tables from a corpus DataFrame.

    The analyzed intermediate is cached (it feeds three consumers);
    at segment-write time it is instead persisted to parquet, which is
    the durable equivalent.
    """
    analyzed = analyze_corpus(corpus, id_col, text_col, field)
    if cache:
        analyzed = analyzed.persist()
    postings = analyzed.filter(F.col("tf") > 0).select(
        "field", "term", "doc_id", "tf", "positions"
    )
    doclens = analyzed.groupBy("doc_id").agg(F.max("doc_len").alias("doc_len"))
    termstats = postings.groupBy("field", "term").agg(
        F.count("*").alias("df")
    )
    stats = doclens.agg(
        F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    return IndexTables(
        postings=postings,
        doclens=doclens,
        termstats=termstats,
        n_docs=int(stats["n"]),
        avgdl=float(stats["avgdl"] or 0.0),
    )


def salted_postings(
    postings: DataFrame,
    termstats: DataFrame,
    df_threshold: int,
    n_salts: int = 16,
) -> DataFrame:
    """Add a ``salt`` column: 0 for tail terms, doc_id%n_salts for head terms.

    Head terms (df > threshold) would otherwise hash-partition an entire
    multi-million-doc posting run onto one reducer.  Salting spreads the
    run over ``n_salts`` reducers; the (field, term, salt) grouping is
    what the block encoder and the segment writer operate on.
    """
    heads = termstats.filter(F.col("df") > df_threshold).select("field", "term")
    return (
        postings.join(
            F.broadcast(heads.withColumn("__is_head", F.lit(True))),
            ["field", "term"],
            "left",
        )
        .withColumn(
            "salt",
            F.when(
                F.col("__is_head").isNotNull(),
                (F.col("doc_id") % F.lit(n_salts)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("__is_head")
    )
