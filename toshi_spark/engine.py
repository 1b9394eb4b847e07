"""The search engine: index handle + query lifecycle.

Spark rebuild of ``LocalIndex::search_index``
(``toshi-server/src/handle.rs:77-161``): build collectors (top-k,
optional sorted-top-k, optional facet counter), lower the DSL to an
executable query, run, fetch stored docs, assemble SearchResults.

Lifecycle mapping (SURVEY.md §3.1): JSON DSL → dataclass tree (IR #1)
→ DataFrame program (IR #2 = Catalyst logical plan) → Catalyst
optimizes → distributed execute → driver-side top-k merge & doc fetch.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from .index.builder import IndexTables, build_index
from .query.compiler import Compiler
from .query.dsl import AllQuery, Search, parse_search
from .schema import IndexSchema, QueryError


@dataclass
class ScoredDoc:
    score: float | None
    doc: dict[str, Any]


@dataclass
class SearchResults:
    """Mirror of ``toshi-types/src/client.rs:27-55`` — mergeable results."""

    hits: int
    docs: list[ScoredDoc]
    facets: list[dict[str, Any]] = dc_field(default_factory=list)

    def get_docs(self) -> list[ScoredDoc]:
        return self.docs

    def get_facets(self) -> list[dict[str, Any]]:
        return self.facets

    def to_json(self) -> dict[str, Any]:
        return {
            "hits": self.hits,
            "docs": [{"score": d.score, "doc": d.doc} for d in self.docs],
            "facets": self.facets,
        }

    def __add__(self, other: "SearchResults") -> "SearchResults":
        # scatter-gather merge (client.rs:37-55): concatenation; the
        # distributed top-k already happened inside Spark.
        return SearchResults(
            hits=self.hits + other.hits,
            docs=self.docs + other.docs,
            facets=self.facets + other.facets,
        )


class FullTextIndex:
    """One named index: schema + corpus row store + inverted-index tables."""

    def __init__(
        self,
        spark: SparkSession,
        schema: IndexSchema,
        corpus: DataFrame,
        tables: IndexTables,
        id_col: str = "doc_id",
        name: str = "index",
    ):
        self.spark = spark
        self.schema = schema
        self.corpus = corpus
        self.tables = tables
        self.id_col = id_col
        self.name = name
        # opt-in doc-sharded postings copy (index/bucketed.py): set by
        # enable_doc_bucketed(); the compiler routes multi-term leaf
        # scans here so phrase/bool intersections group by doc_id
        # without a corpus-scale Exchange
        self.doc_bucketed = None

    # convenience accessors used by the compiler
    @property
    def postings(self) -> DataFrame:
        return self.tables.postings

    @property
    def doclens(self) -> DataFrame:
        return self.tables.doclens

    @property
    def termstats(self) -> DataFrame:
        return self.tables.termstats

    @property
    def fieldstats(self) -> DataFrame:
        return self.tables.fieldstats

    @property
    def n_docs(self) -> int:
        return self.tables.n_docs

    def enable_doc_bucketed(
        self,
        path: str,
        n_term_partitions: int = 16,
        n_buckets: int = 32,
    ) -> "FullTextIndex":
        """Write the doc-sharded postings copy (one write-time shuffle)
        and route multi-term queries through it — see
        index/bucketed.py for the layout and the cost model."""
        from .index.bucketed import write_doc_bucketed

        self.doc_bucketed = write_doc_bucketed(
            self.tables.postings,
            path,
            table=f"toshi_docb_{self.name}",
            n_term_partitions=n_term_partitions,
            n_buckets=n_buckets,
        )
        return self

    def attach_doc_bucketed(self, path: str) -> "FullTextIndex":
        """Attach a doc-sharded copy WRITTEN BY A PRIOR SESSION
        (metadata-only DDL; bucket spec from the layout sidecar) —
        write once at ingest, attach at every open."""
        from .index.bucketed import attach_doc_bucketed

        self.doc_bucketed = attach_doc_bucketed(self.spark, path)
        return self

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        corpus: DataFrame,
        schema: IndexSchema,
        id_col: str = "doc_id",
        name: str = "index",
        cache: bool = True,
        quantize_fieldnorms: bool = False,
        cache_partitions: int | None = None,
    ) -> "FullTextIndex":
        text_fields = [f.name for f in schema.text_fields()]
        tables = build_index(
            corpus, id_col=id_col, text_fields=text_fields, cache=cache,
            tokenizers={f.name: f.tokenizer for f in schema.text_fields()},
            quantize_fieldnorms=quantize_fieldnorms,
            cache_partitions=cache_partitions,
        )
        if cache:
            # the cached row store obeys the same partition rule as the
            # index tables (see build_index's cache_partitions doc)
            if (cache_partitions is not None
                    and cache_partitions < corpus.rdd.getNumPartitions()):
                corpus = corpus.repartition(cache_partitions)
            corpus = corpus.persist()
        return cls(spark, schema, corpus, tables, id_col=id_col, name=name)

    # ------------------------------------------------------------- search

    def search_df(self, search: Search,
                  scored: DataFrame | None = None) -> DataFrame:
        """Compile + rank; returns (score, doc_id, <stored fields>) DF.

        Ordering/limit are applied; the DataFrame is collect-ready but
        still lazy (used directly by the driver-contract ``queries()``).
        ``scored`` optionally supplies an already-compiled (doc_id,
        score) set — ``search()`` shares one compile between the top-k
        and the facet collector.
        """
        if search.query is None:
            raise QueryError("Empty Query Provided")  # handle.rs:158-160
        if scored is None:
            search.query.validate()
            scored = Compiler(self).compile(search.query)

        sort_spec = self.schema.get(search.sort_by) if search.sort_by else None
        corpus = self.corpus.alias("c")
        if (
            sort_spec is not None
            and sort_spec.fast
            and sort_spec.stored
            and sort_spec.ftype == "u64"
        ):
            # top-k by fast field: returned "score" IS the field value
            # (handle.rs:82-92,127-134); silent fallback otherwise.
            ranked = (
                scored.select("doc_id")
                .alias("s")
                .join(corpus, F.col("s.doc_id") == F.col(f"c.{self.id_col}"))
                .select(
                    F.col(f"c.{sort_spec.name}").cast("double").alias("score"),
                    F.col("s.doc_id").alias("doc_id"),
                )
                .orderBy(F.col("score").desc(), F.col("doc_id").asc())
                .limit(search.limit)
            )
        else:
            ranked = scored.orderBy(
                F.col("score").desc(), F.col("doc_id").asc()
            ).limit(search.limit)
        # doc fetch: k rows vs row store → broadcast the k winners
        # (handle.rs:127-144 doc-fetch join)
        fetched = F.broadcast(ranked.alias("r")).join(
            corpus, F.col("r.doc_id") == F.col(f"c.{self.id_col}")
        )
        stored_cols = [
            F.col(f"c.{f.name}").alias(f.name)
            for f in self.schema.fields
            if f.stored
        ]
        return fetched.select(
            F.col("r.score").alias("score"),
            F.col("r.doc_id").alias("doc_id"),
            *stored_cols,
        ).orderBy(F.col("score").desc(), F.col("doc_id").asc())

    def facet_counts(self, search: Search,
                     scored: DataFrame | None = None) -> list[dict[str, Any]]:
        """Facet counting with the reference's first-value extraction quirk.

        Only the FIRST requested facet path is extracted into the
        response (``handle.rs:146-155`` uses ``values()[0]``); counts are
        per immediate child path, sorted by path (term order).
        ``scored`` reuses an already-compiled matched set (one compile,
        one postings scan for top-k AND facets — recompiling would scan
        the postings twice per faceted search).
        """
        if search.facets is None:
            return []
        fq = search.facets
        spec = self.schema.get(fq.field)
        if spec is None or spec.ftype != "facet":
            return []  # handle.rs:95-105: silently no facet collector
        if not fq.values:
            return []
        if scored is None:
            scored = Compiler(self).compile(search.query or AllQuery())
        prefix = fq.values[0].rstrip("/")
        depth = len([p for p in prefix.split("/") if p]) + 1
        matched = scored.select("doc_id").alias("s").join(
            self.corpus.alias("c"),
            F.col("s.doc_id") == F.col(f"c.{self.id_col}"),
        )
        child = F.concat(
            F.lit("/"),
            F.array_join(
                F.slice(F.split(F.col(f"c.{fq.field}"), "/"), 2, depth), "/"
            ),
        )
        counts = (
            matched.filter(F.col(f"c.{fq.field}").startswith(prefix + "/"))
            .select(child.alias("facet_child"))
            .groupBy("facet_child")
            .agg(F.count("*").alias("value"))
            .orderBy("facet_child")
            .collect()
        )
        return [{"field": r["facet_child"], "value": r["value"]} for r in counts]

    def search(self, search: Search) -> SearchResults:
        # with facets requested, compile ONCE and persist the matched
        # set: both collectors (top-k, facet counter) reuse it instead
        # of re-scanning the postings (VERDICT r2 #6)
        scored = None
        if search.facets is not None and search.query is not None:
            search.query.validate()
            scored = Compiler(self).compile(search.query).persist()
        try:
            df = self.search_df(search, scored=scored)
            rows = df.collect()
            facets = (
                self.facet_counts(search, scored=scored)
                if search.facets else []
            )
        finally:
            if scored is not None:
                scored.unpersist()
        stored_names = [f.name for f in self.schema.fields if f.stored]

        def render(v):
            # FlatNamedDocument (toshi-types/src/query/mod.rs:322-338):
            # multi-valued stored fields collapse to a scalar when
            # single-valued, else render as an array
            if isinstance(v, list):
                return v[0] if len(v) == 1 else v
            return v

        docs = [
            ScoredDoc(
                score=float(r["score"]),
                doc={n: render(r[n]) for n in stored_names},
            )
            for r in rows
        ]
        return SearchResults(hits=len(docs), docs=docs, facets=facets)

    def search_json(self, body: dict[str, Any]) -> SearchResults:
        """POST /{index} equivalent: JSON body → results.

        Missing query → substituted all_docs (handlers/search.rs:17).
        """
        if "query" not in body or body.get("query") is None:
            body = {**body, "query": None}  # parse_query(None) → AllQuery
        return self.search(parse_search(body))
