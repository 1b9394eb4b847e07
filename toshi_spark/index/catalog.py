"""Index catalog: the control plane over named indexes.

Mirrors Toshi's ``IndexCatalog`` (``toshi-server/src/index.rs:15-19``):
a map of name → index handle with create / list / summary / flush /
refresh, plus the document-mutation surface (add_document,
delete_term) from ``toshi-server/src/handle.rs:162-210`` and the
HTTP handlers in ``handlers/index.rs`` / ``handlers/summary.rs``.

On disk:

    base/<name>/index.json        schema + settings
    base/<name>/manifest.jsonl    committed segments (commit log)
    base/<name>/segments/<id>/    segment payloads
    base/<name>/tombstones/       delete-by-term tombstone parquet

Deletes are tombstones (doc ids), anti-joined at query time —
the Iceberg merge-on-read pattern; compaction folds them in.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..analyzer import analyzer_version
from ..engine import FullTextIndex
from ..schema import FieldSpec, IndexSchema, QueryError
from .builder import IndexTables, build_index
from .segments import (
    Manifest,
    build_segments,
    open_segmented_tables,
    segment_id_for,
    write_segment,
)


# pending buffers above this size parse DISTRIBUTED at flush (the
# driver-side json.loads loop over a staged multi-hundred-MB
# distributed-bulk batch was the last serial parse in the ingest path)
DEFAULT_FLUSH_DISTRIBUTED_BYTES = 16 << 20


class IndexCatalog:
    def __init__(self, spark: SparkSession, base_path: str,
                 flush_distributed_bytes: int =
                 DEFAULT_FLUSH_DISTRIBUTED_BYTES):
        self.spark = spark
        self.base_path = base_path
        self.flush_distributed_bytes = flush_distributed_bytes
        os.makedirs(base_path, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.base_path, name)

    # ------------------------------------------------------------ create

    def create_index(self, name: str, schema: IndexSchema | list[dict],
                     merge_policy: dict | None = None) -> None:
        """PUT /{index}/_create (handlers/index.rs:30-42).

        ``merge_policy`` mirrors the reference settings
        (settings.rs:47-49,190-201): ``{"kind": "log"|"none",
        "min_merge_size": 8, "min_layer_size": 10000,
        "level_log_size": 0.75}``; default is the log policy with the
        reference defaults.  Compaction runs automatically after each
        commit (flush), like Tantivy's writer-attached merge policy.
        """
        if isinstance(schema, list):
            if schema and "ftype" in schema[0]:
                schema = IndexSchema([FieldSpec(**s) for s in schema])
            else:  # Toshi schema-JSON shape {name, type, options}
                schema = IndexSchema.from_json(schema)
        # unknown tokenizer names must fail HERE with the pinned
        # QueryError, not later inside an executor-side analyze kernel
        schema.validate_tokenizers()
        idx_dir = self._dir(name)
        if os.path.exists(os.path.join(idx_dir, "index.json")):
            raise QueryError(f"Index: {name} already exists")
        os.makedirs(idx_dir, exist_ok=True)
        with open(os.path.join(idx_dir, "index.json"), "w") as f:
            json.dump(
                {
                    "name": name,
                    "created_at": time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                    ),
                    "opstamp": 0,
                    "fields": [vars(s) for s in schema.fields],
                    "merge_policy": merge_policy or {"kind": "log"},
                    # indexed terms are DERIVED data: record the
                    # analyzer version each tokenizer produced them
                    # under (for dictionary tokenizers this includes
                    # the dictionary fingerprint), so open() can refuse
                    # an index whose terms no longer match current
                    # query-side analysis
                    "analyzer_versions": {
                        s.tokenizer: analyzer_version(s.tokenizer)
                        for s in schema.text_fields()
                    },
                },
                f,
            )

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._dir(name), "index.json"))

    def _meta(self, name: str) -> dict:
        if not self.exists(name):
            raise QueryError(f"Unknown Index: '{name}' does not exist")
        with open(os.path.join(self._dir(name), "index.json")) as f:
            return json.load(f)

    def _save_meta(self, name: str, meta: dict) -> None:
        with open(os.path.join(self._dir(name), "index.json"), "w") as f:
            json.dump(meta, f)

    def schema(self, name: str) -> IndexSchema:
        meta = self._meta(name)
        return IndexSchema([FieldSpec(**s) for s in meta["fields"]])

    # -------------------------------------------------------------- list

    def list_indexes(self) -> list[str]:
        """GET /_list — sorted, deduped (index.rs:51-56)."""
        out = set()
        for d in os.listdir(self.base_path):
            if os.path.exists(os.path.join(self.base_path, d, "index.json")):
                out.add(d)
        return sorted(out)

    def refresh_catalog(self) -> list[str]:
        """Directory re-scan (index.rs:102-124); stateless here."""
        return self.list_indexes()

    # ------------------------------------------------------------ ingest

    def ingest(
        self,
        name: str,
        corpus: DataFrame,
        id_col: str = "doc_id",
        n_chunks: int = 1,
        fingerprint: str = "v1",
    ) -> int:
        """Bulk ingest: chunked, resumable, all-or-nothing per chunk.

        Mirrors _bulk semantics (handlers/bulk.rs): any failure leaves
        the manifest untouched for the failing chunk (rollback).
        Returns docs ingested.
        """
        schema = self.schema(name)
        # terms are produced NOW, not at create: verify the current
        # analyzer identity (incl. the cang_jie_dict dictionary
        # fingerprint) still matches the create-time stamp, so a
        # set_dictionary() between create and ingest fails the build
        # loudly instead of stamping terms under the wrong identity
        self._check_analyzer_versions(name, schema)
        text_fields = [f.name for f in schema.text_fields()]
        entries = build_segments(
            self.spark, corpus, self._dir(name), id_col=id_col,
            text_fields=text_fields, n_chunks=n_chunks,
            index_name=name, fingerprint=fingerprint,
            tokenizers={f.name: f.tokenizer for f in schema.text_fields()},
        )
        meta = self._meta(name)
        meta["opstamp"] = 0  # commit resets the opstamp (handle.rs:62-70)
        # track the id ceiling so API-added docs (no explicit id — the
        # reference's writer assigns ids) never collide with ingested ids
        max_id = corpus.agg(F.max(F.col(id_col))).collect()[0][0]
        if max_id is not None:
            meta["next_doc_id"] = max(
                int(meta.get("next_doc_id", 0)), int(max_id) + 1
            )
        self._save_meta(name, meta)
        return sum(e.docs for e in entries)

    def add_document(self, name: str, doc: dict[str, Any],
                     commit: bool = False) -> None:
        """Single-doc add (handle.rs:162-182): micro-segment append.

        Without commit=True the doc sits in a staging buffer (pending
        NDJSON) and only becomes visible on flush — mirroring writer
        buffering + ReloadPolicy::OnCommit.
        """
        pending = os.path.join(self._dir(name), "pending.jsonl")
        with open(pending, "a") as f:
            f.write(json.dumps(doc) + "\n")
        meta = self._meta(name)
        meta["opstamp"] = int(meta.get("opstamp", 0)) + 1
        self._save_meta(name, meta)
        if commit:
            self.flush(name)

    def stage_pending_lines(self, name: str, lines: list[str]) -> None:
        """Append pre-validated NDJSON lines to the pending buffer in
        one sequential write (the distributed-bulk staging path: the
        API layer has already parsed+validated every line in a Spark
        job, so re-serializing per doc through add_document would only
        add a driver-side JSON round-trip).  Opstamp advances by one
        per doc, same as per-doc adds."""
        self.stage_pending_stream(name, lines, len(lines))

    def stage_pending_stream(self, name: str, lines, count: int) -> None:
        """Streaming form of :meth:`stage_pending_lines`: ``lines`` is
        any iterable (e.g. a generator over a spilled bulk file), so a
        multi-hundred-MB validated batch appends to the pending buffer
        without ever being held as a Python list.  ``count`` advances
        the opstamp (one per doc, same as per-doc adds)."""
        pending = os.path.join(self._dir(name), "pending.jsonl")
        with open(pending, "a") as f:
            for line in lines:
                f.write(line.rstrip("\n") + "\n")
        meta = self._meta(name)
        meta["opstamp"] = int(meta.get("opstamp", 0)) + count
        self._save_meta(name, meta)

    def flush(self, name: str) -> int:
        """POST /{index}/_flush (handlers/summary.rs:35-46).

        Builds a micro-segment from pending docs; returns the opstamp
        before reset.
        """
        meta = self._meta(name)
        opstamp = int(meta.get("opstamp", 0))
        self._recover_rowstore(name)
        pending = os.path.join(self._dir(name), "pending.jsonl")
        if os.path.exists(pending) and os.path.getsize(pending) > 0:
            schema = self.schema(name)
            # segment build = term production: the analyzer identity
            # (incl. dictionary fingerprint) must still match the
            # create-time stamp — see ingest()
            self._check_analyzer_versions(name, schema)
            # writer-assigned doc ids (reference: Tantivy assigns ids on
            # add; our deterministic equivalent is a persisted counter)
            next_id = int(meta.get("next_doc_id", 0))
            sticky = set(meta.get("array_fields", []))
            distributed = (
                os.path.getsize(pending) > self.flush_distributed_bytes
            )
            if distributed:
                sdf, array_fields, n_new_ids = (
                    self._parse_pending_distributed(
                        pending, schema, next_id, sticky
                    )
                )
                # one parse for the three downstream actions (postings
                # build, segment write, rowstore write) — and pins the
                # rows before the pending file is deleted below
                sdf = sdf.persist()
            else:
                sdf, array_fields, n_new_ids = (
                    self._parse_pending_driver(pending, next_id, sticky)
                )
            meta["next_doc_id"] = next_id + n_new_ids
            if array_fields:
                self._promote_rowstore_arrays(name, array_fields, meta)
                meta["array_fields"] = sorted(array_fields)
            text_fields = [f.name for f in schema.text_fields()]
            tables = build_index(
                sdf, id_col="doc_id", text_fields=text_fields,
                tokenizers={f.name: f.tokenizer
                            for f in schema.text_fields()},
            )
            # monotonic persisted counter — NOT manifest length, which
            # shrinks after merge compaction and could repeat with the
            # same opstamp, colliding with (and rmtree-ing) a live
            # committed segment
            flush_no = int(meta.get("flush_counter", 0))
            meta["flush_counter"] = flush_no + 1
            seg_id = segment_id_for(name, f"flush-{flush_no}", str(opstamp))
            write_segment(self.spark, tables, self._dir(name), seg_id,
                          opstamp=opstamp)
            # stash the flushed rows so open() can serve stored fields.
            # Written under a per-flush subdirectory keyed by seg_id
            # with overwrite semantics: a crash between this write and
            # the meta save replays the SAME pending docs into the SAME
            # directory — idempotent, so searches never see duplicate
            # stored rows (mirrors the manifest's dedupe-by-segment-id).
            rowstore = os.path.join(self._dir(name), "rowstore")
            sdf.write.mode("overwrite").parquet(
                os.path.join(rowstore, f"flush-{seg_id}")
            )
            if distributed:
                sdf.unpersist()
            os.remove(pending)
        # deletes become visible at the commit point, like the reference
        self._promote_pending_tombstones(name)
        meta["opstamp"] = 0
        self._save_meta(name, meta)
        # Tantivy's merge policy is writer-attached and engages on
        # commit (settings.rs:190-201): compact due buckets now
        self._auto_merge(name)
        return opstamp

    def _parse_pending_driver(self, pending: str, next_id: int,
                              sticky: set[str]):
        """Small-buffer flush parse (driver-side json.loads loop).

        Multi-valued fields: once ANY doc supplies an array for a
        field, that field's row-store column becomes array-typed for
        every doc (sticky, recorded in index.json) — parquet cannot
        mix string and array<string> across appends.  Render collapses
        singletons back (FlatNamedDocument).  Returns (sdf,
        array_fields incl. sticky, count of writer-assigned ids).
        """
        with open(pending) as f:
            docs = [json.loads(line) for line in f if line.strip()]
        n_new = 0
        for doc in docs:
            if "doc_id" not in doc:
                doc["doc_id"] = next_id + n_new
                n_new += 1
        array_fields = set(sticky)
        for doc in docs:
            for k, v in doc.items():
                if isinstance(v, list):
                    array_fields.add(k)
        if array_fields:
            for doc in docs:
                for k in array_fields:
                    if k in doc and not isinstance(doc[k], list):
                        doc[k] = [doc[k]]
        return self.spark.createDataFrame(docs), array_fields, n_new

    def _parse_pending_distributed(self, pending: str,
                                   schema: IndexSchema, next_id: int,
                                   sticky: set[str]):
        """Large-buffer flush parse as a Spark job (same semantics as
        the driver path, verified by A/B test): a staged
        distributed-bulk batch re-parsed through a serial driver loop
        was the last single-threaded stage in the ingest path.

        Two distributed passes over the buffer (json.loads twice, but
        N-wide): pass 1 discovers the seen-field set, which fields are
        array-valued anywhere (the sticky promotion rule needs GLOBAL
        knowledge before any row is emitted), and how many docs need
        writer-assigned ids; pass 2 emits typed rows against the
        schema computed from pass 1.  Per-line ordinals (zipWithIndex
        over the offset-ordered text read) make writer-assigned ids
        deterministic in LINE ORDER, byte-identical to the driver
        loop's next_id++.
        """
        spark = self.spark
        rdd = (
            spark.read.text(pending).rdd
            .map(lambda r: r[0])
            .filter(lambda s: s.strip())
            .zipWithIndex()
        )
        ldf = spark.createDataFrame(rdd, "line string, _ln long")

        def probe(batches):
            import json as _json

            import pandas as _pd

            for pdf in batches:
                arr: set[str] = set()
                seen: set[str] = set()
                missing = 0
                for line in pdf["line"]:
                    d = _json.loads(line)
                    seen.update(d.keys())
                    for k, v in d.items():
                        if isinstance(v, list):
                            arr.add(k)
                    if "doc_id" not in d:
                        missing += 1
                yield _pd.DataFrame({
                    "arr": [sorted(arr)], "seen": [sorted(seen)],
                    "missing": [missing],
                })

        stats = ldf.mapInPandas(
            probe, "arr array<string>, seen array<string>, missing long"
        ).collect()
        seen_fields: set[str] = set()
        array_fields = set(sticky)
        n_missing = 0
        for r in stats:
            seen_fields.update(r["seen"])
            array_fields.update(r["arr"])
            n_missing += int(r["missing"])
        seen_fields.discard("doc_id")

        def spark_type(f: str) -> str:
            spec = schema.get(f)
            base = (
                "long"
                if spec is not None and spec.ftype in ("i64", "u64")
                else "string"
            )
            return f"array<{base}>" if f in array_fields else base

        fields = sorted(seen_fields)
        out_schema = ", ".join(
            ["doc_id long", "_ln long"]
            + [f"`{f}` {spark_type(f)}" for f in fields]
        )
        arrf = frozenset(array_fields)

        def parse(batches):
            import json as _json

            import pandas as _pd

            for pdf in batches:
                cols: dict[str, list] = {f: [] for f in fields}
                ids: list = []
                lns: list[int] = []
                for line, ln in zip(pdf["line"], pdf["_ln"]):
                    d = _json.loads(line)
                    ids.append(d.get("doc_id"))
                    lns.append(int(ln))
                    for f in fields:
                        v = d.get(f)
                        if (f in arrf and v is not None
                                and not isinstance(v, list)):
                            v = [v]
                        cols[f].append(v)
                yield _pd.DataFrame({"doc_id": _pd.Series(
                    ids, dtype="object"), "_ln": lns, **cols})

        out = ldf.mapInPandas(parse, out_schema)
        if n_missing == 0:
            sdf = out.drop("_ln")
        else:
            total = ldf.count()
            if n_missing == total:
                # every doc needs an id: ordinals are dense, so the
                # assignment is a pure column expression — no shuffle
                sdf = out.withColumn(
                    "doc_id", F.lit(next_id) + F.col("_ln")
                ).drop("_ln")
            else:
                # mixed batch (some docs carry ids): rank the missing
                # ones by line order.  The global window sorts ONLY
                # the missing rows on one partition — a rare shape
                # (APIs either assign ids or don't); documented trade.
                from pyspark.sql.window import Window

                w = Window.orderBy("_ln")
                missing = (
                    out.filter(F.col("doc_id").isNull())
                    .withColumn(
                        "doc_id",
                        F.lit(next_id) + F.row_number().over(w) - 1,
                    )
                )
                sdf = (
                    out.filter(F.col("doc_id").isNotNull())
                    .unionByName(missing)
                    .drop("_ln")
                )
        return sdf, array_fields, n_missing

    def _auto_merge(self, name: str) -> list[str]:
        from .merge import run_merge

        meta = self._meta(name)
        pol = meta.get("merge_policy") or {"kind": "log"}
        if pol.get("kind", "log") == "none":
            return []  # NoMergePolicy (settings.rs merge_policy = "none")
        return run_merge(
            self.spark, self._dir(name),
            min_merge_size=int(pol.get("min_merge_size", 8)),
            min_layer_size=int(pol.get("min_layer_size", 10_000)),
            level_log_size=float(pol.get("level_log_size", 0.75)),
            index_name=name,
        )

    def _rowstore_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "rowstore")

    def _read_rowstore(self, name: str) -> DataFrame | None:
        """Row store = flat parquet (post-promotion rewrites) and/or
        per-flush subdirectories (idempotent appends)."""
        rowstore = self._rowstore_path(name)
        if not os.path.exists(rowstore):
            return None
        return self.spark.read.option(
            "recursiveFileLookup", "true"
        ).parquet(rowstore)

    def _recover_rowstore(self, name: str) -> None:
        """Finish or discard an interrupted array-promotion swap.

        Invariants: ``rowstore.promote`` only ever holds a COMPLETE
        rewrite (it is written before any rename), and the old data is
        renamed ASIDE (never deleted) before the new data moves in —
        so every crash point leaves either the old or the new complete
        row store recoverable.
        """
        rowstore = self._rowstore_path(name)
        tmp, old = rowstore + ".promote", rowstore + ".old"
        if not os.path.exists(rowstore):
            if os.path.exists(tmp):  # crashed between the two renames
                os.replace(tmp, rowstore)
            elif os.path.exists(old):  # defensive: tmp lost somehow
                os.replace(old, rowstore)
        else:
            # rowstore intact → any leftovers are stale (an incomplete
            # promote rewrite, or the pre-swap copy after a completed
            # swap); the promotion re-runs on the next flush because
            # meta.array_fields only updates after a successful swap
            shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)

    def _promote_rowstore_arrays(self, name: str, array_fields: set[str],
                                 meta: dict) -> None:
        """Rewrite scalar row-store columns to array<...> for fields
        that have gone multi-valued (one-time schema promotion; the
        rowstore holds only flushed docs, so the rewrite is small)."""
        self._recover_rowstore(name)
        rowstore = self._rowstore_path(name)
        df = self._read_rowstore(name)
        if df is None:
            return
        already = set(meta.get("array_fields", []))
        todo = array_fields - already
        if not todo:
            return
        changed = False
        for f in todo:
            if f in df.columns and not str(
                df.schema[f].dataType
            ).startswith("ArrayType"):
                df = df.withColumn(
                    f, F.when(F.col(f).isNotNull(), F.array(F.col(f)))
                )
                changed = True
        if not changed:
            return
        tmp, old = rowstore + ".promote", rowstore + ".old"
        df.write.mode("overwrite").parquet(tmp)
        # swap via rename-aside: the old row store is never deleted
        # before the new one is in place (_recover_rowstore completes
        # an interrupted swap on the next open/flush)
        os.replace(rowstore, old)
        os.replace(tmp, rowstore)
        shutil.rmtree(old, ignore_errors=True)

    def rollback(self, name: str) -> None:
        """Discard uncommitted adds AND deletes (bulk.rs:121-129)."""
        pending = os.path.join(self._dir(name), "pending.jsonl")
        if os.path.exists(pending):
            os.remove(pending)
        shutil.rmtree(
            os.path.join(self._dir(name), "tombstones_pending"),
            ignore_errors=True,
        )
        meta = self._meta(name)
        meta["opstamp"] = 0
        self._save_meta(name, meta)

    # ------------------------------------------------------------ delete

    def delete_term(self, name: str, terms: dict[str, str],
                    commit: bool = False) -> int:
        """DELETE /{index} (handle.rs:184-210): delete docs matching
        each exact (field, term); returns docs_affected.

        Implemented as tombstones: matching doc ids append to a
        tombstone table that queries anti-join against; compaction
        folds them in (merge.run_merge).  Visibility mirrors the
        reference's deferred-delete semantics (handle.rs:184-210 runs
        ``writer.delete_term`` but readers only see it after the next
        commit): without ``commit=True`` the tombstones land in a
        PENDING area that searches ignore; flush/commit promotes them.
        """
        ix = self.open(name)
        matched = None
        for field, value in terms.items():
            ix.schema.require_indexed(field)
            m = ix.postings.filter(
                (F.col("field") == field) & (F.col("term") == value)
            ).select("doc_id")
            matched = m if matched is None else matched.union(m)
        if matched is None:
            return 0
        matched = matched.distinct()
        pending_dir = os.path.join(self._dir(name), "tombstones_pending")
        existing = self._tombstones(name, include_pending=True)
        fresh = (
            matched.join(existing, "doc_id", "left_anti")
            if existing is not None
            else matched
        )
        n = fresh.count()
        if n:
            fresh.write.mode("append").parquet(pending_dir)
        if commit:
            self._promote_pending_tombstones(name)
        return n

    def _read_tomb_dir(self, name: str, dirname: str) -> DataFrame | None:
        tomb_dir = os.path.join(self._dir(name), dirname)
        if os.path.exists(tomb_dir) and any(
            f.endswith(".parquet") for f in os.listdir(tomb_dir)
        ):
            # pinned schema: skip parquet inference (one fewer tiny
            # driver job per open; see segments.POSTINGS_READ_SCHEMA)
            return self.spark.read.schema("doc_id bigint").parquet(
                tomb_dir
            )
        return None

    def _tombstones(self, name: str,
                    include_pending: bool = False) -> DataFrame | None:
        committed = self._read_tomb_dir(name, "tombstones")
        if not include_pending:
            return committed
        pending = self._read_tomb_dir(name, "tombstones_pending")
        if committed is None:
            return pending
        if pending is None:
            return committed
        return committed.union(pending).distinct()

    def _promote_pending_tombstones(self, name: str) -> None:
        """Commit point for deletes: pending parquet → committed dir.

        File moves (not a Spark rewrite): each pending part file is
        renamed into the committed directory under a unique name, so
        promotion is cheap and crash-safe (a re-run re-moves leftovers;
        duplicate doc_ids across files are harmless — anti-join
        semantics dedupe).
        """
        src = os.path.join(self._dir(name), "tombstones_pending")
        if not os.path.exists(src):
            return
        dst = os.path.join(self._dir(name), "tombstones")
        os.makedirs(dst, exist_ok=True)
        for fn in os.listdir(src):
            if fn.endswith(".parquet"):
                os.replace(
                    os.path.join(src, fn),
                    os.path.join(dst, f"promoted-{int(time.time()*1e6)}-{fn}"),
                )
        shutil.rmtree(src, ignore_errors=True)

    # ------------------------------------------------------------- open

    def open(self, name: str, corpus: DataFrame | None = None) -> FullTextIndex:
        """Open the committed view of an index as a query engine.

        ``corpus`` optionally supplies the row store (stored fields);
        otherwise the flushed rowstore parquet (if any) is used.
        """
        schema = self.schema(name)
        self._check_analyzer_versions(name, schema)
        self._recover_rowstore(name)
        tables = open_segmented_tables(self.spark, self._dir(name))
        if corpus is None:
            corpus = self._read_rowstore(name)
            if corpus is None:
                corpus = tables.doclens.select("doc_id").distinct()
        # stored-field retrieval needs every stored column present; an
        # index opened without its row store (ingest() indexes a corpus
        # the caller owns) serves nulls for missing stored fields
        # instead of failing the search plan
        for spec in schema.fields:
            if spec.stored and spec.name not in corpus.columns:
                corpus = corpus.withColumn(spec.name, F.lit(None))
        tomb = self._tombstones(name)
        if tomb is not None:
            tables = IndexTables(
                postings=tables.postings.join(tomb, "doc_id", "left_anti"),
                doclens=tables.doclens.join(tomb, "doc_id", "left_anti"),
                termstats=tables.termstats,
                fieldstats=tables.fieldstats,
                n_docs=tables.n_docs,
            )
            corpus = corpus.join(tomb, "doc_id", "left_anti")
        ix = FullTextIndex(self.spark, schema, corpus, tables,
                           id_col="doc_id", name=name)
        # attach the doc-sharded postings copy if one exists for THIS
        # segment set (build_doc_sharded); deletes apply at read via
        # the handle's tombstone anti-join, so only a manifest change
        # (new/merged segments) makes the copy fall away
        from .bucketed import attach_doc_bucketed, read_docb_meta

        docb_path = os.path.join(self._dir(name), "docb")
        meta = read_docb_meta(docb_path)
        if meta is not None:
            fp = meta.get("manifest_fingerprint")
            if fp == self.manifest_fingerprint(name):
                handle = attach_doc_bucketed(
                    self.spark, docb_path,
                    table=f"toshi_docb_{name}_{fp[:8]}",
                )
                ix.doc_bucketed = handle.with_tombstones(tomb)
        return ix

    def manifest_fingerprint(self, name: str) -> str:
        """md5 of manifest.jsonl alone — the SEGMENT-SET stamp.
        Tombstones are deliberately excluded (vs
        :meth:`commit_fingerprint`): deletes never invalidate a
        doc-sharded postings copy, they are filtered at read."""
        import hashlib

        man = os.path.join(self._dir(name), "manifest.jsonl")
        h = hashlib.md5()
        if os.path.exists(man):
            with open(man, "rb") as f:
                h.update(f.read())
        return h.hexdigest()

    def build_doc_sharded(
        self,
        name: str,
        n_term_partitions: int = 32,
        n_buckets: int = 64,
    ) -> str:
        """Write the doc-sharded postings copy (index/bucketed.py) for
        this index's COMMITTED segment set under ``<index>/docb`` and
        stamp it with the manifest fingerprint.  :meth:`open` attaches
        the copy while the stamp matches; a later flush/merge changes
        the manifest and the stale copy silently falls away (correct
        but slower multi-term plans) until this is re-run — the same
        write-once/attach-forever lifecycle as the segments
        themselves.  Raw segment postings are written (no tombstone
        filter): deletes stay read-time."""
        from .bucketed import write_doc_bucketed

        d = self._dir(name)
        tables = open_segmented_tables(self.spark, d)
        fp = self.manifest_fingerprint(name)
        path = os.path.join(d, "docb")
        write_doc_bucketed(
            tables.postings, path,
            table=f"toshi_docb_{name}_{fp[:8]}",
            n_term_partitions=n_term_partitions, n_buckets=n_buckets,
            extra_meta={"manifest_fingerprint": fp},
        )
        return path

    def commit_fingerprint(self, name: str) -> str:
        """Cheap stamp of the COMMITTED view: manifest bytes + the
        committed-tombstone file listing.  Changes iff a commit
        (flush/merge/format migration) changed what readers may see —
        staged tombstones (``tombstones_pending``) are deliberately
        excluded, matching deferred-delete visibility.  Long-lived
        serving processes key cached :meth:`open` handles on it so a
        later commit refreshes the handle instead of silently serving
        the pre-commit view (queries.q_delete_visibility's cache)."""
        import hashlib

        d = self._dir(name)
        h = hashlib.md5()
        man = os.path.join(d, "manifest.jsonl")
        if os.path.exists(man):
            with open(man, "rb") as f:
                h.update(f.read())
        tdir = os.path.join(d, "tombstones")
        if os.path.isdir(tdir):
            for fn in sorted(os.listdir(tdir)):
                p = os.path.join(tdir, fn)
                h.update(f"{fn}:{os.path.getsize(p)}".encode())
        return h.hexdigest()

    def _check_analyzer_versions(self, name: str,
                                 schema: IndexSchema) -> None:
        """Fail fast when an index's terms were produced by an analyzer
        whose output has since changed (e.g. the round-4 Porter-1980 →
        Snowball swap): queries analyze with the CURRENT chain, so a
        stale-stemmed index would silently return zero hits instead of
        an error.  Indexes created before versions were recorded count
        as version 1 for every tokenizer."""
        stored = self._meta(name).get("analyzer_versions", {})
        stale = []
        for s in schema.text_fields():
            have = stored.get(s.tokenizer, 1)
            want = analyzer_version(s.tokenizer)
            if str(have) != str(want):
                stale.append((s.name, s.tokenizer, have, want))
        if stale:
            # QueryError: the API layer's (status, json) contract
            # catches it as a 400 with this message — a bare ValueError
            # would escape handle() as a transport-level crash
            raise QueryError(
                f"index {name!r} has field(s) analyzed under a "
                f"different analyzer version: "
                f"{[(f, t, f'v{h}->v{w}') for f, t, h, w in stale]}. "
                "Indexed terms no longer match query-side analysis — "
                "re-ingest the source documents (stemmed/segmented "
                "terms cannot be migrated in place)."
            )

    # ----------------------------------------------------------- summary

    def index_summary(self, name: str, include_sizes: bool = False) -> dict:
        """GET /{index}/_summary (handlers/summary.rs:17-33)."""
        meta = self._meta(name)
        entries = Manifest(self._dir(name)).entries()
        out = {
            "summaries": {
                "index_name": name,
                "segments": [e.segment_id for e in entries],
                "opstamp": meta.get("opstamp", 0),
                "num_docs": sum(e.docs for e in entries),
            }
        }
        if include_sizes:
            out["summaries"]["segment_sizes"] = {
                e.segment_id: e.bytes for e in entries
            }
        return out

    def delete_index(self, name: str) -> None:
        if self.exists(name):
            shutil.rmtree(self._dir(name))
