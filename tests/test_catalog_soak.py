"""Concurrent multi-index catalog soak (VERDICT r6 #10 stretch).

scripts_segments_scale.py covers one index × many segments; this soak
drives a 20-index catalog with interleaved create / ingest / add /
flush / delete-term / merge / query / drop across worker threads — the
cross-index manifest/meta races a per-index test can't produce
(catalog state is per-index directories; nothing here should ever
bleed between indexes).
"""

import random
import threading

import pytest
from pyspark.sql import functions as F

from toshi_spark.index.catalog import IndexCatalog

N_INDEXES = 20
DOCS_PER_INDEX = 24


def _mk_docs(spark, tag: str, lo: int, n: int):
    return spark.createDataFrame(
        [(lo + i, f"{tag} common doc{lo + i} spark word{i % 5}")
         for i in range(n)],
        "doc_id long, text string",
    )


@pytest.mark.parametrize("n_threads", [4])
def test_twenty_index_interleaved_soak(spark, tmp_path, n_threads):
    cat = IndexCatalog(spark, str(tmp_path))
    errors: list[str] = []
    names = [f"soak{i:02d}" for i in range(N_INDEXES)]

    def lifecycle(name: str, seed: int) -> None:
        rng = random.Random(seed)
        try:
            cat.create_index(name, [
                {"name": "text", "ftype": "text", "stored": False,
                 "indexed": True},
            ], merge_policy={"kind": "log", "min_merge_size": 3,
                             "min_layer_size": 10})
            # chunked ingest → several segments
            cat.ingest(name, _mk_docs(spark, name, 0, DOCS_PER_INDEX),
                       n_chunks=3, fingerprint=name)
            # staged single-doc adds, committed by an explicit flush
            for j in range(2):
                cat.add_document(
                    name,
                    {"doc_id": 1000 + j,
                     "text": f"{name} extra common doc{1000 + j}"},
                )
            cat.flush(name)
            # delete a term, commit it
            n_del = cat.delete_term(name, {"text": f"doc{seed % 5}"})
            cat.flush(name)
            # interleave a read while neighbors mutate
            ix = cat.open(name)
            hits = ix.postings.filter(
                (F.col("field") == "text") & (F.col("term") == "common")
            ).select("doc_id").distinct().count()
            expect = DOCS_PER_INDEX + 2 - n_del
            if hits != expect:
                errors.append(
                    f"{name}: common hits {hits} != {expect}"
                )
            # this index's terms must never appear in a neighbor
            other = names[(names.index(name) + 7) % N_INDEXES]
            if cat.exists(other):
                try:
                    oix = cat.open(other)
                    leak = oix.postings.filter(
                        F.col("term") == name
                    ).count()
                    if leak:
                        errors.append(f"{name} leaked into {other}")
                except Exception:
                    pass  # neighbor mid-create/drop — open may race
            if rng.random() < 0.25:
                cat.delete_index(name)
                if cat.exists(name):
                    errors.append(f"{name}: still exists after drop")
        except Exception as e:  # pragma: no cover
            errors.append(f"{name}: {type(e).__name__}: {e}")

    threads = []
    for i, name in enumerate(names):
        t = threading.Thread(target=lifecycle, args=(name, i), daemon=True)
        threads.append(t)
    # bounded concurrency: n_threads lifecycles in flight at once
    it = iter(threads)
    running: list[threading.Thread] = []
    for t in threads:
        t.start()
        running.append(t)
        if len(running) >= n_threads:
            running.pop(0).join(timeout=300)
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors[:8]
    # surviving indexes are listed, sorted, and openable
    listed = cat.refresh_catalog()
    assert listed == sorted(listed)
    for name in listed:
        ix = cat.open(name)
        assert ix.postings.filter(F.col("term") == "common").count() > 0
