"""Two-parallelism scaling benchmark (the N vs 4N cluster criterion).

No multi-node cluster exists in this sandbox, so per driver
instruction the two-cluster-size scaling criterion is evidenced by
running the SAME indexing job at local[8] and local[32] on the SAME
deterministic synthetic webtext corpus and reporting throughput at
both plus scaling efficiency = T8/T32 / 4 ... precisely:

    efficiency = (throughput_32 / throughput_8) / (32/8)

Each run is a separate spark-submit-style subprocess (a JVM can't
change core count in-process).  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from toshi_spark.session import get_spark
from toshi_spark.fixtures import synth_webtext
from toshi_spark.index.docmap import assign_doc_ids
from toshi_spark.index.builder import build_index

cores = int(sys.argv[1]); n_docs = int(sys.argv[2])
spark = get_spark(f"scaling_{{cores}}", cores=cores)
corpus = assign_doc_ids(synth_webtext(spark, n_docs, seed=42,
                                      partitions=4 * cores), order_col="url")
t0 = time.perf_counter()
ix = build_index(corpus, id_col="doc_id", text_fields="text")
n_post = ix.postings.count()
ix.termstats.count(); ix.doclens.count()
dt = time.perf_counter() - t0
print(json.dumps({{"cores": cores, "sec": dt, "docs_per_sec": n_docs / dt,
                   "n_postings": n_post}}))
"""


def run_at(cores: int, n_docs: int) -> dict:
    repo = os.path.dirname(os.path.abspath(__file__))
    code = WORKER.format(repo=repo)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(n_docs)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(os.environ.get("SCALING_N_DOCS", "40000"))
    lo = run_at(8, n_docs)
    hi = run_at(32, n_docs)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4.0
    print(json.dumps({
        "metric": "indexing throughput scaling local[8] -> local[32]",
        "n_docs": n_docs,
        "local8_docs_per_sec": round(lo["docs_per_sec"], 2),
        "local32_docs_per_sec": round(hi["docs_per_sec"], 2),
        "local8_sec": round(lo["sec"], 2),
        "local32_sec": round(hi["sec"], 2),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
    }))


if __name__ == "__main__":
    main()
