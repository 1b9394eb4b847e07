"""One-off: streaming-ingest latency (round 6): NDJSON files landing in
a watched dir -> micro-batch segment commits -> query visibility."""
import json, os, shutil, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from toshi_spark.session import get_spark
from toshi_spark.streaming.autocommit import stream_ingest
from toshi_spark.index.segments import Manifest, open_segmented_tables
from toshi_spark.scoring import bm25_score, topk

SRC = "/tmp/stream_src"; IDX = "/tmp/stream_idx"
shutil.rmtree(SRC, ignore_errors=True); shutil.rmtree(IDX, ignore_errors=True)
os.makedirs(SRC)
spark = get_spark("stream_lat", cores=8, shuffle_partitions=8)
schema = "doc_id long, text string"

def drop_batch(b, n=2000):
    with open(f"{SRC}/batch{b}.json.tmp", "w") as f:
        for i in range(n):
            did = b*n + i
            f.write(json.dumps({"doc_id": did, "text": f"stream doc marker{did:08d} w{i%100} filler tokens here"})+"\n")
    os.rename(f"{SRC}/batch{b}.json.tmp", f"{SRC}/batch{b}.json")
    return time.perf_counter()

res = {"batch_docs": 2000, "batches": []}
# round 7: compaction enabled — the policy fires mid-run, so these
# numbers show steady-state ingest-to-visible latency ACROSS a merge
# (min_merge_size=4 → a compaction lands around batch 4)
MERGE = {"min_merge_size": 4, "min_layer_size": 100}
q = stream_ingest(spark, SRC, schema, IDX, index_name="lat",
                  trigger_seconds=0.5, available_now=False,
                  merge_policy=MERGE)
try:
    for b in range(8):
        t_drop = drop_batch(b)
        # poll manifest until the new docs are committed
        target = (b+1)*2000
        while True:
            try:
                entries = Manifest(IDX).entries()
                if sum(e.docs for e in entries) >= target:
                    break
            except Exception:
                pass
            time.sleep(0.05)
        commit_lat = time.perf_counter() - t_drop
        # query visibility: marker term of the batch's last doc
        t0 = time.perf_counter()
        t = open_segmented_tables(spark, IDX)
        m = t.postings.filter((F.col("field")=="text") & (F.col("term")==f"marker{target-1:08d}")).select("field","term","doc_id","tf","doc_len")
        rows = topk(bm25_score(m, t.doclens, t.termstats, t.n_docs, t.fieldstats, tf_mode="full", unique_doc_terms=True), 5).collect()
        q_lat = time.perf_counter() - t0
        assert len(rows) == 1 and rows[0].doc_id == target-1, rows
        res["batches"].append({"commit_visibility_sec": round(commit_lat,2),
                               "open_plus_query_sec": round(q_lat,2)})
finally:
    q.stop()
res["n_segments"] = len(Manifest(IDX).entries())
res["merge_policy"] = MERGE
print(json.dumps(res))
