"""Auxiliary measurement harness (guide §1): per-query plan capture and
isolated timing.  ``bench.py`` is the FROZEN driver contract; this file
exists so optimization rounds can
- dump ``explain("formatted")`` for every declared query (plans/rNN/),
- time each query in isolation (median of N collects after a warmup,
  same methodology as bench.py, plus a noop-sink variant that times the
  computation without the collect),
- run a single query repeatedly for profiling.

Usage:
  python bench_extra.py explain --out plans/r08 [--suffix _before]
  python bench_extra.py time [--queries a,b,c] [--trials 3] [--noop]
  python bench_extra.py one --query text_profile [--trials 5]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from toshi_spark.queries import QUERIES, get_index  # noqa: E402
from toshi_spark.session import get_spark  # noqa: E402


def _explain_str(df, mode: str = "formatted") -> str:
    qe = df._jdf.queryExecution()
    try:
        jvm = df.sparkSession._jvm
        return jvm.PythonSQLUtils.explainString(qe, mode)
    except Exception:
        return qe.explainString(
            df.sparkSession._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString(mode)
        )


def cmd_explain(spark, sf_dir: str, out_dir: str, suffix: str,
                names: list[str]) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        txt = _explain_str(df, "formatted")
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


def _time_one(spark, sf_dir: str, name: str, trials: int,
              noop: bool) -> dict:
    fn = QUERIES[name]
    spark.sparkContext.setJobDescription(f"bench_extra:{name}")

    def run():
        df = fn(spark, sf_dir)
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()

    run()  # warmup (artifact builds, JIT, worker spin-up)
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    return {
        "median": round(statistics.median(ts), 4),
        "min": round(min(ts), 4),
        "max": round(max(ts), 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["explain", "time", "one"])
    ap.add_argument("--out", default="plans/r08")
    ap.add_argument("--suffix", default="")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--query", default=None)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--build-index", action="store_true",
                    help="time the index build first (bench.py does)")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("toshi_spark_bench_extra", cores=cpus)

    names = list(QUERIES)
    if args.queries:
        names = [n.strip() for n in args.queries.split(",")]
    if args.query:
        names = [args.query]

    if args.mode == "explain":
        cmd_explain(spark, sf_dir, args.out, args.suffix, names)
        return

    out: dict[str, dict] = {}
    if args.build_index:
        t0 = time.perf_counter()
        ix = get_index(spark, sf_dir)
        ix.postings.count()
        ix.doclens.count()
        ix.termstats.count()
        out["__index_build__"] = {
            "median": round(time.perf_counter() - t0, 4)
        }
    for name in names:
        out[name] = _time_one(spark, sf_dir, name, args.trials, args.noop)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "results": out}))


if __name__ == "__main__":
    main()
