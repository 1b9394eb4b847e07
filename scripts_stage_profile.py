"""Per-stage timing for the remaining hot bench queries (guide §1.4).

Isolates each expensive query's internal stages with the noop sink so
the computation is timed without the driver-collect, at whatever
SPARK_GRAFT_SF_DIR points to.  Not part of the driver contract.

Usage: python scripts_stage_profile.py [stage ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from toshi_spark.queries import (  # noqa: E402
    QUERIES,
    analyzed_corpus,
    load_documents,
)
from toshi_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(label, fn, trials=3):
    fn()  # warm
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:55s} {statistics.median(ts):7.3f}  "
          f"(min {min(ts):.3f} max {max(ts):.3f})", flush=True)


def main():
    spark = get_spark("stage_profile", cores=CPUS)
    want = set(sys.argv[1:])

    def on(name):
        return not want or name in want

    art = analyzed_corpus(spark, SF_DIR)
    noop(art.select("doc_id"))  # force artifact build untimed

    if on("lm_score"):
        from toshi_spark.pipeline.training import (
            lm_score, ngrams_col, tokens_barrier,
        )

        spark.sparkContext.setJobDescription("lm: full")
        timeit("lm_score full (noop)",
               lambda: noop(lm_score(art, toks_col="toks")))
        toks = tokens_barrier(art, toks_col="toks")
        spark.sparkContext.setJobDescription("lm: bigram stream")
        bigrams = toks.select(
            "doc_id", F.explode(ngrams_col(F.col("_t"), 2)).alias("bigram")
        ).select(
            "doc_id",
            F.substring_index("bigram", " ", 1).alias("w1"),
            F.substring_index("bigram", " ", -1).alias("w2"),
        )
        timeit("lm: bigram string stream (noop)", lambda: noop(bigrams))
        spark.sparkContext.setJobDescription("lm: zip stream")
        n = F.size("_t")
        zipped = toks.select(
            "doc_id",
            F.explode(
                F.when(
                    n >= 2,
                    F.zip_with(
                        F.slice("_t", 1, n - 1),
                        F.slice("_t", 2, n - 1),
                        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                    ),
                ).otherwise(F.array().cast(
                    "array<struct<w1:string,w2:string>>")),
            ).alias("_bg"),
        ).select("doc_id", "_bg.w1", "_bg.w2")
        timeit("lm: zip-struct stream (noop)", lambda: noop(zipped))
        spark.sparkContext.setJobDescription("lm: model only")
        timeit("lm: bigram model agg (noop)",
               lambda: noop(bigrams.groupBy("w1", "w2").count()))
        nd = bigrams.groupBy("w1", "w2").count().count()
        nu = toks.select(F.explode("_t").alias("w")).groupBy("w").count().count()
        print(f"distinct bigrams: {nd}, distinct unigrams: {nu}", flush=True)

    if on("dsir"):
        from toshi_spark.pipeline.training import (
            _bigram_bucket_arrays, dsir_weights,
        )
        from toshi_spark.pipeline.dedup import _cut_lineage

        spark.sparkContext.setJobDescription("dsir: full")
        timeit(
            "dsir full (noop)",
            lambda: noop(dsir_weights(
                art, n_buckets=4096, toks_col="toks",
                target_filter=F.col("doc_id") % 13 == 0)),
        )
        spark.sparkContext.setJobDescription("dsir: featurize")
        timeit(
            "dsir: bucket arrays map pass (noop)",
            lambda: noop(_bigram_bucket_arrays(
                art, 4096, "doc_id", "text", "toks")),
        )
        spark.sparkContext.setJobDescription("dsir: featurize+ckpt")
        timeit(
            "dsir: bucket arrays + cut_lineage",
            lambda: _cut_lineage(_bigram_bucket_arrays(
                art, 4096, "doc_id", "text", "toks")).count(),
        )

    if on("contamination"):
        spark.sparkContext.setJobDescription("contam: full")
        timeit("contamination full (noop)",
               lambda: noop(QUERIES["contamination"](spark, SF_DIR)))
        from toshi_spark.pipeline.training import (
            _gram_fp_col, tokens_barrier,
        )

        base = tokens_barrier(art, toks_col="toks")
        hashed = base.select(
            "doc_id",
            F.explode(F.array(F.struct(
                F.transform("_t", lambda t: F.xxhash64(t)).alias("h1"),
                F.transform("_t", lambda t: F.xxhash64(t, F.lit(1)))
                .alias("h2"),
            ))).alias("_h"),
        )
        spark.sparkContext.setJobDescription("contam: hash arrays")
        timeit("contam: token-hash arrays (noop)", lambda: noop(hashed))
        grams = hashed.select(
            "doc_id",
            F.explode(F.zip_with(
                _gram_fp_col(F.col("_h.h1"), 8),
                _gram_fp_col(F.col("_h.h2"), 8),
                lambda a, b: F.struct(a.alias("_g1"), b.alias("_g2")),
            )).alias("_g"),
        )
        spark.sparkContext.setJobDescription("contam: gram explode")
        timeit("contam: exploded gram keys (noop)", lambda: noop(grams))

    if on("substring"):
        from toshi_spark.pipeline.dedup import substring_dedup

        spark.sparkContext.setJobDescription("substr: full")
        timeit("substring_dedup full (noop)",
               lambda: noop(substring_dedup(art, k=8)))
        from toshi_spark.pipeline.training import _gram_fp_col

        toks = art.select(
            "doc_id",
            F.split(F.coalesce(F.col("text"), F.lit("")), " ").alias("_t"),
        )
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
                    _gram_fp_col(F.col("_ha.h1"), 8),
                    _gram_fp_col(F.col("_ha.h2"), 8),
                    lambda a, b: F.struct(a.alias("f1"), b.alias("f2")),
                )
            ).alias("pos", "_w"),
        ).select("doc_id", "pos", F.col("_w.f1").alias("_h1"),
                 F.col("_w.f2").alias("_h2"))
        spark.sparkContext.setJobDescription("substr: windows")
        timeit("substr: window stream (noop)", lambda: noop(wins))
        occ_key = (F.col("doc_id") * F.lit(1 << 30) + F.col("pos"))
        lexicon = (
            wins.groupBy("_h1", "_h2")
            .agg(F.count("*").alias("_occ"),
                 F.min(occ_key).alias("_first_key"))
            .where(F.col("_occ") >= 2)
        )
        spark.sparkContext.setJobDescription("substr: lexicon")
        timeit("substr: lexicon agg (noop)", lambda: noop(lexicon))
        dup = wins.join(lexicon, ["_h1", "_h2"]).where(
            occ_key != F.col("_first_key"))
        spark.sparkContext.setJobDescription("substr: dup join")
        timeit("substr: dup join (noop)", lambda: noop(dup))

    if on("paragraph"):
        from toshi_spark.pipeline.dedup import paragraph_dedup

        docs = load_documents(spark, SF_DIR)
        spark.sparkContext.setJobDescription("para: full")
        timeit("paragraph_dedup full (noop)",
               lambda: noop(paragraph_dedup(docs, para_tokens=12)))

    if on("lsh"):
        spark.sparkContext.setJobDescription("lsh: full noop")
        timeit("lsh_pairs full (noop)",
               lambda: noop(QUERIES["lsh_pairs"](spark, SF_DIR)))
        timeit("lsh_pairs full (collect)",
               lambda: QUERIES["lsh_pairs"](spark, SF_DIR).collect())
        from toshi_spark.pipeline.dedup import (
            band_buckets, minhash_signatures,
        )

        aug = analyzed_corpus(spark, SF_DIR, augmented=True)
        sigs = minhash_signatures(aug, n_hashes=8, toks_col="toks")
        spark.sparkContext.setJobDescription("lsh: sigs")
        timeit("lsh: signatures (noop)", lambda: noop(sigs))
        banded = band_buckets(sigs, 8, 4)
        spark.sparkContext.setJobDescription("lsh: banded")
        timeit("lsh: banded (noop)", lambda: noop(banded))

    if on("ngram"):
        spark.sparkContext.setJobDescription("ngram: full noop")
        timeit("ngram_jaccard full (noop)",
               lambda: noop(QUERIES["ngram_jaccard"](spark, SF_DIR)))

    if on("fuzzy"):
        spark.sparkContext.setJobDescription("fuzzy: full noop")
        timeit("fuzzy_contamination full (noop)",
               lambda: noop(QUERIES["fuzzy_contamination"](spark, SF_DIR)))

    if on("neardup"):
        spark.sparkContext.setJobDescription("neardup: full noop")
        timeit("embedding_neardup full (noop)",
               lambda: noop(QUERIES["embedding_neardup"](spark, SF_DIR)))

    if on("atm"):
        spark.sparkContext.setJobDescription("atm: full noop")
        timeit("assemble_training_mix full (noop)",
               lambda: noop(QUERIES["assemble_training_mix"](spark, SF_DIR)))


if __name__ == "__main__":
    main()
