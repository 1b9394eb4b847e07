"""Corpus sources: Iceberg-first loading with parquet/json fallbacks.

BASELINE.json's input_hint names an Iceberg table of web pages
(url, warc_ts, html, text, lang).  The Iceberg runtime jars are not in
this image, so the loader is capability-gated: it tries the Iceberg
DataSource and falls back to parquet/NDJSON with the same schema.  On
a real cluster Iceberg adds partition pruning + snapshot isolation on
top of the same DataFrame the rest of the engine consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

WEBTEXT_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def load_webtext(
    spark: SparkSession,
    source: str,
    fmt: str = "auto",
) -> DataFrame:
    """Load the webtext corpus from an Iceberg table name or a path.

    fmt: 'iceberg' | 'parquet' | 'json' | 'auto' (auto = iceberg when
    the runtime is present and ``source`` has no path separator, else
    by file extension, defaulting to parquet).
    """
    if fmt == "auto":
        if "/" not in source and iceberg_available(spark):
            fmt = "iceberg"
        elif source.endswith((".json", ".jsonl", ".ndjson")):
            fmt = "json"
        else:
            fmt = "parquet"
    if fmt == "iceberg":
        if not iceberg_available(spark):
            raise NotImplementedError(
                "Iceberg runtime not on the classpath in this environment; "
                "pass a parquet/json path instead"
            )
        return spark.read.format("iceberg").load(source)
    if fmt == "json":
        return spark.read.schema(WEBTEXT_SCHEMA).json(source)
    return spark.read.parquet(source)
