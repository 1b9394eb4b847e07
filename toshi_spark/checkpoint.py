"""Phase-boundary materialization for multi-stage pipeline queries.

A pipeline query with a frame feeding several downstream consumers
(webtext extraction → {hash, lexicon, strip}; training-mix selection →
{featurize, score, pack}) must materialize that frame once or every
consumer re-executes the upstream chain.  ``DataFrame.persist()`` is
the obvious tool but has the wrong lifecycle for a *library* of
queries: the cache entry lives in Spark's CacheManager, which holds the
plan by reference — it is NOT garbage-collected when the caller drops
the frame (the ContextCleaner reclaims RDD/broadcast blocks, not
DataFrame cache entries), so repeated invocations in one long-lived
session accumulate executor storage.

``phase_checkpoint`` gives the two lifecycles that are actually wanted:

- default (sf-scale, in-session): **eager ``localCheckpoint``** — the
  frame materializes once as executor RDD blocks and its lineage is
  cut; the blocks ARE ContextCleaner-reclaimed once the returned frame
  is unreferenced, so the library never leaks storage across calls.
- ``checkpoint_dir`` set (crawl scale): **parquet write + read-back** —
  the durable inter-phase artifact a production run writes anyway:
  survives executor loss (localCheckpoint blocks are non-replicated),
  frees executor memory entirely, and makes the phase resumable /
  consumable by later jobs.  This is the executable form of the
  "at crawl scale this is a disk checkpoint" intent.

``checkpoint_dir`` resolves from the explicit argument first, then the
``TOSHI_SPARK_CHECKPOINT_DIR`` environment variable, so the driver's
fixed ``(spark, sf_dir)`` query signature can still exercise the disk
path end-to-end.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame

_SEQ = itertools.count()

ENV_VAR = "TOSHI_SPARK_CHECKPOINT_DIR"


def phase_checkpoint(
    df: DataFrame,
    label: str = "phase",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Materialize ``df`` once at a phase boundary; see module doc.

    Returns a frame whose plan is a scan of the materialized data
    (parquet files under ``checkpoint_dir``, else localCheckpoint
    blocks) — downstream consumers never re-execute the input plan.
    """
    cdir = checkpoint_dir or os.environ.get(ENV_VAR)
    if cdir:
        path = os.path.join(cdir, f"{label}-{next(_SEQ)}")
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)
    return df.localCheckpoint(eager=True)
