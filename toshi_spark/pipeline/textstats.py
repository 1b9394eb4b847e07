"""Text analysis for pipeline filtering: language ID heuristic, quality
scoring, token counting, document fingerprinting.

All JVM-side column algebra (no UDFs): these run per document over the
full corpus, so they must stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import simhash_col, tokens_col

EN_STOPWORDS = [
    "the", "a", "of", "and", "in", "to", "is", "it", "that", "for",
]

# GPT-2-style pretokenizer, RE2-safe subset (no lookahead, so interior
# multi-space runs count as one whitespace token instead of splitting
# one space onto the next word — documented approximation; the pattern
# is shared verbatim with the DuckDB oracle).  Gives the BPE-ish token
# count a data pipeline budgets corpora with.
BPE_PRETOKEN_RE = (
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s']+|\\s+"
)


def _stopword_hits(tokens: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def _digit_chars_col(text: Column) -> Column:
    """Count of ASCII digit chars, as ``length − length(translate(…))``.

    Value-identical to ``length(regexp_replace(text, '[^0-9]', ''))``
    for EVERY input (digits are single UTF-16 units; every non-digit —
    surrogate pairs included — cancels out of the subtraction), but
    avoids a SECOND char-class ``regexp_replace`` in the same generated
    stage: measured at 50k docs, one such replace costs ~0.09 s, two
    distinct ones in one projection cost 1.2-1.5 s (the second pattern
    pollutes the JIT profile of the shared regex machinery), while the
    ``translate`` form keeps the whole projection at ~0.15 s.
    """
    return F.length(text) - F.length(F.translate(text, "0123456789", ""))


def lang_id(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """n-gram/stopword language-ID heuristic → (doc_id, en_ratio, pred).

    Real pipelines plug in fastText/CLD; the operator shape (per-doc
    ratio features → argmax label, all vectorized) is what matters.
    """
    toks = tokens_col(text_col)
    n = F.size(toks)
    en = _stopword_hits(toks, EN_STOPWORDS)
    ratio = F.when(n > 0, en / n).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(ratio, 4).alias("en_ratio"),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("und")).alias("pred"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  keep_cols: tuple = ()) -> DataFrame:
    """Per-doc quality features + a composite score.

    Features: token count, mean token length, stopword ratio,
    non-alnum (punct/space) character ratio, digit ratio.  The
    composite mirrors common webtext quality filters (length band +
    stopword presence − symbol noise).  ``keep_cols`` pass through
    untouched (e.g. ``lang`` for per-language threshold calibration)
    so downstream grouping never needs a corpus-scale re-join.
    """
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    alnum_chars = F.length(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    )
    digit_chars = _digit_chars_col(F.col(text_col))
    # tokens are maximal alnum runs, so Σ token lengths ≡ alnum char
    # count — mean token length without an interpreted fold
    mean_tok_len = F.when(
        n_tokens > 0, alnum_chars / n_tokens
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tokens > 0, _stopword_hits(toks, EN_STOPWORDS) / n_tokens
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0, (n_chars - alnum_chars) / n_chars
    ).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, digit_chars / n_chars).otherwise(
        F.lit(0.0)
    )
    length_ok = (n_tokens >= 10) & (n_tokens <= 5000)
    score = (
        F.when(length_ok, F.lit(0.5)).otherwise(F.lit(0.0))
        + F.least(stop_ratio * F.lit(5.0), F.lit(0.3))
        - F.least(punct_ratio, F.lit(0.2))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in keep_cols],
        n_tokens.cast("long").alias("n_tokens"),
        F.round(mean_tok_len, 4).alias("mean_tok_len"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(score, 4).alias("quality"),
    )


# polynomial rolling-hash parameters: prime modulus 2^31-1 keeps every
# intermediate inside int64 on BOTH engines (numpy products stay under
# 2^42; DuckDB's nested-mod form stays under 2^51 — DuckDB raises on
# BIGINT overflow rather than wrapping, so mod-2^64 hashing is out)
FP_BASE = 1_000_003
FP_MOD = 2_147_483_647

# per-process memo for the SimHash token hash (add_profile_stats):
# token frequencies are Zipfian, so one md5 per DISTINCT token per
# WORKER replaces one per (doc, type) — Spark's reused Python workers
# keep the dict warm across tasks.  Bounded so a pathological vocab
# cannot grow it without limit.
_MD5_TOKEN_CACHE: dict[str, int] = {}
_MD5_TOKEN_CACHE_MAX = 2_000_000


def _token_md5(tok: str) -> int:
    """int(md5(tok)[:8 hex], 16) — the SimHash token hash, memoized."""
    h = _MD5_TOKEN_CACHE.get(tok)
    if h is None:
        from hashlib import md5

        h = int(md5(tok.encode("utf-8")).hexdigest()[:8], 16)
        if len(_MD5_TOKEN_CACHE) < _MD5_TOKEN_CACHE_MAX:
            _MD5_TOKEN_CACHE[tok] = h
    return h


def add_fingerprint(df: DataFrame, text_col: str = "text",
                    out_col: str = "fingerprint",
                    gram: int = 8) -> DataFrame:
    """Append a rolling-hash min fingerprint of ``text_col`` via one
    ``mapInArrow`` kernel; ``text_col`` is CONSUMED (dropped from the
    output) and every other input column passes through untouched — so
    a profile select can compute its column-algebra stats first and pay
    the Arrow transfer for the text bytes exactly once, with no re-scan
    and no join back.

    fp = min_j poly_hash(text[j:j+gram]) with a Karp-Rabin polynomial
    mod 2^31-1 (shift-invariant, locality-robust — the winnowing
    family collapsed to its min-hash core).  Per doc the kernel does
    one numpy sliding-window matmul against the power kernel: each
    byte is touched once, zero intermediate rows (the explode-per-
    position form would materialize ~total-bytes rows at 100 TB).
    Texts shorter than ``gram`` hash as one zero-padded window; empty
    text hashes to 0.
    """
    import numpy as np
    import pyarrow as pa

    kernel = np.empty(gram, dtype=np.int64)
    kernel[gram - 1] = 1
    for t in range(gram - 2, -1, -1):
        kernel[t] = (kernel[t + 1] * FP_BASE) % FP_MOD

    in_fields = df.schema.fields
    text_idx = [f.name for f in in_fields].index(text_col)
    out_names = [f.name for f in in_fields if f.name != text_col]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in in_fields if f.name != text_col
    ) + f", {out_col} long"

    def kern(batches):
        pad = np.zeros(gram - 1, dtype=np.uint8)
        for b in batches:
            if b.num_rows == 0:
                continue
            out = np.zeros(b.num_rows, dtype=np.int64)
            for r, s in enumerate(b.column(text_idx).to_pylist()):
                bs = np.frombuffer((s or "").encode("utf-8"), dtype=np.uint8)
                if bs.size == 0:
                    continue
                padded = np.concatenate([bs, pad])
                w = np.lib.stride_tricks.sliding_window_view(padded, gram)[
                    : max(bs.size - gram + 1, 1)
                ]
                out[r] = ((w.astype(np.int64) @ kernel) % FP_MOD).min()
            passthrough = [
                b.column(i) for i in range(b.num_columns) if i != text_idx
            ]
            yield pa.RecordBatch.from_arrays(
                passthrough + [pa.array(out, type=pa.int64())],
                names=out_names + [out_col],
            )

    return df.mapInArrow(kern, out_schema)


def add_profile_stats(df: DataFrame, text_col: str = "text",
                      toks_col: str = "_toks", bits: int = 16,
                      gram: int = 8) -> DataFrame:
    """Fused Arrow kernel for the per-token-heavy profile stats: one
    ``mapInArrow`` pass emitting fingerprint, n_types / raw TTR / raw
    entropy, SimHash, and raw repetition fractions.  ``text_col`` and
    ``toks_col`` are CONSUMED; every other column passes through.

    Why a kernel: these four families fold per TOKEN, and Spark
    evaluates higher-order-function lambdas interpreted (never
    whole-stage codegen), so the pure-column forms cost ~0.3 ms/doc
    each (measured: repetition 1.6 s, entropy 1.25 s, simhash 1.1 s
    for 5k docs at sf0.1 — vs 0.4 s for ALL the regexp/count stats
    together).  Same design as the analyzer's vectorized kernel: the
    slow per-element path moves to numpy/hashlib inside the one Arrow
    pass the profile already pays for the fingerprint.

    Semantics mirror the column forms exactly (those remain the
    reference implementations, used by the standalone operators and
    pinned against this kernel by tests):

    - tokens arrive PRE-COMPUTED from the JVM (``tokens_col``), so
      lower/split semantics cannot diverge between engines;
    - simhash: md5-first-8-hex per token, per-bit majority over raw
      occurrences (integer-exact, same as ``simhash_col``);
    - entropy: run contributions ``c·log2(c)`` accumulated
      SEQUENTIALLY in sorted-token order like the fold (ulp-level
      float divergence is absorbed by the caller's ``F.round(…, 4)``,
      the same tolerance the DuckDB oracle already exercises);
    - repetition: trimmed-non-empty line distinct fraction (Spark
      ``trim`` = strip 0x20 only) and max-bigram multiplicity;
    - ratios are emitted RAW; the caller applies the identical
      ``F.round`` JVM-side so rounding is unchanged;
    - NULL text (hence a NULL token array from the JVM) → n_types is
      NULL, matching entropy_cols' aggregate over a null array; every
      other stat falls through its ``when()`` to 0.0 in both forms.
    """
    import math

    import numpy as np
    import pyarrow as pa

    kernel = np.empty(gram, dtype=np.int64)
    kernel[gram - 1] = 1
    for t in range(gram - 2, -1, -1):
        kernel[t] = (kernel[t + 1] * FP_BASE) % FP_MOD

    in_fields = df.schema.fields
    names = [f.name for f in in_fields]
    text_idx = names.index(text_col)
    toks_idx = names.index(toks_col)
    drop = {text_idx, toks_idx}
    out_names = [f.name for i, f in enumerate(in_fields) if i not in drop]
    extra = ["fingerprint", "n_types", "ttr_raw", "entropy_raw",
             "simhash", "dup_line_raw", "top_bigram_raw"]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for i, f in enumerate(in_fields) if i not in drop
    ) + (", fingerprint long, n_types long, ttr_raw double,"
         " entropy_raw double, simhash long, dup_line_raw double,"
         " top_bigram_raw double")

    def kern(batches):
        from collections import Counter

        # resolve the memoized hash through the module so the worker-
        # process cache is shared across tasks (a closure copy would be
        # rebuilt per task)
        from toshi_spark.pipeline.textstats import _token_md5

        pad = np.zeros(gram - 1, dtype=np.uint8)
        bit_idx = np.arange(bits)
        for b in batches:
            if b.num_rows == 0:
                continue
            n_rows = b.num_rows
            fp = np.zeros(n_rows, dtype=np.int64)
            n_types = np.zeros(n_rows, dtype=np.int64)
            # NULL text → NULL token array JVM-side; entropy_cols'
            # fold over a null array yields n_types=NULL (every other
            # stat falls through a when() to its 0 default).  Mirror
            # that exactly: mask n_types where toks is null.
            nt_null = np.zeros(n_rows, dtype=bool)
            ttr = np.zeros(n_rows, dtype=np.float64)
            ent = np.zeros(n_rows, dtype=np.float64)
            sig = np.zeros(n_rows, dtype=np.int64)
            dup_line = np.zeros(n_rows, dtype=np.float64)
            top_bg = np.zeros(n_rows, dtype=np.float64)
            texts = b.column(text_idx).to_pylist()
            toks_all = b.column(toks_idx).to_pylist()
            for r in range(n_rows):
                s = texts[r] or ""
                if toks_all[r] is None:
                    nt_null[r] = True
                toks = toks_all[r] or []
                # fingerprint (identical to add_fingerprint's kernel)
                bs = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
                if bs.size:
                    padded = np.concatenate([bs, pad])
                    w = np.lib.stride_tricks.sliding_window_view(
                        padded, gram
                    )[: max(bs.size - gram + 1, 1)]
                    fp[r] = ((w.astype(np.int64) @ kernel) % FP_MOD).min()
                n = len(toks)
                if n:
                    # entropy/TTR: Counter + sorted keys gives the SAME
                    # sorted-distinct iteration order (and thus the
                    # same sequential float fold) as the previous
                    # np.unique over an object array, without the
                    # Python-compare sort of every occurrence
                    cnt = Counter(toks)
                    uniq = sorted(cnt)
                    k = len(uniq)
                    n_types[r] = k
                    ttr[r] = k / n
                    counts = np.fromiter(
                        (cnt[u] for u in uniq), dtype=np.int64, count=k
                    )
                    clogc = 0.0
                    for c in counts:
                        c = float(c)
                        clogc += c * math.log2(c)
                    ent[r] = math.log2(n) - clogc / n
                    # simhash: tf-weighted per-bit counts over the
                    # DISTINCT tokens (≡ per-occurrence counts, the
                    # same identity simhash_col uses) — md5 per type
                    # served from the worker-level cache
                    hs = np.fromiter(
                        (_token_md5(u) for u in uniq),
                        dtype=np.int64, count=k,
                    )
                    bitc = (
                        ((hs[:, None] >> bit_idx) & 1)
                        * counts[:, None]
                    ).sum(axis=0)
                    sig[r] = int(
                        ((2 * bitc > n).astype(np.int64)
                         << bit_idx).sum()
                    )
                # repetition: lines (trim = 0x20 only, like Spark trim)
                lines = [ln.strip(" ") for ln in s.split("\n")]
                lines = [ln for ln in lines if ln != ""]
                if lines:
                    dup_line[r] = 1.0 - len(set(lines)) / len(lines)
                if n >= 2:
                    # most-frequent bigram count: C-level pair hashing
                    # (identical count to the explicit dict loop)
                    top_bg[r] = max(
                        Counter(zip(toks, toks[1:])).values()
                    ) / (n - 1)
            passthrough = [
                b.column(i) for i in range(b.num_columns) if i not in drop
            ]
            yield pa.RecordBatch.from_arrays(
                passthrough + [
                    pa.array(fp, type=pa.int64()),
                    pa.array(n_types, type=pa.int64(),
                             mask=nt_null if nt_null.any() else None),
                    pa.array(ttr, type=pa.float64()),
                    pa.array(ent, type=pa.float64()),
                    pa.array(sig, type=pa.int64()),
                    pa.array(dup_line, type=pa.float64()),
                    pa.array(top_bg, type=pa.float64()),
                ],
                names=out_names + extra,
            )

    return df.mapInArrow(kern, out_schema)


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", gram: int = 8) -> DataFrame:
    """Content fingerprint → (doc_id, fingerprint); see add_fingerprint."""
    return add_fingerprint(
        docs.select(F.col(id_col).cast("long").alias("doc_id"),
                    F.col(text_col)),
        text_col=text_col, gram=gram,
    )


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals for webtext filtering:

    - ``dup_line_frac``: 1 − distinct/total over non-empty trimmed
      lines (boilerplate and templated pages repeat lines);
    - ``top_bigram_frac``: share of the most frequent word bigram
      among all bigrams (degenerate/spammy text loops short phrases).

    Both signals are PER-DOC computations, so the whole operator is
    map-only: line stats are array algebra, and the bigram mode is the
    longest equal-run in the doc's SORTED bigram array (array_sort +
    one aggregate fold) — no explode, no groupBy, zero exchanges.  The
    previous explode + groupBy(doc, bigram) form shuffled every bigram
    of the corpus to compute what never leaves its row.
    """
    dup_line_frac, top_bigram_frac = repetition_cols(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        dup_line_frac.alias("dup_line_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
    )


def mode_run_count(arr: Column) -> Column:
    """Count of the most frequent element = longest equal-run in the
    sorted array, via ONE aggregate fold (no explode, no groupBy)."""

    def run_step(acc, x):
        run_new = F.when(
            acc["prev"].isNotNull() & (acc["prev"] == x),
            acc["run"] + F.lit(1),
        ).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run_new.alias("run"),
            F.greatest(acc["best"], run_new).alias("best"),
        )

    return F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        run_step,
        lambda acc: acc["best"],
    )


def repetition_cols(text_col: str = "text") -> tuple[Column, Column]:
    """(dup_line_frac, top_bigram_frac) as rounded column expressions."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"),
                    lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        F.lit(1.0)
        - F.size(F.array_distinct(lines)).cast("double") / n_lines,
    ).otherwise(F.lit(0.0))
    toks = tokens_col(text_col)
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda x, y: F.concat(x, F.lit(" "), y),
        ),
    ).otherwise(F.array().cast("array<string>"))
    mc = mode_run_count(bigrams)
    tc = F.size(bigrams)
    top_bigram_frac = F.when(
        tc > 0, F.round(mc.cast("double") / tc, 4)
    ).otherwise(F.lit(0.0))
    return F.round(dup_line_frac, 4), top_bigram_frac


# PII patterns — shared verbatim with the DuckDB oracle, so the subset
# must be RE2-compatible (no lookaround/backreferences).  Conservative
# by design: training-data scrubbing prefers false positives.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def pii_scrub(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text",
              passthrough: tuple[str, ...] = ()) -> DataFrame:
    """Detect and redact PII-shaped spans: per-kind match counts plus
    the text with each span replaced by a typed placeholder.

    Pure regexp column algebra — map-only, fuses into the source scan
    at crawl scale.  Emails are redacted FIRST (an email contains a
    dot-separated host that the looser patterns must not see).

    ``passthrough`` names input columns to carry into the output so a
    pipeline can consume the scrub AND its input text from ONE branch
    instead of joining two branches that each recompute the upstream
    chain (see q_webtext_clean).
    """
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .cast("long").alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS.items()
    ]
    redacted = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        redacted = F.regexp_replace(redacted, pat, f"<{kind.upper()}>")
    return docs.select(
        F.col(id_col).alias("doc_id"), *passthrough, *counts,
        redacted.alias("redacted"),
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 50,
    stride: int = 40,
) -> DataFrame:
    """Split each doc into whitespace-token windows of ``chunk_tokens``
    every ``stride`` tokens (overlap = chunk_tokens − stride) — the
    context-packing stage an embedding/pretraining pipeline runs ahead
    of tokenization.  One posexplode row per chunk, all array algebra:
    a flatMap fused into the scan, no shuffle.  Chunk text re-joins
    the original whitespace tokens with single spaces (documented
    normalization — the token stream is what downstream consumes).
    """
    arr = F.split(F.trim(F.col(text_col)), r"\s+")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(arr) - 1, F.lit(0)),
        F.lit(stride),
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        arr.alias("toks"),
        F.posexplode(starts).alias("chunk_no", "start"),
    )
    chunk = F.slice(F.col("toks"), F.col("start") + 1, chunk_tokens)
    return base.select(
        "doc_id",
        F.col("chunk_no").cast("int").alias("chunk_no"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk"),
    )


def gopher_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 5000,
    min_mean_tok_len: float = 2.0,
    max_mean_tok_len: float = 12.0,
    min_distinct_stopwords: int = 2,
    max_digit_tok_frac: float = 0.2,
    max_mode_tok_frac: float = 0.2,
    toks_col: str | None = None,
) -> DataFrame:
    """Gopher-style hard quality GATE (Rae et al. 2021 §A1.1): the
    keep/drop decision pipelines actually apply, with per-rule
    attribution so drops are auditable.  ``quality_score`` ranks;
    this FILTERS.  Rules (thresholds scaled to the synthetic corpus,
    all dials exposed):

      r_len    token count within [min_tokens, max_tokens]
      r_mean   mean token length within [min, max]
      r_stop   ≥ min_distinct_stopwords DISTINCT stopwords present
               (the "real prose" test — spam keyword lists fail it)
      r_digit  digit-only token fraction ≤ max_digit_tok_frac
      r_mode   most-frequent-token share ≤ max_mode_tok_frac
               (degenerate repetition; the mode count is the longest
               equal-run in the sorted token array — one fold)

    Every signal is per-doc array algebra: the operator is map-only,
    zero exchanges, and composes with the scan at crawl scale.
    Returns (doc_id, n_tokens, mean_tok_len, n_stop_distinct,
    digit_tok_frac, mode_tok_frac, r_len..r_mode, keep).

    ``toks_col`` — pre-tokenized column on ``docs`` (the shared
    analyzed-corpus artifact): skips the scan-side re-tokenize.
    """
    toks = F.col(toks_col) if toks_col is not None else tokens_col(text_col)
    n = F.size(toks)
    alnum_chars = F.length(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    )
    mean_len = F.when(n > 0, alnum_chars / n).otherwise(F.lit(0.0))
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    digit_frac = F.when(
        n > 0,
        F.size(F.filter(toks, lambda t: t.rlike("^[0-9]+$")))
        .cast("double") / n,
    ).otherwise(F.lit(0.0))

    def run_step(acc, x):
        run_new = F.when(
            acc["prev"].isNotNull() & (acc["prev"] == x),
            acc["run"] + F.lit(1),
        ).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run_new.alias("run"),
            F.greatest(acc["best"], run_new).alias("best"),
        )

    mode_cnt = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        run_step,
        lambda acc: acc["best"],
    )
    mode_frac = F.when(
        n > 0, mode_cnt.cast("double") / n
    ).otherwise(F.lit(0.0))

    out = docs.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        F.round(mean_len, 4).alias("mean_tok_len"),
        n_stop.cast("long").alias("n_stop_distinct"),
        F.round(digit_frac, 4).alias("digit_tok_frac"),
        F.round(mode_frac, 4).alias("mode_tok_frac"),
    )
    r_len = (F.col("n_tokens") >= min_tokens) & (
        F.col("n_tokens") <= max_tokens
    )
    r_mean = (F.col("mean_tok_len") >= min_mean_tok_len) & (
        F.col("mean_tok_len") <= max_mean_tok_len
    )
    r_stop = F.col("n_stop_distinct") >= min_distinct_stopwords
    r_digit = F.col("digit_tok_frac") <= max_digit_tok_frac
    r_mode = F.col("mode_tok_frac") <= max_mode_tok_frac
    return out.select(
        "*",
        r_len.alias("r_len"),
        r_mean.alias("r_mean"),
        r_stop.alias("r_stop"),
        r_digit.alias("r_digit"),
        r_mode.alias("r_mode"),
        (r_len & r_mean & r_stop & r_digit & r_mode).alias("keep"),
    )


def unigram_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram-distribution signals: Shannon entropy of the per-doc
    token distribution plus type-token ratio (the lexical-diversity
    pair CCNet-style quality pipelines cut on — machine-generated
    keyword stuffing has low entropy, boilerplate has low TTR).

    H = log2(n) - (Σ_t c_t·log2(c_t)) / n over token counts c_t —
    computed as ONE fold over the sorted token array (the same
    sorted-run trick as ``gopher_filter``'s mode count: a run's
    length IS its token's count), so the operator is map-only, zero
    exchanges, and composes with the scan at crawl scale.  n_types
    rides in the same fold (number of runs).  Values round to 4 dp so
    engine/oracle parity cannot flip in the last ulp.

    Returns (doc_id, n_tokens, n_types, ttr, entropy).
    """
    toks = tokens_col(text_col)
    n = F.size(toks)
    n_types, ttr, ent = entropy_cols(toks)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        n_types.alias("n_types"),
        F.round(ttr, 4).alias("ttr"),
        F.round(ent, 4).alias("entropy"),
    )


def entropy_cols(toks: Column) -> tuple[Column, Column, Column]:
    """(n_types, ttr, entropy) column expressions over a token array —
    one fold over the sorted array (a run's length IS its count)."""
    n = F.size(toks)

    def run_step(acc, x):
        is_cont = acc["prev"].isNotNull() & (acc["prev"] == x)
        run_new = F.when(is_cont, acc["run"] + F.lit(1)).otherwise(
            F.lit(1)
        )
        # close the previous run when a new one starts
        closed = F.when(
            is_cont | acc["prev"].isNull(), acc["sum"]
        ).otherwise(
            acc["sum"]
            + acc["run"].cast("double") * F.log2(acc["run"].cast("double"))
        )
        types_new = F.when(is_cont, acc["types"]).otherwise(
            acc["types"] + F.lit(1)
        )
        return F.struct(
            x.alias("prev"),
            run_new.alias("run"),
            closed.alias("sum"),
            types_new.alias("types"),
        )

    folded = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0.0).alias("sum"),
            F.lit(0).alias("types"),
        ),
        run_step,
        lambda acc: F.struct(
            F.when(
                acc["prev"].isNotNull(),
                acc["sum"]
                + acc["run"].cast("double")
                * F.log2(acc["run"].cast("double")),
            ).otherwise(F.lit(0.0)).alias("clogc"),
            acc["types"].alias("types"),
        ),
    )
    ent = F.when(
        n > 0,
        F.log2(n.cast("double")) - folded["clogc"] / n.cast("double"),
    ).otherwise(F.lit(0.0))
    ttr = F.when(
        n > 0, folded["types"].cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))
    return folded["types"].cast("long"), ttr, ent


def text_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    simhash_bits: int = 16,
    toks_col: str | None = None,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """The full per-document text profile in ONE corpus scan: token
    counts (whitespace / alnum-run / BPE-ish), language-ID heuristic,
    quality features + composite score, repetition signals, unigram
    entropy + TTR, SimHash signature, and the rolling-hash content
    fingerprint.

    The cheap regexp/count stats are JVM column algebra; the four
    per-token-fold families (repetition, entropy/TTR, SimHash,
    fingerprint) ride ONE ``add_profile_stats`` Arrow kernel — Spark
    evaluates higher-order lambdas interpreted, so their pure-column
    forms cost ~0.3 ms/doc each (measured 4.1 s of this query's 4.9 s
    at sf0.1), while the fused numpy pass does the same folds in the
    Arrow transfer the fingerprint already pays.  The JVM computes the
    token array ONCE and ships it, so tokenizer semantics cannot
    diverge; the kernel emits raw ratios and the final projection
    applies the same ``F.round`` as the column forms (which remain the
    reference implementations, kernel-vs-column pinned by pytest).
    Map-only, zero exchanges — at 100 TB this replaces seven separate
    scans of the corpus (one per stat family) with one, which is the
    difference between a profile job and seven profile jobs.

    Returns (doc_id, n_ws, n_tokens, n_bpe, en_ratio, pred,
    mean_tok_len, stop_ratio, punct_ratio, digit_ratio, quality,
    dup_line_frac, top_bigram_frac, n_types, ttr, entropy, simhash,
    fingerprint).

    ``toks_col`` — pre-tokenized column on ``docs`` (the shared
    analyzed-corpus artifact): skips the scan-side re-tokenize; the
    char-level stats still read ``text_col``.

    ``passthrough`` — input columns carried into the output unchanged
    (e.g. map-only signature columns computed upstream in the SAME
    scan — a join-back would cost a doc_id exchange).
    """
    passthrough = passthrough or []
    toks = F.col(toks_col) if toks_col is not None else tokens_col(text_col)
    # Phase 1 (pre-kernel): each SHARED raw count exactly once.  The
    # ratio expressions reference stop_hits/alnum_chars/… several times
    # each, and CollapseProject inlines a named projection into every
    # consumer — the interpreted stopword filter and the regexp scans
    # were each evaluated 4-5× per row (measured: the duplicated
    # projection cost ~2 s of a 2.9 s query at 50k docs).  The Arrow
    # kernel is a hard projection barrier, so the counts ride THROUGH
    # it as columns and phase 2 derives the ratios from bound
    # attributes with plain scalar arithmetic (identical expressions →
    # identical doubles).
    stats = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        *passthrough,
        F.col(text_col),
        toks.alias("_toks"),
        F.size(F.split(F.col(text_col), r"\s+")).cast("long").alias("n_ws"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE),
                                 F.lit(0))
        ).cast("long").alias("n_bpe"),
        F.length(F.col(text_col)).alias("_n_chars"),
        F.length(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
        ).alias("_alnum_chars"),
        _digit_chars_col(F.col(text_col)).alias("_digit_chars"),
        _stopword_hits(toks, EN_STOPWORDS).alias("_stop_hits"),
    )
    out = add_profile_stats(stats, text_col=text_col, toks_col="_toks",
                            bits=simhash_bits)
    # Phase 2 (post-kernel): ratios/score from the bound counts —
    # the same formulas as lang_id/quality_score (the reference
    # implementations), bit-identical arithmetic.
    n_tokens = F.col("n_tokens")
    n_chars = F.col("_n_chars")
    alnum_chars = F.col("_alnum_chars")
    digit_chars = F.col("_digit_chars")
    stop_hits = F.col("_stop_hits")
    en_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(
        F.lit(0.0)
    )
    mean_tok_len = F.when(
        n_tokens > 0, alnum_chars / n_tokens
    ).otherwise(F.lit(0.0))
    stop_ratio = en_ratio
    punct_ratio = F.when(
        n_chars > 0, (n_chars - alnum_chars) / n_chars
    ).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, digit_chars / n_chars).otherwise(
        F.lit(0.0)
    )
    length_ok = (n_tokens >= 10) & (n_tokens <= 5000)
    score = (
        F.when(length_ok, F.lit(0.5)).otherwise(F.lit(0.0))
        + F.least(stop_ratio * F.lit(5.0), F.lit(0.3))
        - F.least(punct_ratio, F.lit(0.2))
    )
    return out.select(
        "doc_id", "n_ws", "n_tokens", "n_bpe",
        F.round(en_ratio, 4).alias("en_ratio"),
        F.when(en_ratio >= 0.05, F.lit("en")).otherwise(F.lit("und"))
        .alias("pred"),
        F.round(mean_tok_len, 4).alias("mean_tok_len"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(score, 4).alias("quality"),
        F.round("dup_line_raw", 4).alias("dup_line_frac"),
        F.round("top_bigram_raw", 4).alias("top_bigram_frac"),
        "n_types",
        F.round("ttr_raw", 4).alias("ttr"),
        F.round("entropy_raw", 4).alias("entropy"),
        "simhash", "fingerprint",
        *passthrough,
    )
