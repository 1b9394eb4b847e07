"""HTML → text extraction for Common-Crawl-style web pages.

The input table (BASELINE.json input_hint) carries raw page bytes in
``html: binary`` alongside ``text: string``; a real ingest pipeline
derives the latter from the former.  This module is that stage,
expressed entirely in JVM-side column algebra (``regexp_replace`` /
``replace`` — whole-stage codegen, no Python in the hot path), so at
100 TB the extraction runs inside the scan stage with zero shuffle:

1. drop <script>/<style> blocks wholesale (their bodies are not text),
2. strip remaining tags,
3. decode the common named entities (&amp; last, single pass — the
   standard non-recursive decode, so "&amp;lt;" → "&lt;" stays inert),
4. collapse whitespace runs and trim.

The regexes are shared verbatim with the DuckDB oracle (both engines'
regex dialects — java.util.regex and RE2 — agree on this subset: inline
(?is) flags, lazy quantifiers, character classes; backreferences are
deliberately avoided because RE2 lacks them).

Reference parity: the reference engine indexes pre-extracted text
(document fields arrive as JSON strings, toshi-server/src/handle.rs:
137-156); this stage reproduces the upstream extraction so the engine
can ingest raw crawl bytes directly.  On the synthetic webtext fixture
(fixtures.synth_webtext) extraction is byte-identical to the ``text``
column — the north-star invariant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# script/style blocks: lazy body match, no backreference (RE2-safe)
BLOCK_RE = r"(?is)<(?:script|style)\b[^>]*>.*?</(?:script|style)\s*>"
# any remaining tag (comments/doctype included via the leading chars)
TAG_RE = r"(?s)<[^>]*>"
WS_RE = r"\s+"

# named entities, &amp; decoded LAST (single-pass, non-recursive)
ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def extract_text_col(html: Column) -> Column:
    """Column expression: HTML string → extracted plain text."""
    txt = F.regexp_replace(html, BLOCK_RE, " ")
    txt = F.regexp_replace(txt, TAG_RE, " ")
    for ent, ch in ENTITIES:
        txt = F.replace(txt, F.lit(ent), F.lit(ch))
    txt = F.regexp_replace(txt, WS_RE, " ")
    return F.trim(txt)


def extract_text(
    pages: DataFrame,
    html_col: str = "html",
    out_col: str = "text",
) -> DataFrame:
    """Add ``out_col`` with the text extracted from ``html_col``.

    ``html_col`` may be binary (raw crawl bytes, decoded as UTF-8) or
    string.  Everything stays inside whole-stage codegen — at crawl
    scale this is a map-only stage fused into the source scan.
    """
    col = F.col(html_col)
    if dict(pages.dtypes).get(html_col) == "binary":
        col = F.decode(col, "utf-8")
    return pages.withColumn(out_col, extract_text_col(col))


def oracle_extract_sql(html_expr: str) -> str:
    """The same extraction as a DuckDB scalar expression (shared
    regexes; RE2 needs the 'g' option for global replace)."""
    expr = f"regexp_replace({html_expr}, '{BLOCK_RE}', ' ', 'g')"
    expr = f"regexp_replace({expr}, '{TAG_RE}', ' ', 'g')"
    for ent, ch in ENTITIES:
        lit = ch.replace("'", "''")
        expr = f"replace({expr}, '{ent.replace(chr(39), chr(39)*2)}', '{lit}')"
    expr = f"regexp_replace({expr}, '{WS_RE}', ' ', 'g')"
    return f"trim({expr})"


def boilerplate_lines(
    pages: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 10,
) -> DataFrame:
    """Lines (trimmed, non-empty) appearing in ≥ ``min_docs`` DISTINCT
    docs — the cross-document boilerplate set (nav bars, footers,
    cookie banners) that line-level dedup strips before training.

    Two shuffles, both necessary for exactness — but both move the
    16-byte line HASH, never the line text: distinct (doc, md5(line))
    pairs, then a partially-aggregated count per hash (the previous
    form shuffled the full line strings twice; a line here can be a
    whole collapsed page).  The surviving strings are recovered by a
    broadcast join of the count table (the boilerplate lexicon —
    small by the operator's own premise) back onto the line stream.
    Output is the (small) lexicon.
    """
    lines = pages.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.transform(F.split(F.col(text_col), "\n"),
                    lambda l: F.trim(l)),
                lambda l: l != "",
            )
        ).alias("line"),
    )
    hashed = lines.select(
        "doc_id", F.md5(F.encode("line", "utf-8")).alias("_h")
    )
    counts = (
        hashed.distinct()
        .groupBy("_h")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    return (
        lines.select(F.md5(F.encode("line", "utf-8")).alias("_h"), "line")
        .join(F.broadcast(counts), "_h")
        .select("line", "n_docs")
        .distinct()
    )


def strip_boilerplate(
    pages: DataFrame,
    boiler: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "clean",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Remove boilerplate lines from each doc, preserving the order of
    the surviving lines.

    The lexicon (small by construction — it is the set of lines
    repeated across ≥min_docs documents) collapses to ONE row holding
    a sorted line array, broadcast into a map-side higher-order
    filter: each doc's split lines are filtered against it and
    re-joined IN PLACE.  Lines never leave their row — the previous
    posexplode → anti-join → collect_list/array_sort → spine-join
    shape paid a doc_id exchange carrying every byte of page text to
    reassemble an order the row already had.  Docs whose every line is
    boilerplate survive with an empty string (array_join over an empty
    array).

    ``passthrough`` names input columns carried into the output so a
    single-branch pipeline needs no join-back (see pii_scrub).
    """
    lex = boiler.agg(
        F.array_sort(F.collect_set("line")).alias("_blines")
    )
    kept = F.filter(
        F.split(F.col(text_col), "\n"),
        lambda l: ~F.array_contains(F.col("_blines"), F.trim(l)),
    )
    return (
        pages.crossJoin(F.broadcast(lex))
        .select(
            F.col(id_col).alias("doc_id"), *passthrough,
            F.array_join(kept, "\n").alias(out_col),
        )
    )


# --- URL canonicalization (crawl frontier / URL-level dedup stage) ------
#
# Common-Crawl-style pipelines dedup and join on CANONICAL urls: the
# same page is crawled as http://WWW.Site.com:80/a/?b=2&a=1#frag and
# https://site.com/a?a=1&b=2, and url-level joins (seen-lists, host
# reputations, robots caches) only work after normalization.  Rules
# (the conservative, semantics-preserving subset of RFC 3986 §6):
#   scheme + host lowercased; leading "www." dropped; default port
#   (:80 http / :443 https) dropped; fragment dropped; query params
#   split, tracking params (utm_*) removed, remainder sorted and
#   re-joined; trailing path slash collapsed ('/' root kept).
# Everything is JVM column algebra (split/regexp/array_sort — fused
# into the scan at crawl scale, zero shuffle); the DuckDB oracle
# mirrors each step with split_part/list_sort over the same regexes.

SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
WWW_RE = r"^www\."
TRAIL_SLASH_RE = "/+$"


def canonicalize_url_cols(url: Column) -> dict[str, Column]:
    """Column expressions: raw url → scheme/host/path/query/canonical."""
    scheme = F.lower(F.regexp_extract(url, SCHEME_RE, 1))
    after = F.regexp_replace(url, SCHEME_RE, "")
    nofrag = F.substring_index(after, "#", 1)
    pre_q = F.substring_index(nofrag, "?", 1)
    qpos = F.instr(nofrag, "?")
    query = F.when(
        qpos > 0,
        F.substring(nofrag, qpos + F.lit(1), F.length(nofrag)),
    ).otherwise(F.lit(""))
    hostport = F.lower(F.substring_index(pre_q, "/", 1))
    ppos = F.instr(pre_q, "/")
    path = F.when(
        ppos > 0, F.substring(pre_q, ppos, F.length(pre_q))
    ).otherwise(F.lit("/"))
    host = F.regexp_replace(hostport, WWW_RE, "")
    host = F.when(
        scheme == "http", F.regexp_replace(host, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host, ":443$", "")
    ).otherwise(host)
    path = F.regexp_replace(path, TRAIL_SLASH_RE, "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & (~p.startswith("utm_")),
        )
    )
    qsorted = F.array_join(params, "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qsorted != "", F.concat(F.lit("?"), qsorted)).otherwise(
            F.lit("")
        ),
    )
    return {
        "scheme": scheme,
        "host": host,
        "path": path,
        "query_sorted": qsorted,
        "canonical_url": canonical,
    }


def canonicalize_urls(
    pages: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Add (scheme, host, path, query_sorted, canonical_url) columns."""
    cols = canonicalize_url_cols(F.col(url_col))
    return pages.withColumns(cols)


def oracle_canonicalize_sql(url_expr: str, source: str) -> str:
    """The same canonicalization as a DuckDB query over ``source``
    (a relation exposing ``doc_id`` and the columns ``url_expr``
    uses); yields (doc_id, scheme, host, path, query_sorted,
    canonical_url).  Shares SCHEME_RE / WWW_RE / TRAIL_SLASH_RE with
    the Spark path verbatim."""
    return f"""
SELECT doc_id, scheme, host, path, query_sorted,
       scheme || '://' || host || path ||
       CASE WHEN query_sorted <> '' THEN '?' || query_sorted
            ELSE '' END AS canonical_url
FROM (
  SELECT doc_id, scheme,
         CASE WHEN scheme = 'http'
              THEN regexp_replace(host0, ':80$', '')
              WHEN scheme = 'https'
              THEN regexp_replace(host0, ':443$', '')
              ELSE host0 END AS host,
         CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
         array_to_string(
           list_sort(list_filter(string_split(query, '&'),
             p -> p <> '' AND NOT starts_with(p, 'utm_'))),
           '&') AS query_sorted
  FROM (
    SELECT doc_id, scheme,
           regexp_replace(lower(split_part(pre_q, '/', 1)),
                          '{WWW_RE}', '') AS host0,
           regexp_replace(
             CASE WHEN strpos(pre_q, '/') > 0
                  THEN substr(pre_q, strpos(pre_q, '/'))
                  ELSE '/' END,
             '{TRAIL_SLASH_RE}', '') AS path0,
           CASE WHEN strpos(nofrag, '?') > 0
                THEN substr(nofrag, strpos(nofrag, '?') + 1)
                ELSE '' END AS query
    FROM (
      SELECT doc_id, split_part(nofrag, '?', 1) AS pre_q, nofrag,
             scheme
      FROM (
        SELECT doc_id,
               lower(regexp_extract(u, '{SCHEME_RE}', 1)) AS scheme,
               split_part(regexp_replace(u, '{SCHEME_RE}', ''),
                          '#', 1) AS nofrag
        FROM (SELECT doc_id, {url_expr} AS u FROM {source})
      )
    )
  )
)
"""


def host_cap(
    pages: DataFrame,
    cap: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-host page quota (crawl-budget enforcement: no host may
    contribute more than ``cap`` pages downstream — the standard
    guard against SEO farms and wiki mirrors swamping a training
    mix).  Expects ``canonicalize_urls`` output (a ``host`` column).

    Selection is DETERMINISTIC, not first-N-in-scan-order: pages rank
    by (md5(doc_id), doc_id) within their host — a seedless uniform
    shuffle both engines reproduce — and ranks above ``cap`` drop.

    Scale shape: the window runs over a PROJECTED (id, host, rank-key)
    slice — the per-host exchange and sort never carry the page
    payload, so a 10^8-page host flows through its partition as
    ~50-byte rows, not pages (and Spark's WindowGroupLimit pushes the
    rank≤cap filter below the exchange, bounding even those).  The
    payload joins back on the kept-id list, which is OUTPUT-sized
    (≤ cap per host) — AQE picks broadcast when it fits.  Column
    contract unchanged: full input row + ``host_rank``.
    """
    from pyspark.sql import Window

    keyed = pages.select(
        F.col(id_col).alias("_cap_id"),
        F.col("host").alias("_cap_host"),
        F.md5(F.col(id_col).cast("string")).alias("_rk_key"),
    )
    w = Window.partitionBy("_cap_host").orderBy("_rk_key", "_cap_id")
    kept = (
        keyed.withColumn("host_rank", F.row_number().over(w))
        .where(F.col("host_rank") <= cap)
        .select("_cap_id", "host_rank")
    )
    return pages.join(
        kept, pages[id_col] == kept["_cap_id"], "inner"
    ).drop("_cap_id")
