"""Dictionary-based CJK word segmentation (jieba-style max-probability
DAG), filling the reference's ``cang_jie`` slot algorithmically.

The reference registers the cang-jie tokenizer (a jieba wrapper) under
``CANG_JIE`` (``toshi-server/src/lib.rs:57-72``); its production
dictionary ships with the jieba project and is not reproducible here,
so the DEFAULT ``cang_jie`` registry slot stays the CJK character
BIGRAM scheme (deterministic, dictionary-free, good search recall).
This module implements the actual segmentation ALGORITHM — the part
that IS public knowledge — behind a pluggable dictionary:

1. build the word DAG over a CJK run: from each index i, every
   POSITIVE-frequency dictionary word starting at i is an edge
   i → i+len(word); a single character is always an edge (unknown
   chars segment alone; 0-frequency entries are jieba's del_word
   idiom — kept out of the DAG, exactly like jieba's ``if FREQ[frag]``
   guard);
2. dynamic programming right-to-left for the maximum log-probability
   route, p(word) = freq(word)/total with unknown chars at freq 1 —
   the jieba ``calc``/``get_DAG`` construction (``log(FREQ.get(w) or
   1)``); route ties prefer the LONGER word (jieba's tuple-max);
3. cut the run along the best route.

``ANALYZERS["cang_jie_dict"]`` exposes the chain (CJK runs segmented
by dictionary, non-CJK runs through the default tokenizer).  A small
built-in demo dictionary makes the path testable end-to-end; real
deployments pass their own ``{word: frequency}`` via
``set_dictionary`` (e.g. loaded from jieba's ``dict.txt``) BEFORE
building or opening indexes — ``get_analyzer("cang_jie_dict")``
snapshots the active dictionary into the analyzer closure so Spark
ships it to executors by value (module state alone would not survive
the worker's fresh import), and the catalog stamps the dictionary
FINGERPRINT into the index's analyzer version so an index built under
one dictionary refuses to open under another.
"""

from __future__ import annotations

import hashlib
import math

# A deliberately small demonstration dictionary ({word: frequency}):
# enough to exercise multi-length DAG routes in tests.  NOT a
# linguistic resource — production replaces it wholesale.
DEMO_DICT: dict[str, int] = {
    "今天": 100, "天气": 80, "很好": 60, "今天天气": 5,
    "北京": 120, "大学": 90, "北京大学": 150, "生": 40, "大学生": 70,
    "数据": 100, "大数据": 80, "处理": 60, "搜索": 50, "引擎": 45,
    "搜索引擎": 90, "我们": 110, "中国": 130, "人民": 70,
    "中华人民共和国": 200, "共和国": 60, "中华": 50,
}

_ACTIVE: dict[str, int] | None = None
# dictionary-derived constants, computed ONCE per dictionary (a
# 350k-entry production dict would otherwise pay an O(|dict|) scan per
# CJK run): id → (strong dict ref, (max_word_len, log_total,
# fingerprint)).  The strong ref both verifies identity and keeps the
# id from being recycled by the allocator for a different dict.
# BOUNDED (insertion-order LRU-ish, oldest evicted past the cap): the
# strong refs would otherwise retain every dictionary ever installed
# for the process lifetime — an unbounded leak in a long-lived driver
# that swaps dictionaries.
_STATS_CACHE: dict[int, tuple[dict, tuple[int, float, str]]] = {}
_STATS_CACHE_MAX = 4


def set_dictionary(dictionary: dict[str, int] | None) -> None:
    """Install the process-wide segmentation dictionary (None resets
    to the demo dictionary).  Call BEFORE building/opening indexes:
    the dictionary is snapshotted into analyzer closures at
    ``get_analyzer`` time and fingerprinted into index metadata."""
    global _ACTIVE
    _ACTIVE = dict(dictionary) if dictionary is not None else None


def active_dict() -> dict[str, int]:
    return _ACTIVE if _ACTIVE is not None else DEMO_DICT


def dict_stats(d: dict[str, int]) -> tuple[int, float, str]:
    """(max_word_len, log_total, fingerprint) for a dictionary,
    memoized by object identity (dictionaries are installed whole via
    set_dictionary, never mutated in place)."""
    key = id(d)
    cached = _STATS_CACHE.get(key)
    if cached is not None and cached[0] is d:
        return cached[1]
    max_len = max((len(w) for w in d), default=1)
    log_total = math.log(max(sum(d.values()), 1))
    h = hashlib.md5()
    for w in sorted(d):
        h.update(f"{w}\t{d[w]}\n".encode("utf-8"))
    stats = (max_len, log_total, h.hexdigest()[:16])
    while len(_STATS_CACHE) >= _STATS_CACHE_MAX:
        _STATS_CACHE.pop(next(iter(_STATS_CACHE)))
    _STATS_CACHE[key] = (d, stats)
    return stats


def load_dict_txt(path_or_lines) -> dict[str, int]:
    """Load a dictionary in jieba's public ``dict.txt`` format.

    Each line is ``word freq [pos-tag]`` separated by whitespace
    (jieba's ``gen_pfdict``): the part-of-speech tag, if present, is
    ignored; blank lines and ``#`` comment lines are skipped; a
    repeated word keeps the LAST entry (file order wins, matching
    ``add_word`` overwrite semantics); ``freq`` must be a non-negative
    integer — 0 is jieba's ``del_word`` idiom and stays in the dict so
    the DAG guard excludes the word explicitly.

    ``path_or_lines`` is a filesystem path or any iterable of lines.
    Typical use::

        set_dictionary(load_dict_txt("/path/to/jieba/dict.txt"))

    making the ``cang_jie_dict`` tokenizer turnkey with jieba's own
    published dictionary (MIT-licensed, not vendored here).
    """
    close = None
    if isinstance(path_or_lines, (str, bytes)):
        src = open(path_or_lines, encoding="utf-8")
        close = src
    else:
        src = path_or_lines
    out: dict[str, int] = {}
    try:
        for ln, line in enumerate(src, 1):
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) < 2:
                raise ValueError(
                    f"dict.txt line {ln}: expected 'word freq [tag]', "
                    f"got {line!r}"
                )
            word, freq = parts[0], parts[1]
            try:
                f = int(freq)
            except ValueError:
                raise ValueError(
                    f"dict.txt line {ln}: frequency {freq!r} is not an "
                    "integer"
                ) from None
            if f < 0:
                raise ValueError(
                    f"dict.txt line {ln}: negative frequency {f}"
                )
            out[word] = f
    finally:
        if close is not None:
            close.close()
    if not out:
        raise ValueError("dict.txt contained no entries")
    return out


def load_sample_dict() -> dict[str, int]:
    """The packaged sample dictionary (``data/sample_dict.txt``, jieba
    dict.txt format): ~90 common Mandarin words with plausible relative
    frequencies — enough to make ``cang_jie_dict`` turnkey.  Production
    deployments load jieba's full published dict.txt instead."""
    import os

    return load_dict_txt(
        os.path.join(os.path.dirname(__file__), "data",
                     "sample_dict.txt")
    )


def dictionary_fingerprint() -> str:
    """Stable fingerprint of the ACTIVE dictionary (stamped into index
    metadata so dictionary swaps are refused at open, not discovered
    as silent zero-hit queries)."""
    d = active_dict()
    return dict_stats(d)[2]


def segment(run: str, dictionary: dict[str, int] | None = None) -> list[str]:
    """Cut one CJK run into words by the max-probability DAG route."""
    d = dictionary if dictionary is not None else active_dict()
    return segment_with(run, d, dict_stats(d))


def segment_with(run: str, d: dict[str, int],
                 stats: tuple[int, float, str]) -> list[str]:
    """Segmentation core against precomputed dictionary stats — the
    form analyzer closures capture (dict + stats ride the closure to
    executors; nothing resolves from module state at run time)."""
    n = len(run)
    if n == 0:
        return []
    if n == 1:
        return [run]
    max_len, log_total, _ = stats
    # DAG[i] = end indices j (inclusive) for positive-freq dict words
    dag: list[list[int]] = []
    for i in range(n):
        ends = [i]  # single char always segments
        for j in range(i + 1, min(n, i + max_len)):
            if d.get(run[i : j + 1]):
                ends.append(j)
        dag.append(ends)
    # right-to-left DP; tuple max prefers the larger end index on ties
    route: list[tuple[float, int]] = [(0.0, 0)] * (n + 1)
    for i in range(n - 1, -1, -1):
        route[i] = max(
            (
                math.log(d.get(run[i : j + 1]) or 1) - log_total
                + route[j + 1][0],
                j,
            )
            for j in dag[i]
        )
    out: list[str] = []
    i = 0
    while i < n:
        j = route[i][1]
        out.append(run[i : j + 1])
        i = j + 1
    return out
