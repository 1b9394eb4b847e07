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
   dictionary word starting at i is an edge i → i+len(word); a single
   character is always an edge (unknown chars segment alone);
2. dynamic programming right-to-left for the maximum log-probability
   route, p(word) = freq(word)/total with unknown chars at freq 1 —
   exactly the jieba ``calc``/``get_DAG`` construction; route ties
   prefer the LONGER word (same tuple-max tie-break as jieba);
3. cut the run along the best route.

``ANALYZERS["cang_jie_dict"]`` exposes the chain (CJK runs segmented
by dictionary, non-CJK runs through the default tokenizer).  A small
built-in demo dictionary makes the path testable end-to-end; real
deployments pass their own ``{word: frequency}`` via
``set_dictionary`` (e.g. loaded from jieba's ``dict.txt``).
"""

from __future__ import annotations

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


def set_dictionary(dictionary: dict[str, int] | None) -> None:
    """Install the process-wide segmentation dictionary (None resets
    to the demo dictionary).  Must be called before any Spark action
    that analyzes with ``cang_jie_dict`` (the analyzer closure ships to
    executors with the active dictionary)."""
    global _ACTIVE
    _ACTIVE = dict(dictionary) if dictionary is not None else None


def _dict() -> dict[str, int]:
    return _ACTIVE if _ACTIVE is not None else DEMO_DICT


def segment(run: str, dictionary: dict[str, int] | None = None) -> list[str]:
    """Cut one CJK run into words by the max-probability DAG route."""
    d = dictionary if dictionary is not None else _dict()
    n = len(run)
    if n == 0:
        return []
    if n == 1:
        return [run]
    max_len = max((len(w) for w in d), default=1)
    total = max(sum(d.values()), 1)
    log_total = math.log(total)
    # DAG[i] = list of end indices j (inclusive) for words run[i:j+1]
    dag: list[list[int]] = []
    for i in range(n):
        ends = [i]  # single char always segments
        for j in range(i + 1, min(n, i + max_len)):
            if run[i : j + 1] in d:
                ends.append(j)
        dag.append(ends)
    # right-to-left DP; tuple max prefers the larger end index on ties
    route: list[tuple[float, int]] = [(0.0, 0)] * (n + 1)
    for i in range(n - 1, -1, -1):
        route[i] = max(
            (
                math.log(d.get(run[i : j + 1], 1)) - log_total
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
