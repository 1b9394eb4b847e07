"""Porter stemmer (M.F. Porter, "An algorithm for suffix stripping",
Program 14(3), 1980 — the public-domain algorithm definition).

Fills the ``en_stem`` analyzer-registry slot: Tantivy registers an
``en_stem`` tokenizer by default (simple tokenizer → remove-long →
lowercase → English stemmer).  Tantivy uses the Snowball ("Porter2")
variant; without its reference tables verifiable offline, this module
pins the ORIGINAL Porter algorithm exactly as published, with the
paper's worked examples committed as test vectors.  The two differ on
a small tail of words — documented deviation in COVERAGE.md.

Notation from the paper: a word is [C](VC)^m[V]; conditions on the
stem (the part before the candidate suffix):
  m      — the measure (number of VC sequences)
  *v*    — stem contains a vowel
  *d     — stem ends with a double consonant
  *o     — stem ends cvc where the final c is not w, x or y
Vowels: a e i o u, plus y when preceded by a consonant.
"""

from __future__ import annotations

_VOWELS = set("aeiou")


def _is_consonant(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        v = not _is_consonant(stem, i)
        if not v and prev_vowel:
            m += 1
        prev_vowel = v
    return m


def _contains_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(stem: str) -> bool:
    return (
        len(stem) >= 2
        and stem[-1] == stem[-2]
        and _is_consonant(stem, len(stem) - 1)
    )


def _ends_cvc(stem: str) -> bool:
    if len(stem) < 3:
        return False
    return (
        _is_consonant(stem, len(stem) - 3)
        and not _is_consonant(stem, len(stem) - 2)
        and _is_consonant(stem, len(stem) - 1)
        and stem[-1] not in "wxy"
    )


def _rule_list(word: str, rules, cond=None) -> str | None:
    """Apply the longest-suffix-match rule of a step; None = no match.

    Per the paper, within one step only the rule with the longest
    matching suffix is considered — if its condition fails, the word
    is left unchanged (later rules are NOT tried).
    """
    best = None
    for suffix, repl in rules:
        if word.endswith(suffix) and (best is None or
                                      len(suffix) > len(best[0])):
            best = (suffix, repl)
    if best is None:
        return None
    suffix, repl = best
    stem = word[: len(word) - len(suffix)]
    if cond is None or cond(stem):
        return stem + repl
    return word


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
    ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def stem(word: str) -> str:
    """Stem one lowercase word (non-alpha input returned unchanged)."""
    if len(word) <= 2 or not word.isalpha():
        return word
    w = word

    # ---- step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # ---- step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _contains_vowel(w[:-2]):
            w = w[:-2]
            flag_1b = True
    elif w.endswith("ing"):
        if _contains_vowel(w[:-3]):
            w = w[:-3]
            flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif _ends_double_consonant(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w = w + "e"

    # ---- step 1c
    if w.endswith("y") and _contains_vowel(w[:-1]):
        w = w[:-1] + "i"

    # ---- step 2
    out = _rule_list(w, _STEP2, cond=lambda s: _measure(s) > 0)
    if out is not None:
        w = out

    # ---- step 3
    out = _rule_list(w, _STEP3, cond=lambda s: _measure(s) > 0)
    if out is not None:
        w = out

    # ---- step 4
    best = None
    for suffix in _STEP4:
        if w.endswith(suffix) and (best is None or len(suffix) > len(best)):
            best = suffix
    if best is not None:
        s = w[: len(w) - len(best)]
        if best == "ion":
            if _measure(s) > 1 and s.endswith(("s", "t")):
                w = s
        elif _measure(s) > 1:
            w = s

    # ---- step 5a
    if w.endswith("e"):
        s = w[:-1]
        m = _measure(s)
        if m > 1 or (m == 1 and not _ends_cvc(s)):
            w = s

    # ---- step 5b
    if _measure(w) > 1 and _ends_double_consonant(w) and w.endswith("l"):
        w = w[:-1]

    return w
