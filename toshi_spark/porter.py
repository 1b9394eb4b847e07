"""Snowball English stemmer ("Porter2", M.F. Porter, snowballstem.org
— the public algorithm definition).

Fills the ``en_stem`` analyzer-registry slot: Tantivy registers an
``en_stem`` tokenizer by default (simple tokenizer → remove-long →
lowercase → English Snowball stemmer via rust-stemmers,
``toshi-server/src/lib.rs:57-77``).  Earlier rounds shipped the
original 1980 Porter algorithm here; this module now implements the
Snowball revision the reference actually uses, so stemmed-field index
terms match the reference for the word classes where the two
algorithms diverge (-ly handling, exception words, R1/R2 regions).

Implementation notes (terminology from the published definition):
- vowels: a e i o u y; a ``y`` that starts the word or follows a vowel
  is marked ``Y`` (consonant) in the prelude and restored at the end.
- R1 = region after the first non-vowel following a vowel (special
  prefixes gener-/commun-/arsen- pin R1 to the prefix end);
  R2 = same construction applied inside R1.  Both are computed ONCE as
  cursor positions and never recomputed — suffix edits only touch the
  word's tail, exactly like the Snowball runtime.
- a "short syllable" is non-vowel + vowel + non-vowel(≠ w, x, Y) at
  the end, or vowel + non-vowel comprising the whole word head; a word
  is "short" if it ends in a short syllable and R1 is null.
- each step applies only its LONGEST matching suffix; if that one's
  condition fails, the step does nothing (no shorter-suffix retry).
"""

from __future__ import annotations

_VOWELS = set("aeiouy")  # marked 'Y' is deliberately NOT a vowel

_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

_LI_ENDINGS = set("cdeghkmnrt")

# whole-word special forms (checked before anything else)
_EXCEPTION1 = {
    "skis": "ski", "skies": "sky",
    "dying": "die", "lying": "lie", "tying": "tie",
    "idly": "idl", "gently": "gentl", "ugly": "ugli", "early": "earli",
    "only": "onli", "singly": "singl",
    # invariants
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

# invariant after step 1a
_EXCEPTION2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)

_STEP2 = [
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"),
    ("tional", "tion"), ("biliti", "ble"), ("lessli", "less"),
    ("entli", "ent"), ("ation", "ate"), ("alism", "al"),
    ("aliti", "al"), ("ousli", "ous"), ("iviti", "ive"),
    ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", "og"), ("li", ""),
]

_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
    ("ical", "ic"), ("ness", ""), ("ful", ""),
]

_STEP4 = [
    "ement",
    "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
    "al", "er", "ic",
]


def _is_v(c: str) -> bool:
    return c in _VOWELS


def _region_after(w: str, begin: int) -> int:
    """Index after the first non-vowel that follows a vowel, scanning
    pairs whose vowel sits at position ≥ ``begin``; len(w) if none."""
    for i in range(begin + 1, len(w)):
        if not _is_v(w[i]) and _is_v(w[i - 1]):
            return i + 1
    return len(w)


def _compute_r1(w: str) -> int:
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            return len(pre)
    return _region_after(w, 0)


def _ends_short_syllable(w: str) -> bool:
    n = len(w)
    if n == 2:
        return _is_v(w[0]) and not _is_v(w[1])
    if n >= 3:
        return (
            not _is_v(w[-3])
            and _is_v(w[-2])
            and not _is_v(w[-1])
            and w[-1] not in "wxY"
        )
    return False


def _longest_suffix(w: str, suffixes) -> str | None:
    best = None
    for s in suffixes:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


def stem(word: str) -> str:
    """Stem one (lowercase) word with the Snowball English algorithm."""
    w = word
    if w.startswith("'"):
        w = w[1:]
    if w in _EXCEPTION1:
        return _EXCEPTION1[w]
    if len(w) < 3:
        return w

    # prelude: mark consonant y as Y (initial, or right after a vowel)
    chars = list(w)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and _is_v(chars[i - 1]):
            chars[i] = "Y"
    w = "".join(chars)

    r1 = _compute_r1(w)
    r2 = _region_after(w, r1)

    def in_r1(suffix: str) -> bool:
        return len(w) - len(suffix) >= r1

    def in_r2(suffix: str) -> bool:
        return len(w) - len(suffix) >= r2

    # ---- step 0: longest among  '   's   's'
    for s in ("'s'", "'s", "'"):
        if w.endswith(s):
            w = w[: -len(s)]
            break

    # ---- step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        # delete if the preceding part contains a vowel NOT immediately
        # before the s (gas→gas, this→this, gaps→gap, kiwis→kiwi)
        if any(_is_v(c) for c in w[:-2]):
            w = w[:-1]

    if w in _EXCEPTION2:
        return w

    # ---- step 1b: longest among  eed eedly ed edly ing ingly
    suf = _longest_suffix(w, ("eedly", "ingly", "edly", "eed", "ing", "ed"))
    if suf in ("eed", "eedly"):
        if in_r1(suf):
            w = w[: -len(suf)] + "ee"
    elif suf is not None:
        if any(_is_v(c) for c in w[: -len(suf)]):
            w = w[: -len(suf)]
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif w.endswith(_DOUBLES):
                w = w[:-1]
            elif r1 >= len(w) and _ends_short_syllable(w):
                w = w + "e"

    # ---- step 1c: y/Y → i after a non-initial non-vowel
    if (
        len(w) > 2
        and w[-1] in "yY"
        and not _is_v(w[-2])
    ):
        w = w[:-1] + "i"

    # ---- step 2 (longest match; act only if in R1)
    suf = _longest_suffix(w, [s for s, _ in _STEP2])
    if suf is not None and in_r1(suf):
        repl = dict(_STEP2)[suf]
        stem_part = w[: -len(suf)]
        if suf == "ogi":
            if stem_part.endswith("l"):
                w = stem_part + repl
        elif suf == "li":
            if stem_part and stem_part[-1] in _LI_ENDINGS:
                w = stem_part
        else:
            w = stem_part + repl

    # ---- step 3 (longest match; act only if in R1)
    suf = _longest_suffix(w, [s for s, _ in _STEP3])
    if suf is not None and in_r1(suf):
        if suf == "ative":
            if in_r2(suf):
                w = w[: -len(suf)]
        else:
            w = w[: -len(suf)] + dict(_STEP3)[suf]

    # ---- step 4 (longest match; act only if in R2)
    suf = _longest_suffix(w, _STEP4)
    if suf is not None and in_r2(suf):
        if suf == "ion":
            if w[: -3].endswith(("s", "t")):
                w = w[:-3]
        else:
            w = w[: -len(suf)]

    # ---- step 5
    if w.endswith("e"):
        if in_r2("e") or (in_r1("e") and not _ends_short_syllable(w[:-1])):
            w = w[:-1]
    elif w.endswith("l"):
        if in_r2("l") and len(w) >= 2 and w[-2] == "l":
            w = w[:-1]

    return w.replace("Y", "y")
