"""Raw query-string parser (Lucene-style grammar → DSL tree).

The reference passes ``{"raw": "..."}`` straight to Tantivy's
``QueryParser`` with ALL schema fields as default fields
(``toshi-server/src/handle.rs:115-119``).  Pinned behaviors:

- ``field:value`` — the value IS analyzed with the field's tokenizer
  (unlike the term DSL node): the reference raw-query test matches
  ``test_text:"Duckiment"`` (capital D) against the indexed lowercase
  term (``handlers/search.rs:129-138``).
- quoted values → phrase (single analyzed token degrades to a term).
- syntax errors → ``Syntax Error: {raw}``
  (``handlers/search.rs:82-90``).
- referencing a stored-but-unindexed field →
  ``The field '{f}' is not declared as indexed``
  (``handlers/search.rs:93-101``).
- implicit occur between clauses is Should (Tantivy default; AND / ``+``
  makes Must, NOT / ``-`` makes MustNot).

Supported grammar::

    query   := clause ((AND|OR)? clause)*
    clause  := [+|-|NOT] primary ['~' DIGIT?] ['^' NUMBER]
    primary := '(' query ')'
             | field ':' '(' query ')'        (field grouping: the
               group's bare terms default to that field)
             | [field ':'] (TERM | '"' TERM* '"' | '[' lo TO hi ']')
    TERM    := analyzer tokens (intra-word '-' and '.' stay in the
               term text and are split by the analyzer — '-' is the
               MustNot operator only at clause start); a term
               containing ``*`` / ``?`` compiles as a WILDCARD via the
               regex automaton (``*``→``.*``, ``?``→``.``; a bare
               ``*`` is match-all); ``term~`` / ``term~N`` compiles as
               a Damerau-Levenshtein fuzzy term (Lucene default N=2)

``clause^boost`` wraps the clause in a BoostQuery (score multiplier),
matching Tantivy's QueryParser.  Wildcard / fuzzy / field-grouping go
BEYOND the reference's parser surface (Tantivy's QueryParser rejects
them) — they lower onto the engine's existing regex/fuzzy automatons,
closing the most-hit gap for Lucene-syntax users.
"""

from __future__ import annotations

import re

from ..analyzer import terms_for
from ..schema import IndexSchema, QueryError
from .dsl import (
    AllQuery,
    BoolQuery,
    BoostQuery,
    ExactTerm,
    FuzzyQuery,
    PhraseQuery,
    Query,
    RangeQuery,
    RegexQuery,
)

_RANGE_RE = re.compile(
    r"""(?P<lb>[\[{])\s*(?P<lo>\*|-?\d+)\s+TO\s+(?P<hi>\*|-?\d+)\s*(?P<rb>[\]}])"""
)

_BOOST_RE = re.compile(r"\^(?P<boost>\d+(?:\.\d+)?)")
_FUZZY_RE = re.compile(r"~(?P<d>\d+)?")

# term text may contain intra-word '-' and '.' (the analyzer splits
# them); it may not START with '-' so the MustNot operator still
# tokenizes at clause start; '*' / '?' mark wildcard terms
_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<and>AND\b)
      | (?P<or>OR\b)
      | (?P<not>NOT\b)
      | (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<plus>\+)
      | (?P<minus>-)
      | (?P<field>[\w][\w.]*)\s*:
      | (?P<quoted>"[^"]*")
      | (?P<term>[\w*?][\w.\-*?]*)
    )""",
    re.VERBOSE | re.UNICODE,
)


class _Parser:
    def __init__(self, raw: str, schema: IndexSchema):
        self.raw = raw
        self.schema = schema
        self.pos = 0
        self.n = len(raw)
        # default-field stack: field grouping `f:(a b)` pins the
        # group's bare terms to f instead of all indexed text fields
        self.field_stack: list[list[str]] = []

    def err(self) -> QueryError:
        return QueryError(f"Syntax Error: {self.raw}")

    def _skip_ws(self) -> None:
        while self.pos < self.n and self.raw[self.pos].isspace():
            self.pos += 1

    def at_end(self) -> bool:
        self._skip_ws()
        return self.pos >= self.n

    def peek_rparen(self) -> bool:
        self._skip_ws()
        return self.pos < self.n and self.raw[self.pos] == ")"

    def next_token(self) -> re.Match:
        m = _TOKEN_RE.match(self.raw, self.pos)
        if not m or m.end() == self.pos:
            raise self.err()
        self.pos = m.end()
        return m

    # --------------------------------------------------------- grammar

    def parse_query(self, depth: int = 0) -> Query:
        """clause ((AND|OR)? clause)* — until EOF or the group's ')'."""
        clauses: list[tuple[str, Query]] = []  # (occur, query)
        pending_occur = "should"
        promote_next_and = False
        while not self.at_end():
            if self.peek_rparen():
                break
            m = self.next_token()
            if m.group("and"):
                # AND promotes both neighbors to must
                if clauses:
                    clauses[-1] = ("must", clauses[-1][1])
                promote_next_and = True
                continue
            if m.group("or"):
                pending_occur = "should"
                continue
            if m.group("not") or m.group("minus"):
                pending_occur = "must_not"
                continue
            if m.group("plus"):
                pending_occur = "must"
                continue
            if m.group("rparen"):
                raise self.err()  # unbalanced ')'

            sub = self._parse_primary(m, depth)
            sub = self._maybe_boost(sub)

            occur = pending_occur
            if promote_next_and:
                occur = "must"
                promote_next_and = False
            pending_occur = "should"
            if sub is not None:
                clauses.append((occur, sub))

        if not clauses:
            raise self.err()
        if len(clauses) == 1 and clauses[0][0] == "should":
            return clauses[0][1]
        return BoolQuery(
            must=[q for o, q in clauses if o == "must"],
            must_not=[q for o, q in clauses if o == "must_not"],
            should=[q for o, q in clauses if o == "should"],
            allow_nested=True,
        )

    def _group(self, depth: int) -> Query:
        sub = self.parse_query(depth + 1)
        self._skip_ws()
        if self.pos >= self.n or self.raw[self.pos] != ")":
            raise self.err()
        self.pos += 1
        return sub

    def _parse_primary(self, m: re.Match, depth: int) -> Query | None:
        if m.group("lparen"):
            return self._group(depth)

        field_name: str | None = None
        if m.group("field"):
            field_name = m.group("field")
            # Lucene range syntax: field:[lo TO hi] / field:{lo TO hi}
            mr = _RANGE_RE.match(self.raw, self.pos)
            if mr:
                self.pos = mr.end()
                return self._range_query(field_name, mr)
            m2 = self.next_token()
            if m2.group("lparen"):
                # field grouping f:(a b): bare terms inside the group
                # default to f (Lucene QueryParser semantics)
                self._check_fields([field_name])
                self.field_stack.append([field_name])
                try:
                    return self._group(depth)
                finally:
                    self.field_stack.pop()
            if not (m2.group("quoted") or m2.group("term")):
                raise self.err()
            value, quoted = (
                (m2.group("quoted")[1:-1], True)
                if m2.group("quoted")
                else (m2.group("term"), False)
            )
        else:
            value, quoted = (
                (m.group("quoted")[1:-1], True)
                if m.group("quoted")
                else (m.group("term"), False)
            )

        if field_name:
            fields = [field_name]
        elif self.field_stack:
            fields = self.field_stack[-1]
        else:
            fields = [
                f.name for f in self.schema.fields
                if f.ftype == "text" and f.indexed
            ]
        self._check_fields(fields)

        # fuzzy suffix: term~ / term~N (Damerau-Levenshtein, Lucene
        # default max edits 2; not analyzed — lowercased only, like
        # Lucene's wildcard/fuzzy term handling)
        mf = _FUZZY_RE.match(self.raw, self.pos)
        if mf and not quoted:
            self.pos = mf.end()
            dist = int(mf.group("d")) if mf.group("d") else 2
            if dist > 2:
                # Lucene caps fuzzy edit distance at 2; a bigger digit
                # string (e.g. `spark~10`) previously misparsed as
                # distance 1 + a new bare term "0" — reject loudly
                raise QueryError(
                    f"Fuzzy distance {dist} out of range (max 2): "
                    f"{self.raw}"
                )
            per = [
                FuzzyQuery(f, value.lower(), distance=dist,
                           transposition=True)
                for f in fields
            ]
            return per[0] if len(per) == 1 else BoolQuery(
                should=per, allow_nested=True
            )

        if not quoted and ("*" in value or "?" in value):
            if value == "*":
                if field_name or self.field_stack:
                    # fielded `f:*` = field-exists (Lucene semantics):
                    # any term in the NAMED field, not match-all-docs
                    per = [RegexQuery(f, ".*") for f in fields]
                    return per[0] if len(per) == 1 else BoolQuery(
                        should=per, allow_nested=True
                    )
                return AllQuery()  # bare unfielded * matches all documents
            pattern = _wildcard_regex(value.lower())
            per = [RegexQuery(f, pattern) for f in fields]
            return per[0] if len(per) == 1 else BoolQuery(
                should=per, allow_nested=True
            )

        return _value_query(self.schema, fields, value, quoted)

    def _check_fields(self, fields: list[str]) -> None:
        for f in fields:
            spec = self.schema.get(f)
            if spec is None:
                raise QueryError(f"Unknown field: {f}")
            if not spec.indexed:
                raise QueryError(
                    f"The field '{f}' is not declared as indexed"
                )

    def _range_query(self, field_name: str, mr: re.Match) -> Query:
        spec = self.schema.get(field_name)
        if spec is None:
            raise QueryError(f"Unknown field: {field_name}")
        if not spec.indexed:
            raise QueryError(
                f"The field '{field_name}' is not declared as indexed"
            )
        lo, hi = mr.group("lo"), mr.group("hi")
        kw: dict = {}
        if lo != "*":
            kw["gte" if mr.group("lb") == "[" else "gt"] = int(lo)
        if hi != "*":
            kw["lte" if mr.group("rb") == "]" else "lt"] = int(hi)
        return RangeQuery(field_name, **kw)

    def _maybe_boost(self, sub: Query | None) -> Query | None:
        """clause^NUMBER → BoostQuery wrapper (Tantivy QueryParser).

        The '^' must immediately follow the clause (no whitespace) —
        a free-standing '^' is a syntax error.
        """
        mb = _BOOST_RE.match(self.raw, self.pos)
        if not mb:
            if self.pos < self.n and self.raw[self.pos] == "^":
                raise self.err()  # '^' without a number
            return sub
        self.pos = mb.end()
        if sub is None:
            return None
        return BoostQuery(sub, float(mb.group("boost")))


def _wildcard_regex(value: str) -> str:
    """Lucene wildcard term → whole-term regex: ``*``→``.*``,
    ``?``→``.``, everything else literal-escaped."""
    out: list[str] = []
    for ch in value:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


def parse_raw(raw: str, schema: IndexSchema) -> Query:
    p = _Parser(raw, schema)
    q = p.parse_query()
    if not p.at_end():
        raise p.err()  # trailing garbage (e.g. unbalanced ')')
    return q


def _value_query(schema: IndexSchema, fields: list[str], value: str,
                 quoted: bool) -> Query | None:
    """Analyze the value per field (with the FIELD's registered
    tokenizer); build term/phrase/multi-field bool."""
    per_field: list[Query] = []
    for f in fields:
        spec = schema.get(f)
        tokens = terms_for(value, spec.tokenizer if spec else "default")
        if not tokens:
            continue
        if quoted and len(tokens) > 1:
            per_field.append(PhraseQuery(f, tokens))
        elif len(tokens) == 1:
            per_field.append(ExactTerm(f, tokens[0]))
        else:
            # unquoted multi-token value: OR of terms (Tantivy default)
            per_field.append(
                BoolQuery(should=[ExactTerm(f, t) for t in tokens], allow_nested=True)
            )
    if not per_field:
        return None
    if len(per_field) == 1:
        return per_field[0]
    return BoolQuery(should=per_field, allow_nested=True)
