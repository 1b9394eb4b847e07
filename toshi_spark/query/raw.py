"""Raw query-string parser (Lucene-lite grammar → DSL tree).

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

Supported grammar subset::

    query   := clause ((AND|OR)? clause)*
    clause  := [+|-] [field ':'] (TERM | '"' TERM* '"')
    TERM    := analyzer tokens

Unsupported Lucene syntax (ranges, boosts, wildcards, grouping) raises
the pinned Syntax Error.
"""

from __future__ import annotations

import re

from ..analyzer import terms_only
from ..schema import IndexSchema, QueryError
from .dsl import BoolQuery, ExactTerm, PhraseQuery, Query, RangeQuery

_RANGE_RE = re.compile(
    r"""(?P<lb>[\[{])\s*(?P<lo>\*|-?\d+)\s+TO\s+(?P<hi>\*|-?\d+)\s*(?P<rb>[\]}])"""
)

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<and>AND\b)
      | (?P<or>OR\b)
      | (?P<not>NOT\b)
      | (?P<plus>\+)
      | (?P<minus>-)
      | (?P<field>[\w][\w.]*)\s*:
      | (?P<quoted>"[^"]*")
      | (?P<term>[\w][\w.]*)
    )""",
    re.VERBOSE | re.UNICODE,
)


def parse_raw(raw: str, schema: IndexSchema) -> Query:
    pos = 0
    clauses: list[tuple[str, Query]] = []  # (occur, query)
    pending_occur = "should"
    promote_next_and = False
    n = len(raw)
    while pos < n:
        if raw[pos].isspace():
            pos += 1
            continue
        m = _TOKEN_RE.match(raw, pos)
        if not m or m.end() == pos:
            raise QueryError(f"Syntax Error: {raw}")
        pos = m.end()
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

        field_name: str | None = None
        if m.group("field"):
            field_name = m.group("field")
            # Lucene range syntax: field:[lo TO hi] / field:{lo TO hi}
            mr = _RANGE_RE.match(raw, pos)
            if mr:
                pos = mr.end()
                spec = schema.get(field_name)
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
                occur = pending_occur
                if promote_next_and:
                    occur = "must"
                    promote_next_and = False
                pending_occur = "should"
                clauses.append((occur, RangeQuery(field_name, **kw)))
                continue
            m2 = _TOKEN_RE.match(raw, pos)
            if not m2 or not (m2.group("quoted") or m2.group("term")):
                raise QueryError(f"Syntax Error: {raw}")
            pos = m2.end()
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

        occur = pending_occur
        if promote_next_and:
            occur = "must"
            promote_next_and = False
        pending_occur = "should"

        fields = [field_name] if field_name else [
            f.name for f in schema.fields if f.ftype == "text" and f.indexed
        ]
        for f in fields:
            spec = schema.get(f)
            if spec is None:
                raise QueryError(f"Unknown field: {f}")
            if not spec.indexed:
                raise QueryError(f"The field '{f}' is not declared as indexed")

        sub = _value_query(fields, value, quoted)
        if sub is not None:
            clauses.append((occur, sub))

    if not clauses:
        raise QueryError(f"Syntax Error: {raw}")
    if len(clauses) == 1 and clauses[0][0] == "should":
        return clauses[0][1]
    return BoolQuery(
        must=[q for o, q in clauses if o == "must"],
        must_not=[q for o, q in clauses if o == "must_not"],
        should=[q for o, q in clauses if o == "should"],
        allow_nested=True,
    )


def _value_query(fields: list[str], value: str, quoted: bool) -> Query | None:
    """Analyze the value per field; build term/phrase/multi-field bool."""
    tokens = terms_only(value)
    if not tokens:
        return None
    per_field: list[Query] = []
    for f in fields:
        if quoted and len(tokens) > 1:
            per_field.append(PhraseQuery(f, tokens))
        elif len(tokens) == 1:
            per_field.append(ExactTerm(f, tokens[0]))
        else:
            # unquoted multi-token value: OR of terms (Tantivy default)
            per_field.append(
                BoolQuery(should=[ExactTerm(f, t) for t in tokens], allow_nested=True)
            )
    if len(per_field) == 1:
        return per_field[0]
    return BoolQuery(should=per_field, allow_nested=True)
