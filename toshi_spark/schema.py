"""Index schema: Toshi's {name, type, options} field specs.

Reference shape: schema JSON is an array of field specs
(``toshi-server/src/handlers/index.rs:85-90``, ``requests.http:7-70``).
Field options drive engine behavior (SURVEY.md §1.2):

- ``stored``   → retrievable in results (row store column)
- ``indexed``  → participates in the inverted index / native predicates
- ``fast``     → columnar fast field; required (with stored) for sort_by
  (``toshi-server/src/handle.rs:84-88``)
- ``positions``→ postings carry positions (phrase queries)
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field


class QueryError(Exception):
    """Mirrors Toshi's Error::QueryError strings."""


@dataclass
class FieldSpec:
    name: str
    ftype: str  # text | i64 | u64 | date | facet
    stored: bool = True
    indexed: bool = True
    fast: bool = False
    positions: bool = True  # record: position
    # analyzer registry key (schema "tokenizer" option): Toshi keys
    # extra tokenizers by name, e.g. the feature-gated CJK tokenizer
    # under cang_jie::CANG_JIE (toshi-server/src/lib.rs:57-72) — names
    # normalize case-insensitively so the reference's 'CANG_JIE'
    # spelling resolves
    tokenizer: str = "default"

    def __post_init__(self) -> None:
        self.tokenizer = str(self.tokenizer).lower()


@dataclass
class IndexSchema:
    fields: list[FieldSpec] = dc_field(default_factory=list)

    def get(self, name: str) -> FieldSpec | None:
        for f in self.fields:
            if f.name == name:
                return f
        return None

    def require(self, name: str) -> FieldSpec:
        spec = self.get(name)
        if spec is None:
            raise QueryError(f"Unknown field: {name}")
        return spec

    def require_indexed(self, name: str) -> FieldSpec:
        spec = self.require(name)
        if not spec.indexed:
            raise QueryError(
                f"The field '{name}' is not declared as indexed"
            )
        return spec

    def text_fields(self) -> list[FieldSpec]:
        return [f for f in self.fields if f.ftype == "text" and f.indexed]

    def validate_tokenizers(self) -> None:
        """Raise the pinned QueryError for unregistered tokenizer names
        at schema-accept time (create_index) — NOT later inside an
        executor-side analyze kernel."""
        from .analyzer import get_analyzer

        for f in self.fields:
            try:
                get_analyzer(f.tokenizer)
            except ValueError as e:
                raise QueryError(str(e)) from None

    @classmethod
    def from_json(cls, specs: list[dict]) -> "IndexSchema":
        """Parse the Toshi schema-JSON array shape."""
        out = []
        for s in specs:
            opts = s.get("options", {})
            indexing = opts.get("indexing")
            out.append(
                FieldSpec(
                    name=s["name"],
                    ftype=s["type"],
                    stored=bool(opts.get("stored", True)),
                    indexed=bool(opts.get("indexed", indexing is not None)),
                    fast=bool(opts.get("fast", False)),
                    positions=(
                        indexing.get("record") == "position" if indexing else True
                    ),
                    tokenizer=(
                        indexing.get("tokenizer", "default")
                        if indexing else "default"
                    ),
                )
            )
        return cls(out)


TOSHI_FIXTURE_SCHEMA_SPECS = IndexSchema(
    # reference fixture schema: toshi-server/src/commit.rs:44-55
    [
        FieldSpec("test_text", "text", stored=True, indexed=True, positions=True),
        FieldSpec("test_i64", "i64", stored=True, indexed=True, fast=True),
        FieldSpec("test_u64", "u64", stored=True, indexed=True, fast=True),
        FieldSpec("test_unindex", "text", stored=True, indexed=False),
        FieldSpec("test_facet", "facet", stored=True, indexed=True),
    ]
)
