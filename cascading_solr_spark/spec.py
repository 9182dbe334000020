"""Index spec + eager fail-fast schema validation.

Mirrors the reference's plan-time validation contract
(core/SolrSchemeUtil.java:40-107, called from the scheme constructors at
hadoop/SolrScheme.java:51 and local/SolrScheme.java:48): validation happens
on the client BEFORE any job is submitted, and raises on

1. a sink field that does not exist in the schema
   ("Sink field name doesn't exist in Solr schema",
   core/SolrSchemeUtil.java:87-94) — here: a spec column missing from the
   input DataFrame schema;
2. a required schema field not bound by any sink field
   ("No sink field name for required Solr field",
   core/SolrSchemeUtil.java:96-101) — here: a missing key/content column.
   The reference's only required field is the unique key ``id``
   (schema.xml:100, <uniqueKey>id</uniqueKey> schema.xml:224); ours is the
   composite key (repo, path, commit) plus the analyzed ``content``.

No embedded server boot is needed: the check is pure Python over a
StructType, same fail-fast semantics at zero cost.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


class IndexSpecError(ValueError):
    """Plan-time validation failure (the TapException analogue)."""


@dataclass(frozen=True)
class IndexSpec:
    """Configuration of one inverted index build.

    BM25 parameters fixed at the Lucene-modern defaults k1=1.2, b=0.75
    (BASELINE.json north_star; the reference schema leaves <similarity>
    commented, schema.xml:1097-1105, deferring to Lucene's default).
    """

    content_field: str = "content"
    key_fields: tuple[str, ...] = ("repo", "path", "commit")
    stored_fields: tuple[str, ...] = ("repo", "path", "commit", "lang")
    # untokenized exact-match fields indexed as "field:value" terms — the
    # StrField analogue (schema.xml:288).  array<string> columns are
    # multi-valued (schema.xml:104): each element becomes a membership term
    # (SolrWriter.java:67-71 tuple-explode); nulls are skipped.
    keyword_fields: tuple[str, ...] = ()
    # EXTRA analyzed text fields (beyond content_field), indexed with
    # namespaced terms "field:token" and PER-FIELD length normalization
    # (each posting packs that field's dl; per-field avgdl rides meta) —
    # the multi-field schema the reference's eDisMax /browse handler
    # queries with per-field boosts (solrconfig.xml:872-877 qf).  Nulls /
    # empty fields contribute no postings (SolrWriter.java:65-66 null-skip).
    text_fields: tuple[str, ...] = ()
    doc_id_field: str | None = None  # pre-existing dense doc id, else derived
    k1: float = 1.2
    b: float = 0.75
    num_shards: int = 8  # reference: one shard per reducer (README.md:7-8)
    block_size: int = 128  # docs per block-max block
    # terms whose df exceeds this fraction of N get salted in the build
    # shuffle (stopword-grade code tokens: import/return/def/...).
    hot_term_df_ratio: float = 0.05
    # hot-term detection runs on a seeded sample of ~this many docs (full
    # corpus when it is smaller): the hot SET only steers salting, so an
    # estimate is sufficient — and it avoids materializing the full
    # (term, doc) pass twice at 10^12-file scale.
    hot_sample_docs: int = 20_000
    salt_buckets: int = 8
    # SPIMI in-partition flush threshold, the analogue of the reference's
    # 500-doc micro-batch (core/SolrWriter.java:20 MAX_DOCS_PER_ADD).
    batch_rows: int = 10_000
    # index term positions (Lucene .pos analogue: delta-varint per-posting
    # position lists riding the postings rows) — enables phrase queries
    # (schema.xml text fields index positions by default; the reference's
    # embedded Solr answers phrase queries out of the box).  Off by default:
    # positions cost ~1 varint per token of extra postings payload.
    positions: bool = False

    def __post_init__(self) -> None:
        if self.num_shards < 1:
            raise IndexSpecError(f"num_shards must be >= 1, got {self.num_shards}")
        if self.block_size < 1:
            raise IndexSpecError(f"block_size must be >= 1, got {self.block_size}")
        if self.salt_buckets < 1:
            raise IndexSpecError(f"salt_buckets must be >= 1, got {self.salt_buckets}")
        if not self.key_fields and self.doc_id_field is None:
            raise IndexSpecError("need key_fields or doc_id_field for unique doc ids")
        overlap = set(self.text_fields) & (
            set(self.keyword_fields) | {self.content_field}
        )
        if overlap:
            # text_fields share the keyword "field:" term namespace, so a
            # field indexed both ways would collide; content is already the
            # default (un-namespaced) text field
            raise IndexSpecError(
                f"text_fields must be disjoint from keyword_fields and "
                f"content_field, overlap: {sorted(overlap)}"
            )


def validate_schema(schema: T.StructType, spec: IndexSpec) -> None:
    """Fail fast before job submission (core/SolrSchemeUtil.java:87-101 analogue).

    Raises :class:`IndexSpecError` listing every problem at once.
    """
    by_name = {f.name: f for f in schema.fields}
    problems: list[str] = []

    required = [
        spec.content_field,
        *spec.key_fields,
        *spec.stored_fields,
        *spec.keyword_fields,
        *spec.text_fields,
    ]
    if spec.doc_id_field:
        required.append(spec.doc_id_field)
    for name in dict.fromkeys(required):
        if name not in by_name:
            problems.append(
                f"spec field {name!r} doesn't exist in input schema "
                f"(have: {sorted(by_name)})"
            )

    cf = by_name.get(spec.content_field)
    if cf is not None and not isinstance(cf.dataType, T.StringType):
        problems.append(
            f"content field {spec.content_field!r} must be string, "
            f"got {cf.dataType.simpleString()}"
        )
    for name in spec.text_fields:
        tf_field = by_name.get(name)
        if tf_field is not None and not isinstance(tf_field.dataType, T.StringType):
            problems.append(
                f"text field {name!r} must be string, "
                f"got {tf_field.dataType.simpleString()}"
            )
    for name in spec.keyword_fields:
        kf = by_name.get(name)
        if kf is None:
            continue
        ok = isinstance(kf.dataType, T.StringType) or (
            isinstance(kf.dataType, T.ArrayType)
            and isinstance(kf.dataType.elementType, T.StringType)
        )
        if not ok:
            problems.append(
                f"keyword field {name!r} must be string or array<string>, "
                f"got {kf.dataType.simpleString()}"
            )
    if spec.doc_id_field:
        df_field = by_name.get(spec.doc_id_field)
        if df_field is not None and not isinstance(
            df_field.dataType, (T.LongType, T.IntegerType)
        ):
            problems.append(
                f"doc_id field {spec.doc_id_field!r} must be int/long, "
                f"got {df_field.dataType.simpleString()}"
            )

    if problems:
        raise IndexSpecError("; ".join(problems))
