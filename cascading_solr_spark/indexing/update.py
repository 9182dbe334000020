"""Atomic updates — Solr 4.x field modifiers (``{"id":1, "price":
{"set":99}}`` through the /update handlers, solrconfig.xml:968).

Solr's atomic updates are implemented server-side as read-modify-rewrite:
the stored document is fetched, modifiers applied, and the result re-added
under the same uniqueKey (old version tombstoned).  That is exactly the
shape here, distributed: one join of the update batch against the doc
store, modifier arithmetic JVM-side, then the existing
``append_documents(overwrite=True)`` update path (tombstone + fresh
segment — Lucene's updateDocument).

Solr's own precondition carries over verbatim: EVERY indexed field must be
stored (the rewrite has to reconstruct the full document).  The spec is
validated up front and the call refuses loudly otherwise — silent field
loss is the classic atomic-update footgun this guards against.

Supported modifiers (the Solr 4.x set): ``set`` (replace; a null value
removes the field — Solr's ``set null``), ``inc`` (numeric increment),
``add`` (append to a multi-valued field; this engine stores multi-values
comma-joined, same documented rule as the XML loader).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cascading_solr_spark.indexing.append import append_documents
from cascading_solr_spark.indexing.build import Index
from cascading_solr_spark.spec import IndexSpecError

_MODIFIERS = ("set", "inc", "add")


def atomic_update(
    spark: SparkSession,
    index_dir: str,
    updates: DataFrame,
    modifiers: dict[str, str],
    batch_id: str | None = None,
) -> Index:
    """Apply field modifiers to existing documents.

    ``updates`` carries the spec's key_fields plus one column per modified
    field; ``modifiers`` maps each modified field to ``set`` / ``inc`` /
    ``add``.  Keys that match no live document raise (Solr would create a
    new doc from the partial field set — with required content that is
    never reconstructible, so this engine refuses; add new docs through
    append_documents).

    Cost: one docs-table join against the (small) update batch + the
    O(batch) overwrite-append — never a full index rewrite.
    """
    index = Index.load(index_dir)
    spec = index.spec
    if spec.doc_id_field:
        raise IndexSpecError(
            "atomic updates need key_fields (uniqueKey semantics)"
        )
    keys = list(spec.key_fields)
    required = set(
        (spec.content_field, *spec.stored_fields, *spec.keyword_fields,
         *spec.text_fields, *keys)
    )
    not_stored = sorted(required - set(spec.stored_fields))
    if not_stored:
        raise IndexSpecError(
            f"atomic updates need every indexed field stored to reconstruct "
            f"the document (Solr's own precondition); not stored: "
            f"{not_stored!r}"
        )
    bad = {f: m for f, m in modifiers.items() if m not in _MODIFIERS}
    if bad:
        raise IndexSpecError(
            f"unknown modifiers {bad!r} (supported: {_MODIFIERS})"
        )
    unkeyable = sorted(set(modifiers) & set(keys))
    if unkeyable:
        raise IndexSpecError(f"cannot modify key fields {unkeyable!r}")

    renamed = updates
    for f in modifiers:
        renamed = renamed.withColumnRenamed(f, f"_mod_{f}")
    # live filter by doc_id BEFORE dropping it — old and new versions of an
    # updated doc share their keys, so a key-level filter cannot tell a
    # tombstoned row from its replacement
    docs = index.docs(spark).drop("shard", "sha256")
    if index.has_deletes:
        docs = docs.join(
            F.broadcast(index.deleted_ids(spark)), "doc_id", "left_anti"
        )
    docs = docs.drop("doc_id")
    n_missing = renamed.join(
        docs.select(*keys).distinct(), keys, "left_anti"
    ).count()
    if n_missing:
        raise IndexSpecError(
            f"{n_missing} update row(s) match no live document "
            f"(atomic updates modify existing docs; use append_documents "
            f"for new ones)"
        )
    joined = docs.join(F.broadcast(renamed), keys)

    cols = []
    for c in docs.columns:
        if c in modifiers:
            mod, new = modifiers[c], F.col(f"_mod_{c}")
            if mod == "set":
                cols.append(new.alias(c))
            elif mod == "inc":
                cols.append((F.col(c) + F.coalesce(new, F.lit(0))).alias(c))
            else:  # add: comma-join multi-value append (documented rule)
                cols.append(
                    F.when(new.isNull(), F.col(c))
                    .when(F.col(c).isNull(), new.cast("string"))
                    .otherwise(F.concat_ws(",", F.col(c), new.cast("string")))
                    .alias(c)
                )
        else:
            cols.append(F.col(c))
    rebuilt = joined.select(*cols)
    # MATERIALIZE before appending: the rebuilt plan READS this index's own
    # docs table, and append writes to it — Spark's lazy re-evaluation of a
    # self-referential plan mid-append produces duplicate-doc postings (the
    # classic read-modify-write hazard; observed, not theoretical).  One
    # O(batch) temp-parquet round-trip cuts the lineage; distributed, never
    # a driver collect.
    import shutil
    import uuid

    tmp = os.path.join(index_dir, f"_atomic_tmp_{uuid.uuid4().hex[:12]}")
    try:
        rebuilt.write.parquet(tmp)
        return append_documents(
            spark,
            index_dir,
            spark.read.parquet(tmp),
            batch_id=batch_id,
            overwrite=True,
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
