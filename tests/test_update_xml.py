"""Round-5h update surface: the XML /update loader (solrconfig.xml:968
UpdateRequestHandler) and atomic updates (Solr 4.x field modifiers
set/inc/add — read-modify-rewrite over the uniqueKey)."""

import pytest
from pyspark.sql import functions as F

from cascading_solr_spark.corpus import synth_corpus
from cascading_solr_spark.indexing import atomic_update, build_index
from cascading_solr_spark.query.search import match_ids, search
from cascading_solr_spark.sources import read_documents_xml
from cascading_solr_spark.spec import IndexSpec, IndexSpecError

# --- XML loader -------------------------------------------------------------


def _write_xml(d, name, docs):
    rows = []
    for doc in docs:
        fields = "".join(
            f'<field name="{k}">{v}</field>' for k, v in doc
        )
        rows.append(f"<doc>{fields}</doc>")
    (d / name).write_text(f"<add>{''.join(rows)}</add>")


def test_read_documents_xml(spark, tmp_path):
    d = tmp_path / "xml"
    d.mkdir()
    _write_xml(
        d, "a.xml",
        [
            [("id", "1"), ("name", "TurboWriter 2.3"),
             ("cat", "wordprocessor"), ("cat", "Japanese")],
            [("id", "2"), ("name", "Shasta 1.0"), ("cat", "Chinese")],
        ],
    )
    _write_xml(d, "b.xml", [[("id", "3"), ("name", "Third"), ("cat", "x")]])
    df = read_documents_xml(spark, str(d), glob="*.xml")
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {"1", "2", "3"}
    # repeated <field name="cat"> = multi-valued membership, comma-joined
    assert rows["1"]["cat"] == "wordprocessor,Japanese"
    assert rows["2"]["name"] == "Shasta 1.0"
    assert sorted(df.columns) == ["cat", "id", "name"]


def test_read_documents_xml_empty_dir(spark, tmp_path):
    d = tmp_path / "nox"
    d.mkdir()
    with pytest.raises(FileNotFoundError):
        read_documents_xml(spark, str(d), glob="*.xml")


# --- atomic updates ---------------------------------------------------------

AU_SPEC = IndexSpec(
    num_shards=2,
    salt_buckets=2,
    block_size=16,
    keyword_fields=("lang",),
    stored_fields=("repo", "path", "commit", "lang", "content", "views", "tags"),
)


@pytest.fixture()
def ixdir(spark, tmp_path):
    out = str(tmp_path / "auix")
    corpus = (
        synth_corpus(spark, 120, partitions=4)
        .withColumn("views", (F.length("content") % 7).cast("long"))
        .withColumn("tags", F.lit(None).cast("string"))
    )
    build_index(spark, corpus, AU_SPEC, out)
    return out


def _keys_of(spark, ix, n=3):
    return (
        ix.docs(spark)
        .select("repo", "path", "commit", "views")
        .orderBy("path")
        .limit(n)
        .collect()
    )


def test_atomic_set_inc_add(spark, ixdir):
    from cascading_solr_spark.indexing.build import Index

    ix0 = Index.load(ixdir)
    n0 = match_ids(spark, ix0, "*:*").count()
    targets = _keys_of(spark, ix0, 3)
    updates = spark.createDataFrame(
        [
            (t["repo"], t["path"], t["commit"], "zz", 5, "hot")
            for t in targets
        ],
        "repo string, path string, commit string, lang string, "
        "views long, tags string",
    )
    ix = atomic_update(
        spark, ixdir, updates,
        {"lang": "set", "views": "inc", "tags": "add"},
    )
    # live doc count unchanged (replace, not insert)
    assert match_ids(spark, ix, "*:*").count() == n0
    # keyword postings reflect the set: exactly the 3 rewritten docs
    got = search(spark, ix, "lang:zz *:*", k=None).select(
        "repo", "path", "commit", "lang", "views", "tags"
    ).collect()
    assert len(got) == 3
    want = {(t["repo"], t["path"], t["commit"]): t["views"] for t in targets}
    for r in got:
        assert r["lang"] == "zz"
        assert r["views"] == want[(r["repo"], r["path"], r["commit"])] + 5
        assert r["tags"] == "hot"  # add onto NULL = the value itself
    # a second add appends comma-joined
    ix = atomic_update(
        spark, ixdir,
        updates.select("repo", "path", "commit", "tags"),
        {"tags": "add"},
    )
    r = search(spark, ix, "lang:zz *:*", k=None).select("tags").collect()
    assert {x["tags"] for x in r} == {"hot,hot"}


def test_atomic_update_guards(spark, ixdir):
    upd = spark.createDataFrame(
        [("nope", "nope", "nope", "zz")],
        "repo string, path string, commit string, lang string",
    )
    with pytest.raises(IndexSpecError, match="no live document"):
        atomic_update(spark, ixdir, upd, {"lang": "set"})
    with pytest.raises(IndexSpecError, match="unknown modifiers"):
        atomic_update(spark, ixdir, upd, {"lang": "replace"})
    with pytest.raises(IndexSpecError, match="key fields"):
        atomic_update(spark, ixdir, upd, {"path": "set"})


def test_atomic_update_needs_all_stored(spark, tmp_path):
    out = str(tmp_path / "thin")
    build_index(
        spark,
        synth_corpus(spark, 40, partitions=2),
        IndexSpec(num_shards=1, stored_fields=("repo", "path", "commit")),
        out,
    )
    upd = spark.createDataFrame(
        [("r", "p", "c")], "repo string, path string, commit string"
    )
    with pytest.raises(IndexSpecError, match="not stored"):
        atomic_update(spark, out, upd, {"repo": "set"})
