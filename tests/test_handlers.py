"""Auxiliary handler analogues: /analysis/field, /analysis/document,
/admin/luke, /admin/ping (solrconfig.xml:1030,1065,1078,1099) and the
/update/json + /update/csv document loaders (:981,:986)."""

import pytest
from pyspark.sql import functions as F

from cascading_solr_spark.analyzer import tokenize
from cascading_solr_spark.corpus import synth_corpus
from cascading_solr_spark.handlers import (
    analysis_document,
    analysis_field,
    luke_overview,
    luke_top_terms,
    ping,
)
from cascading_solr_spark.indexing.build import build_index
from cascading_solr_spark.sources import read_documents_csv, read_documents_json
from cascading_solr_spark.spec import IndexSpec, IndexSpecError

H_SPEC = IndexSpec(
    num_shards=2,
    keyword_fields=("lang",),
    text_fields=("path",),
    stored_fields=("repo", "path", "lang"),
)


@pytest.fixture(scope="module")
def ix(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("hix") / "ix")
    return build_index(
        spark, synth_corpus(spark, 200, partitions=4), H_SPEC, out
    )


# ------------------------------------------------------------- /analysis


def test_analysis_field_positions(spark):
    rows = [
        (r["position"], r["term"])
        for r in analysis_field(spark, "content", "a TurboWriter b").collect()
    ]
    # WordDelimiter splitting: catenated whole overlaps its first part
    assert rows == [(0, "a"), (1, "turbo"), (2, "writer"), (1, "turbowriter"),
                    (3, "b")]


def test_analysis_field_empty_and_null(spark):
    assert analysis_field(spark, "content", None).count() == 0
    assert analysis_field(spark, "content", "").count() == 0


def test_analysis_document_per_field(spark):
    doc = {
        "content": "parse buffer",
        "path": "src/parse.py",
        "lang": "Python",
    }
    out = analysis_document(spark, H_SPEC, doc).collect()
    by_field = {}
    for r in out:
        by_field.setdefault(r["field"], []).append(r["term"])
    assert by_field["content"] == ["parse", "buffer"]
    assert by_field["path"] == tokenize("src/parse.py")
    # keyword field: exact untokenized value (StrField, schema.xml:71)
    assert by_field["lang"] == ["Python"]
    # absent field emits nothing (null-skip)
    out2 = analysis_document(spark, H_SPEC, {"content": "x"}).collect()
    assert {r["field"] for r in out2} == {"content"}


# ------------------------------------------------------------ /admin/luke


def test_luke_overview_matches_dict(spark, ix):
    rows = {r["field"]: r for r in luke_overview(spark, ix).collect()}
    assert set(rows) == {"content", "lang", "path"}
    d = ix.term_dict(spark)
    n_lang = d.filter(F.col("term").startswith("lang:")).count()
    assert rows["lang"]["n_terms"] == n_lang
    assert rows["content"]["n_terms"] == (
        d.count()
        - n_lang
        - d.filter(F.col("term").startswith("path:")).count()
    )
    # every doc has exactly one lang value -> sum_df == n_docs
    assert int(rows["lang"]["sum_df"]) == ix.n_docs


def test_luke_top_terms_content_and_keyword(spark, ix):
    top = luke_top_terms(spark, ix, "content", k=5).collect()
    assert len(top) == 5
    dfs = [int(r["df"]) for r in top]
    assert dfs == sorted(dfs, reverse=True)
    assert all(":" not in r["term"] for r in top)
    langs = luke_top_terms(spark, ix, "lang", k=10).collect()
    assert {r["term"] for r in langs} == {
        "python", "java", "scala", "go", "javascript"
    }
    with pytest.raises(ValueError, match="unknown field"):
        luke_top_terms(spark, ix, "nope")


# ------------------------------------------------------------ /admin/ping


def test_ping_ok_and_fail(spark, ix, tmp_path):
    ok = ping(spark, ix.path).collect()[0]
    assert ok["status"] == "OK" and int(ok["n_docs"]) == ix.n_docs
    bad = ping(spark, str(tmp_path / "nope")).collect()[0]
    assert bad["status"] == "FAIL" and int(bad["n_docs"]) == 0


# ------------------------------------------------------- document loaders


def test_read_documents_json_roundtrip(spark, tmp_path, ix):
    src = synth_corpus(spark, 50, partitions=2)
    p = str(tmp_path / "docs_json")
    src.write.json(p)
    spec = H_SPEC
    df = read_documents_json(spark, p, spec=spec)
    assert df.count() == 50
    assert set(df.columns) >= {"repo", "path", "lang", "content"}
    # loader output builds a working index
    out = str(tmp_path / "ixj")
    ix2 = build_index(spark, df, spec, out)
    assert ix2.n_docs == 50


def test_read_documents_json_multiline_array(spark, tmp_path):
    p = tmp_path / "arr.json"
    p.write_text(
        '[{"content": "a b", "doc_id": 1}, {"content": "c", "doc_id": 2}]'
    )
    df = read_documents_json(spark, str(p), multiline=True)
    assert df.count() == 2


def test_read_documents_csv_with_schema_and_validation(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text("doc_id,content,lang\n1,parse buffer,python\n2,merge,go\n")
    df = read_documents_csv(
        spark, str(p),
        schema="doc_id long, content string, lang string",
        spec=IndexSpec(
            doc_id_field="doc_id", key_fields=(), keyword_fields=("lang",),
            stored_fields=("lang",),
        ),
    )
    assert df.count() == 2
    with pytest.raises(IndexSpecError):
        read_documents_csv(
            spark, str(p),
            schema="doc_id long, content string, lang string",
            spec=IndexSpec(content_field="body"),
        )


def test_read_documents_extract_text_files(spark, tmp_path):
    """/update/extract analogue: binaryFile scan + Arrow-batched text
    extraction + literal.<field> constant columns."""
    from cascading_solr_spark.sources import read_documents_extract

    d = tmp_path / "files"
    d.mkdir()
    (d / "a.txt").write_text("def parse_buffer(): return 1\n")
    (d / "b.txt").write_text("class StreamWriter: pass\n")
    df = read_documents_extract(
        spark, str(d), literals={"lang": "python", "source": "upload"},
        glob="*.txt",
    )
    rows = sorted(df.collect(), key=lambda r: r["path"])
    assert [r["path"].rsplit("/", 1)[-1] for r in rows] == ["a.txt", "b.txt"]
    assert rows[0]["content"].startswith("def parse_buffer")
    assert rows[0]["length"] == len("def parse_buffer(): return 1\n")
    assert {r["lang"] for r in rows} == {"python"}
    assert {r["source"] for r in rows} == {"upload"}
    assert df.columns == ["path", "length", "content", "lang", "source"]


def test_read_documents_extract_binary_needs_parser(spark, tmp_path):
    """True binary payloads hit the declared Tika stub unless a custom
    extractor is plugged in."""
    from py4j.protocol import Py4JJavaError

    from cascading_solr_spark.sources import read_documents_extract

    d = tmp_path / "bin"
    d.mkdir()
    (d / "img.bin").write_bytes(bytes([0xFF, 0xFE, 0x00, 0x9C, 0x80]))
    with pytest.raises(Exception) as ei:
        read_documents_extract(spark, str(d)).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
    # a custom extractor (the Tika seam) makes the same file readable
    df = read_documents_extract(
        spark, str(d), extractor=lambda payload, p: payload.hex()
    )
    assert df.collect()[0]["content"] == "fffe009c80"
