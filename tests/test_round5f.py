"""Round-5f behaviors: the last concretely-configured /browse highlight and
facet settings.

* f.content.hl.snippets=3 (solrconfig.xml:928): up to N fragments per
  (doc, field), document order, each search resuming after the previous
  match;
* hl.encoder=html (solrconfig.xml:922): field text escaped, markup not;
* hl.simple.pre/post=<b>/</b> (solrconfig.xml:923-924): configurable
  markers;
* every facet.field of a request in ONE pass (solrconfig.xml:891-894
  declares four): facet_fields_counts == per-field facet_counts, off a
  single match job + a single prefix-OR-pruned postings scan.
"""

import re

import pytest
from pyspark.sql import functions as F

from cascading_solr_spark.corpus import synth_corpus
from cascading_solr_spark.indexing.build import build_index
from cascading_solr_spark.query.search import (
    facet_counts,
    facet_fields_counts,
    highlight_fields,
    search,
)
from cascading_solr_spark.spec import IndexSpec

R5F_SPEC = IndexSpec(
    num_shards=2,
    salt_buckets=2,
    block_size=16,
    keyword_fields=("lang", "repo"),
    stored_fields=("repo", "path", "lang", "content"),
)


@pytest.fixture(scope="module")
def ix(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("r5fix") / "ix")
    return build_index(
        spark, synth_corpus(spark, 300, partitions=4), R5F_SPEC, out
    )


@pytest.fixture(scope="module")
def pdf(spark):
    return (
        synth_corpus(spark, 300, partitions=4)
        .toPandas()
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )


def _occurrences(text: str, terms: list[str], n: int) -> list[tuple]:
    """Brute-force oracle: up to n (pos, term) document-order occurrences,
    ties term-asc, each search resuming after the previous match end."""
    out, off = [], 0
    low = text.lower()
    while len(out) < n:
        best = None
        for t in sorted(terms):
            p = low.find(t, off)
            if p >= 0 and (best is None or p < best[0]):
                best = (p, t)
        if best is None:
            break
        out.append(best)
        off = best[0] + len(best[1])
    return out


# ------------------------------------------------------- multi-snippet


def test_snippets_match_bruteforce_oracle(spark, ix, pdf):
    out = highlight_fields(
        spark, ix, "parse buffer", ["content"], k=10,
        field_params={"content": {"fragsize": 40, "snippets": 3}},
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(int(r["doc_id"]), []).append(r)
    assert by_doc, "no results"
    texts = dict(zip(pdf.index, pdf["content"]))
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["snippet_no"])
        occ = _occurrences(texts[doc_id], ["parse", "buffer"], 3)
        assert [r["snippet_no"] for r in rows] == list(
            range(1, len(occ) + 1)
        )
        for r, (p, t) in zip(rows, occ):
            assert r["term"] == t
            # the wrapped text IS the document text at that position
            m = re.search(r"<em>(.*?)</em>", r["snippet"], re.S)
            assert m and m.group(1).lower() == t
            assert texts[doc_id][p:p + len(t)] == m.group(1)


def test_snippets_default_single_and_snippet_no(spark, ix):
    out = highlight_fields(
        spark, ix, "parse", ["content", "path"], k=5,
        field_params={"path": {"fragsize": 0}},
    ).collect()
    assert all(r["snippet_no"] == 1 for r in out)
    assert len(out) == 10  # k docs x 2 fields, one fragment each


def _esc(x: str) -> str:
    return (
        x.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def test_html_encoder_escapes_text_not_markup(spark, ix, pdf):
    out = highlight_fields(
        spark, ix, "parse", ["content"], k=10,
        field_params={"content": {"fragsize": 80, "snippets": 2}},
        pre="<b>", post="</b>", encoder="html",
    ).collect()
    assert out
    texts = dict(zip(pdf.index, pdf["content"]))
    by_doc = {}
    for r in out:
        by_doc.setdefault(int(r["doc_id"]), []).append(r)
    checked = 0
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["snippet_no"])
        occ = _occurrences(texts[doc_id], ["parse"], 2)
        for r, (p, t) in zip(rows, occ):
            text = texts[doc_id]
            w = 40  # fragsize 80 // 2
            start = max(p - w, 0)
            expect = (
                _esc(text[start:p]) + "<b>" + _esc(text[p:p + len(t)])
                + "</b>" + _esc(text[p + len(t):p + len(t) + w])
            )
            assert r["snippet"] == expect
            checked += 1
    assert checked > 0
    # corpus content carries & or < or > somewhere: prove the escaper is
    # live by round-tripping one crafted value through the same helper
    assert _esc("a & b < c > d") == "a &amp; b &lt; c &gt; d"


def test_unknown_encoder_raises(spark, ix):
    with pytest.raises(ValueError):
        highlight_fields(
            spark, ix, "parse", ["content"], encoder="latin1"
        ).collect()


# --------------------------------------------- multi-field facet counts


def test_facet_fields_counts_equals_per_field(spark, ix):
    multi = facet_fields_counts(
        spark, ix, "parse buffer", ["lang", "repo"]
    ).collect()
    got = {(r["field"], r["value"]): int(r["n"]) for r in multi}
    exp = {}
    for f in ("lang", "repo"):
        for r in facet_counts(spark, ix, "parse buffer", f).collect():
            exp[(f, r["value"])] = int(r["n"])
    assert got == exp


def test_facet_fields_limit_and_sort_per_field(spark, ix):
    top1 = facet_fields_counts(
        spark, ix, "parse buffer", ["lang", "repo"], limit=1
    ).collect()
    assert [r["field"] for r in top1] == ["lang", "repo"]
    full = facet_fields_counts(
        spark, ix, "parse buffer", ["lang", "repo"]
    ).collect()
    for t in top1:
        peers = [r for r in full if r["field"] == t["field"]]
        best = max(peers, key=lambda r: (r["n"], ), default=None)
        assert int(t["n"]) == int(best["n"])
    idx_sorted = facet_fields_counts(
        spark, ix, "parse buffer", ["lang"], sort="index"
    ).collect()
    vals = [r["value"] for r in idx_sorted]
    assert vals == sorted(vals)


def test_facet_fields_rejects_non_keyword(spark, ix):
    with pytest.raises(ValueError):
        facet_fields_counts(spark, ix, "parse", ["path"]).collect()


# ------------------------------------------------------------ fl param


def test_fl_prunes_and_orders(spark, ix):
    full = search(spark, ix, "parse buffer", k=5).collect()
    pruned = search(
        spark, ix, "parse buffer", k=5, fl=["lang", "score"]
    ).collect()
    assert set(pruned[0].asDict()) == {"doc_id", "lang", "score"}
    assert [r["doc_id"] for r in pruned] == [r["doc_id"] for r in full]
    by_id = {r["doc_id"]: r for r in full}
    assert all(r["lang"] == by_id[r["doc_id"]]["lang"] for r in pruned)


def test_fl_without_score_drops_it(spark, ix):
    rows = search(spark, ix, "parse", k=3, fl=["path"]).collect()
    assert set(rows[0].asDict()) == {"doc_id", "path"}


def test_fl_rejects_unstored(spark, ix):
    with pytest.raises(ValueError):
        search(spark, ix, "parse", k=3, fl=["commit"]).collect()


def test_fl_scan_pruned_to_requested_columns(spark, ix):
    plan = search(
        spark, ix, "parse", k=3, fl=["lang"]
    )._jdf.queryExecution().executedPlan().toString()
    import re as _re
    for m in _re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        # any docs-side scan must never read the wide content column
        assert "content" not in cols, plan


# ----------------------------------------- facet.prefix / facet.missing


def test_facet_prefix_filters_buckets(spark, ix):
    allb = facet_counts(spark, ix, "parse buffer", "lang").collect()
    pref = {r["value"]: r["n"] for r in facet_counts(
        spark, ix, "parse buffer", "lang", prefix="p"
    ).collect()}
    exp = {r["value"]: r["n"] for r in allb if r["value"].startswith("p")}
    assert pref == exp and pref  # python matches


def test_facet_missing_counts_docs_without_value(spark, ix):
    # every synth doc has a lang -> missing bucket must be 0
    rows = facet_counts(
        spark, ix, "parse buffer", "lang", missing=True
    ).collect()
    miss = [r for r in rows if r["value"] is None]
    assert len(miss) == 1 and int(miss[0]["n"]) == 0
    # and it composes with prefix (missing is prefix-independent)
    rows_p = facet_counts(
        spark, ix, "parse buffer", "lang", prefix="zz", missing=True
    ).collect()
    assert [r["value"] for r in rows_p] == [None]


# ------------------------------------------------------ /browse facade


def test_browse_composes_default_request(spark, ix, pdf):
    from cascading_solr_spark.handlers import browse

    resp = browse(
        spark, ix, "parse buffer",
        facet_fields=["lang", "repo"],
        facet_queries={"py": "lang:python"},
        hl_fields=["content"],
        hl_params={"content": {"fragsize": 60, "snippets": 2}},
    )
    res = resp["results"].collect()
    assert 0 < len(res) <= 10
    # mm=100% default: every result matches BOTH terms (conjunction)
    texts = dict(zip(pdf.index, pdf["content"]))
    for r in res:
        low = texts[int(r["doc_id"])].lower()
        assert "parse" in low and "buffer" in low
    hl = resp["highlighting"].collect()
    # highlighting corresponds to the results rows exactly
    assert {int(r["doc_id"]) for r in hl} == {int(r["doc_id"]) for r in res}
    assert all("<b>" in r["snippet"] for r in hl if r["term"])
    ff = resp["facet_fields"].collect()
    assert {r["field"] for r in ff} == {"lang", "repo"}
    # facet counts run under the mm=100% == AND match set
    n_matched = sum(int(r["n"]) for r in ff if r["field"] == "lang")
    n_expected = sum(
        1 for t in pdf["content"]
        if "parse" in t.lower() and "buffer" in t.lower()
    )
    assert n_matched == n_expected
    fq = {r["facet"]: int(r["n"]) for r in resp["facet_queries"].collect()}
    assert set(fq) == {"py"}


def test_browse_landing_page_match_all(spark, ix, pdf):
    from cascading_solr_spark.handlers import browse

    resp = browse(spark, ix, None, facet_fields=["lang"], rows=5)
    assert "spellcheck" not in resp and "highlighting" not in resp
    res = resp["results"].collect()
    assert [int(r["doc_id"]) for r in res] == [0, 1, 2, 3, 4]
    assert all(float(r["score"]) == 1.0 for r in res)
    ff = {r["value"]: int(r["n"]) for r in resp["facet_fields"].collect()}
    assert ff == pdf["lang"].value_counts().to_dict()


def test_browse_spellcheck_collation(spark, ix):
    from cascading_solr_spark.handlers import browse

    resp = browse(spark, ix, "parze buffer")
    sc = resp["spellcheck"].collect()
    assert sc and any("parse" in r["collation"] for r in sc)


# -------------------------------------------------------- sloppy phrase


POS_SPEC = IndexSpec(
    num_shards=2,
    salt_buckets=2,
    block_size=16,
    keyword_fields=("lang",),
    stored_fields=("repo", "path", "lang", "content"),
    positions=True,
)


@pytest.fixture(scope="module")
def pix(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("r5fpos") / "ix")
    return build_index(
        spark, synth_corpus(spark, 300, partitions=4), POS_SPEC, out
    )


def _sloppy_freq(positions: dict, terms: list[str], slop: int) -> int:
    """Brute-force twin of the kernel's definition: count of first-term
    positions whose greedy strictly-increasing chain through the remaining
    terms spans <= len(terms)-1+slop."""
    import bisect

    if any(t not in positions for t in terms):
        return 0
    n = 0
    for p in positions[terms[0]]:
        q = p
        ok = True
        for t in terms[1:]:
            arr = positions[t]
            i = bisect.bisect_right(arr, q)
            if i >= len(arr):
                ok = False
                break
            q = arr[i]
        if ok and q - p <= len(terms) - 1 + slop:
            n += 1
    return n


def _doc_positions(text: str) -> dict:
    from cascading_solr_spark.analyzer import tokenize_with_positions

    out: dict = {}
    for term, pos in tokenize_with_positions(text):
        out.setdefault(term, []).append(pos)
    for v in out.values():
        v.sort()
    return out


def test_slop_matches_bruteforce(spark, pix, pdf):
    from cascading_solr_spark.query.search import search_phrase

    terms = ["parse", "buffer"]
    for slop in (0, 1, 3):
        got = {
            int(r["doc_id"])
            for r in search_phrase(
                spark, pix, "parse buffer", k=None, with_stored=False,
                slop=slop,
            ).collect()
        }
        exp = {
            i for i, t in zip(pdf.index, pdf["content"])
            if _sloppy_freq(_doc_positions(t), terms, slop) > 0
        }
        assert got == exp, f"slop={slop}"
    # monotone: bigger slop never loses matches, and finds strictly more
    # somewhere on this corpus
    s0 = {int(r["doc_id"]) for r in search_phrase(
        spark, pix, "parse buffer", k=None, with_stored=False).collect()}
    s3 = {int(r["doc_id"]) for r in search_phrase(
        spark, pix, "parse buffer", k=None, with_stored=False, slop=3
    ).collect()}
    assert s0 <= s3 and len(s3) > len(s0)


def test_slop_zero_equals_exact(spark, pix):
    from cascading_solr_spark.query.search import search_phrase

    exact = search_phrase(
        spark, pix, "parse buffer", k=None, with_stored=False
    ).collect()
    zero = search_phrase(
        spark, pix, "parse buffer", k=None, with_stored=False, slop=0
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in exact] == [
        (r["doc_id"], r["score"]) for r in zero
    ]


def test_slop_query_string_and_batch_parity(spark, pix):
    from cascading_solr_spark.query.search import (
        match_ids,
        search_many,
        search_phrase,
    )

    via_string = search(
        spark, pix, '"parse buffer"~2', k=None, with_stored=False
    ).collect()
    direct = search_phrase(
        spark, pix, "parse buffer", k=None, with_stored=False, slop=2
    ).collect()
    assert [(r["doc_id"], round(r["score"], 6)) for r in via_string] == [
        (r["doc_id"], round(r["score"], 6)) for r in direct
    ]
    assert direct, "fixture produced no sloppy matches"
    batch = search_many(
        spark, pix, {"a": '"parse buffer"~2'}, k=10
    ).collect()
    single = search_phrase(
        spark, pix, "parse buffer", k=10, with_stored=False, slop=2
    ).collect()
    assert [(r["doc_id"], round(r["score"], 6)) for r in batch] == [
        (r["doc_id"], round(r["score"], 6)) for r in single
    ]
    n = match_ids(spark, pix, '"parse buffer"~2').count()
    assert n == len(direct)
