"""Prohibited clauses — the Lucene-parser MUST_NOT surface (``-term``,
``-field:value``, ``NOT term``, and Solr's pure-negative top-level rewrite
``-foo`` == ``*:* AND NOT foo``).

The reference serves these through Solr's query parser (its /browse and
/select handlers accept any Lucene boolean syntax; solrconfig.xml:766-774).
Sharding is by doc id, so exclusion is SHARD-LOCAL: an excluded term's
postings for shard s are exactly the shard's excluded docs, decoded with the
delete tombstones and stripped before the accumulator / top-k (wand.denied_ids
— θ never reflects an excluded doc, so MaxScore pruning stays exact).
"""

import pytest

from cascading_solr_spark.corpus import synth_corpus
from cascading_solr_spark.indexing.build import build_index
from cascading_solr_spark.query.search import (
    highlight,
    match_ids,
    parse_prohibited,
    search,
    search_after,
    search_dismax,
    search_many,
)
from cascading_solr_spark.spec import IndexSpec

R5G_SPEC = IndexSpec(
    num_shards=2,
    salt_buckets=2,
    block_size=16,
    keyword_fields=("lang", "repo"),
    stored_fields=("repo", "lang", "content"),
)


@pytest.fixture(scope="module")
def ix(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("r5gix") / "ix")
    return build_index(
        spark, synth_corpus(spark, 300, partitions=4), R5G_SPEC, out
    )


def _ids(df):
    return {r["doc_id"] for r in df.collect()}


def _scored(df):
    return {(r["doc_id"], round(r["score"], 9)) for r in df.collect()}


def test_parse_prohibited_forms():
    assert parse_prohibited("spark join -merge NOT sort") == (
        "spark join", ["merge", "sort"],
    )
    assert parse_prohibited("-foo") == ("", ["foo"])
    # a bare hyphen token is not a clause
    assert parse_prohibited("a - b") == ("a - b", [])
    with pytest.raises(ValueError):
        parse_prohibited('-"a b"')


def test_ranked_negation_is_exact_antijoin(spark, ix):
    """search('a b -c') == search('a b') minus docs matching c — same
    scores for every survivor (exclusion never changes BM25 stats)."""
    pos = _scored(search(spark, ix, "parse buffer", k=None, with_stored=False))
    excl = _ids(match_ids(spark, ix, "merge"))
    neg = _scored(
        search(spark, ix, "parse buffer -merge", k=None, with_stored=False)
    )
    want = {(d, s) for d, s in pos if d not in excl}
    assert neg == want and len(neg) < len(pos)


def test_topk_negation_exact_under_maxscore(spark, ix):
    """Top-10 under exclusion equals the first 10 of the full excluded
    ranking — MaxScore θ never counts an excluded doc."""
    full = sorted(
        _scored(
            search(spark, ix, "parse buffer -merge", k=None, with_stored=False)
        ),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    t10 = [
        (r["doc_id"], round(r["score"], 9))
        for r in search(
            spark, ix, "parse buffer -merge", k=10, with_stored=False
        ).collect()
    ]
    assert t10 == full


def test_pure_negative_matches_all_but(spark, ix):
    allids = _ids(match_ids(spark, ix, "*:*"))
    excl = _ids(match_ids(spark, ix, "merge"))
    assert _ids(match_ids(spark, ix, "-merge")) == allids - excl
    assert _ids(match_ids(spark, ix, "*:* -merge")) == allids - excl


def test_not_form_and_keyword_exclusion(spark, ix):
    base = _ids(match_ids(spark, ix, "parse buffer"))
    excl = _ids(match_ids(spark, ix, "merge"))
    assert _ids(match_ids(spark, ix, "parse buffer NOT merge")) == base - excl
    es = _ids(match_ids(spark, ix, "*:*", filters={"lang": "python"}))
    assert _ids(match_ids(spark, ix, "parse buffer -lang:python")) == base - es


def test_negation_ground_truth(spark, ix):
    """Membership against a brute-force per-doc oracle (the analyzer run
    driver-side over every stored text), not another kernel path."""
    from cascading_solr_spark.analyzer import tokenize

    docs = ix.docs(spark).select("doc_id", "content").toPandas()
    tok = {
        int(r.doc_id): set(tokenize(r.content))
        for r in docs.itertuples(index=False)
    }
    got = _ids(match_ids(spark, ix, "parse -merge"))
    want = {d for d, ts in tok.items() if "parse" in ts and "merge" not in ts}
    assert got == want


def test_and_and_filters_compose_with_negation(spark, ix):
    a_pos = _ids(match_ids(spark, ix, "parse buffer", op="AND"))
    excl = _ids(match_ids(spark, ix, "merge"))
    assert (
        _ids(match_ids(spark, ix, "parse buffer -merge", op="AND"))
        == a_pos - excl
    )
    f_pos = _ids(
        match_ids(spark, ix, "parse buffer", filters={"lang": "java"})
    )
    assert (
        _ids(
            match_ids(
                spark, ix, "parse buffer -merge", filters={"lang": "java"}
            )
        )
        == f_pos - excl
    )


def test_batch_negation_parity(spark, ix):
    single = {
        ("a", d, s)
        for d, s in [
            (r["doc_id"], round(r["score"], 9))
            for r in search(
                spark, ix, "parse buffer -merge", k=10, with_stored=False
            ).collect()
        ]
    }
    got = {
        (r["query_id"], r["doc_id"], round(r["score"], 9))
        for r in search_many(
            spark, ix, {"a": "parse buffer -merge"}, k=10
        ).collect()
    }
    assert got == single


def test_cursor_paging_with_negation(spark, ix):
    from cascading_solr_spark.query.search import next_cursor

    full = [
        (r["doc_id"], round(r["score"], 9))
        for r in search(
            spark, ix, "parse buffer -merge", k=None, with_stored=False
        ).collect()
    ]
    pages, cursor = [], None
    for _ in range(3):
        rows = search_after(
            spark, ix, "parse buffer -merge", cursor=cursor, k=7
        ).collect()
        if not rows:
            break
        pages += [(r["doc_id"], round(r["score"], 9)) for r in rows]
        cursor = next_cursor(rows)
    assert pages == full[: len(pages)] and len(pages) == min(21, len(full))


def test_dismax_negation(spark, ix):
    qf = {"content": 1.0}
    pos = _scored(
        search_dismax(
            spark, ix, "parse buffer", qf, k=None, with_stored=False
        )
    )
    excl = _ids(match_ids(spark, ix, "merge"))
    neg = _scored(
        search_dismax(
            spark, ix, "parse buffer -merge", qf, k=None, with_stored=False
        )
    )
    assert neg == {(d, s) for d, s in pos if d not in excl}


def test_highlight_never_wraps_prohibited_term(spark, ix):
    rows = highlight(spark, ix, "parse -merge", k=10).collect()
    assert rows
    for r in rows:
        assert r["term"] != "merge"
        assert "<em>merge</em>" not in r["snippet"].lower()


def test_parse_boosts_forms():
    from cascading_solr_spark.query.search import parse_boosts

    assert parse_boosts("a^2 b c^1.5") == ("a b c", {"a": 2.0, "c": 1.5})
    assert parse_boosts("plain query") == ("plain query", {})
    with pytest.raises(ValueError):
        parse_boosts("a^0")


def test_boost_additive_identity(spark, ix):
    """score('a b^2', d) == score('a b', d) + score('b', d): doubling a
    clause weight adds one extra copy of its contribution (the exact
    Lucene boost placement — idf multiplier)."""
    def scored(q):
        return {
            r["doc_id"]: r["score"]
            for r in search(spark, ix, q, k=None, with_stored=False).collect()
        }

    b2 = scored("parse buffer^2")
    base = scored("parse buffer")
    only_b = scored("buffer")
    assert set(b2) == set(base)
    assert all(
        abs(b2[d] - (base[d] + only_b.get(d, 0.0))) < 1e-9 for d in b2
    )


def test_boost_never_changes_match_set(spark, ix):
    assert _ids(match_ids(spark, ix, "parse buffer^3")) == _ids(
        match_ids(spark, ix, "parse buffer")
    )


def test_boost_batch_and_explain_parity(spark, ix):
    from cascading_solr_spark.query.search import explain_score

    single = {
        (r["doc_id"], round(r["score"], 9))
        for r in search(
            spark, ix, "parse buffer^2", k=10, with_stored=False
        ).collect()
    }
    batch = {
        (r["doc_id"], round(r["score"], 9))
        for r in search_many(spark, ix, {"q": "parse buffer^2"}, k=10).collect()
    }
    assert batch == single
    top = search(
        spark, ix, "parse buffer^2", k=1, with_stored=False
    ).collect()[0]
    ex = explain_score(spark, ix, "parse buffer^2", top["doc_id"]).collect()
    assert abs(sum(r["contribution"] for r in ex) - top["score"]) < 1e-9


def test_boost_dismax_single_field_additive(spark, ix):
    qf = {"content": 1.0}

    def scored(q):
        return {
            r["doc_id"]: r["score"]
            for r in search_dismax(
                spark, ix, q, qf, k=None, with_stored=False
            ).collect()
        }

    b2 = scored("parse buffer^2")
    base = scored("parse buffer")
    only_b = scored("buffer")
    assert all(
        abs(b2[d] - (base[d] + only_b.get(d, 0.0))) < 1e-9 for d in b2
    )


def test_boost_on_prohibited_clause_is_stripped(spark, ix):
    assert _ids(match_ids(spark, ix, "parse -merge^2")) == _ids(
        match_ids(spark, ix, "parse -merge")
    )


def test_excluded_term_absent_from_index_is_noop(spark, ix):
    base = _scored(search(spark, ix, "parse buffer", k=5, with_stored=False))
    got = _scored(
        search(spark, ix, "parse buffer -zzzzznotaterm", k=5, with_stored=False)
    )
    assert got == base


# ---- wildcard / prefix queries (MultiTermQuery rewrite) ----


def _vocab(spark, ix):
    from cascading_solr_spark.analyzer import tokenize

    docs = ix.docs(spark).select("doc_id", "content").toPandas()
    return {
        int(r.doc_id): set(tokenize(r.content))
        for r in docs.itertuples(index=False)
    }


def test_expand_wildcard_matches_vocabulary(spark, ix):
    import fnmatch

    from cascading_solr_spark.query.search import expand_wildcard

    tok = _vocab(spark, ix)
    vocab = sorted({t for ts in tok.values() for t in ts})
    for pat in ("parse*", "b?ffer", "*ream", "re*y"):
        want = sorted(t for t in vocab if fnmatch.fnmatchcase(t, pat))
        assert expand_wildcard(spark, ix, pat) == want, pat


def test_wildcard_match_set_ground_truth(spark, ix):
    import fnmatch

    tok = _vocab(spark, ix)
    got = _ids(match_ids(spark, ix, "parse*"))
    want = {
        d
        for d, ts in tok.items()
        if any(fnmatch.fnmatchcase(t, "parse*") for t in ts)
    }
    assert got == want and got


def test_wildcard_constant_score_additivity(spark, ix):
    """Mixed 'term wild*' scores bm25(term) + 1.0·[matched wild*] — Solr's
    constant-score rewrite for multi-term queries."""
    import fnmatch

    tok = _vocab(spark, ix)
    wdocs = {
        d
        for d, ts in tok.items()
        if any(fnmatch.fnmatchcase(t, "stream*") for t in ts)
    }
    base = {
        r["doc_id"]: r["score"]
        for r in search(spark, ix, "parse", k=None, with_stored=False).collect()
    }
    mixed = {
        r["doc_id"]: r["score"]
        for r in search(
            spark, ix, "parse stream*", k=None, with_stored=False
        ).collect()
    }
    assert set(mixed) == set(base) | wdocs
    for d, s in mixed.items():
        want = base.get(d, 0.0) + (1.0 if d in wdocs else 0.0)
        assert abs(s - want) < 1e-9


def test_wildcard_and_neg_and_boost(spark, ix):
    import fnmatch

    tok = _vocab(spark, ix)
    wdocs = {
        d
        for d, ts in tok.items()
        if any(fnmatch.fnmatchcase(t, "stream*") for t in ts)
    }
    pdocs = {d for d, ts in tok.items() if "parse" in ts}
    assert _ids(match_ids(spark, ix, "parse stream*", op="AND")) == (
        pdocs & wdocs
    )
    assert _ids(match_ids(spark, ix, "parse -stream*")) == pdocs - wdocs
    boosted = {
        r["doc_id"]: r["score"]
        for r in search(
            spark, ix, "parse stream*^3", k=None, with_stored=False
        ).collect()
    }
    base = {
        r["doc_id"]: r["score"]
        for r in search(spark, ix, "parse", k=None, with_stored=False).collect()
    }
    for d, s in boosted.items():
        assert abs(s - (base.get(d, 0.0) + (3.0 if d in wdocs else 0.0))) < 1e-9


def test_wildcard_batch_and_cursor_parity(spark, ix):
    single = [
        (r["doc_id"], round(r["score"], 9))
        for r in search(
            spark, ix, "parse stream*", k=10, with_stored=False
        ).collect()
    ]
    batch = {
        (r["doc_id"], round(r["score"], 9))
        for r in search_many(spark, ix, {"q": "parse stream*"}, k=10).collect()
    }
    assert batch == set(single)
    paged = [
        (r["doc_id"], round(r["score"], 9))
        for r in search_after(spark, ix, "parse stream*", k=10).collect()
    ]
    assert paged == single


def test_wildcard_guards(spark, ix):
    from cascading_solr_spark.query.search import expand_wildcard

    with pytest.raises(ValueError, match="keyword field"):
        expand_wildcard(spark, ix, "lang:p*")
    with pytest.raises(ValueError, match="matches everything"):
        expand_wildcard(spark, ix, "*")
    with pytest.raises(ValueError, match="maxBooleanClauses"):
        expand_wildcard(spark, ix, "*a*", max_expansions=1)
    with pytest.raises(ValueError, match="dismax"):
        search_dismax(spark, ix, "parse str*", {"content": 1.0})


def test_wildcard_highlight_wraps_expansion(spark, ix):
    rows = highlight(spark, ix, "stream*", k=5).collect()
    assert rows
    assert any("<em>" in r["snippet"] for r in rows)


# ---- stored-field doc filters (frange / PostFilter analogue) ----


def test_doc_filter_exactness_all_paths(spark, ix):
    """k=None (semi-join), top-k (overfetch loop incl. escalation against
    a near-empty filter), match-only, match-all, and composition with
    negation — all against a driver-side ground truth."""
    docs = ix.docs(spark).select("doc_id", "content").toPandas()
    ln = {int(r.doc_id): len(r.content) for r in docs.itertuples(index=False)}
    med = sorted(ln.values())[len(ln) // 2]
    hi = max(ln.values()) - 1
    base = {
        r["doc_id"]: r["score"]
        for r in search(
            spark, ix, "parse buffer", k=None, with_stored=False
        ).collect()
    }
    for thr in (med, hi):
        ok = {d for d, v in ln.items() if v >= thr}
        pred = f"length(content) >= {thr}"
        full = {
            r["doc_id"]: r["score"]
            for r in search(
                spark, ix, "parse buffer", k=None, with_stored=False,
                doc_filter=pred,
            ).collect()
        }
        assert full == {d: s for d, s in base.items() if d in ok}, thr
        want = sorted(
            ((d, s) for d, s in base.items() if d in ok),
            key=lambda x: (-x[1], x[0]),
        )[:10]
        got = [
            (r["doc_id"], r["score"])
            for r in search(
                spark, ix, "parse buffer", k=10, with_stored=False,
                doc_filter=pred,
            ).collect()
        ]
        assert got == want, thr
    ok = {d for d, v in ln.items() if v >= med}
    pred = f"length(content) >= {med}"
    assert _ids(match_ids(spark, ix, "parse buffer", doc_filter=pred)) == (
        set(base) & ok
    )
    assert _ids(match_ids(spark, ix, "*:*", doc_filter=pred)) == ok
    neg = _ids(match_ids(spark, ix, "parse buffer -merge", doc_filter=pred))
    nbase = _ids(match_ids(spark, ix, "parse buffer -merge"))
    assert neg == nbase & ok


def test_doc_filter_stats_unchanged(spark, ix):
    """fq semantics: surviving docs keep their unfiltered BM25 scores."""
    pred = "length(content) >= 0"  # matches everything
    a = _scored(search(spark, ix, "parse buffer", k=10, with_stored=False))
    b = _scored(
        search(
            spark, ix, "parse buffer", k=10, with_stored=False,
            doc_filter=pred,
        )
    )
    assert a == b


# ---- fuzzy queries (FuzzyQuery analogue; classic Levenshtein) ----


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_expand_fuzzy_matches_vocabulary(spark, ix):
    from cascading_solr_spark.query.search import expand_fuzzy

    tok = _vocab(spark, ix)
    vocab = sorted({t for ts in tok.values() for t in ts})
    for token, q, d in (("parse~1", "parse", 1), ("bufer~", "bufer", 2)):
        want = sorted(t for t in vocab if _lev(t, q) <= d)
        assert expand_fuzzy(spark, ix, token) == want, token
    assert expand_fuzzy(spark, ix, "parse~0") == ["parse"]
    assert expand_fuzzy(spark, ix, "zzqxj~0") == []


def test_fuzzy_constant_score_and_neg(spark, ix):
    tok = _vocab(spark, ix)
    fdocs = {
        d for d, ts in tok.items() if any(_lev(t, "bufer") <= 1 for t in ts)
    }
    base = {
        r["doc_id"]: r["score"]
        for r in search(spark, ix, "parse", k=None, with_stored=False).collect()
    }
    mixed = {
        r["doc_id"]: r["score"]
        for r in search(
            spark, ix, "parse bufer~1", k=None, with_stored=False
        ).collect()
    }
    assert set(mixed) == set(base) | fdocs
    for d, s in mixed.items():
        assert abs(s - (base.get(d, 0.0) + (1.0 if d in fdocs else 0.0))) < 1e-9
    pdocs = {d for d, ts in tok.items() if "parse" in ts}
    assert _ids(match_ids(spark, ix, "parse bufer~1", op="AND")) == (
        pdocs & fdocs
    )
    assert _ids(match_ids(spark, ix, "parse -bufer~1")) == pdocs - fdocs


# ---- keyword range filters (StrField range query: field:[a TO b]) ----


def _lang_of(spark, ix):
    docs = ix.docs(spark).select("doc_id", "lang").toPandas()
    return {int(d): l for d, l in zip(docs.doc_id, docs.lang)}


def test_range_inclusive_exclusive_open(spark, ix):
    lang = _lang_of(spark, ix)
    incl = {d for d, l in lang.items() if "java" <= l <= "python"}
    assert _ids(match_ids(spark, ix, "lang:[java TO python]")) == incl
    excl = {d for d, l in lang.items() if "java" < l < "python"}
    assert _ids(match_ids(spark, ix, "lang:{java TO python}")) == excl
    hi_open = {d for d, l in lang.items() if l >= "python"}
    assert _ids(match_ids(spark, ix, "lang:[python TO *]")) == hi_open


def test_range_composes_with_query_and_negation(spark, ix):
    lang = _lang_of(spark, ix)
    in_rng = {d for d, l in lang.items() if "java" <= l <= "python"}
    base = _scored(search(spark, ix, "parse buffer", k=None, with_stored=False))
    got = _scored(
        search(
            spark, ix, "parse buffer lang:[java TO python]",
            k=None, with_stored=False,
        )
    )
    assert got == {(d, s) for d, s in base if d in in_rng}
    neg = _ids(match_ids(spark, ix, "parse buffer -lang:[java TO python]"))
    assert neg == {d for d, _ in base} - in_rng


def test_range_batch_parity_and_guards(spark, ix):
    single = {
        (r["doc_id"], round(r["score"], 9))
        for r in search(
            spark, ix, "parse lang:[go TO python]", k=10, with_stored=False
        ).collect()
    }
    batch = {
        (r["doc_id"], round(r["score"], 9))
        for r in search_many(
            spark, ix, {"q": "parse lang:[go TO python]"}, k=10
        ).collect()
    }
    assert batch == single
    assert match_ids(spark, ix, "parse lang:[zz TO zzz]").count() == 0
    with pytest.raises(ValueError, match="non-keyword field"):
        search(spark, ix, "parse price:[1 TO 2]", k=5)


def test_range_dismax_and_matchall(spark, ix):
    lang = _lang_of(spark, ix)
    in_rng = {d for d, l in lang.items() if "go" <= l <= "java"}
    assert _ids(match_ids(spark, ix, "*:* lang:[go TO java]")) == in_rng
    qf = {"content": 1.0}
    base = _scored(
        search_dismax(spark, ix, "parse buffer", qf, k=None, with_stored=False)
    )
    got = _scored(
        search_dismax(
            spark, ix, "parse buffer lang:[go TO java]", qf,
            k=None, with_stored=False,
        )
    )
    assert got == {(d, s) for d, s in base if d in in_rng}


def test_fuzzy_spark_path_matches_cache_path(spark, ix):
    """The distributed (ngram-candidates + JVM levenshtein) expansion and
    the driver-cache expansion are the same Levenshtein ball — force the
    Spark path by blanking the handle's cache."""
    from cascading_solr_spark.indexing.build import Index
    from cascading_solr_spark.query.search import expand_fuzzy

    want = expand_fuzzy(spark, ix, "bufer~1")
    ix2 = Index.load(ix.path)
    object.__setattr__(ix2, "_dict_cache", None)
    got = expand_fuzzy(spark, ix2, "bufer~1")
    assert got == want and want


def test_fuzzy_batch_parity_and_guards(spark, ix):
    single = {
        (r["doc_id"], round(r["score"], 9))
        for r in search(
            spark, ix, "parse bufer~1", k=10, with_stored=False
        ).collect()
    }
    batch = {
        (r["doc_id"], round(r["score"], 9))
        for r in search_many(spark, ix, {"q": "parse bufer~1"}, k=10).collect()
    }
    assert batch == single
    with pytest.raises(ValueError, match="unsupported fuzzy"):
        search(spark, ix, "roam~0.8", k=5)
    with pytest.raises(ValueError, match="0..2"):
        search(spark, ix, "roam~3", k=5)
    with pytest.raises(ValueError, match="dismax"):
        search_dismax(spark, ix, "parse bufer~1", {"content": 1.0})
