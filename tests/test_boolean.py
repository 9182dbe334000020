"""Nested boolean queries — (a AND b) OR (c AND NOT d).

Semantics pinned here: structured precedence (NOT > AND > OR, parens
group; documented deviation from Lucene's flat clause-modifier parse),
Lucene BooleanWeight branch-sum scoring (an OR sums only its MATCHING
children), grounding guard (a tree satisfiable without any positive leaf
is rejected loudly), shard-local evaluation (sharding is by doc id).
"""

import pytest

from cascading_solr_spark.corpus import synth_corpus
from cascading_solr_spark.indexing.build import build_index
from cascading_solr_spark.query.boolean import (
    boolean_match_ids,
    parse_boolean,
    search_boolean,
)
from cascading_solr_spark.query.search import match_ids, search
from cascading_solr_spark.spec import IndexSpec

BOOL_SPEC = IndexSpec(
    num_shards=2,
    salt_buckets=2,
    block_size=16,
    keyword_fields=("lang",),
    stored_fields=("lang", "content"),
)


@pytest.fixture(scope="module")
def ix(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("boolix") / "ix")
    return build_index(
        spark, synth_corpus(spark, 300, partitions=4), BOOL_SPEC, out
    )


@pytest.fixture(scope="module")
def sets(spark, ix):
    def mids(q, **kw):
        return {r["doc_id"] for r in match_ids(spark, ix, q, **kw).collect()}

    return {
        "parse": mids("parse"),
        "buffer": mids("buffer"),
        "merge": mids("merge"),
        "stream": mids("stream"),
        "all": mids("*:*"),
        "java": mids("*:*", filters={"lang": "java"}),
    }


def _bids(spark, ix, q):
    return {r["doc_id"] for r in boolean_match_ids(spark, ix, q).collect()}


def test_match_sets_ground_truth(spark, ix, sets):
    p, b, m, s = sets["parse"], sets["buffer"], sets["merge"], sets["stream"]
    cases = {
        "(parse AND buffer) OR (merge AND stream)": (p & b) | (m & s),
        "parse AND (buffer OR merge)": p & (b | m),
        "(parse OR buffer) AND NOT merge": (p | b) - m,
        "parse AND (buffer OR NOT merge)": p & (b | (sets["all"] - m)),
        "lang:java AND (parse OR merge)": sets["java"] & (p | m),
        "parse AND NOT (buffer AND merge)": p - (b & m),
        "parse buffer": p | b,  # bare juncture = default OR
    }
    for q, want in cases.items():
        assert _bids(spark, ix, q) == want, q


def test_default_op_and(spark, ix, sets):
    got = _bids_with_op(spark, ix, "parse (buffer OR merge)", "AND")
    assert got == sets["parse"] & (sets["buffer"] | sets["merge"])


def _bids_with_op(spark, ix, q, op):
    return {
        r["doc_id"]
        for r in boolean_match_ids(spark, ix, q, default_op=op).collect()
    }


def test_branch_sum_scoring_is_lucene_exact(spark, ix, sets):
    """A doc matching parse, buffer, stream (not merge) under
    (parse AND buffer) OR (merge AND stream) gets NO credit for stream."""
    leaf = {
        t: {
            r["doc_id"]: r["score"]
            for r in search(spark, ix, t, k=None, with_stored=False).collect()
        }
        for t in ("parse", "buffer", "merge", "stream")
    }
    got = {
        r["doc_id"]: r["score"]
        for r in search_boolean(
            spark, ix, "(parse AND buffer) OR (merge AND stream)", k=None
        ).collect()
    }
    p, b = sets["parse"], sets["buffer"]
    m, s = sets["merge"], sets["stream"]
    assert set(got) == (p & b) | (m & s)
    for d, sc in got.items():
        want = 0.0
        if d in p and d in b:
            want += leaf["parse"][d] + leaf["buffer"][d]
        if d in m and d in s:
            want += leaf["merge"][d] + leaf["stream"][d]
        assert abs(sc - want) < 1e-9


def test_not_scores_zero_and_topk_exact(spark, ix, sets):
    leaf = {
        r["doc_id"]: r["score"]
        for r in search(spark, ix, "parse", k=None, with_stored=False).collect()
    }
    full = {
        r["doc_id"]: r["score"]
        for r in search_boolean(
            spark, ix, "parse AND NOT merge", k=None
        ).collect()
    }
    assert set(full) == sets["parse"] - sets["merge"]
    assert all(abs(s - leaf[d]) < 1e-9 for d, s in full.items())
    want10 = sorted(full.items(), key=lambda x: (-x[1], x[0]))[:10]
    got10 = [
        (r["doc_id"], r["score"])
        for r in search_boolean(
            spark, ix, "parse AND NOT merge", k=10
        ).collect()
    ]
    assert got10 == want10


def test_guards(spark, ix):
    kwf = ("lang",)
    with pytest.raises(ValueError, match="positive requirement"):
        parse_boolean("parse OR NOT merge", kwf)
    with pytest.raises(ValueError, match="NOT under NOT"):
        parse_boolean("NOT (NOT parse)", kwf)
    with pytest.raises(ValueError, match="multi-term"):
        parse_boolean("parse AND mer*", kwf)
    with pytest.raises(ValueError, match="unbalanced|unexpected"):
        parse_boolean("(parse AND buffer", kwf)
    with pytest.raises(ValueError, match="trailing"):
        parse_boolean("parse) buffer", kwf)


def test_deletes_respected(spark, ix, sets, tmp_path):
    """Tombstoned docs leave boolean results like every other kernel."""
    import shutil

    from cascading_solr_spark.indexing.delete import delete_documents

    dup = str(tmp_path / "boolix_del")
    shutil.copytree(ix.path, dup)
    victims = sorted(sets["parse"] & sets["buffer"])[:5]
    ix2 = delete_documents(spark, dup, victims)
    got = _bids(spark, ix2, "parse AND buffer")
    assert got == (sets["parse"] & sets["buffer"]) - set(victims)
