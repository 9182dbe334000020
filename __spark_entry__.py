"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Engine: cascading_solr_spark — PySpark-native inverted-index build + BM25
top-k query engine re-expressing ScaleUnlimited/cascading.solr (SURVEY.md),
plus training-data pipeline operators (dedup, similarity, text analysis,
multimodal plumbing).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cascading_solr_spark.indexing.build import Index, build_index
from cascading_solr_spark.operators import dedup, multimodal, similarity, textstats
from cascading_solr_spark.query.naive import bm25_topk_df, corpus_stats, tokens_long
from cascading_solr_spark.query.search import keyword_filter, search
from cascading_solr_spark.spec import IndexSpec
from cascading_solr_spark.streaming.refresh import windowed_event_counts

# deterministic 64-dim ANN query vector (shared by the Spark path and the
# oracle-SQL construction — pure arithmetic, no RNG)
ANN_QV = [((7 * d + 3) % 11 - 5) / 2.0 for d in range(64)]

# ---------------------------------------------------------------- helpers

SIMPLE = "[a-z0-9]+"  # oracle-side tokenizer (== full analyzer on this corpus)

Q_MAIN = "spark join"          # 2 terms: FP-commutative cross-engine
Q_MULTI = "merge sort window batch"
DF_TERMS = ("spark", "join", "scan", "stream")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


_DOC_SPEC = IndexSpec(
    content_field="text",
    key_fields=("doc_id",),
    # "text" stored -> highlighting (Solr stored="true" requirement);
    # "textlen" (= length(text)) and "docdate" (deterministic DATE derived
    # from doc_id) are derived at index time: the numeric and DATE fields
    # facet.range buckets over (the reference range-facets price and
    # manufacturedate_dt the same way, solrconfig.xml:900-914)
    # "title" stored too: whole-field highlighting (f.title.hl.fragsize=0,
    # solrconfig.xml:925-926)
    stored_fields=("lang", "source", "textlen", "docdate", "text", "title"),
    keyword_fields=("lang", "source"),  # exact filters served index-side
    # derived "title" (first 5 whitespace words of text): the extra analyzed
    # field the eDisMax qf= leg boosts (solrconfig.xml:872-877 name^1.2)
    text_fields=("title",),
    doc_id_field="doc_id",
    num_shards=8,
    salt_buckets=4,
    positions=True,  # phrase queries (ft_phrase) need the positional format
)


_INDEX_FORMAT_VERSION = 12  # bump on any postings/dict/ANN layout change


_INDEX_HANDLES: dict[str, Index] = {}


def _index_for(spark: SparkSession, sf_dir: str) -> Index:
    """Build (once, cached on disk keyed by corpus dir + format version) the
    compressed index.  The HANDLE is memoized too, so per-handle state
    (Index.dict_cache) survives across the driver's query calls."""
    key = os.path.abspath(sf_dir).replace(os.sep, "_")
    out = os.path.join(
        tempfile.gettempdir(), f"css_index_v{_INDEX_FORMAT_VERSION}{key}"
    )
    if not os.path.exists(os.path.join(out, "meta.json")):
        shutil.rmtree(out, ignore_errors=True)
        source = (
            _docs(spark, sf_dir)
            .withColumn("textlen", F.length("text"))
            # deterministic DATE spread over ~3 years (oracle-reproducible:
            # DATE '2020-01-01' + (doc_id*37 mod 1100) days)
            .withColumn(
                "docdate",
                F.date_add(
                    F.to_date(F.lit("2020-01-01")),
                    F.pmod(F.col("doc_id") * 37, F.lit(1100)).cast("int"),
                ),
            )
            # derived title: first 5 space-separated words (oracle twin:
            # array_to_string(list_slice(str_split(text,' '),1,5),' '))
            .withColumn(
                "title",
                F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 5)),
            )
        )
        build_index(spark, source, _DOC_SPEC, out)
        _INDEX_HANDLES.pop(out, None)
    if out not in _INDEX_HANDLES:
        _INDEX_HANDLES[out] = Index.load(out)
    return _INDEX_HANDLES[out]


def _deleted_index_for(spark: SparkSession, sf_dir: str) -> Index:
    """Snapshot of the cached index with a FIXED deterministic delete set
    (doc_id % 17 == 3) applied — the Q40 tombstone surface under the
    driver's oracle check.  Built once per format version (snapshot into a
    tmp dir, delete, atomic rename: a crash never publishes a tombstone-less
    copy)."""
    base = _index_for(spark, sf_dir)
    out = base.path + "_del"
    if not os.path.exists(os.path.join(out, "meta.json")):
        from cascading_solr_spark.indexing.delete import delete_documents
        from cascading_solr_spark.indexing.replicate import snapshot_index

        shutil.rmtree(out, ignore_errors=True)
        tmp = out + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        snapshot_index(base.path, tmp)
        delete_documents(
            spark,
            tmp,
            base.docs(spark)
            .select("doc_id")
            .filter(F.pmod(F.col("doc_id"), F.lit(17)) == F.lit(3)),
        )
        os.rename(tmp, out)
        _INDEX_HANDLES.pop(out, None)
    if out not in _INDEX_HANDLES:
        _INDEX_HANDLES[out] = Index.load(out)
    return _INDEX_HANDLES[out]


def _emb_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _emb(spark, sf_dir).withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )


def _ann_for(spark: SparkSession, sf_dir: str) -> str:
    """Materialized bucket-partitioned ANN index (cached like _index_for)."""
    key = os.path.abspath(sf_dir).replace(os.sep, "_")
    out = os.path.join(
        tempfile.gettempdir(), f"css_ann_v{_INDEX_FORMAT_VERSION}{key}"
    )
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        shutil.rmtree(out, ignore_errors=True)
        # 2 independent hyperplane tables: the recall>=0.9 configuration
        # (BENCH ann_curve: 1 table tops out at ~0.5 recall on sf0.01)
        similarity.build_ann_index(_emb_double(spark, sf_dir), out, n_tables=2)
    return out


def _toks_cte(table: str = "documents") -> str:
    return (
        f"toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), "
        f"'{SIMPLE}')) AS term FROM {table})"
    )


def _bm25_sql(
    terms: tuple[str, ...],
    k: int | None,
    weights: dict[str, float] | None = None,
    rounded: bool = True,
) -> str:
    """``weights``: per-term boost multipliers (the ``term^2`` query form —
    the engine premultiplies boosts into idf; ×1.0 is exact in IEEE, so the
    weighted SQL is bit-identical to the old unweighted form).
    ``rounded=False`` returns the RAW score — for legs that add a function
    value BEFORE the final round (round(round(x,4)+f,4) can differ from
    round(x+f,4) at the 4th decimal)."""
    w = weights or {}
    tl = ", ".join(f"('{t}', {float(w.get(t, 1.0))!r})" for t in terms)
    return f"""
WITH {_toks_cte()},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                 (SELECT sum(dl) FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
q(term, w) AS (VALUES {tl}),
dfreq AS (SELECT tf.term, q.w, count(*)::BIGINT AS df FROM tf
          JOIN q ON q.term = tf.term GROUP BY 1, 2),
scores AS (
  SELECT tf.doc_id,
         sum( d.w * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
              * (tf.tf * (1.2 + 1.0))
              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) ) AS score
  FROM tf JOIN dfreq d ON d.term = tf.term
  JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY 1)
SELECT doc_id, {'round(score, 4)' if rounded else 'score'} AS score
FROM scores ORDER BY {'round(score, 4)' if rounded else 'score'} DESC, doc_id ASC
{f'LIMIT {k}' if k is not None else ''}
"""


def _const_clause_sql(member_pred: str, k: int = 10) -> str:
    """DuckDB twin of a 'join <multiterm-clause>' query: BM25 over the
    plain term 'join' plus a CONSTANT 1.0 for every doc containing any
    term satisfying ``member_pred`` (the engine's wildcard/fuzzy rewrite —
    Solr's constant-score multi-term rewrite)."""
    return f"""
SELECT cdoc AS doc_id, round(cscore, 4) AS score FROM (
  WITH {_toks_cte()},
  tf AS (SELECT doc_id, count(*)::BIGINT AS tf FROM toks
         WHERE term = 'join' GROUP BY 1),
  dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
  st AS (SELECT (SELECT count(*) FROM documents) AS n,
                (SELECT sum(dl) FROM dl)
                  / (SELECT count(*) FROM documents) AS avgdl),
  jdf AS (SELECT count(*)::BIGINT AS df FROM tf),
  jraw AS (SELECT tf.doc_id,
                  ln(1 + (s.n - j.df + 0.5) / (j.df + 0.5))
                  * (tf.tf * (1.2 + 1.0))
                  / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl))
                    AS score
           FROM tf JOIN dl USING (doc_id) CROSS JOIN jdf j CROSS JOIN st s),
  wdocs AS (SELECT DISTINCT doc_id FROM toks WHERE {member_pred})
  -- UNAMBIGUOUS aliases: 'score'/'doc_id' here would bind to the JOINED
  -- COLUMNS in ORDER BY (alias shadowing), silently sorting by the plain
  -- BM25 leg instead of the combined score
  SELECT coalesce(j.doc_id, w.doc_id) AS cdoc,
         coalesce(j.score, 0)
           + CASE WHEN w.doc_id IS NOT NULL THEN 1.0 ELSE 0 END AS cscore
  FROM jraw j FULL OUTER JOIN wdocs w ON w.doc_id = j.doc_id
  ORDER BY round(cscore, 4) DESC, cdoc ASC LIMIT {k}
) cc
"""


def _dismax_sql(
    terms: tuple[str, ...],
    qf: dict[str, str],
    boosts: dict[str, float],
    tie: float,
    k: int | None,
) -> str:
    """DuckDB twin of search_dismax: per-field BM25 (per-field tf/dl/df/
    avgdl, global N in idf and avgdl denominators — the engine's documented
    rule), per clause max + tie * (sum - max) over fields, summed across
    clauses.  ``qf`` maps field name -> SQL expression producing that
    field's raw text over ``documents``."""
    tl = ", ".join(f"('{t}')" for t in terms)
    toks_union = "\n  UNION ALL\n".join(
        f"  SELECT '{f}' AS f, doc_id, unnest(regexp_extract_all(lower("
        f"{expr}), '{SIMPLE}')) AS term FROM documents"
        for f, expr in qf.items()
    )
    bl = ", ".join(f"('{f}', {b})" for f, b in boosts.items())
    return f"""
WITH ftoks AS (
{toks_union}
),
tf AS (SELECT f, doc_id, term, count(*)::BIGINT AS tf FROM ftoks GROUP BY 1, 2, 3),
dl AS (SELECT f, doc_id, count(*)::BIGINT AS dl FROM ftoks GROUP BY 1, 2),
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
avgdl AS (SELECT f, sum(dl) / (SELECT n FROM nn) AS avgdl FROM dl GROUP BY 1),
q(term) AS (VALUES {tl}),
boosts(f, boost) AS (VALUES {bl}),
dfreq AS (SELECT f, term, count(*)::BIGINT AS df FROM tf
          WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
contrib AS (
  SELECT tf.doc_id, tf.term,
         b.boost * ln(1 + (nn.n - d.df + 0.5) / (d.df + 0.5))
         * (tf.tf * (1.2 + 1.0))
         / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / a.avgdl)) AS c
  FROM tf
  JOIN dfreq d ON tf.f = d.f AND tf.term = d.term
  JOIN dl ON dl.f = tf.f AND dl.doc_id = tf.doc_id
  JOIN avgdl a ON a.f = tf.f
  JOIN boosts b ON b.f = tf.f
  CROSS JOIN nn),
clause AS (SELECT doc_id, term,
                  max(c) + {tie} * (sum(c) - max(c)) AS cs
           FROM contrib GROUP BY 1, 2),
scores AS (SELECT doc_id, sum(cs) AS score FROM clause GROUP BY 1)
SELECT doc_id, round(score, 4) AS score
FROM scores ORDER BY round(score, 4) DESC, doc_id ASC
{f'LIMIT {k}' if k is not None else ''}
"""


#: oracle-side twin of the driver index's derived title column
_TITLE_SQL = "array_to_string(list_slice(str_split(text, ' '), 1, 5), ' ')"


def _esc_sql(x: str) -> str:
    """DuckDB twin of the engine's hl.encoder=html escape (& first)."""
    return (
        "replace(replace(replace(" + x + ", '&', '&amp;'), '<', '&lt;'), "
        "'>', '&gt;')"
    )


#: ±30-char fragment with the match <b>-wrapped and the field text (never
#: the markup) html-escaped — the engine's fragsize=60 / pre=<b> / html
#: encoder shape, over columns (text, pos, term)
_FRAG3_SQL = (
    _esc_sql("substr(text, greatest(pos - 30, 1), pos - greatest(pos - 30, 1))")
    + " || '<b>' || " + _esc_sql("substr(text, pos, length(term))")
    + " || '</b>' || " + _esc_sql("substr(text, pos + length(term), 30)")
)


# ------------------------------------------------------------ entry point


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: compressed-index BM25 top-10 with stored fields on sf0.001."""
    ix = _index_for(spark, "/root/testdata/sf0.001")
    return search(spark, ix, "merge sort stream", k=10)


# ----------------------------------------------------------------- queries


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """EXACTLY 50 entries: the driver's oracle check caps at 50 (discovered
    round 4 — CORRECTNESS_r04 recorded precisely the first 50 of 54 keys in
    dict order, silently dropping ft_batch_search / ft_topk_per_lang /
    ev_sessionize / ix_lineage).  Near-duplicate entries are merged into
    tagged unions (each merged path still runs AND oracle-checks), so the
    checked set equals the full set; tests/test_entry_parity.py fails
    loudly if the count ever exceeds the cap again."""
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- full-text engine (SURVEY.md §2.2 Q1-Q10) ---
    # naive oracle-adjacent BM25, both headline queries in one tagged union
    # (merged r5: was ft_bm25_topk + ft_bm25_multiterm)
    q["ft_bm25_naive"] = lambda s, d: (
        bm25_topk_df(_docs(s, d), Q_MAIN, k=10)
        .select(F.lit("q0").alias("query_id"), "doc_id", "score")
        .unionByName(
            bm25_topk_df(_docs(s, d), Q_MULTI, k=10).select(
                F.lit("q1").alias("query_id"), "doc_id", "score"
            )
        )
    )
    # compressed-index retrieval through the three shard kernels (merged r5:
    # was ix_search_compressed [MaxScore] + ix_search_taat [exhaustive TAAT];
    # r5d adds the eDisMax multi-field kernel — qf=text^0.5 title^1.2
    # tie=0.1, the solrconfig.xml:872-886 /browse request shape)
    def _kernels(s, d):
        from cascading_solr_spark.query.search import search_dismax

        ix = _index_for(s, d)
        return (
            search(s, ix, Q_MAIN, k=10, with_stored=False)
            .select(
                F.lit("maxscore").alias("kernel"),
                "doc_id",
                F.round("score", 4).alias("score"),
            )
            .unionByName(
                search(
                    s, ix, Q_MULTI, k=10, mode="taat", with_stored=False,
                ).select(
                    F.lit("taat").alias("kernel"),
                    "doc_id",
                    F.round("score", 4).alias("score"),
                )
            )
            .unionByName(
                search_dismax(
                    s, ix, Q_MAIN, {"text": 0.5, "title": 1.2}, tie=0.1,
                    k=10, with_stored=False,
                ).select(
                    F.lit("dismax").alias("kernel"),
                    "doc_id",
                    F.round("score", 4).alias("score"),
                )
            )
            # r5e: the same query over a tombstoned snapshot (doc_id%17==3
            # deleted): deleted docs leave the top-k, survivors keep their
            # full-corpus BM25 scores (Lucene stale-stats semantics)
            .unionByName(
                search(
                    s, _deleted_index_for(s, d), Q_MAIN, k=10,
                    with_stored=False,
                ).select(
                    F.lit("deleted").alias("kernel"),
                    "doc_id",
                    F.round("score", 4).alias("score"),
                )
            )
        )

    q["ix_search_kernels"] = _kernels
    # hit counting incl. the zero-hit short-circuit (merged r5: was
    # ft_keyword_hits + ft_zero_hit)
    q["ft_hit_counts"] = lambda s, d: _docs(s, d).agg(
        F.sum(
            F.array_contains(textstats.simple_tokens("text"), "stream").cast("long")
        ).alias("n_stream"),
        F.sum(
            F.array_contains(textstats.simple_tokens("text"), "zzqxv").cast("long")
        ).alias("n_zzqxv"),
    )
    # Q3 both ways in one kind-tagged union (merged r5c: was ft_field_scoped
    # + ft_field_scoped_indexed): the naive docs-side filter match and the
    # index-side keyword filter COMPOSED with BM25 ranking (fq semantics —
    # global scoring stats)
    q["ft_field_scoped"] = lambda s, d: (
        _docs(s, d)
        .filter(
            (F.col("lang") == "es")
            & F.array_contains(textstats.simple_tokens("text"), "join")
        )
        .select(
            F.lit("match").alias("kind"),
            "doc_id",
            F.lit(0.0).alias("score"),
        )
        .unionByName(
            search(
                s, _index_for(s, d), Q_MAIN, k=10, with_stored=False,
                filters={"lang": "es"},
            ).select(
                F.lit("ranked").alias("kind"),
                "doc_id",
                F.round("score", 4).alias("score"),
            )
        )
    )
    # pure keyword-field membership served from the postings (cat:Japanese
    # analogue, AbstractSolrSchemeTest.java:163-169)
    q["ix_keyword_filter"] = lambda s, d: keyword_filter(
        s, _index_for(s, d), {"lang": "es"}
    )
    # facet.field (solrconfig.xml:891-893) + facet.query (:896-897) in one
    # kind-tagged union (merged r5b: was ft_facets + ft_facet_query) — both
    # served from the match-only kernel, never a docs-table scan
    def _facets(s, d):
        from cascading_solr_spark.query.search import (
            facet_counts,
            facet_query_counts,
        )

        ix = _index_for(s, d)
        field = facet_counts(s, ix, Q_MAIN, "lang").select(
            F.lit("field").alias("kind"),
            F.col("value").alias("facet"),
            "n",
        )
        fq = facet_query_counts(
            s, ix, Q_MAIN, {"es_docs": "lang:es", "with_stream": "stream"}
        ).select(F.lit("query").alias("kind"), "facet", "n")
        # the /browse landing page: q.alt=*:* (solrconfig.xml:879) — the
        # match-all path feeding the same facet machinery
        browse = facet_counts(s, ix, "*:*", "lang").select(
            F.lit("browse").alias("kind"),
            F.col("value").alias("facet"),
            "n",
        )
        # r5f: ALL the request's facet.fields in one pass (the /browse
        # defaults declare four, solrconfig.xml:891-894) — one match job +
        # one prefix-OR-pruned postings scan serving every field
        from cascading_solr_spark.query.search import facet_fields_counts

        multi = facet_fields_counts(
            s, ix, Q_MAIN, ["lang", "source"], mincount=1
        ).select(
            F.concat(F.lit("multi_"), F.col("field")).alias("kind"),
            F.col("value").alias("facet"),
            "n",
        )
        # r5f: facet.prefix (scan-narrowed buckets) + facet.missing (the
        # NULL bucket; 0 here — every doc has a lang — but the anti-join
        # plumbing runs distributed and the row rides the oracle check)
        pm = facet_counts(
            s, ix, Q_MAIN, "lang", prefix="e", missing=True
        ).select(
            F.lit("prefix_e").alias("kind"),
            F.coalesce(F.col("value"), F.lit("__missing__")).alias("facet"),
            "n",
        )
        # r5i: facet.offset — page 2 of the lang buckets (offset=2 limit=2
        # into the count-desc/value-asc order; Solr's facet paging params)
        off = facet_fields_counts(
            s, ix, Q_MAIN, ["lang"], limit=2, offset=2
        ).select(
            F.lit("offset2").alias("kind"),
            F.col("value").alias("facet"),
            "n",
        )
        return (
            field.unionByName(fq).unionByName(browse).unionByName(multi)
            .unionByName(pm).unionByName(off)
        )

    q["ft_facet_counts"] = _facets

    # spellcheck suggestions (Solr spellcheck component, solrconfig.xml:932):
    # closest dict terms to a misspelled query term, (distance, df desc) rank
    def _spell(s, d):
        from cascading_solr_spark.query.search import suggest_terms

        return suggest_terms(s, _index_for(s, d), "sparc", k=5)

    q["ft_spellcheck"] = _spell

    # MoreLikeThis (solr.MoreLikeThisComponent, solrconfig.xml:1166, run on
    # /browse with mlt.count, :883-888): interesting terms of doc 0 by
    # tf·idf, OR-ranked similar docs, source excluded
    # ... PLUS the per-result batched form (r5i): more_like_this_docs over
    # docs {0, 1} in ONE search_many kernel pass (the /browse MLT section,
    # mlt.count=3 per result) — kind-tagged 'stream' vs 'docs'
    def _mlt(s, d):
        from cascading_solr_spark.query.search import (
            more_like_this,
            more_like_this_docs,
        )

        ix = _index_for(s, d)
        src = _docs(s, d).filter(F.col("doc_id") == 0).collect()[0]["text"]
        stream = more_like_this(
            s, ix, src, k=10, max_terms=10, exclude_doc_id=0
        ).select(
            F.lit("stream").alias("kind"),
            F.lit(-1).cast("long").alias("src"),
            "doc_id",
            F.round("score", 4).alias("score"),
        )
        docsleg = more_like_this_docs(s, ix, [0, 1], count=3).select(
            F.lit("docs").alias("kind"),
            "src",
            "doc_id",
            F.round("score", 4).alias("score"),
        )
        return stream.unionByName(docsleg)

    q["ft_mlt"] = _mlt

    # highlighting (Solr highlight component: hl=on solrconfig.xml:917,
    # registered :1167, in the /browse chain :1177): top-k ranked docs with
    # the earliest-occurring query term <em>-wrapped in a ±30-char fragment
    # of the stored text
    # ... PLUS the multi-field hl.fl shape (r5d): whole-field title
    # highlight (f.title.hl.fragsize=0 + alternateField=title,
    # solrconfig.xml:925-926) riding the same top-k, field-tagged
    def _highlight(s, d):
        from cascading_solr_spark.query.search import (
            highlight,
            highlight_fields,
        )

        ix = _index_for(s, d)
        content = highlight(s, ix, Q_MAIN, k=10, window=30).select(
            "doc_id",
            F.round("score", 4).alias("score"),
            F.lit("text").alias("field"),
            F.lit(1).alias("snippet_no"),
            "term",
            "snippet",
        )
        title = highlight_fields(
            s, ix, Q_MAIN, ["title"], k=10,
            field_params={
                "title": {"fragsize": 0, "alternate_field": "title"}
            },
        ).select(
            "doc_id",
            F.round("score", 4).alias("score"),
            "field",
            "snippet_no",
            "term",
            "snippet",
        )
        # r5f: the f.content.hl.snippets=3 multi-fragment mode with the
        # /browse config's own hl.simple.pre=<b> and hl.encoder=html
        # (solrconfig.xml:922-924,928): up to 3 document-order fragments,
        # field text html-escaped, markers untouched
        text3 = highlight_fields(
            s, ix, Q_MAIN, ["text"], k=10,
            field_params={"text": {"fragsize": 60, "snippets": 3}},
            pre="<b>", post="</b>", encoder="html",
        ).select(
            "doc_id",
            F.round("score", 4).alias("score"),
            F.lit("text3").alias("field"),
            "snippet_no",
            "term",
            "snippet",
        )
        return content.unionByName(title).unionByName(text3)

    q["ft_highlight"] = _highlight

    # facet.range (solrconfig.xml:900-914): bucket counts of the matching
    # docs' stored numeric textlen over [0, 4000) step 500, zero buckets
    # included (facet.mincount=0 default)
    def _facet_range(s, d):
        from cascading_solr_spark.query.search import facet_range_counts

        return facet_range_counts(
            s, _index_for(s, d), Q_MAIN, "textlen", start=0, end=4000, gap=500
        )

    q["ft_facet_range"] = _facet_range

    # DATE-typed facet.range with month-gap arithmetic + facet.range.other
    # buckets (the reference range-facets manufacturedate_dt with +1YEAR
    # gaps, solrconfig.xml:909-914, and sets other=after for price, :900):
    # quarterly buckets over the stored docdate, before/after/between rows
    # included (other=all)
    def _facet_range_date(s, d):
        from cascading_solr_spark.query.search import facet_range_counts_date

        return facet_range_counts_date(
            s, _index_for(s, d), Q_MAIN, "docdate",
            start="2020-03-01", end="2022-03-01", gap_months=3, other=True,
        )

    q["ft_facet_range_date"] = _facet_range_date

    # match-only kernel (the Lucene matching-not-ranking path facets /
    # filter caches consume): doc-id decode only, no scoring arithmetic,
    # tf/dl columns pruned at the parquet scan
    def _match_only(s, d):
        from cascading_solr_spark.query.search import match_ids

        return match_ids(s, _index_for(s, d), "lang:es " + Q_MAIN)

    q["ix_match_only"] = _match_only

    # field-sorted retrieval (Solr sort=<field> asc — the reference config's
    # own warming queries use sort=price asc, solrconfig.xml:600-601; served
    # match-set-first per useFilterForSortedQuery, :545-559)
    # kind-tagged union (r5h): field leg (sort=textlen asc) + func leg
    # (sort by recip(textlen,1,1000,100) desc — the func QParser /
    # sort-by-function surface, solrconfig.xml:1744-1750)
    def _sorted(s, d):
        from cascading_solr_spark.query.search import (
            search_sorted,
            sort_by_function,
        )

        ix = _index_for(s, d)
        fld = search_sorted(
            s, ix, Q_MAIN, "textlen", ascending=True, k=10
        ).select(
            F.lit("field").alias("kind"),
            "doc_id",
            F.col("textlen").cast("double").alias("val"),
        )
        fn = sort_by_function(
            s, ix, Q_MAIN, "recip(textlen,1,1000,100)", ascending=False, k=10
        ).select(
            F.lit("func").alias("kind"),
            "doc_id",
            F.round("value", 6).alias("val"),
        )
        # cursor leg (r5i): page 2 fetched BY CURSOR from page 1's last
        # (textlen, doc_id) — Solr's cursorMark under a field sort; must
        # equal OFFSET 10 on the full order (the oracle's formulation)
        p1 = search_sorted(
            s, ix, Q_MAIN, "textlen", ascending=True, k=10
        ).select("doc_id", "textlen").collect()
        crs = search_sorted(
            s, ix, Q_MAIN, "textlen", ascending=True, k=10,
            cursor=(p1[-1]["textlen"], p1[-1]["doc_id"]),
        ).select(
            F.lit("cursor").alias("kind"),
            "doc_id",
            F.col("textlen").cast("double").alias("val"),
        )
        return fld.unionByName(fn).unionByName(crs)

    q["ft_sorted_query"] = _sorted

    # pagination (Solr start param; /select returns "the range of documents
    # requested", solrconfig.xml:484): page 2 of the ranked result
    # both deep-paging surfaces in one mode-tagged union (merged r5b: was
    # ft_paged_query [offset start=N] + ft_cursor_page [cursorMark
    # analogue: page 2 fetched BY CURSOR from page 1's last (score,
    # doc_id), page-N work = page-1 work])
    def _deep_paging(s, d):
        from cascading_solr_spark.query.search import next_cursor, search_after

        ix = _index_for(s, d)
        off = search(s, ix, Q_MAIN, k=10, start=10, with_stored=False).select(
            F.lit("offset").alias("mode"),
            "doc_id",
            F.round("score", 4).alias("score"),
        )
        page1 = search_after(s, ix, Q_MULTI, k=10).collect()
        cur = search_after(
            s, ix, Q_MULTI, cursor=next_cursor(page1), k=10
        ).select(
            F.lit("cursor").alias("mode"),
            "doc_id",
            F.round("score", 4).alias("score"),
        )
        return off.unionByName(cur)

    q["ft_deep_paging"] = _deep_paging

    # QueryElevationComponent (/elevate + elevate.xml,
    # solrconfig.xml:1485-1499): pinned ids first in config order with
    # their real BM25 scores, one exclude, normal ranked tail
    def _elevate(s, d):
        from cascading_solr_spark.query.search import search_elevated

        return search_elevated(
            s, _index_for(s, d), Q_MAIN,
            {Q_MAIN: [3, 5, (1, True)]}, k=10,
        ).select("doc_id", F.round("score", 4).alias("score"), "elevated")

    q["ft_elevate"] = _elevate

    # DebugComponent (debugQuery=true, solrconfig.xml:1169,1179): per-term
    # BM25 explanation of the top-ranked doc — pieces from the INDEX
    # (dict df + postings tf/dl), sum(contribution) = the ranked score
    def _explain(s, d):
        from cascading_solr_spark.query.search import explain_score

        ix = _index_for(s, d)
        top = search(s, ix, Q_MAIN, k=1, with_stored=False).collect()[0]
        return explain_score(s, ix, Q_MAIN, top["doc_id"]).select(
            "term", "df", "tf", "dl",
            F.round("idf", 6).alias("idf"),
            F.round("tf_norm", 6).alias("tf_norm"),
            F.round("contribution", 6).alias("contribution"),
        )

    q["ft_explain"] = _explain

    # RealTimeGetHandler (/get, solrconfig.xml:843-851): stored fields by
    # unique key, partition-pruned to the ids' shards + row groups
    def _rt_get(s, d):
        from cascading_solr_spark.query.search import realtime_get

        return realtime_get(s, _index_for(s, d), [1, 2, 3, 5, 8]).select(
            "doc_id", "lang", "source",
            F.col("textlen").cast("long").alias("textlen"),
            "sha256",
        )

    q["ft_rt_get"] = _rt_get

    # TermsComponent (/terms handler, solrconfig.xml:1458-1466): vocabulary
    # browse by prefix, terms.sort=count default — PLUS the /admin/luke
    # top-terms report (r5d, solrconfig.xml:1078) in one kind-tagged union
    def _terms(s, d):
        from cascading_solr_spark.handlers import luke_top_terms
        from cascading_solr_spark.query.search import terms_component

        ix = _index_for(s, d)
        t = terms_component(s, ix, prefix="s", k=10).select(
            F.lit("terms").alias("kind"), "term", "df"
        )
        lk = luke_top_terms(s, ix, "lang", k=10).select(
            F.lit("luke").alias("kind"), "term", "df"
        )
        # r5h: terms.regex — full anchored match (Matcher.matches rule)
        rx = terms_component(s, ix, regex="s.*t", k=10).select(
            F.lit("regex").alias("kind"), "term", "df"
        )
        # r5i: terms.lower/terms.upper range bounds (lower incl, upper
        # excl — the Solr defaults)
        rng = terms_component(s, ix, lower="so", upper="sz", k=10).select(
            F.lit("range").alias("kind"), "term", "df"
        )
        return t.unionByName(lk).unionByName(rx).unionByName(rng)

    q["ft_terms"] = _terms

    # facet.pivot (the /browse defaults pivot cat,inStock,
    # solrconfig.xml:899): (outer, inner) keyword-value pair counts over the
    # match set, all sides index-derived
    def _pivot(s, d):
        from cascading_solr_spark.query.search import facet_pivot_counts

        return facet_pivot_counts(
            s, _index_for(s, d), Q_MAIN, ("lang", "source")
        )

    q["ft_facet_pivot"] = _pivot

    # StatsComponent (solrconfig.xml:1168): numeric stats of a stored field
    # over the match set
    def _stats(s, d):
        from cascading_solr_spark.query.search import stats_field

        ix = _index_for(s, d)

        def _sel(df):
            return df.select(
                "facet",
                F.col("n").cast("long").alias("n"),
                F.col("missing").cast("long").alias("missing"),
                F.col("min").cast("long").alias("min"),
                F.col("max").cast("long").alias("max"),
                F.col("sum").cast("long").alias("sum"),
                F.round("mean", 4).alias("mean"),
                F.round("stddev", 4).alias("stddev"),
            )

        flat = stats_field(s, ix, Q_MAIN, "textlen").withColumn(
            "facet", F.lit("*")
        )
        # r5h: stats.facet=lang — the same stats per facet value
        fac = stats_field(s, ix, Q_MAIN, "textlen", facet="lang")
        return _sel(flat).unionByName(_sel(fac))

    q["ft_stats"] = _stats

    # spellcheck.collate + collateExtendedResults (solrconfig.xml:937-938)
    # PLUS the multi-collation knobs (r5d: maxCollations=3 /
    # maxCollationTries=5, solrconfig.xml:940-941) in one kind-tagged union
    def _collate(s, d):
        from cascading_solr_spark.query.search import (
            spellcheck_collate,
            spellcheck_collations,
        )

        ix = _index_for(s, d)
        single = spellcheck_collate(s, ix, "sparc join").select(
            F.lit("single").alias("kind"), "collation", "hits"
        )
        multi = spellcheck_collations(
            s, ix, "sparc join", max_collations=2, max_tries=2
        ).select(F.lit("multi").alias("kind"), "collation", "hits")
        return single.unionByName(multi)

    q["ft_collate"] = _collate

    # TermVectorComponent (/tvrh handler, solrconfig.xml:1326-1346): per-doc
    # (term, tf, df) vector derived from stored content + the dict
    def _tv(s, d):
        from cascading_solr_spark.query.search import term_vectors

        return term_vectors(s, _index_for(s, d), 0)

    q["ft_term_vectors"] = _tv

    # composition: query-string keyword filter + field sort (desc) + paging
    # in one request — the full Solr request shape (q + fq + sort + start)
    def _sorted_paged(s, d):
        from cascading_solr_spark.query.search import search_sorted

        return search_sorted(
            s, _index_for(s, d), "lang:es " + Q_MAIN, "textlen",
            ascending=False, k=5, start=5,
        ).select("doc_id", "textlen")

    q["ix_sorted_filtered_paged"] = _sorted_paged
    # query-time synonym expansion (SynonymFilter expand=true analogue)
    q["ft_synonym"] = lambda s, d: search(
        s, _index_for(s, d), "join", k=10, with_stored=False,
        synonyms={"join": ["merge"]},
    ).select("doc_id", F.round("score", 4).alias("score"))
    # conjunctive matching through BOTH paths in one tagged union (merged
    # r5: was ft_and_query [naive docs scan] + ix_and_query [index-side
    # postings intersection, the Lucene-parser +term/AND form,
    # schema.xml:239 default OR overridden]); tokens projected ONCE as a
    # named column — Catalyst does not CSE two regexp_extract_all calls
    q["and_query_paths"] = lambda s, d: (
        _docs(s, d)
        .select("doc_id", textstats.simple_tokens("text").alias("_toks"))
        .filter(
            F.array_contains("_toks", "spark") & F.array_contains("_toks", "join")
        )
        .select(F.lit("naive").alias("path"), "doc_id")
        .unionByName(
            search(
                s, _index_for(s, d), Q_MAIN, k=None, op="AND",
                with_stored=False,
            ).select(F.lit("index").alias("path"), "doc_id")
        )
    )
    # the reference's own query-string form through the Lucene parser
    # (q=cat:Japanese, AbstractSolrSchemeTest.java:163-165): field:value
    # tokens parsed against spec.keyword_fields into index-side filters,
    # plus (r5g) the MUST_NOT form — '-merge' strips matching docs
    # in-kernel (shard-local: sharding is by doc id) before top-k
    def _query_string(s, d):
        ix = _index_for(s, d)
        filt = search(
            s, ix, "lang:es " + Q_MAIN, k=10, with_stored=False
        ).select(
            F.lit("filter").alias("kind"),
            "doc_id",
            F.round("score", 4).alias("score"),
        )
        neg = search(
            s, ix, Q_MAIN + " -merge", k=10, with_stored=False
        ).select(
            F.lit("neg").alias("kind"),
            "doc_id",
            F.round("score", 4).alias("score"),
        )
        # r5g: per-term boost 'join^2' — clause weight multiplier (Lucene
        # boost placement: premultiplied into idf, MaxScore bounds scale)
        boost = search(
            s, ix, "spark join^2", k=10, with_stored=False
        ).select(
            F.lit("boost").alias("kind"),
            "doc_id",
            F.round("score", 4).alias("score"),
        )
        # r5g: wildcard clause 'so*' — dict-expanded constant-score
        # (Solr's multi-term rewrite: +1.0 per doc matching any expansion,
        # added to the BM25 of the plain terms)
        wild = search(
            s, ix, "join s*", k=10, with_stored=False
        ).select(
            F.lit("wild").alias("kind"),
            "doc_id",
            F.round("score", 4).alias("score"),
        )
        # r5g: fuzzy clause 'xerge~1' — Levenshtein-ball dict expansion,
        # constant-score like the wildcard rewrite (classic Levenshtein,
        # the documented deviation from Lucene's Damerau default)
        fuzzy = search(
            s, ix, "join xerge~1", k=10, with_stored=False
        ).select(
            F.lit("fuzzy").alias("kind"),
            "doc_id",
            F.round("score", 4).alias("score"),
        )
        # r5g: keyword range filter 'lang:[de TO es]' — StrField
        # lexicographic range, dict-expanded to a filter GROUP (OR within,
        # AND against other fq) composed index-side with the ranked query
        rng = search(
            s, ix, Q_MAIN + " lang:[de TO es]", k=10, with_stored=False
        ).select(
            F.lit("range").alias("kind"),
            "doc_id",
            F.round("score", 4).alias("score"),
        )
        # r5g: numeric stored-field filter (Solr frange / PostFilter
        # analogue): ranked overfetch + pruned point-probe validation,
        # BM25 stats unchanged (fq semantics)
        dfq = search(
            s, ix, Q_MAIN, k=10, with_stored=False,
            doc_filter="textlen >= 300",
        ).select(
            F.lit("dfq").alias("kind"),
            "doc_id",
            F.round("score", 4).alias("score"),
        )
        # r5g: nested boolean tree — structured precedence, shard-local
        # set algebra over the candidate universe, Lucene BooleanWeight
        # branch-sum scoring (an OR credits only its MATCHING children)
        from cascading_solr_spark.query.boolean import search_boolean

        bool_ = search_boolean(
            s, ix, "(spark AND join) OR (merge AND sort)", k=10
        ).select(
            F.lit("bool").alias("kind"),
            "doc_id",
            F.round("score", 4).alias("score"),
        )
        # r5h: eDisMax additive boost FUNCTION (bf=div(textlen,100),
        # solrconfig.xml:872 defType=edismax + the ValueSource library of
        # :1744-1750) — full-match exact scoring + column-pruned docs join,
        # arithmetic JVM-side
        from cascading_solr_spark.query.search import search_boosted

        bf = search_boosted(
            s, ix, Q_MAIN, bf="div(textlen,100)", k=10
        ).select(
            F.lit("bf").alias("kind"),
            "doc_id",
            F.round("score", 4).alias("score"),
        )
        # r5h: eDisMax boost QUERY (bq=lang:es^2.5) — matching docs gain
        # the clause weight (constant-score boost-query rule)
        bqq = search_boosted(
            s, ix, Q_MAIN, bq="lang:es^2.5", k=10
        ).select(
            F.lit("bq").alias("kind"),
            "doc_id",
            F.round("score", 4).alias("score"),
        )
        # r5h: {!join from=source to=source}"merge sort" as fq — docs
        # sharing a source with a phrase-matching doc; one distributed
        # value-join (JoinQParserPlugin analogue), fq semantics (global
        # BM25 stats, join contributes no score)
        from cascading_solr_spark.query.search import search_joined

        jn = search_joined(
            s, ix, Q_MAIN, '"merge sort"', "source", "source", k=10
        ).select(
            F.lit("join").alias("kind"),
            "doc_id",
            F.round("score", 4).alias("score"),
        )
        return (
            filt.unionByName(neg).unionByName(boost)
            .unionByName(wild).unionByName(fuzzy).unionByName(rng)
            .unionByName(dfq).unionByName(bool_)
            .unionByName(bf).unionByName(bqq).unionByName(jn)
        )

    q["ix_query_string"] = _query_string

    # --- exact phrase query (PhraseQuery; positional index, r5c) ---
    def _phrase(s, d):
        from cascading_solr_spark.query.search import search_phrase

        ix = _index_for(s, d)
        exact = search_phrase(
            s, ix, "merge sort", k=None, with_stored=False
        ).select(
            F.lit("exact").alias("kind"),
            "doc_id",
            F.round("score", 4).alias("score"),
        )
        # r5f: the sloppy form "merge sort"~2 — ordered greedy-chain span
        # <= 3 (semantics documented on _phrase_kernel)
        slop2 = search_phrase(
            s, ix, "merge sort", k=None, with_stored=False, slop=2
        ).select(
            F.lit("slop2").alias("kind"),
            "doc_id",
            F.round("score", 4).alias("score"),
        )
        return exact.unionByName(slop2)

    q["ft_phrase"] = _phrase

    # --- result grouping / field collapse (group.field=lang, r5c) plus
    # the group.query form (r5h) in one kind-tagged union ---
    def _grouped(s, d):
        from cascading_solr_spark.query.search import (
            search_grouped,
            search_grouped_queries,
        )

        ix = _index_for(s, d)
        fld = search_grouped(
            s, ix, Q_MAIN, "lang", group_limit=2, k_groups=5
        ).select(
            F.lit("field").alias("kind"),
            "group",
            "group_hits",
            F.col("group_rank").cast("long").alias("group_rank"),
            "doc_id",
            F.round("score", 4).alias("score"),
        )
        gq = search_grouped_queries(
            s, ix, Q_MAIN, {"es": "lang:es", "mergeful": "merge"},
            group_limit=3,
        ).select(
            F.lit("gq").alias("kind"),
            "group",
            "group_hits",
            F.col("group_rank").cast("long").alias("group_rank"),
            "doc_id",
            F.round("score", 4).alias("score"),
        )
        # r5i: group.ngroups=true — the TOTAL distinct matching groups
        # (response-header figure), one count-distinct broadcast onto rows
        ng = search_grouped(
            s, ix, Q_MAIN, "lang", group_limit=1, k_groups=1,
            with_ngroups=True,
        ).select(
            F.lit("ngroups").alias("kind"),
            F.lit("*").alias("group"),
            F.col("ngroups").alias("group_hits"),
            F.lit(0).cast("long").alias("group_rank"),
            F.lit(-1).cast("long").alias("doc_id"),
            F.lit(0.0).alias("score"),
        ).limit(1)
        return fld.unionByName(gq).unionByName(ng)

    q["ft_grouped"] = _grouped

    # --- eDisMax minimum-should-match (mm=3 of 4 OR terms, r5c) ---
    q["ft_min_match"] = lambda s, d: search(
        s, _index_for(s, d), Q_MULTI, k=None, with_stored=False, min_match=3
    ).select("doc_id", F.round("score", 4).alias("score"))

    # --- batched multi-query search (one distributed pass for N queries);
    # r5: full single-query-surface parity — q2 carries a keyword filter
    # through the batch kernel (restored to the checked set after the r4
    # cap-drop, see the queries() docstring) ---
    def _batch(s, d):
        from cascading_solr_spark.query.search import search_many

        return search_many(
            s,
            _index_for(s, d),
            {
                "q0": Q_MAIN,
                "q1": Q_MULTI,
                "q2": {"q": Q_MAIN, "filters": {"lang": "es"}},
            },
            k=10,
        ).select("query_id", "doc_id", F.round("score", 4).alias("score"))

    q["ft_batch_search"] = _batch

    # --- top-k per group (window over BM25 scores; restored, see above) ---
    def _topk_per_lang(s, d):
        from pyspark.sql import Window

        scores = bm25_topk_df(_docs(s, d), Q_MAIN, k=None)
        joined = scores.join(_docs(s, d).select("doc_id", "lang"), "doc_id")
        w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            joined.withColumn("rn", F.row_number().over(w).cast("long"))
            .filter(F.col("rn") <= 3)
            .select("lang", "doc_id", "score", "rn")
        )

    q["ft_topk_per_lang"] = _topk_per_lang

    # --- sessionization (gap-based, window functions; restored) ---
    def _sessions(s, d):
        from cascading_solr_spark.operators.sessions import sessionize

        return sessionize(_events(s, d), gap_seconds=1800)

    q["ev_sessionize"] = _sessions
    # per-term df + corpus (n, avgdl) in one (stat, value) union (merged
    # r5c: was ft_df_stats + ft_corpus_stats)
    q["ft_corpus_stats"] = lambda s, d: (
        tokens_long(_docs(s, d), "text", "doc_id")
        .filter(F.col("term").isin(list(DF_TERMS)))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .select(
            F.concat(F.lit("df:"), F.col("term")).alias("stat"),
            F.col("df").cast("double").alias("value"),
        )
        .unionByName(
            corpus_stats(_docs(s, d), "text").select(
                F.lit("n").alias("stat"), F.col("n").cast("double").alias("value")
            )
        )
        .unionByName(
            corpus_stats(_docs(s, d), "text").select(
                F.lit("avgdl").alias("stat"),
                F.round("avgdl", 4).alias("value"),
            )
        )
    )
    q["ft_postings_long"] = lambda s, d: (
        tokens_long(_docs(s, d), "text", "doc_id")
        .filter(F.col("term").isin(["spark", "join", "scan"]))
        .select("doc_id", "term", "tf")
    )
    q["ft_stored_roundtrip"] = lambda s, d: (
        bm25_topk_df(_docs(s, d), Q_MAIN, k=5)
        .join(_docs(s, d), "doc_id")
        .select(
            "doc_id", "score", "lang", "source",
            F.sha2(F.col("text"), 256).alias("sha"),
        )
    )

    # --- dedup ---
    def _docs_with_dups(s, d):
        docs = _docs(s, d).select("doc_id", "text")
        clones = (
            _docs(s, d)
            .filter(F.col("doc_id") < 50)
            .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        )
        return docs.union(clones)

    q["dd_exact"] = lambda s, d: dedup.exact_duplicates(
        _docs_with_dups(s, d), "text"
    ).select("content_sha", "n_dups", "keep_doc_id")
    q["dd_ngram_jaccard"] = lambda s, d: dedup.ngram_jaccard_pairs(
        _docs(s, d), "text", n=3, threshold=0.1
    ).select("doc_a", "doc_b", "common", "na", "nb", "jaccard")
    q["dd_minhash_sigs"] = lambda s, d: dedup.minhash_signatures(
        _docs(s, d), "text"
    ).select("doc_id", F.col("h").cast("long").alias("h"), "minhash")
    # LSH pairs + connected-components clustering (r5i) in one kind-tagged
    # union: 'pair' rows are the verified near-dup pairs, 'comp' rows assign
    # every paired doc its canonical representative (min reachable doc_id)
    # with v = cluster size — the pairs→clusters→keep-one step a dedup
    # pipeline actually ships.  Oracle: recursive-CTE transitive closure.
    def _dd_lsh(s, d):
        pairs = dedup.minhash_lsh_pairs(
            _docs_with_dups(s, d), "text", threshold=0.5
        ).persist()
        comp = dedup.connected_components(pairs)
        csize = comp.groupBy("component").agg(F.count("*").alias("sz"))
        return (
            pairs.select(
                F.lit("pair").alias("kind"),
                F.col("doc_a").alias("a"),
                F.col("doc_b").alias("b"),
                F.col("jaccard").alias("v"),
            )
            .unionByName(
                comp.join(csize, "component").select(
                    F.lit("comp").alias("kind"),
                    F.col("doc_id").alias("a"),
                    F.col("component").alias("b"),
                    F.col("sz").cast("double").alias("v"),
                )
            )
        )

    q["dd_minhash_lsh"] = _dd_lsh
    # signatures + banded equi-join near pairs (lossless pigeonhole) in one
    # kind-tagged union vs the quadratic oracle (merged r5c: was dd_simhash
    # + dd_simhash_pairs); sig rows use b=-1
    q["dd_simhash"] = lambda s, d: (
        dedup.simhash(_docs(s, d), "text")
        .select(
            F.lit("sig").alias("kind"),
            F.col("doc_id").alias("a"),
            F.lit(-1).cast("long").alias("b"),
            F.col("simhash").cast("long").alias("v"),
        )
        .unionByName(
            dedup.simhash_near_pairs(
                _docs(s, d).select("doc_id", "text"), "text", max_hamming=1
            ).select(
                F.lit("pair").alias("kind"),
                F.col("doc_a").alias("a"),
                F.col("doc_b").alias("b"),
                F.col("hamming").cast("long").alias("v"),
            )
        )
    )

    # --- similarity / ANN ---
    q["sim_cosine_topk"] = lambda s, d: similarity.cosine_topk_to_row(
        _emb(s, d), query_id=0, k=10
    )
    # threshold 0.3 (not 0.95): the synthetic embeddings yield ZERO pairs
    # above ~0.8, which made this check pass vacuously in r4 — at 0.3 the
    # exact path returns a non-empty superset of sim_near_pairs_lsh's pairs
    q["sim_near_pairs"] = lambda s, d: similarity.embedding_near_pairs(
        _emb(s, d).withColumn(
            "embedding", F.transform("embedding", lambda x: x.cast("double"))
        ),
        threshold=0.3,
    )
    q["sim_lsh_buckets"] = lambda s, d: (
        similarity.lsh_buckets(_emb(s, d))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )
    # scale path: candidates from LSH bucket equi-join, exact-cosine verify
    q["sim_near_pairs_lsh"] = lambda s, d: similarity.embedding_near_pairs_lsh(
        _emb_double(s, d), threshold=0.3
    )
    # materialized bucket-partitioned ANN: the query reads ONLY the probed
    # (tbl, bucket) partitions — 2 tables x hamming-2 multiprobe, the
    # recall>=0.9 config (see BENCH ann_curve)
    q["sim_ann_topk"] = lambda s, d: similarity.ann_lsh_topk_indexed(
        s, _ann_for(s, d), ANN_QV, k=10, probes=3, n_tables=2
    ).select("vec_id", F.col("bucket").cast("long").alias("bucket"), "cos_sim")

    # --- text analysis ---
    # token counting + rolling-hash fingerprint joined per doc (merged r5:
    # was ts_token_count + ts_fingerprint; fingerprint covers docs with >=1
    # token, left-joined so token counts keep full coverage)
    q["ts_tokens_fp"] = lambda s, d: (
        _docs(s, d)
        .select(
            "doc_id",
            textstats.token_count("text").cast("long").alias("n_tokens"),
        )
        .join(
            textstats.fingerprint(_docs(s, d), "text").select(
                "doc_id", "fingerprint"
            ),
            "doc_id",
            "left",
        )
    )
    # quality scoring + language-ID joined per doc (merged r5b: was
    # ts_quality + ts_langid — both 1-row-per-doc Catalyst-only features)
    q["ts_quality_lang"] = lambda s, d: (
        textstats.quality_features(_docs(s, d), "text")
        .select(
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "avg_token_len", "alnum_ratio", "stopword_ratio", "quality_score",
        )
        .join(
            textstats.language_id(_docs(s, d), "text").select(
                "doc_id", "pred_lang",
                F.col("n_en").cast("long").alias("n_en"),
                F.col("n_es").cast("long").alias("n_es"),
                F.col("n_fr").cast("long").alias("n_fr"),
            ),
            "doc_id",
        )
    )
    # --- multimodal plumbing ---
    # binary wrap + typed metadata + Arrow feature extraction in one result
    # (merged r5: was mm_binary_meta + mm_features)
    def _mm(s, d):
        media = multimodal.as_media(_docs(s, d), "text")
        return multimodal.extract_features(media).join(
            media.select("doc_id", "media_type"), "doc_id"
        ).select(
            "doc_id",
            "media_type",
            F.col("byte_len").cast("long").alias("byte_len"),
            F.col("width").cast("long").alias("width"),
            F.col("height").cast("long").alias("height"),
            F.col("n_frames").cast("long").alias("n_frames"),
            "checksum",
        )

    q["mm_pipeline"] = _mm

    # --- events (batch windowed aggregation; streaming twin in streaming/) ---
    q["ev_windowed_counts"] = lambda s, d: (
        windowed_event_counts(_events(s, d), "1 hour").select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type", "n", "total_value",
        )
    )

    # --- index internals (rows-only checks; binary/non-SQL) ---
    q["ix_lineage"] = lambda s, d: _index_for(s, d).lineage(s).select(
        "shard", "terms", "postings", "status"
    )
    return q


# ------------------------------------------------------------- oracle SQL


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o["ft_bm25_naive"] = f"""
SELECT 'q0' AS query_id, doc_id, score
FROM ({_bm25_sql(tuple(Q_MAIN.split()), 10)}) a
UNION ALL
SELECT 'q1' AS query_id, doc_id, score
FROM ({_bm25_sql(tuple(Q_MULTI.split()), 10)}) b
"""
    o["ix_search_kernels"] = f"""
SELECT 'maxscore' AS kernel, doc_id, score
FROM ({_bm25_sql(tuple(Q_MAIN.split()), 10)}) a
UNION ALL
SELECT 'taat' AS kernel, doc_id, score
FROM ({_bm25_sql(tuple(Q_MULTI.split()), 10)}) b
UNION ALL
SELECT 'dismax' AS kernel, doc_id, score
FROM ({_dismax_sql(
        tuple(Q_MAIN.split()),
        {"text": "text", "title": _TITLE_SQL},
        {"text": 0.5, "title": 1.2},
        0.1,
        10,
    )}) c
UNION ALL
SELECT * FROM (
  SELECT 'deleted' AS kernel, doc_id, score
  FROM ({_bm25_sql(tuple(Q_MAIN.split()), None)}) z
  WHERE doc_id % 17 <> 3
  ORDER BY score DESC, doc_id ASC LIMIT 10) dd
"""
    o["ft_hit_counts"] = f"""
WITH {_toks_cte()}
SELECT (SELECT count(DISTINCT doc_id) FROM toks
        WHERE term = 'stream')::BIGINT AS n_stream,
       (SELECT count(DISTINCT doc_id) FROM toks
        WHERE term = 'zzqxv')::BIGINT AS n_zzqxv
"""
    o["ft_field_scoped"] = f"""
WITH {_toks_cte()},
scores AS ({_bm25_sql(tuple(Q_MAIN.split()), None)})
SELECT 'match' AS kind, d.doc_id, 0.0 AS score FROM documents d
WHERE d.lang = 'es'
  AND EXISTS (SELECT 1 FROM toks t WHERE t.doc_id = d.doc_id AND t.term = 'join')
UNION ALL
SELECT 'ranked' AS kind, doc_id, score FROM (
  SELECT s.doc_id, s.score
  FROM scores s JOIN documents d USING (doc_id)
  WHERE d.lang = 'es'
  ORDER BY s.score DESC, s.doc_id ASC LIMIT 10)
"""
    o["ix_keyword_filter"] = "SELECT doc_id FROM documents WHERE lang = 'es'"
    o["ft_facet_counts"] = f"""
WITH {_toks_cte()},
matched AS (SELECT DISTINCT doc_id FROM toks
            WHERE term IN ('spark', 'join')),
es AS (SELECT doc_id FROM documents WHERE lang = 'es'),
st AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'stream')
SELECT 'field' AS kind, d.lang AS facet, count(*)::BIGINT AS n
FROM documents d JOIN matched USING (doc_id)
GROUP BY 2
UNION ALL
SELECT 'query' AS kind, 'es_docs' AS facet,
       (SELECT count(*) FROM matched JOIN es USING (doc_id))::BIGINT AS n
UNION ALL
SELECT 'query' AS kind, 'with_stream' AS facet,
       (SELECT count(*) FROM matched JOIN st USING (doc_id))::BIGINT AS n
UNION ALL
SELECT 'browse' AS kind, d.lang AS facet, count(*)::BIGINT AS n
FROM documents d GROUP BY 2
UNION ALL
SELECT 'multi_lang' AS kind, d.lang AS facet, count(*)::BIGINT AS n
FROM documents d JOIN matched USING (doc_id) GROUP BY 2
UNION ALL
SELECT 'multi_source' AS kind, d.source AS facet, count(*)::BIGINT AS n
FROM documents d JOIN matched USING (doc_id) GROUP BY 2
UNION ALL
SELECT 'prefix_e' AS kind, d.lang AS facet, count(*)::BIGINT AS n
FROM documents d JOIN matched USING (doc_id)
WHERE d.lang LIKE 'e%' GROUP BY 2
UNION ALL
SELECT 'prefix_e' AS kind, '__missing__' AS facet,
       (SELECT count(*) FROM matched m
        LEFT JOIN documents dd USING (doc_id)
        WHERE dd.lang IS NULL)::BIGINT AS n
UNION ALL
SELECT 'offset2' AS kind, facet, n FROM (
  SELECT d.lang AS facet, count(*)::BIGINT AS n,
         row_number() OVER (ORDER BY count(*) DESC, d.lang ASC) AS rk
  FROM documents d JOIN matched USING (doc_id) GROUP BY d.lang
) WHERE rk > 2 AND rk <= 4
"""
    o["ft_spellcheck"] = f"""
WITH {_toks_cte()},
vocab AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
          FROM toks GROUP BY 1)
SELECT term, df, levenshtein(term, 'sparc')::INT AS distance
FROM vocab
WHERE term != 'sparc' AND abs(length(term) - 5) <= 2
  AND levenshtein(term, 'sparc') <= 2
ORDER BY distance ASC, df DESC, term ASC LIMIT 5
"""
    o["ft_mlt"] = f"""
WITH {_toks_cte()},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                 (SELECT sum(dl) FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
mlt AS (SELECT t.term
        FROM tf t JOIN dfreq d USING (term) CROSS JOIN stats s
        WHERE t.doc_id = 0
        ORDER BY t.tf * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) DESC,
                 t.term ASC
        LIMIT 10),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
              * (tf.tf * (1.2 + 1.0))
              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) ) AS score
  FROM tf JOIN mlt USING (term) JOIN dfreq d USING (term)
       JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY 1),
mltd AS (
  SELECT src, term FROM (
    SELECT t.doc_id AS src, t.term,
           row_number() OVER (PARTITION BY t.doc_id
             ORDER BY t.tf * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) DESC,
                      t.term ASC) AS rnk
    FROM tf t JOIN dfreq d USING (term) CROSS JOIN stats s
    WHERE t.doc_id IN (0, 1)
  ) WHERE rnk <= 10),
dscores AS (
  SELECT m.src, tf.doc_id,
         sum( ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
              * (tf.tf * (1.2 + 1.0))
              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) ) AS score
  FROM tf JOIN mltd m USING (term) JOIN dfreq d USING (term)
       JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY 1, 2),
dtop AS (
  SELECT src, doc_id, score,
         row_number() OVER (PARTITION BY src
                            ORDER BY score DESC, doc_id ASC) AS rnk
  FROM dscores WHERE doc_id != src)
SELECT 'stream' AS kind, CAST(-1 AS BIGINT) AS src, doc_id,
       round(score, 4) AS score
FROM (SELECT doc_id, score FROM scores WHERE doc_id != 0
      ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 10) st
UNION ALL
SELECT 'docs' AS kind, src, doc_id, round(score, 4) AS score
FROM dtop WHERE rnk <= 3
"""
    # positions via case-insensitive regexp over the ORIGINAL text (length
    # of the lazy prefix group + 1) — matching the engine's regexp_instr
    # semantics exactly; strpos(lower(text)) would drift where Unicode case
    # folding changes string length (the r5 engine fix)
    o["ft_highlight"] = f"""
WITH top AS ({_bm25_sql(tuple(Q_MAIN.split()), 10)}),
cand AS (
  SELECT t.doc_id, t.score, q.term, d.text,
         CASE WHEN regexp_matches(d.text, '(?is)' || q.term)
              THEN length(regexp_extract(d.text,
                          '(?is)^(.*?)' || q.term, 1)) + 1
              ELSE 0 END AS pos
  FROM top t JOIN documents d USING (doc_id),
       (VALUES ('join'), ('spark')) q(term)),
best AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY CASE WHEN pos > 0 THEN pos ELSE 2147483647 END,
                     term) AS rn
  FROM cand),
h0 AS (SELECT t.doc_id, t.score, d.text
       FROM top t JOIN documents d USING (doc_id)),
hc1 AS (
  SELECT h0.*, q.term,
         CASE WHEN regexp_matches(h0.text, '(?is)' || q.term)
              THEN length(regexp_extract(h0.text,
                          '(?is)^(.*?)' || q.term, 1)) + 1
              ELSE 2147483647 END AS pos
  FROM h0, (VALUES ('join'), ('spark')) q(term)),
hf1 AS (SELECT doc_id, score, text, term, pos FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY pos, term) AS rn FROM hc1) z WHERE rn = 1),
hc2 AS (
  SELECT f.doc_id, f.score, f.text, q.term,
         CASE WHEN regexp_matches(substr(f.text, f.pos + length(f.term)),
                                  '(?is)' || q.term)
              THEN length(regexp_extract(
                     substr(f.text, f.pos + length(f.term)),
                     '(?is)^(.*?)' || q.term, 1))
                   + f.pos + length(f.term)
              ELSE 2147483647 END AS pos
  FROM hf1 f, (VALUES ('join'), ('spark')) q(term)
  WHERE f.pos < 2147483647),
hf2 AS (SELECT doc_id, score, text, term, pos FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY pos, term) AS rn FROM hc2) z WHERE rn = 1),
hc3 AS (
  SELECT f.doc_id, f.score, f.text, q.term,
         CASE WHEN regexp_matches(substr(f.text, f.pos + length(f.term)),
                                  '(?is)' || q.term)
              THEN length(regexp_extract(
                     substr(f.text, f.pos + length(f.term)),
                     '(?is)^(.*?)' || q.term, 1))
                   + f.pos + length(f.term)
              ELSE 2147483647 END AS pos
  FROM hf2 f, (VALUES ('join'), ('spark')) q(term)
  WHERE f.pos < 2147483647),
hf3 AS (SELECT doc_id, score, text, term, pos FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY pos, term) AS rn FROM hc3) z WHERE rn = 1)
SELECT doc_id, score, 'text' AS field, 1 AS snippet_no,
  CASE WHEN pos > 0 THEN term ELSE '' END AS term,
  CASE WHEN pos > 0 THEN
    substr(text, greatest(pos - 30, 1), pos - greatest(pos - 30, 1))
    || '<em>' || substr(text, pos, length(term)) || '</em>'
    || substr(text, pos + length(term), 30)
  ELSE substr(text, 1, 60) END AS snippet
FROM best WHERE rn = 1
UNION ALL
SELECT doc_id, score, 'title' AS field, 1 AS snippet_no,
  CASE WHEN pos > 0 THEN term ELSE '' END AS term,
  CASE WHEN pos > 0 THEN
    substr(title, 1, pos - 1)
    || '<em>' || substr(title, pos, length(term)) || '</em>'
    || substr(title, pos + length(term), length(title))
  ELSE substr(title, 1, 750) END AS snippet
FROM (
  SELECT c.*, row_number() OVER (PARTITION BY doc_id
            ORDER BY CASE WHEN pos > 0 THEN pos ELSE 2147483647 END,
                     term) AS rn
  FROM (
    SELECT t.doc_id, t.score, q.term, d2.title,
           CASE WHEN regexp_matches(d2.title, '(?is)' || q.term)
                THEN length(regexp_extract(d2.title,
                            '(?is)^(.*?)' || q.term, 1)) + 1
                ELSE 0 END AS pos
    FROM top t
    JOIN (SELECT doc_id, {_TITLE_SQL} AS title FROM documents) d2
      USING (doc_id),
         (VALUES ('join'), ('spark')) q(term)) c) b
WHERE rn = 1
UNION ALL
SELECT doc_id, score, 'text3' AS field, 1 AS snippet_no,
  CASE WHEN pos < 2147483647 THEN term ELSE '' END AS term,
  CASE WHEN pos < 2147483647 THEN {_FRAG3_SQL} ELSE '' END AS snippet
FROM hf1
UNION ALL
SELECT doc_id, score, 'text3' AS field, 2 AS snippet_no, term,
  {_FRAG3_SQL} AS snippet
FROM hf2 WHERE pos < 2147483647
UNION ALL
SELECT doc_id, score, 'text3' AS field, 3 AS snippet_no, term,
  {_FRAG3_SQL} AS snippet
FROM hf3 WHERE pos < 2147483647
"""
    o["ft_facet_range"] = f"""
WITH {_toks_cte()},
matched AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ('spark', 'join')),
cnt AS (
  SELECT CAST(floor((length(d.text) - 0) / 500) AS BIGINT) AS i,
         count(*)::BIGINT AS n
  FROM documents d JOIN matched USING (doc_id)
  WHERE length(d.text) >= 0 AND length(d.text) < 4000
  GROUP BY 1),
spine AS (SELECT unnest(range(0, 8)) AS i)
SELECT (0 + spine.i * 500)::BIGINT AS range_start,
       coalesce(cnt.n, 0)::BIGINT AS n
FROM spine LEFT JOIN cnt USING (i)
ORDER BY range_start
"""
    # date range facet: docdate = 2020-01-01 + (doc_id*37 mod 1100) days;
    # quarterly buckets from 2020-03-01 (day-of-month 1 -> pure month
    # arithmetic), 8 buckets to the boundary end 2022-03-01, other=all
    o["ft_facet_range_date"] = f"""
WITH {_toks_cte()},
matched AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ('spark', 'join')),
dd AS (SELECT doc_id,
              (DATE '2020-01-01'
               + ((doc_id * 37) % 1100)::INT * INTERVAL 1 DAY)::DATE AS v
       FROM documents),
j AS (SELECT v FROM dd JOIN matched USING (doc_id)),
b AS (SELECT CASE WHEN v < DATE '2020-03-01' THEN -1
                  WHEN v >= DATE '2022-03-01' THEN 8
                  ELSE ((12 * year(v) + month(v)) - (12 * 2020 + 3)) // 3
             END AS _b
      FROM j),
cnt AS (SELECT _b, count(*)::BIGINT AS n FROM b GROUP BY 1),
spine AS (SELECT unnest(range(0, 8)) AS _b)
SELECT strftime(DATE '2020-03-01' + (spine._b * 3)::INT * INTERVAL 1 MONTH,
                '%Y-%m-%d') AS bucket,
       coalesce(cnt.n, 0)::BIGINT AS n
FROM spine LEFT JOIN cnt USING (_b)
UNION ALL
SELECT 'before' AS bucket,
       coalesce((SELECT n FROM cnt WHERE _b = -1), 0)::BIGINT AS n
UNION ALL
SELECT 'after' AS bucket,
       coalesce((SELECT n FROM cnt WHERE _b = 8), 0)::BIGINT AS n
UNION ALL
SELECT 'between' AS bucket,
       coalesce((SELECT sum(n) FROM cnt WHERE _b BETWEEN 0 AND 7),
                0)::BIGINT AS n
"""
    o["ix_match_only"] = f"""
WITH {_toks_cte()}
SELECT DISTINCT t.doc_id
FROM toks t JOIN documents d ON d.doc_id = t.doc_id
WHERE t.term IN ('spark', 'join') AND d.lang = 'es'
"""
    # n_outer from the outer field alone (Solr: pivot outer counts are
    # independent of the inner field); inner pairs LEFT-joined so an outer
    # bucket with no inner values survives as (outer, NULL, 0, n_outer)
    o["ft_facet_pivot"] = f"""
WITH {_toks_cte()},
matched AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ('spark', 'join')),
om AS (SELECT d.doc_id, d.lang AS value_outer
       FROM documents d JOIN matched USING (doc_id)
       WHERE d.lang IS NOT NULL),
nout AS (SELECT value_outer, count(*)::BIGINT AS n_outer FROM om GROUP BY 1),
counts AS (
  SELECT om.value_outer, d.source AS value_inner, count(*)::BIGINT AS n
  FROM om JOIN documents d USING (doc_id)
  WHERE d.source IS NOT NULL
  GROUP BY 1, 2)
SELECT nout.value_outer, counts.value_inner,
       coalesce(counts.n, 0)::BIGINT AS n, nout.n_outer
FROM nout LEFT JOIN counts USING (value_outer)
"""
    o["ft_stats"] = f"""
WITH {_toks_cte()},
matched AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ('spark', 'join'))
SELECT '*' AS facet,
       count(length(d.text))::BIGINT AS n,
       sum(CASE WHEN d.text IS NULL THEN 1 ELSE 0 END)::BIGINT AS missing,
       min(length(d.text))::BIGINT AS min,
       max(length(d.text))::BIGINT AS max,
       sum(length(d.text))::BIGINT AS sum,
       round(avg(length(d.text)), 4) AS mean,
       round(stddev_samp(length(d.text)), 4) AS stddev
FROM documents d JOIN matched USING (doc_id)
UNION ALL
SELECT d.lang AS facet,
       count(length(d.text))::BIGINT AS n,
       sum(CASE WHEN d.text IS NULL THEN 1 ELSE 0 END)::BIGINT AS missing,
       min(length(d.text))::BIGINT AS min,
       max(length(d.text))::BIGINT AS max,
       sum(length(d.text))::BIGINT AS sum,
       round(avg(length(d.text)), 4) AS mean,
       round(stddev_samp(length(d.text)), 4) AS stddev
FROM documents d JOIN matched USING (doc_id)
GROUP BY d.lang
"""
    o["ft_collate"] = f"""
WITH {_toks_cte()},
vocab AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
          FROM toks GROUP BY 1),
sugg AS (SELECT term,
                row_number() OVER (
                  ORDER BY levenshtein(term, 'sparc') ASC, df DESC,
                           term ASC) AS rk
         FROM vocab
         WHERE term != 'sparc' AND abs(length(term) - 5) <= 2
           AND levenshtein(term, 'sparc') <= 2),
best AS (SELECT term FROM sugg WHERE rk = 1),
matched AS (SELECT DISTINCT t.doc_id FROM toks t
            WHERE t.term = (SELECT term FROM best) OR t.term = 'join'),
multi AS (
  SELECT s.term || ' join' AS "collation",
         (SELECT count(DISTINCT t.doc_id) FROM toks t
          WHERE t.term = s.term OR t.term = 'join')::BIGINT AS hits
  FROM sugg s WHERE s.rk <= 2)
SELECT 'single' AS kind,
       (SELECT term FROM best) || ' join' AS "collation",
       (SELECT count(*) FROM matched)::BIGINT AS hits
UNION ALL
SELECT 'multi' AS kind, "collation", hits FROM (
  SELECT "collation", hits FROM multi WHERE hits > 0
  ORDER BY hits DESC, "collation" ASC LIMIT 2)
"""
    o["ft_term_vectors"] = f"""
WITH {_toks_cte()},
tf AS (SELECT term, count(*)::BIGINT AS tf FROM toks WHERE doc_id = 0
       GROUP BY 1),
dfreq AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks
          GROUP BY 1)
SELECT tf.term, tf.tf, dfreq.df
FROM tf JOIN dfreq USING (term)
"""
    o["ix_sorted_filtered_paged"] = f"""
WITH {_toks_cte()},
matched AS (SELECT DISTINCT t.doc_id FROM toks t
            JOIN documents d ON d.doc_id = t.doc_id
            WHERE t.term IN ('spark', 'join') AND d.lang = 'es')
SELECT d.doc_id, length(d.text)::BIGINT AS textlen
FROM documents d JOIN matched USING (doc_id)
ORDER BY length(d.text) DESC, d.doc_id ASC LIMIT 5 OFFSET 5
"""
    o["ft_sorted_query"] = f"""
WITH {_toks_cte()},
matched AS (SELECT DISTINCT doc_id FROM toks WHERE term IN ('spark', 'join'))
SELECT 'field' AS kind, doc_id, val FROM (
  SELECT d.doc_id, length(d.text)::DOUBLE AS val
  FROM documents d JOIN matched USING (doc_id)
  ORDER BY length(d.text) ASC, d.doc_id ASC LIMIT 10
) fl
UNION ALL
SELECT 'func' AS kind, doc_id, val FROM (
  -- recip(x,m,a,b) = a/(m*x+b): recip(textlen,1,1000,100) =
  -- 1000 / (textlen + 100); unambiguous aliases (sdoc/sval) so ORDER BY
  -- binds the computed value, not a joined column
  SELECT d.doc_id AS sdoc,
         round(1000.0 / (1.0 * length(d.text) + 100.0), 6) AS sval
  FROM documents d JOIN matched USING (doc_id)
  ORDER BY 1000.0 / (1.0 * length(d.text) + 100.0) DESC, d.doc_id ASC
  LIMIT 10
) fn(doc_id, val)
UNION ALL
SELECT 'cursor' AS kind, doc_id, val FROM (
  SELECT d.doc_id, length(d.text)::DOUBLE AS val
  FROM documents d JOIN matched USING (doc_id)
  ORDER BY length(d.text) ASC, d.doc_id ASC LIMIT 10 OFFSET 10
) cr
"""
    # offset paging and cursor paging both equal OFFSET on the full ranking
    o["ft_deep_paging"] = f"""
SELECT 'offset' AS mode, doc_id, score FROM (
  SELECT doc_id, score FROM ({_bm25_sql(tuple(Q_MAIN.split()), None)}) a
  ORDER BY score DESC, doc_id ASC LIMIT 10 OFFSET 10
) x
UNION ALL
SELECT 'cursor' AS mode, doc_id, score FROM (
  SELECT doc_id, score FROM ({_bm25_sql(tuple(Q_MULTI.split()), None)}) b
  ORDER BY score DESC, doc_id ASC LIMIT 10 OFFSET 10
) y
"""
    # QueryElevationComponent: pinned [3, 5] in config order with their
    # real BM25 scores (0 when the doc has no match), doc 1 excluded,
    # ranked tail of 8
    o["ft_elevate"] = f"""
WITH scores AS ({_bm25_sql(tuple(Q_MAIN.split()), None)}),
elev(doc_id, ord) AS (VALUES (3, 0), (5, 1))
SELECT e.doc_id, coalesce(s.score, 0.0) AS score, TRUE AS elevated
FROM elev e LEFT JOIN scores s USING (doc_id)
UNION ALL
SELECT doc_id, score, FALSE AS elevated FROM (
  SELECT doc_id, score FROM scores
  WHERE doc_id NOT IN (1, 3, 5)
  ORDER BY score DESC, doc_id ASC LIMIT 8
) t
"""
    # DebugComponent: per-term BM25 pieces of the top-ranked doc
    o["ft_explain"] = f"""
WITH {_toks_cte()},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                 (SELECT sum(dl) FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
q(term) AS (VALUES ('spark'), ('join')),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf
          WHERE term IN (SELECT term FROM q) GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
              * (tf.tf * (1.2 + 1.0))
              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) ) AS score
  FROM tf JOIN dfreq d USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY 1),
top1 AS (SELECT doc_id FROM scores
         ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 1)
SELECT t.term, d.df, t.tf, dl.dl,
       round(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)), 6) AS idf,
       round((t.tf * (1.2 + 1.0))
             / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)), 6)
         AS tf_norm,
       round(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
             * (t.tf * (1.2 + 1.0))
             / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)), 6)
         AS contribution
FROM tf t JOIN top1 USING (doc_id) JOIN dfreq d USING (term)
     JOIN dl USING (doc_id) CROSS JOIN stats s
"""
    # RealTimeGetHandler: stored fields by unique key
    o["ft_rt_get"] = """
SELECT doc_id, lang, source, length(text)::BIGINT AS textlen,
       sha256(text) AS sha256
FROM documents WHERE doc_id IN (1, 2, 3, 5, 8)
"""
    o["ft_terms"] = f"""
WITH {_toks_cte()},
vocab AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
          FROM toks GROUP BY 1)
SELECT 'terms' AS kind, term, df FROM (
  SELECT term, df FROM vocab
  WHERE term LIKE 's%'
  ORDER BY df DESC, term ASC LIMIT 10)
UNION ALL
SELECT 'luke' AS kind, term, df FROM (
  SELECT lang AS term, count(*)::BIGINT AS df FROM documents
  GROUP BY 1 ORDER BY df DESC, term ASC LIMIT 10)
UNION ALL
SELECT 'regex' AS kind, term, df FROM (
  SELECT term, df FROM vocab
  WHERE regexp_matches(term, '^(?:s.*t)$')
  ORDER BY df DESC, term ASC LIMIT 10)
UNION ALL
SELECT 'range' AS kind, term, df FROM (
  SELECT term, df FROM vocab
  WHERE term >= 'so' AND term < 'sz'
  ORDER BY df DESC, term ASC LIMIT 10)
"""
    o["ft_synonym"] = _bm25_sql(("join", "merge"), 10)
    # both conjunctive paths (naive scan / index-side postings intersection)
    # produce the same match set
    _and_sql = f"""
WITH {_toks_cte()}
SELECT doc_id FROM toks WHERE term IN ('spark', 'join')
GROUP BY doc_id HAVING count(DISTINCT term) = 2
"""
    o["and_query_paths"] = f"""
SELECT 'naive' AS path, doc_id FROM ({_and_sql}) a
UNION ALL
SELECT 'index' AS path, doc_id FROM ({_and_sql}) b
"""
    # query-string parser path: 'lang:es spark join' == filter + ranked
    # query; '-merge' (MUST_NOT) == ranked query minus docs containing the
    # excluded term, scores unchanged (exclusion never alters BM25 stats)
    o["ix_query_string"] = f"""
WITH scores AS ({_bm25_sql(tuple(Q_MAIN.split()), None)}),
mtoks AS (WITH {_toks_cte()}
          SELECT DISTINCT doc_id FROM toks WHERE term = 'merge')
SELECT 'filter' AS kind, s.doc_id, s.score
FROM (SELECT * FROM scores s JOIN documents d USING (doc_id)
      WHERE d.lang = 'es'
      ORDER BY s.score DESC, s.doc_id ASC LIMIT 10) s
UNION ALL
SELECT 'neg' AS kind, doc_id, score
FROM (SELECT s.doc_id, s.score FROM scores s
      WHERE s.doc_id NOT IN (SELECT doc_id FROM mtoks)
      ORDER BY s.score DESC, s.doc_id ASC LIMIT 10) n
UNION ALL
SELECT 'boost' AS kind, doc_id, score
FROM ({_bm25_sql(tuple(Q_MAIN.split()), 10, weights={"join": 2.0})}) b
UNION ALL
SELECT 'wild' AS kind, doc_id, score
FROM ({_const_clause_sql("term LIKE 's%'")}) wl
UNION ALL
SELECT 'fuzzy' AS kind, doc_id, score
FROM ({_const_clause_sql("levenshtein(term, 'xerge') <= 1")}) fz
UNION ALL
SELECT 'range' AS kind, doc_id, score
FROM (SELECT s.doc_id, s.score
      FROM scores s JOIN documents d USING (doc_id)
      WHERE d.lang >= 'de' AND d.lang <= 'es'
      ORDER BY s.score DESC, s.doc_id ASC LIMIT 10) rg
UNION ALL
SELECT 'dfq' AS kind, doc_id, score
FROM (SELECT s.doc_id, s.score
      FROM scores s JOIN documents d USING (doc_id)
      WHERE length(d.text) >= 300
      ORDER BY s.score DESC, s.doc_id ASC LIMIT 10) df
UNION ALL
SELECT 'bool' AS kind, doc_id, score FROM (
  WITH {_toks_cte()},
  tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
         WHERE term IN ('spark','join','merge','sort') GROUP BY 1, 2),
  dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
  st AS (SELECT (SELECT count(*) FROM documents) AS n,
                (SELECT sum(dl) FROM dl)
                  / (SELECT count(*) FROM documents) AS avgdl),
  dfr AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
  contrib AS (SELECT tf.doc_id, tf.term,
                     ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
                     * (tf.tf * (1.2 + 1.0))
                     / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl))
                       AS c
              FROM tf JOIN dfr d ON d.term = tf.term
              JOIN dl USING (doc_id) CROSS JOIN st s),
  piv AS (SELECT doc_id,
                 sum(CASE WHEN term = 'spark' THEN c END) AS c_spark,
                 sum(CASE WHEN term = 'join'  THEN c END) AS c_join,
                 sum(CASE WHEN term = 'merge' THEN c END) AS c_merge,
                 sum(CASE WHEN term = 'sort'  THEN c END) AS c_sort
          FROM contrib GROUP BY 1),
  -- Lucene branch sum: each satisfied AND branch contributes; an
  -- unsatisfied branch's matched term contributes NOTHING
  sat AS (SELECT doc_id,
                 coalesce(CASE WHEN c_spark IS NOT NULL
                                AND c_join IS NOT NULL
                               THEN c_spark + c_join END, 0)
               + coalesce(CASE WHEN c_merge IS NOT NULL
                                AND c_sort IS NOT NULL
                               THEN c_merge + c_sort END, 0) AS bscore
          FROM piv
          WHERE (c_spark IS NOT NULL AND c_join IS NOT NULL)
             OR (c_merge IS NOT NULL AND c_sort IS NOT NULL))
  SELECT doc_id, round(bscore, 4) AS score
  FROM sat ORDER BY round(bscore, 4) DESC, doc_id ASC LIMIT 10
) bq
UNION ALL
-- r5h: bf additive boost function (score = raw_bm25 + textlen/100, rounded
-- ONCE at the end — the engine's rounding point); unambiguous aliases
SELECT 'bf' AS kind, doc_id, score FROM (
  SELECT s.doc_id AS fdoc,
         round(s.score + length(d.text) / 100.0, 4) AS fscore
  FROM ({_bm25_sql(tuple(Q_MAIN.split()), None, rounded=False)}) s
  JOIN documents d USING (doc_id)
  ORDER BY s.score + length(d.text) / 100.0 DESC, s.doc_id ASC LIMIT 10
) bfq(doc_id, score)
UNION ALL
-- r5h: bq boost query (constant +2.5 for lang=es docs in the match set)
SELECT 'bq' AS kind, doc_id, score FROM (
  SELECT s.doc_id AS qdoc,
         round(s.score
               + CASE WHEN d.lang = 'es' THEN 2.5 ELSE 0.0 END, 4) AS qscore
  FROM ({_bm25_sql(tuple(Q_MAIN.split()), None, rounded=False)}) s
  JOIN documents d USING (doc_id)
  ORDER BY s.score + CASE WHEN d.lang = 'es' THEN 2.5 ELSE 0.0 END DESC,
           s.doc_id ASC LIMIT 10
) bqb(doc_id, score)
UNION ALL
-- r5h: {{!join from=source to=source}}"merge sort" fq — survivors keep
-- their global BM25 scores
SELECT 'join' AS kind, doc_id, score FROM (
  WITH jptoks AS (
    SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS p
    FROM (SELECT doc_id, regexp_extract_all(lower(text), '{SIMPLE}') AS l
          FROM documents)),
  jinner AS (SELECT DISTINCT a.doc_id
             FROM jptoks a JOIN jptoks b
               ON b.doc_id = a.doc_id AND b.p = a.p + 1
             WHERE a.term = 'merge' AND b.term = 'sort'),
  jallow AS (SELECT doc_id FROM documents WHERE source IN
             (SELECT DISTINCT d2.source FROM documents d2
              JOIN jinner USING (doc_id)))
  SELECT s.doc_id AS jdoc, s.score AS jscore
  FROM scores s JOIN jallow USING (doc_id)
  ORDER BY s.score DESC, s.doc_id ASC LIMIT 10
) jn(doc_id, score)
"""
    # exact phrase 'merge sort': positional adjacency + Lucene PhraseWeight
    # (Σidf over phrase slots × tf_norm(phrase_freq, dl)); positions are
    # token ordinals on this corpus (every word single-part), so a
    # self-join on p+1 is the exact phrase semantics
    o["ft_phrase"] = f"""
WITH ptoks AS (
  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS p
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{SIMPLE}') AS l
        FROM documents)
),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM ptoks GROUP BY 1),
stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                 (SELECT sum(dl) FROM dl)
                   / (SELECT count(*) FROM documents) AS avgdl),
dfs AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM ptoks
        WHERE term IN ('merge', 'sort') GROUP BY 1),
idf AS (SELECT sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))) AS idf_sum
        FROM dfs d CROSS JOIN stats s),
occ AS (SELECT a.doc_id, count(*)::BIGINT AS pf
        FROM ptoks a JOIN ptoks b ON b.doc_id = a.doc_id AND b.p = a.p + 1
        WHERE a.term = 'merge' AND b.term = 'sort'
        GROUP BY 1),
occ2 AS (SELECT doc_id, count(*)::BIGINT AS pf FROM (
           SELECT a.doc_id, a.p, min(b.p) AS q
           FROM ptoks a JOIN ptoks b
             ON b.doc_id = a.doc_id AND b.term = 'sort' AND b.p > a.p
           WHERE a.term = 'merge'
           GROUP BY a.doc_id, a.p
           HAVING min(b.p) - a.p <= 3) z
         GROUP BY doc_id)
SELECT 'exact' AS kind, o.doc_id,
       round(i.idf_sum * (o.pf * (1.2 + 1.0))
             / (o.pf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)), 4)
         AS score
FROM occ o JOIN dl USING (doc_id) CROSS JOIN idf i CROSS JOIN stats s
UNION ALL
SELECT 'slop2' AS kind, o.doc_id,
       round(i.idf_sum * (o.pf * (1.2 + 1.0))
             / (o.pf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)), 4)
         AS score
FROM occ2 o JOIN dl USING (doc_id) CROSS JOIN idf i CROSS JOIN stats s
"""
    # grouping: docs rank (score desc, doc_id) within lang; groups rank by
    # their head doc; top-5 groups × top-2 docs, with per-group numFound
    o["ft_grouped"] = f"""
WITH scores AS ({_bm25_sql(tuple(Q_MAIN.split()), None)}),
j AS (SELECT s.doc_id, s.score, d.lang
      FROM scores s JOIN documents d USING (doc_id)),
r AS (SELECT lang, doc_id, score,
             row_number() OVER (PARTITION BY lang
                                ORDER BY score DESC, doc_id ASC) AS group_rank,
             count(*) OVER (PARTITION BY lang) AS group_hits
      FROM j),
heads AS (SELECT lang, score AS hs, doc_id AS hd FROM r WHERE group_rank = 1),
g AS (SELECT lang, dense_rank() OVER (ORDER BY hs DESC, hd ASC) AS grk
      FROM heads),
{_toks_cte()},
gmember AS (
  SELECT 'es' AS gname, doc_id FROM documents WHERE lang = 'es'
  UNION ALL
  SELECT 'mergeful' AS gname, doc_id FROM
    (SELECT DISTINCT doc_id FROM toks WHERE term = 'merge')),
gr AS (SELECT m.gname, s.doc_id, s.score,
              row_number() OVER (PARTITION BY m.gname
                                 ORDER BY s.score DESC, s.doc_id ASC)
                AS group_rank,
              count(*) OVER (PARTITION BY m.gname) AS group_hits
       FROM scores s JOIN gmember m USING (doc_id))
SELECT 'field' AS kind, r.lang AS "group",
       r.group_hits::BIGINT AS group_hits,
       r.group_rank::BIGINT AS group_rank, r.doc_id, r.score
FROM r JOIN g USING (lang)
WHERE g.grk <= 5 AND r.group_rank <= 2
UNION ALL
SELECT 'gq' AS kind, gname AS "group",
       group_hits::BIGINT AS group_hits,
       group_rank::BIGINT AS group_rank, doc_id, score
FROM gr WHERE group_rank <= 3
UNION ALL
SELECT 'ngroups' AS kind, '*' AS "group",
       (SELECT count(DISTINCT lang) FROM j)::BIGINT AS group_hits,
       CAST(0 AS BIGINT) AS group_rank, CAST(-1 AS BIGINT) AS doc_id,
       0.0 AS score
"""
    # minimum-should-match: >= 3 of the 4 OR terms (eDisMax mm)
    mm_terms = ", ".join(f"'{t}'" for t in Q_MULTI.split())
    o["ft_min_match"] = f"""
WITH {_toks_cte()},
scores AS ({_bm25_sql(tuple(Q_MULTI.split()), None)}),
mc AS (SELECT doc_id, count(DISTINCT term) AS nm FROM toks
       WHERE term IN ({mm_terms}) GROUP BY 1)
SELECT s.doc_id, s.score
FROM scores s JOIN mc USING (doc_id)
WHERE mc.nm >= 3
"""
    terms_in = ", ".join(f"'{t}'" for t in DF_TERMS)
    o["ft_corpus_stats"] = f"""
WITH {_toks_cte()}
SELECT 'df:' || term AS stat, count(DISTINCT doc_id)::DOUBLE AS value
FROM toks WHERE term IN ({terms_in}) GROUP BY term
UNION ALL
SELECT 'n' AS stat, count(*)::DOUBLE AS value FROM documents
UNION ALL
SELECT 'avgdl' AS stat,
       round(avg(len(regexp_extract_all(lower(text), '{SIMPLE}'))), 4) AS value
FROM documents
"""
    o["ft_postings_long"] = f"""
WITH {_toks_cte()}
SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
WHERE term IN ('spark', 'join', 'scan') GROUP BY doc_id, term
"""
    o["ft_stored_roundtrip"] = f"""
WITH top AS ({_bm25_sql(tuple(Q_MAIN.split()), 5)})
SELECT top.doc_id, top.score, d.lang, d.source, sha256(d.text) AS sha
FROM top JOIN documents d USING (doc_id)
"""

    o["dd_exact"] = """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 50
)
SELECT sha256(text) AS content_sha, count(*)::BIGINT AS n_dups,
       min(doc_id) AS keep_doc_id
FROM all_docs GROUP BY 1 HAVING count(*) > 1
"""
    _sh = f"""
docs_l AS (SELECT doc_id, regexp_extract_all(lower(text), '{SIMPLE}') AS l
           FROM documents),
sh AS (SELECT DISTINCT doc_id,
              unnest([array_to_string(l[i:i+2], ' ') for i in range(1, len(l)-1)]) AS shingle
       FROM docs_l WHERE len(l) >= 3)
"""
    o["dd_ngram_jaccard"] = f"""
WITH {_sh},
sizes AS (SELECT doc_id, count(*)::BIGINT AS ns FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT c.doc_a, c.doc_b, c.common, sa.ns AS na, sb.ns AS nb,
       round(c.common / (sa.ns + sb.ns - c.common), 4) AS jaccard
FROM common c JOIN sizes sa ON sa.doc_id = c.doc_a
              JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE round(c.common / (sa.ns + sb.ns - c.common), 4) >= 0.1
"""
    _mh = f"""
{_sh},
vocab AS (SELECT shingle, dense_rank() OVER (ORDER BY shingle) AS sid
          FROM (SELECT DISTINCT shingle FROM sh)),
ids AS (SELECT doc_id, sid FROM sh JOIN vocab USING (shingle)),
hv AS (SELECT doc_id, j.h, ((2 * j.h + 1) * sid + 13 * j.h + 7) % 2147483647 AS hv
       FROM ids, (SELECT unnest(range(0, 16)) AS h) j),
mh AS (SELECT doc_id, h, min(hv)::BIGINT AS minhash FROM hv GROUP BY 1, 2)
"""
    o["dd_minhash_sigs"] = f"WITH {_mh} SELECT doc_id, h::BIGINT AS h, minhash FROM mh"
    _sh_dup = _sh.replace("FROM documents", "FROM all_docs")
    o["dd_minhash_lsh"] = f"""
WITH RECURSIVE all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 50
),
{_sh_dup},
vocab AS (SELECT shingle, dense_rank() OVER (ORDER BY shingle) AS sid
          FROM (SELECT DISTINCT shingle FROM sh)),
ids AS (SELECT doc_id, sid FROM sh JOIN vocab USING (shingle)),
hv AS (SELECT doc_id, j.h, ((2 * j.h + 1) * sid + 13 * j.h + 7) % 2147483647 AS hv
       FROM ids, (SELECT unnest(range(0, 16)) AS h) j),
mh AS (SELECT doc_id, h, min(hv)::BIGINT AS minhash FROM hv GROUP BY 1, 2),
bands AS (SELECT doc_id, CAST(floor(h / 4) AS INT) AS band,
                 string_agg(h || '=' || minhash, ':' ORDER BY h) AS bucket_key
          FROM mh GROUP BY 1, 2),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.bucket_key = b.bucket_key
          AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*)::BIGINT AS ns FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT c.doc_a, c.doc_b,
         round(cm.common / (sa.ns + sb.ns - cm.common), 4) AS jaccard
  FROM cand c JOIN common cm ON cm.doc_a = c.doc_a AND cm.doc_b = c.doc_b
              JOIN sizes sa ON sa.doc_id = c.doc_a
              JOIN sizes sb ON sb.doc_id = c.doc_b
  WHERE round(cm.common / (sa.ns + sb.ns - cm.common), 4) >= 0.5),
sym AS (SELECT doc_a AS u, doc_b AS w FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
reach AS (
  SELECT u, u AS w FROM (SELECT DISTINCT u FROM sym)
  UNION
  SELECT r.u, e.w FROM reach r JOIN sym e ON r.w = e.u),
comp AS (SELECT u AS doc_id, MIN(w) AS component FROM reach GROUP BY u),
csize AS (SELECT component, COUNT(*)::DOUBLE AS sz FROM comp GROUP BY 1)
SELECT 'pair' AS kind, doc_a AS a, doc_b AS b, jaccard AS v FROM pairs
UNION ALL
SELECT 'comp' AS kind, c.doc_id AS a, c.component AS b, s.sz AS v
FROM comp c JOIN csize s USING (component)
"""
    o["dd_simhash"] = f"""
WITH dtoks AS (SELECT DISTINCT doc_id,
                unnest(regexp_extract_all(lower(text), '{SIMPLE}')) AS term
               FROM documents),
vocab AS (SELECT term, dense_rank() OVER (ORDER BY term) AS term_id
          FROM (SELECT DISTINCT term FROM dtoks)),
contrib AS (SELECT t.doc_id, j.bit,
                   ((v.term_id * (2 * j.bit + 17)) % 97 - 48) AS w
            FROM dtoks t JOIN vocab v USING (term),
                 (SELECT unnest(range(0, 16)) AS bit) j),
bits AS (SELECT doc_id, bit, sum(w) AS s FROM contrib GROUP BY 1, 2),
sh AS (SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN CAST(power(2, bit) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS simhash
       FROM bits GROUP BY doc_id)
SELECT 'sig' AS kind, doc_id AS a, CAST(-1 AS BIGINT) AS b, simhash AS v
FROM sh
UNION ALL
SELECT 'pair' AS kind, a.doc_id AS a, b.doc_id AS b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS v
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
"""

    _cos = (
        "list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )
    o["sim_cosine_topk"] = f"""
WITH e AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
SELECT e.vec_id,
       round({_cos.format(a="e.v", b="q.qv")}, 4) AS cos_sim
FROM e, q
ORDER BY round({_cos.format(a="e.v", b="q.qv")}, 4) DESC, e.vec_id ASC LIMIT 10
"""
    o["sim_near_pairs"] = f"""
WITH e AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({_cos.format(a="a.v", b="b.v")}, 4) AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round({_cos.format(a="a.v", b="b.v")}, 4) >= 0.3
"""
    _buckets_cte = """
dims AS (SELECT vec_id, unnest(embedding) AS x,
                unnest(range(0, len(embedding))) AS d
         FROM embeddings),
proj AS (SELECT vec_id, p.plane,
                sum(CAST(x AS DOUBLE)
                    * ((((p.plane * 131 + d * 31 + 7) % 97) - 48))) AS s
         FROM dims, (SELECT unnest(range(0, 8)) AS plane) p
         GROUP BY 1, 2),
buckets AS (SELECT vec_id,
                   CAST(sum(CASE WHEN s > 0
                            THEN CAST(power(2, plane) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS bucket
            FROM proj GROUP BY 1)
"""
    o["sim_lsh_buckets"] = f"""
WITH {_buckets_cte}
SELECT bucket, count(*)::BIGINT AS n FROM buckets GROUP BY 1
"""
    o["sim_near_pairs_lsh"] = f"""
WITH {_buckets_cte},
e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
pairs AS (
  SELECT a.vec_id AS id_a, b2.vec_id AS id_b, ea.v AS va, eb.v AS vb
  FROM buckets a JOIN buckets b2
    ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b2.vec_id)
SELECT id_a, id_b,
       round({_cos.format(a="va", b="vb")}, 4) AS cos_sim
FROM pairs
WHERE round({_cos.format(a="va", b="vb")}, 4) >= 0.3
"""
    qv_sql = "[" + ", ".join(f"CAST({x} AS DOUBLE)" for x in ANN_QV) + "]"
    # 2 hyperplane tables (table t = planes t*8..t*8+7), hamming-2 multiprobe
    # per table; a vector probed in both tables is attributed to its lowest
    # (tbl, bucket) — exactly ann_lsh_topk_indexed's dedup rule
    in0 = ", ".join(
        str(b)
        for b in similarity.query_buckets(ANN_QV, 8, probes=3, plane_offset=0)
    )
    in1 = ", ".join(
        str(b)
        for b in similarity.query_buckets(ANN_QV, 8, probes=3, plane_offset=8)
    )
    o["sim_ann_topk"] = f"""
WITH dims AS (SELECT vec_id, unnest(embedding) AS x,
                     unnest(range(0, len(embedding))) AS d
              FROM embeddings),
proj2 AS (SELECT vec_id, p.plane,
                 sum(CAST(x AS DOUBLE)
                     * ((((p.plane * 131 + d * 31 + 7) % 97) - 48))) AS s
          FROM dims, (SELECT unnest(range(0, 16)) AS plane) p
          GROUP BY 1, 2),
tbuckets AS (SELECT vec_id, CAST(plane // 8 AS INT) AS tbl,
                    CAST(sum(CASE WHEN s > 0
                             THEN CAST(power(2, plane % 8) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS bucket
             FROM proj2 GROUP BY 1, 2),
probed AS (SELECT vec_id, tbl, bucket,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY tbl, bucket) AS rn
           FROM tbuckets
           WHERE (tbl = 0 AND bucket IN ({in0}))
              OR (tbl = 1 AND bucket IN ({in1}))),
e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
q AS (SELECT {qv_sql} AS qv),
cand AS (SELECT p.vec_id, p.bucket, e.v, q.qv
         FROM probed p JOIN e USING (vec_id) CROSS JOIN q
         WHERE p.rn = 1)
SELECT vec_id, bucket,
       round({_cos.format(a="v", b="qv")}, 4) AS cos_sim
FROM cand
ORDER BY round({_cos.format(a="v", b="qv")}, 4) DESC, vec_id ASC LIMIT 10
"""

    o["ts_tokens_fp"] = f"""
WITH tc AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '{SIMPLE}'))::BIGINT AS n_tokens
  FROM documents),
base AS (SELECT doc_id,
                regexp_extract_all(lower(text), '{SIMPLE}') AS l
         FROM documents),
ptoks AS (SELECT doc_id, unnest(l) AS term,
                 unnest(range(1, len(l) + 1)) AS pos
          FROM base),
vocab AS (SELECT term, dense_rank() OVER (ORDER BY term) AS term_id
          FROM (SELECT DISTINCT term FROM ptoks)),
fp AS (SELECT doc_id,
              CAST(sum(term_id * ((pos % 31) + 1)) % 1000003 AS BIGINT)
                AS fingerprint
       FROM ptoks JOIN vocab USING (term) GROUP BY doc_id)
SELECT tc.doc_id, tc.n_tokens, fp.fingerprint
FROM tc LEFT JOIN fp USING (doc_id)
"""
    stop_list = ", ".join(f"'{w}'" for w in textstats.EN_STOPWORDS)
    o["ts_quality_lang"] = f"""
WITH base AS (
  SELECT doc_id,
         coalesce(text, '') AS t,
         regexp_extract_all(lower(coalesce(text, '')), '{SIMPLE}') AS toks
  FROM documents),
feat AS (
  SELECT doc_id,
         length(t)::BIGINT AS n_chars,
         len(toks)::BIGINT AS n_tokens,
         length(regexp_replace(t, '[^a-zA-Z0-9 ]', '', 'g')) AS alnum_chars,
         len(list_filter(toks, x -> x IN ({stop_list}))) AS n_stop,
         list_sum(list_transform(toks, x -> length(x))) AS tok_chars
  FROM base),
quality AS (
  SELECT doc_id, n_chars, n_tokens,
       round(CASE WHEN n_tokens > 0 THEN tok_chars / n_tokens ELSE 0.0 END, 4)
         AS avg_token_len,
       round(CASE WHEN n_chars > 0 THEN alnum_chars / n_chars ELSE 0.0 END, 4)
         AS alnum_ratio,
       round(CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0.0 END, 4)
         AS stopword_ratio,
       round((CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0.0 END) * 0.5
             + (CASE WHEN n_chars > 0 THEN alnum_chars / n_chars ELSE 0.0 END) * 0.3
             + least(n_tokens, 100) / 100.0 * 0.2, 4) AS quality_score
  FROM feat),
lang_counts AS (
  SELECT doc_id,
         len(list_filter(toks, x -> x IN ({{EN}})))::BIGINT AS n_en,
         len(list_filter(toks, x -> x IN ({{ES}})))::BIGINT AS n_es,
         len(list_filter(toks, x -> x IN ({{FR}})))::BIGINT AS n_fr
  FROM base),
langid AS (
  SELECT doc_id,
       CASE WHEN greatest(n_en, n_es, n_fr) = 0 THEN 'und'
            WHEN n_en = greatest(n_en, n_es, n_fr) THEN 'en'
            WHEN n_es = greatest(n_en, n_es, n_fr) THEN 'es'
            ELSE 'fr' END AS pred_lang,
       n_en, n_es, n_fr
  FROM lang_counts)
SELECT q.*, l.pred_lang, l.n_en, l.n_es, l.n_fr
FROM quality q JOIN langid l USING (doc_id)
"""
    marker_sql = {
        lang: ", ".join(f"'{w}'" for w in words)
        for lang, words in textstats.LANG_MARKERS.items()
    }
    o["ts_quality_lang"] = (
        o["ts_quality_lang"]
        .replace("{EN}", marker_sql["en"])
        .replace("{ES}", marker_sql["es"])
        .replace("{FR}", marker_sql["fr"])
    )
    # the deterministic fake features ARE SQL-expressible: byte lengths and a
    # byte-sum checksum over the UTF-8 payload (hex-pair extraction)
    o["mm_pipeline"] = """
WITH b AS (SELECT doc_id, encode(text) AS p FROM documents),
f AS (SELECT doc_id,
             octet_length(p)::BIGINT AS byte_len,
             coalesce(list_sum(list_transform(
                 range(1, octet_length(p) + 1),
                 i -> ('0x' || substr(hex(p), (i - 1) * 2 + 1, 2))::INT
             )), 0)::BIGINT AS checksum
      FROM b)
SELECT doc_id, 'application/octet-stream' AS media_type, byte_len,
       (byte_len % 640)::BIGINT AS width,
       (byte_len % 480)::BIGINT AS height,
       (byte_len // 1024 + 1)::BIGINT AS n_frames,
       checksum
FROM f
"""

    o["ft_batch_search"] = f"""
SELECT 'q0' AS query_id, doc_id, score FROM ({_bm25_sql(tuple(Q_MAIN.split()), 10)}) a
UNION ALL
SELECT 'q1' AS query_id, doc_id, score FROM ({_bm25_sql(tuple(Q_MULTI.split()), 10)}) b
UNION ALL
SELECT 'q2' AS query_id, doc_id, score FROM (
  WITH scores AS ({_bm25_sql(tuple(Q_MAIN.split()), None)})
  SELECT s.doc_id, s.score
  FROM scores s JOIN documents d USING (doc_id)
  WHERE d.lang = 'es'
  ORDER BY s.score DESC, s.doc_id ASC LIMIT 10
) c
"""
    o["ft_topk_per_lang"] = f"""
WITH scores AS ({_bm25_sql(tuple(Q_MAIN.split()), None)}),
ranked AS (
  SELECT d.lang, s.doc_id, s.score,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY s.score DESC, s.doc_id ASC) AS rn
  FROM scores s JOIN documents d USING (doc_id))
SELECT lang, doc_id, score, rn::BIGINT AS rn FROM ranked WHERE rn <= 3
"""
    o["ev_sessionize"] = """
WITH e AS (SELECT user_id, event_id, ts,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
f AS (SELECT user_id, event_id, ts,
             CASE WHEN prev IS NULL
                       OR floor(epoch(ts)) - floor(epoch(prev)) > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM e),
s AS (SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM f)
SELECT user_id, session_id::BIGINT AS session_id, count(*)::BIGINT AS n_events,
       min(floor(epoch(ts)))::BIGINT AS start_s,
       max(floor(epoch(ts)))::BIGINT AS end_s
FROM s GROUP BY user_id, session_id
"""
    o["ev_windowed_counts"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS window_start,
       event_type, count(*)::BIGINT AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""
    # ix_lineage: non-SQL-expressible (compressed index internals) ->
    # rows-only check.
    return o
