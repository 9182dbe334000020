"""Physical-plan guards: the properties that make the engine scale must stay
visible in the plan (SURVEY.md §4).  These tests fail if a refactor silently
drops predicate pushdown, broadcast hints, or partition layout."""

import pytest
from pyspark.sql import functions as F

from cascading_solr_spark.corpus import synth_corpus
from cascading_solr_spark.indexing.build import build_index
from cascading_solr_spark.spec import IndexSpec


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("planix") / "ix")
    corpus = synth_corpus(spark, 100, partitions=4)
    return build_index(spark, corpus, IndexSpec(num_shards=2), out)


def test_term_filter_pushed_to_parquet(spark, index):
    plan = (
        index.postings(spark)
        .filter(F.col("term").isin(["parse", "buffer"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [In(term" in plan


def test_postings_files_term_sorted(spark, index):
    # segment-merge write keeps each shard file term-sorted -> row-group
    # min/max stats prune term lookups
    import pandas as pd

    pdf = index.postings(spark).filter(F.col("shard") == 0).toPandas()
    terms = pdf["term"].tolist()
    assert terms == sorted(terms)


def test_topk_join_is_broadcast(spark, index):
    from cascading_solr_spark.query.search import search

    plan = (
        search(spark, index, "parse buffer", k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_docid_join_avoids_content_sort(spark):
    from cascading_solr_spark.indexing.build import assign_doc_ids

    corpus = synth_corpus(spark, 50, partitions=2)
    plan = (
        assign_doc_ids(corpus, ("repo", "path", "commit"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ShuffledHashJoin" in plan  # not SortMergeJoin over content rows
