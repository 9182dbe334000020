"""Replication snapshots — the solr.ReplicationHandler ``command=backup``
analogue (solrconfig.xml:1135): a snapshot copies exactly the LIVE
generation, writes meta.json last (crash → never loadable), skips stale
generations, and restores as a plain ``Index.load``."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from cascading_solr_spark.corpus import synth_corpus
from cascading_solr_spark.indexing.append import append_documents
from cascading_solr_spark.indexing.build import Index, build_index
from cascading_solr_spark.indexing.compact import compact_index
from cascading_solr_spark.indexing.replicate import restore_index, snapshot_index
from cascading_solr_spark.query.search import search
from cascading_solr_spark.spec import IndexSpec

R_SPEC = IndexSpec(
    num_shards=2,
    keyword_fields=("lang",),
    stored_fields=("repo", "path", "lang"),
)


def _results(spark, ix, q="index buffer"):
    return sorted(
        (r["doc_id"], round(r["score"], 9))
        for r in search(spark, ix, q, k=None, with_stored=False).collect()
    )


@pytest.fixture(scope="module")
def rix(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("repl") / "ix")
    return build_index(spark, synth_corpus(spark, 150, partitions=4), R_SPEC, out)


def test_snapshot_restore_identical_results(spark, rix, tmp_path):
    snap = snapshot_index(rix.path, str(tmp_path / "snap"))
    restored = restore_index(snap)
    assert restored.n_docs == rix.n_docs
    assert _results(spark, restored) == _results(spark, rix)
    # a snapshot IS an index directory: meta + live dirs present
    assert os.path.exists(os.path.join(snap, "meta.json"))


def test_snapshot_refuses_occupied_target(rix, tmp_path):
    snap = snapshot_index(rix.path, str(tmp_path / "s1"))
    with pytest.raises(ValueError, match="already holds"):
        snapshot_index(rix.path, snap)


def test_snapshot_skips_stale_generations(spark, tmp_path):
    """After append+compact the index carries generation-suffixed live dirs
    and stale originals; backup copies only what meta points at (what
    ReplicationHandler replicates: the live segments_N view)."""
    base = str(tmp_path / "gen")
    corpus = synth_corpus(spark, 160, partitions=4).cache()
    head = corpus.filter(F.xxhash64("path") % 2 == 0)
    tail = corpus.filter(F.xxhash64("path") % 2 != 0)
    build_index(spark, head, R_SPEC, base)
    appended = append_documents(spark, base, tail)
    ix = compact_index(spark, appended)
    assert ix.postings_dirname != "postings"  # compaction re-generated
    snap = snapshot_index(base, str(tmp_path / "gsnap"))
    # stale pre-compaction dirs not copied; live generation dirs are
    assert not os.path.isdir(os.path.join(snap, "postings"))
    assert os.path.isdir(os.path.join(snap, ix.postings_dirname))
    restored = restore_index(snap)
    assert _results(spark, restored) == _results(spark, ix)
    corpus.unpersist()


def test_interrupted_snapshot_never_loadable(rix, tmp_path):
    """Crash before the final meta write leaves a directory that Index.load
    rejects — the publish-order atomicity rule."""
    dest = str(tmp_path / "crash")
    os.makedirs(dest)
    shutil.copytree(
        os.path.join(rix.path, "docs"), os.path.join(dest, "docs")
    )
    with pytest.raises((FileNotFoundError, OSError)):
        Index.load(dest)
