"""Distributed inverted-index build: the Spark-first re-expression of the
reference's sharded index-build dataflow.

Reference lifecycle (SURVEY.md §3.1): validate -> partition -> per-reduce-task
embedded-Solr index build with 500-doc micro-batches -> commit + optimize ->
copy local index dir to HDFS (hadoop/SolrOutputFormat.java:46-114,
core/SolrWriter.java:59-128).  Our lifecycle:

1. plan-time ``validate_schema`` (core/SolrSchemeUtil.java:87-101 analogue);
2. deterministic dense ``doc_id`` assignment — distributed global-sort rank,
   never a single-partition window;
3. docs + stats tables (doc store with per-row sha256 invariant);
4. SPIMI inversion in Arrow-batched Python workers (_spimi_tf_kernel):
   memoized code-aware tokenization + per-doc Counter build the in-memory
   term dictionary per partition; only distinct (term, doc_id, tf) pairs
   cross the wire.  (A pure-Catalyst explode+hash-agg variant was measured
   and ANTI-scaled with thread count at local[32] — allocation pressure on
   the single shared JVM heap; separate Python worker processes scale.);
5. exact df pre-pass marks hot terms (df > hot_term_df_ratio * N, the
   stopword-grade ``import``/``return`` tokens); hot terms get a
   doc-derived salt so no single reducer owns a full hot posting list;
6. salted repartition-and-sort shuffle on (shard, term, salt) + a streaming
   mapInPandas assembler producing delta+varint-compressed posting rows with
   per-block max metadata (codec.py) — the commit/optimize analogue
   (core/SolrWriter.java:110-113);
7. atomic publish via Spark's task-commit protocol into
   ``postings/shard=N/`` dirs — one logical shard per document bucket,
   exactly the reference's "N shards for N reducers" (README.md:7-8) — plus a
   per-shard lineage table (terms, postings, bytes, skew_ratio, status) that
   doubles as the resume checkpoint.

Resume: ``build_index(..., resume=True)`` reads the lineage table, skips
shards already committed, and appends only the missing ones — idempotent,
the analogue of Hadoop task retry + idempotent task output dirs
(hadoop/SolrOutputFormat.java:57).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cascading_solr_spark.analyzer import make_cached_tokenizer
from cascading_solr_spark.codec import bm25_tf_norm, encode_varint_counts
from cascading_solr_spark.spec import IndexSpec, validate_schema

TF_SCHEMA = "doc_id long, dl int, shard int, term string, tf int"


def _spimi_tf_kernel(content_field: str, num_shards: int):
    """SPIMI in-memory inversion, Arrow-batched: tokenize (memoized per-word
    cache — code identifiers repeat heavily) + per-doc Counter -> distinct
    (doc, term, tf) rows.  This runs in separate Python worker processes, so
    it scales with cores without sharing one JVM heap (the Catalyst
    expression analyzer measurably anti-scaled under allocation pressure at
    local[32]).  The per-doc dict IS the SPIMI dictionary; only distinct
    (term, doc) pairs ever reach the shuffle."""
    from collections import Counter

    def kernel(batches):
        tokenize_fast = make_cached_tokenizer()
        for pdf in batches:
            doc_ids: list[int] = []
            dls: list[int] = []
            terms: list[str] = []
            tfs: list[int] = []
            for doc_id, content in zip(
                pdf["doc_id"].to_numpy(), pdf[content_field]
            ):
                toks = tokenize_fast(content)
                counts = Counter(toks)
                k = len(counts)
                doc_ids.extend([doc_id] * k)
                dls.extend([len(toks)] * k)
                terms.extend(counts.keys())
                tfs.extend(counts.values())
            ids = np.asarray(doc_ids, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "dl": np.asarray(dls, dtype=np.int32),
                    "shard": (ids % num_shards).astype(np.int32),
                    "term": terms,
                    "tf": np.asarray(tfs, dtype=np.int32),
                }
            )

    return kernel

POSTINGS_SCHEMA = (
    "shard int, term string, salt int, n_docs long, doc_ids binary, "
    "tfs binary, dls binary, block_maxes array<double>, n_blocks int, "
    "n_bytes long"
)


class _Prof:
    """Opt-in build phase timing (CSS_BUILD_PROFILE=1) for scaling work."""

    def __init__(self) -> None:
        self.on = os.environ.get("CSS_BUILD_PROFILE") == "1"
        self.t0 = time.perf_counter()

    def mark(self, label: str) -> None:
        if self.on:
            t1 = time.perf_counter()
            print(f"[build-prof] {label:18s} {t1 - self.t0:6.1f}s", flush=True)
            self.t0 = t1


def _make_dl_udf():
    """Arrow-vectorized token-count UDF (doc length for the BM25 norm), using
    the same memoized tokenizer as the SPIMI kernel."""

    @F.pandas_udf("int")
    def dl(s: pd.Series) -> pd.Series:
        tokenize_fast = make_cached_tokenizer()
        return s.map(lambda t: len(tokenize_fast(t))).astype("int32")

    return dl


def assign_doc_ids(df: DataFrame, keys: tuple[str, ...]) -> DataFrame:
    """Dense deterministic doc_id = global sort rank over unique ``keys``.

    Scale-safe on two axes:

    * a bare ``row_number().over(Window.orderBy(...))`` collapses to ONE
      partition; instead we range-partition + sort (Spark's distributed
      sort), count rows per partition (tiny driver collect), and add the
      partition prefix offsets to a per-partition row_number — the global
      rank, independent of the sampled range boundaries;
    * the sort/window/persist runs on a KEYS-ONLY projection (measured: a
      content-carrying sorted persist anti-scales badly with thread count —
      35s at local[32] vs 3s at local[8] for 200k 4KB docs), then the ids
      hash-join back to the full rows WITHOUT sorting the payload (hint
      shuffle_hash so the planner doesn't pick a sort-merge join that would
      re-sort content).
    """
    keys_l = list(keys)
    slim = df.select(*keys_l)
    sorted_df = slim.orderBy(*keys_l).withColumn("_pid", F.spark_partition_id())
    sorted_df = sorted_df.persist()
    counts = dict(
        (r["_pid"], r["cnt"])
        for r in sorted_df.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(*keys_l)
    ids = (
        sorted_df.join(off_df, "_pid")
        .withColumn("doc_id", F.row_number().over(w) - 1 + F.col("_offset"))
        .drop("_pid", "_offset")
    )
    return df.join(ids.hint("shuffle_hash"), keys_l)


@dataclass
class Index:
    """Handle to a built index directory (postings/docs/stats/lineage)."""

    path: str
    spec: IndexSpec
    n_docs: int
    avgdl: float

    @classmethod
    def load(cls, path: str) -> "Index":
        with open(os.path.join(path, "meta.json")) as fh:
            meta = json.load(fh)
        spec = IndexSpec(**meta["spec"])
        return cls(path=path, spec=spec, n_docs=meta["n_docs"], avgdl=meta["avgdl"])

    def postings(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.path, "postings"))

    def docs(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.path, "docs"))

    def lineage(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.path, "lineage"))

    def term_dict(self, spark: SparkSession) -> DataFrame | None:
        """Global term -> df dictionary (None for pre-dict indexes)."""
        p = os.path.join(self.path, "dict")
        if not os.path.exists(p):
            return None
        return spark.read.parquet(p)


def _assembler(avgdl: float, spec: IndexSpec):
    """mapInPandas posting assembler over a partition sorted by
    (shard, term, salt, doc_id).  Groups may span Arrow batches, so the tail
    group of each batch is carried into the next — the streaming analogue of
    the reference's flush-on-500-docs micro-batching (SolrWriter.java:101-122).
    """
    k1, b, block = spec.k1, spec.b, spec.block_size

    cols = [
        "shard", "term", "salt", "n_docs", "doc_ids", "tfs", "dls",
        "block_maxes", "n_blocks", "n_bytes",
    ]

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        """Batch-vectorized group assembly: ONE global varint encode per
        column, split into per-group byte slices via the per-value byte
        counts; block maxes via maximum.reduceat on global block starts.
        The only per-group Python is bytes slicing."""
        n = len(pdf)
        shard = pdf["shard"].to_numpy(dtype=np.int32)
        salt = pdf["salt"].to_numpy(dtype=np.int32)
        term = pdf["term"].to_numpy()
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)

        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (
            (term[1:] != term[:-1])
            | (salt[1:] != salt[:-1])
            | (shard[1:] != shard[:-1])
        )
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, n))
        n_groups = len(starts)

        # delta-encode doc ids globally; group-leading values stay absolute
        deltas = np.empty(n, dtype=np.int64)
        deltas[0] = ids[0]
        np.subtract(ids[1:], ids[:-1], out=deltas[1:])
        deltas[starts] = ids[starts]
        if n > 1:
            inner = deltas[~change]
            if inner.size and inner.min() <= 0:
                raise ValueError("doc_ids not strictly increasing within group")
        ids_b, nb_ids = encode_varint_counts(deltas.astype(np.uint64))
        tfs_b, nb_tfs = encode_varint_counts(tfs.astype(np.uint64))
        dls_b, nb_dls = encode_varint_counts(dls.astype(np.uint64))
        off_ids = np.zeros(n_groups + 1, dtype=np.int64)
        off_tfs = np.zeros(n_groups + 1, dtype=np.int64)
        off_dls = np.zeros(n_groups + 1, dtype=np.int64)
        np.cumsum(np.add.reduceat(nb_ids, starts), out=off_ids[1:])
        np.cumsum(np.add.reduceat(nb_tfs, starts), out=off_tfs[1:])
        np.cumsum(np.add.reduceat(nb_dls, starts), out=off_dls[1:])

        # per-group per-block maxima of the BM25 tf-norm
        norms = bm25_tf_norm(tfs, dls, avgdl, k1, b)
        pos_in_group = np.arange(n) - np.repeat(starts, sizes)
        bstarts = np.flatnonzero(pos_in_group % block == 0)
        bmax_all = np.maximum.reduceat(norms, bstarts)
        nblocks = -(-sizes // block)
        boff = np.zeros(n_groups + 1, dtype=np.int64)
        np.cumsum(nblocks, out=boff[1:])

        return pd.DataFrame(
            {
                "shard": shard[starts],
                "term": term[starts],
                "salt": salt[starts],
                "n_docs": sizes.astype(np.int64),
                "doc_ids": [
                    ids_b[off_ids[i] : off_ids[i + 1]] for i in range(n_groups)
                ],
                "tfs": [tfs_b[off_tfs[i] : off_tfs[i + 1]] for i in range(n_groups)],
                "dls": [dls_b[off_dls[i] : off_dls[i + 1]] for i in range(n_groups)],
                "block_maxes": [
                    bmax_all[boff[i] : boff[i + 1]].tolist() for i in range(n_groups)
                ],
                "n_blocks": nblocks.astype(np.int32),
                "n_bytes": (
                    np.diff(off_ids) + np.diff(off_tfs) + np.diff(off_dls)
                ).astype(np.int64),
            },
            columns=cols,
        )

    def assemble(iterator):
        carry: pd.DataFrame | None = None
        for pdf in iterator:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # hold back the final (possibly incomplete) group
            last = pdf.iloc[-1]
            tail_mask = (
                (pdf["term"] == last["term"])
                & (pdf["salt"] == last["salt"])
                & (pdf["shard"] == last["shard"])
            )
            # tail group start = first index from the end where mask is contiguous
            rev = tail_mask.to_numpy()[::-1]
            tail_len = int(np.argmin(rev)) if not rev.all() else len(rev)
            cut = len(pdf) - tail_len
            carry = pdf.iloc[cut:]
            head = pdf.iloc[:cut]
            if len(head):
                yield emit(head)
        if carry is not None and len(carry):
            yield emit(carry)

    return assemble


def build_index(
    spark: SparkSession,
    source: DataFrame,
    spec: IndexSpec,
    out_dir: str,
    resume: bool = False,
) -> Index:
    """Build (or resume) a sharded compressed inverted index at ``out_dir``."""
    prof = _Prof()
    validate_schema(source.schema, spec)
    os.makedirs(out_dir, exist_ok=True)
    docs_path = os.path.join(out_dir, "docs")
    postings_path = os.path.join(out_dir, "postings")
    lineage_path = os.path.join(out_dir, "lineage")
    meta_path = os.path.join(out_dir, "meta.json")

    committed: set[int] = set()
    if resume and os.path.exists(lineage_path):
        committed = {
            r["shard"]
            for r in spark.read.parquet(lineage_path)
            .filter(F.col("status") == "committed")
            .select("shard")
            .collect()
        }
    missing = [s for s in range(spec.num_shards) if s not in committed]

    # ---- doc-id pass, materialized once, feeding docs AND postings ----
    based = None
    if not (resume and os.path.exists(meta_path) and os.path.exists(docs_path)) or (
        missing
    ):
        if spec.doc_id_field:
            based = source.withColumn("doc_id", F.col(spec.doc_id_field).cast("long"))
        else:
            # NOT persisted: each consumer re-runs the cheap shuffle-hash
            # join against the cached keys-only id ranking.  Caching the
            # content-carrying rows was measured to anti-scale with thread
            # count (memory-store churn at local[32]).
            based = assign_doc_ids(source, spec.key_fields)

    # ---- docs + stats (skip when resuming a partial postings build) ----
    if resume and os.path.exists(meta_path) and os.path.exists(docs_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        n_docs, avgdl = meta["n_docs"], meta["avgdl"]
    else:
        dl_udf = _make_dl_udf()
        docs = based.select(
            "doc_id",
            *[c for c in spec.stored_fields],
            dl_udf(F.col(spec.content_field)).alias("dl"),
            F.sha2(F.col(spec.content_field), 256).alias("sha256"),
            F.pmod(F.col("doc_id"), F.lit(spec.num_shards)).cast("int").alias(
                "shard"
            ),
        )
        # one file per shard dir (not shards x tasks tiny files)
        (
            # leading "shard" satisfies FileFormatWriter's required ordering
            # (else it inserts its own non-stable sort by the partition col,
            # destroying the doc_id clustering)
            docs.repartition(spec.num_shards, "shard")
            .sortWithinPartitions("shard", "doc_id")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(docs_path)
        )
        prof.mark("docs_write")
        row = (
            spark.read.parquet(docs_path)
            .agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
            .collect()[0]
        )
        n_docs, avgdl = int(row["n"]), float(row["avgdl"])
        prof.mark("stats")
        meta = {
            "spec": {
                k: (list(v) if isinstance(v, tuple) else v)
                for k, v in spec.__dict__.items()
            },
            "n_docs": n_docs,
            "avgdl": avgdl,
        }
        # tuples serialize as lists; IndexSpec accepts both
        meta["spec"]["key_fields"] = list(spec.key_fields)
        meta["spec"]["stored_fields"] = list(spec.stored_fields)
        with open(meta_path, "w") as fh:
            json.dump(meta, fh)

    # ---- postings ----
    if missing:
        # Hot-term detection on a SEEDED SAMPLE of the raw source (not of
        # `based`, so the sample is independent of join row order and thus
        # identical between a fresh build and a resumed one).  When the
        # corpus is small the sample is the full corpus and the threshold
        # reduces to the exact df > ratio * N rule.
        frac = min(1.0, spec.hot_sample_docs / max(1, n_docs))
        sampled = source.select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col(spec.content_field),
        )
        if frac < 1.0:
            sampled = sampled.sample(fraction=frac, seed=42)
        sample_tf = sampled.mapInPandas(
            _spimi_tf_kernel(spec.content_field, 1), TF_SCHEMA
        )
        hot_threshold = max(2.0, spec.hot_term_df_ratio * n_docs * frac)
        hot_terms = (
            sample_tf.groupBy("term")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > hot_threshold)
            .select("term", F.lit(True).alias("_hot"))
        )

        prof.mark("hot_plan")
        # SPIMI inversion in Arrow-batched Python workers (_spimi_tf_kernel):
        # only distinct (term, doc_id, tf) pairs reach the shuffle — ONE
        # streaming pass straight into the salted repartition (no cache).
        tf_long = based.select("doc_id", spec.content_field).mapInPandas(
            _spimi_tf_kernel(spec.content_field, spec.num_shards), TF_SCHEMA
        )
        salted = (
            tf_long.join(F.broadcast(hot_terms), "term", "left")
            .withColumn(
                "salt",
                F.when(
                    F.col("_hot").isNotNull(),
                    F.pmod(
                        F.floor(F.col("doc_id") / spec.num_shards),
                        F.lit(spec.salt_buckets),
                    ).cast("int"),
                ).otherwise(F.lit(0)),
            )
            .drop("_hot")
        )

        shuffle_parts = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32") or "32"
        )
        n_parts = max(spec.num_shards, shuffle_parts)
        if len(missing) < spec.num_shards:
            salted = salted.filter(F.col("shard").isin(missing))
        arranged = salted.repartition(
            n_parts, "shard", "term", "salt"
        ).sortWithinPartitions("shard", "term", "salt", "doc_id")

        postings = arranged.mapInPandas(
            _assembler(avgdl, spec), schema=POSTINGS_SCHEMA
        )
        # "segment merge": re-shuffle the already-COMPRESSED posting rows so
        # each shard lands in one term-sorted file — the analogue of the
        # reference's optimize(maxSegments) at close (core/SolrWriter.java:112,
        # hadoop/SolrOutputFormat.java:35).  Cheap: rows are compact binaries.
        # Term-sorted files maximize parquet row-group min/max pruning for the
        # query-side term IN (...) filter.
        (
            postings.repartition(spec.num_shards, "shard")
            .sortWithinPartitions("shard", "term", "salt")
            .write.mode("append")
            .partitionBy("shard")
            .parquet(postings_path)
        )
        prof.mark("postings_write")

        # ---- lineage / checkpoint commit ----
        built = spark.read.parquet(postings_path).filter(F.col("shard").isin(missing))
        lineage = built.groupBy("shard").agg(
            F.count("*").alias("terms"),
            F.sum("n_docs").alias("postings"),
            F.sum("n_bytes").alias("bytes"),
            (F.max("n_docs") / F.avg("n_docs")).alias("skew_ratio"),
            F.lit("committed").alias("status"),
        )
        lineage.write.mode("append").parquet(lineage_path)

        # ---- term dictionary: global df per term (the idf source) ----
        # Rebuilt from ALL postings whenever shards changed, term-sorted for
        # row-group pruning on the query side's term IN (...) lookup.
        all_built = spark.read.parquet(postings_path)
        (
            all_built.groupBy("term")
            .agg(F.sum("n_docs").alias("df"))
            .repartitionByRange(max(1, spec.num_shards // 4), "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "dict"))
        )
        prof.mark("lineage+dict")

    return Index(path=out_dir, spec=spec, n_docs=n_docs, avgdl=avgdl)
