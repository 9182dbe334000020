"""Distributed inverted-index build: the Spark-first re-expression of the
reference's sharded index-build dataflow.

Reference lifecycle (SURVEY.md §3.1): validate -> partition -> per-reduce-task
embedded-Solr index build with 500-doc micro-batches -> commit + optimize ->
copy local index dir to HDFS (hadoop/SolrOutputFormat.java:46-114,
core/SolrWriter.java:59-128).  Our lifecycle:

1. plan-time ``validate_schema`` (core/SolrSchemeUtil.java:87-101 analogue);
2. deterministic dense ``doc_id`` assignment — distributed global-sort rank,
   never a single-partition window; duplicate keys fail fast (the analogue of
   Solr's uniqueKey constraint, schema.xml:224);
3. ONE Python tokenize pass over the corpus: SPIMI inversion in Arrow-batched
   workers (_spimi_tf_kernel) produces the distinct (term, doc_id, tf) rows
   that feed EVERYTHING downstream — per-term stats (exact df -> hot-term
   set + the dict table), corpus stats (total tokens -> avgdl), and the
   postings shuffle.  (Round 1 scanned the content three times: a dl-UDF
   docs pass, a sampled hot-term pass, and the SPIMI pass.  Folding them
   into one pass + a cached tf table cut the serial component and a full
   Python pass — the round-2 scaling work.);
4. keyword fields (untokenized StrField analogue, schema.xml:288; multi-valued
   membership per schema.xml:104 + SolrWriter.java:67-71 tuple-explode) are
   indexed as ``field:value`` terms in the SAME postings layout, so exact
   filters compose with BM25 ranking index-side;
5. exact hot terms (df > hot_term_df_ratio * N — the stopword-grade
   ``import``/``return`` tokens) get a doc-derived salt so no single reducer
   owns a full hot posting list; the hot SET is persisted in meta.json so
   resumed / appended builds salt identically;
6. salted repartition-and-sort shuffle on (shard, term, salt) + a streaming
   mapInPandas assembler producing delta+varint-compressed posting rows with
   per-block (max_tf, min_dl) pruning metadata and per-block byte offsets
   (codec.py) — block metadata is avgdl-INDEPENDENT so incremental appends
   never invalidate it;
7. atomic publish via Spark's task-commit protocol into
   ``postings/shard=N/`` dirs — one logical shard per document bucket,
   exactly the reference's "N shards for N reducers" (README.md:7-8) — plus a
   per-shard lineage table (terms, postings, bytes, skew_ratio, status) that
   doubles as the resume checkpoint.

Independent jobs overlap via driver threads (docs write ∥ the tokenize pass;
dict write ∥ the postings shuffle): the python-worker-heavy stages and the
JVM-heavy stages use complementary resources, and barrier serialization is
the dominant fixed cost at small scale.

Resume: ``build_index(..., resume=True)`` reads the lineage table, removes
any partially-written uncommitted shard dirs, pre-filters the corpus to the
missing shards (shard = doc_id % num_shards is derivable before tokenizing),
and appends only those — idempotent, the analogue of Hadoop task retry +
idempotent task output dirs (hadoop/SolrOutputFormat.java:57).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

from cascading_solr_spark.analyzer import (
    make_cached_position_tokenizer,
    make_cached_tokenizer,
)
from cascading_solr_spark.codec import (
    DELETED_TERM,
    decode_doc_ids,
    encode_position_payload,
    encode_varint_counts,
)
from cascading_solr_spark.spec import IndexSpec, IndexSpecError, validate_schema

# The big (term, doc) intermediate packs (doc_id, dl) into ONE long:
# packed = doc_id << DL_BITS | min(dl, DL_MASK).  Three fields (24 B of
# UnsafeRow slots + the term bytes) instead of five (40 B) — the shuffle,
# the sort, and both Arrow hops move ~40% fewer bytes, which is what the
# measured 2->8-core inflation was made of (memory-bandwidth contention).
# doc_id < 2^42 (4×10^12, above the north-star scale); dl saturates at
# 2^21-1 tokens (a 2M-token document scores as if 2M — BM25 is flat there).
DL_BITS = 21
DL_MASK = (1 << DL_BITS) - 1

TF_SCHEMA = "packed long, term string, tf int"

#: caller-provided doc ids must fit the packed layout: id << DL_BITS rides an
#: int64, so id in [0, 2^42).  Anything larger (e.g. a raw 64-bit hash id)
#: would silently overflow and corrupt posting doc ids — fail fast instead.
MAX_DOC_ID = (1 << (63 - DL_BITS)) - 1

# keyword-field terms are namespaced "<field>:<value>"; analyzed content terms
# are [a-z0-9]+ so the ':' can never collide.
KW_SEP = ":"


def pack_id_dl(doc_ids: np.ndarray, dls: np.ndarray) -> np.ndarray:
    return (doc_ids.astype(np.int64) << DL_BITS) | np.minimum(
        dls.astype(np.int64), DL_MASK
    )


def _spimi_tf_kernel(content_field: str, positions: bool = False):
    """SPIMI in-memory inversion, Arrow-batched: tokenize (memoized per-word
    cache — code identifiers repeat heavily) + per-doc Counter -> distinct
    (doc, term, tf) rows with (doc_id, dl) packed.  This runs in separate
    Python worker processes, so it scales with cores without sharing one JVM
    heap (the Catalyst expression analyzer measurably anti-scaled under
    allocation pressure at local[32]).  The per-doc dict IS the SPIMI
    dictionary; only distinct (term, doc) pairs ever reach the shuffle.

    With ``positions`` each row additionally carries its delta-varint
    position-list blob (``pos`` binary, Lucene .pos analogue) — encoded
    MAP-SIDE so the shuffle still moves one row per distinct (term, doc)
    pair, just a few bytes wider; the whole batch is encoded in ONE
    vectorized pass and sliced per row (encode_position_payload)."""
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
                    "packed": pack_id_dl(ids, np.asarray(dls, dtype=np.int64)),
                    "term": terms,
                    "tf": np.asarray(tfs, dtype=np.int32),
                }
            )

    def kernel_pos(batches):
        tokenize_pos = make_cached_position_tokenizer()
        for pdf in batches:
            doc_ids: list[int] = []
            dls: list[int] = []
            terms: list[str] = []
            tfs: list[int] = []
            pos_chunks: list[list[int]] = []
            for doc_id, content in zip(
                pdf["doc_id"].to_numpy(), pdf[content_field]
            ):
                tp = tokenize_pos(content)
                per_term: dict[str, list[int]] = {}
                for t, p in tp:
                    per_term.setdefault(t, []).append(p)
                k = len(per_term)
                doc_ids.extend([doc_id] * k)
                dls.extend([len(tp)] * k)
                terms.extend(per_term.keys())
                tfs.extend(len(v) for v in per_term.values())
                pos_chunks.extend(per_term.values())
            ids = np.asarray(doc_ids, dtype=np.int64)
            tf_arr = np.asarray(tfs, dtype=np.int64)
            flat = (
                np.concatenate([np.asarray(c, dtype=np.int64) for c in pos_chunks])
                if pos_chunks
                else np.empty(0, dtype=np.int64)
            )
            buf, seg_nb = encode_position_payload(flat, tf_arr)
            offs = np.zeros(len(seg_nb) + 1, dtype=np.int64)
            np.cumsum(seg_nb, out=offs[1:])
            mv = memoryview(buf)
            yield pd.DataFrame(
                {
                    "packed": pack_id_dl(ids, np.asarray(dls, dtype=np.int64)),
                    "term": terms,
                    "tf": tf_arr.astype(np.int32),
                    "pos": [
                        bytes(mv[offs[i]: offs[i + 1]]) for i in range(len(seg_nb))
                    ],
                }
            )

    return kernel_pos if positions else kernel


def _spimi_field_kernel(field: str, positions: bool = False):
    """SPIMI inversion for one EXTRA analyzed text field (spec.text_fields):
    the same code-aware tokenizer, terms namespaced ``field:token`` (the
    keyword ``field:value`` namespace — spec validation keeps field names
    disjoint, so no collision), and the FIELD's token count packed as dl so
    BM25 length normalization is per-field (the Lucene per-field norms
    analogue the reference's eDisMax qf relies on, solrconfig.xml:872-877).
    Nulls/empty fields emit nothing (SolrWriter.java:65-66 null-skip).
    Positions are never recorded for extra fields (phrase queries are
    content-field only); under a positional spec the rows carry an empty
    blob exactly like keyword rows, which phrase paths never decode."""
    from collections import Counter

    prefix = field + KW_SEP

    def kernel(batches):
        tokenize_fast = make_cached_tokenizer()
        for pdf in batches:
            doc_ids: list[int] = []
            dls: list[int] = []
            terms: list[str] = []
            tfs: list[int] = []
            for doc_id, content in zip(pdf["doc_id"].to_numpy(), pdf[field]):
                toks = tokenize_fast(content) if content is not None else []
                if not toks:
                    continue
                counts = Counter(toks)
                k = len(counts)
                doc_ids.extend([doc_id] * k)
                dls.extend([len(toks)] * k)
                terms.extend(prefix + t for t in counts.keys())
                tfs.extend(counts.values())
            ids = np.asarray(doc_ids, dtype=np.int64)
            out = {
                "packed": pack_id_dl(ids, np.asarray(dls, dtype=np.int64)),
                "term": terms,
                "tf": np.asarray(tfs, dtype=np.int32),
            }
            if positions:
                out["pos"] = [b""] * len(terms)
            yield pd.DataFrame(out)

    return kernel


def _text_field_tf_rows(
    based: "DataFrame", spec: IndexSpec, positions: bool
) -> "DataFrame | None":
    """Union of the namespaced tf streams of every extra text field — each a
    column-pruned scan + its own Arrow kernel, so fields tokenize in
    parallel and the shuffle still moves one row per (field:term, doc)."""
    if not spec.text_fields:
        return None
    schema = TF_SCHEMA_POS if positions else TF_SCHEMA
    out = None
    for f in spec.text_fields:
        part = based.select("doc_id", f).mapInPandas(
            _spimi_field_kernel(f, positions), schema
        )
        out = part if out is None else out.unionByName(part)
    return out


POSTINGS_SCHEMA = (
    "shard int, term string, salt int, n_docs long, sum_tf long, "
    "doc_ids binary, "
    "tfs binary, dls binary, block_max_tf array<int>, block_min_dl array<int>, "
    "block_last_id array<long>, "
    "boffs_ids array<long>, boffs_tfs array<long>, boffs_dls array<long>, "
    "n_blocks int, n_bytes long"
)

# positional variants (spec.positions): the shuffle rows carry the map-side
# encoded per-posting position blob; the assembled rows carry the per-group
# concatenated payload + per-block byte offsets (Lucene .pos analogue)
TF_SCHEMA_POS = TF_SCHEMA + ", pos binary"
POSTINGS_SCHEMA_POS = POSTINGS_SCHEMA + ", pos binary, boffs_pos array<long>"


def tf_schema(spec: IndexSpec) -> str:
    return TF_SCHEMA_POS if spec.positions else TF_SCHEMA


def postings_schema(spec: IndexSpec) -> str:
    return POSTINGS_SCHEMA_POS if spec.positions else POSTINGS_SCHEMA


#: per-phase wall seconds of the most recent ``build_index`` call in this
#: process (always populated; printed only under CSS_BUILD_PROFILE=1).
#: bench_scaling.py publishes these per parallelism level — the phase whose
#: 2-core/8-core ratio is far from 4x is where anti-scaling lives.
LAST_BUILD_PROFILE: dict[str, float] = {}


class _Prof:
    """Build phase timing: records into LAST_BUILD_PROFILE, prints when
    CSS_BUILD_PROFILE=1 (scaling-study instrumentation)."""

    def __init__(self) -> None:
        self.on = os.environ.get("CSS_BUILD_PROFILE") == "1"
        self.t0 = time.perf_counter()
        LAST_BUILD_PROFILE.clear()

    def mark(self, label: str) -> None:
        t1 = time.perf_counter()
        LAST_BUILD_PROFILE[label] = round(t1 - self.t0, 3)
        if self.on:
            print(f"[build-prof] {label:18s} {t1 - self.t0:6.1f}s", flush=True)
        self.t0 = t1


def _rank_ids(
    df: DataFrame,
    keys: tuple[str, ...],
    persist: bool = True,
    check_unique: bool = True,
) -> tuple[DataFrame, int]:
    """Dense deterministic rank over unique ``keys`` -> (ids_df, n_rows).

    ``ids_df`` has columns ``(*keys, doc_id)``.  Scale-safe: a bare
    ``row_number().over(Window.orderBy(...))`` collapses to ONE partition;
    instead we range-partition + sort (Spark's distributed sort), count rows
    per partition (tiny driver collect), and add the partition prefix offsets
    to a per-partition row_number — the global rank, independent of the
    sampled range boundaries.  The sort runs on a KEYS-ONLY projection
    (measured: a content-carrying sorted persist anti-scales badly with
    thread count).

    ``check_unique`` enforces the reference's uniqueKey contract
    (schema.xml:224): duplicate key tuples would silently multiply rows at
    the join-back, so they raise IndexSpecError.  The check rides the
    existing per-partition count job (equal keys land in the same range
    partition, so per-partition distinct counts sum to the global one).

    With ``persist`` the (small) ids frame is cached and eagerly
    materialized so the sorted projection can be released immediately;
    callers that consume the result exactly once can pass persist=False.
    """
    keys_l = list(keys)
    slim = df.select(*keys_l)
    sorted_df = slim.orderBy(*keys_l).withColumn("_pid", F.spark_partition_id())
    sorted_df = sorted_df.persist(StorageLevel.MEMORY_AND_DISK)
    aggs = [F.count("*").alias("cnt")]
    if check_unique:
        aggs.append(F.count_distinct(*keys_l).alias("dcnt"))
    rows = sorted_df.groupBy("_pid").agg(*aggs).collect()
    counts = {r["_pid"]: r["cnt"] for r in rows}
    if check_unique:
        dups = sum(r["cnt"] - r["dcnt"] for r in rows)
        if dups:
            sorted_df.unpersist()
            raise IndexSpecError(
                f"{dups} duplicate rows for key {tuple(keys_l)!r}; the key "
                "must uniquely identify documents (uniqueKey analogue)"
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
    if persist:
        ids = ids.persist(StorageLevel.MEMORY_AND_DISK)
        ids.count()  # materialize so the sorted projection can be released
    sorted_df.unpersist()
    return ids, acc


def _is_plain_scan(df: DataFrame) -> bool:
    """True when ``df`` is a bare file-source scan: no filter, projection, or
    join sits between its files and its rows, so reading the files directly
    (``df.inputFiles()``) yields the same row population.  Any plan wrapping
    the scan returns False — a raw file read would bypass its semantics."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        return plan.getClass().getSimpleName() in (
            "LogicalRelation", "DataSourceV2Relation", "DataSourceV2ScanRelation",
        )
    except Exception:
        return False


def check_doc_id_range(ids: DataFrame, col: str = "doc_id") -> None:
    """Fail fast when caller-provided doc ids don't fit the packed (id, dl)
    int64 layout (id << DL_BITS needs id < 2^42).  One cheap min/max agg on
    the pruned id projection — at 100 TB this is a column-statistics scan."""
    row = ids.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
    lo, hi = row["lo"], row["hi"]
    if lo is None:
        return
    if int(lo) < 0 or int(hi) > MAX_DOC_ID:
        raise IndexSpecError(
            f"doc ids must be in [0, {MAX_DOC_ID}] to fit the packed posting "
            f"layout (got min={lo}, max={hi}); remap hash-derived ids first"
        )


def assign_doc_ids(
    df: DataFrame,
    keys: tuple[str, ...],
    persist: bool = True,
    check_unique: bool = True,
) -> DataFrame:
    """Attach a dense deterministic ``doc_id`` = global sort rank over
    ``keys``.  The ids hash-join back to the full rows WITHOUT sorting the
    payload (hint shuffle_hash so the planner doesn't pick a sort-merge join
    that would re-sort content)."""
    ids, _ = _rank_ids(df, keys, persist=persist, check_unique=check_unique)
    return df.join(ids.hint("shuffle_hash"), list(keys))


_UNSET = object()  # dict_cache sentinel: "not computed yet" vs "too big"


@dataclass
class Index:
    """Handle to a built index directory (postings/docs/stats/lineage)."""

    path: str
    spec: IndexSpec
    n_docs: int
    avgdl: float
    total_tokens: int = 0
    hot_terms: tuple[str, ...] = ()
    #: per-extra-text-field corpus token totals (spec.text_fields) — the
    #: per-field avgdl numerators eDisMax-style multi-field scoring needs
    field_tokens: dict = field(default_factory=dict)
    postings_dirname: str = "postings"
    dict_dirname: str = "dict"
    ngrams_dirname: str = "dict_ngrams"
    docs_dirname: str = "docs"
    #: live tombstone count (Lucene numDeletedDocs analogue): >0 means the
    #: postings carry DELETED_TERM rows that every query path must exclude;
    #: reset to 0 when compaction folds the deletes away.
    n_deleted: int = 0

    @classmethod
    def load(cls, path: str) -> "Index":
        meta_path = os.path.join(path, "meta.json")
        with open(meta_path) as fh:
            meta = json.load(fh)
        st = os.stat(meta_path)
        spec = IndexSpec(**meta["spec"])
        ix = cls._load_from(path, meta, spec)
        # generation stamp for the per-handle DataFrame caches: if meta.json
        # moves on after this handle was created, a first-use cache fill on
        # the stale handle would mix pre- and post-mutation file listings —
        # _cached_df warns loudly instead of serving that silently (r6,
        # ADVICE item; mutators return fresh handles by contract).
        object.__setattr__(ix, "_meta_stamp", (st.st_mtime_ns, st.st_size))
        return ix

    @classmethod
    def _load_from(cls, path: str, meta: dict, spec: IndexSpec) -> "Index":
        return cls(
            path=path,
            spec=spec,
            n_docs=meta["n_docs"],
            avgdl=meta["avgdl"],
            total_tokens=meta.get("total_tokens", 0),
            hot_terms=tuple(meta.get("hot_terms", ())),
            field_tokens=dict(meta.get("field_tokens", {})),
            postings_dirname=meta.get("postings_dirname", "postings"),
            dict_dirname=meta.get("dict_dirname", "dict"),
            ngrams_dirname=meta.get("ngrams_dirname", "dict_ngrams"),
            docs_dirname=meta.get("docs_dirname", "docs"),
            n_deleted=int(meta.get("n_deleted", 0)),
        )

    @property
    def has_deletes(self) -> bool:
        return self.n_deleted > 0

    @property
    def postings_path(self) -> str:
        return os.path.join(self.path, self.postings_dirname)

    @property
    def dict_path(self) -> str:
        # meta-pointed generation dir (like postings): compact_index publishes
        # the folded dict as dict.genN + an atomic meta flip, so a crash at
        # any step leaves a complete dict dir — never a partially-renamed one
        return os.path.join(self.path, self.dict_dirname)

    @property
    def ngrams_path(self) -> str:
        # spellcheck candidate index (padded character bigrams per term),
        # meta-pointed like dict; may not exist for pre-ngram indexes
        return os.path.join(self.path, self.ngrams_dirname)

    def _cached_df(self, spark: SparkSession, key: str, builder) -> DataFrame:
        """Per-handle DataFrame cache: ``spark.read.parquet`` costs a
        ~100 ms py4j/file-listing round trip PER CALL, and every component
        call re-read the same dirs — at bench scale that was most of the
        per-query driver floor (profiled: facet_query 1.8 s wall, 0.09 s
        execution).  Safe under the handle's snapshot contract (same as
        dict_cache): every mutator (append/delete/compact/update) returns a
        FRESH ``Index.load`` handle, so a cached plan never needs to see
        files that appear after the handle was created.  The value pins the
        owning SparkSession (identity compare, strong ref — no id-reuse
        hazard); a different session rebuilds."""
        cache = getattr(self, "_df_cache", None)
        if cache is None:
            cache = {}
            object.__setattr__(self, "_df_cache", cache)
        ent = cache.get(key)
        if ent is not None and ent[0] is spark:
            return ent[1]
        stamp = getattr(self, "_meta_stamp", None)
        if stamp is not None:
            try:
                st = os.stat(os.path.join(self.path, "meta.json"))
                moved = (st.st_mtime_ns, st.st_size) != stamp
            except OSError:
                moved = True
            if moved:
                import warnings

                warnings.warn(
                    "Index handle is stale: the index meta has changed since"
                    " this handle was loaded (append/delete/compact?).  A"
                    " first-use cache fill now can mix pre- and post-mutation"
                    " file listings — use the handle returned by the mutator"
                    " or Index.load a fresh one.",
                    RuntimeWarning,
                    stacklevel=3,
                )
        df = builder()
        cache[key] = (spark, df)
        return df

    def postings(self, spark: SparkSession) -> DataFrame:
        # a 0-doc index (Solr's empty-core analogue) has no postings dir yet
        # — the first append creates it; until then serve a schema-correct
        # empty frame so every query path works unchanged
        if not os.path.exists(self.postings_path):
            return spark.createDataFrame([], postings_schema(self.spec))
        return self._cached_df(
            spark, "postings",
            lambda: spark.read.parquet(self.postings_path),
        )

    @property
    def docs_path(self) -> str:
        # meta-pointed generation dir (like dict/postings): a delete-folding
        # compaction publishes the filtered docs as docs.genN + a meta flip
        return os.path.join(self.path, self.docs_dirname)

    def docs(self, spark: SparkSession) -> DataFrame:
        p = self.docs_path
        if not os.path.exists(p):
            from pyspark.sql import types as T

            with open(os.path.join(self.path, "meta.json")) as fh:
                meta = json.load(fh)
            schema = T.StructType.fromJson(json.loads(meta["docs_schema"]))
            return spark.createDataFrame([], schema)
        return self._cached_df(spark, "docs", lambda: spark.read.parquet(p))

    def deleted_ids(self, spark: SparkSession) -> DataFrame:
        """Distinct tombstoned doc_ids, decoded from the DELETED_TERM
        postings rows (term-pruned scan — only the tombstone rows' row
        groups are read).  Empty frame when the index has no deletes.
        Docs-table-shaped consumers (match-all, realtime get) anti-join
        this; postings kernels instead decode the same rows in-shard via
        ``denied_ids`` (no extra job)."""
        if not self.has_deletes:
            return spark.createDataFrame([], "doc_id long")
        block_size = self.spec.block_size

        def kernel(it):
            for pdf in it:
                for r in pdf.itertuples(index=False):
                    ids = decode_doc_ids(
                        r.doc_ids, int(r.n_docs), block_size
                    )
                    yield pd.DataFrame({"doc_id": ids.astype("int64")})

        return (
            self.postings(spark)
            .filter(F.col("term") == DELETED_TERM)
            .select("doc_ids", "n_docs")
            .mapInPandas(kernel, "doc_id long")
            .distinct()
        )

    def lineage(self, spark: SparkSession) -> DataFrame:
        p = os.path.join(self.path, "lineage")
        if not os.path.exists(p):
            return spark.createDataFrame(
                [],
                "shard int, terms long, postings long, bytes long, "
                "skew_ratio double, status string, segment string",
            )
        return spark.read.parquet(p)

    #: largest RAW dict row count (pre-fold, parquet-footer-served) that
    #: term_dfs will cache driver-side: ~10^6 (term, df) entries is tens of
    #: MB of driver heap; a 10^9-term vocabulary stays distributed.
    DICT_CACHE_MAX_ROWS = 1_000_000

    def dict_cache(self, spark: SparkSession) -> dict[str, int] | None:
        """Driver-side {term: df} of the folded dictionary, or None when the
        vocabulary exceeds DICT_CACHE_MAX_ROWS (raw segment rows, counted
        from parquet footers — no data scan).

        The cache lives on THIS handle and is consistent with the handle's
        snapshot semantics: appends return a fresh Index (append_documents'
        contract), so a reloaded handle re-reads the grown dict.  Saves one
        Spark job per query (the df-lookup scan) — at bench scale that is
        the visible floor of per-query latency."""
        cached = getattr(self, "_dict_cache", _UNSET)
        if cached is not _UNSET:
            return cached
        d = self.term_dict(spark)
        result: dict[str, int] | None = None
        if d is not None:
            n_raw = spark.read.parquet(self.dict_path).count()  # footer-served
            if n_raw <= self.DICT_CACHE_MAX_ROWS:
                result = {r["term"]: int(r["df"]) for r in d.collect()}
        object.__setattr__(self, "_dict_cache", result)
        return result

    def term_dict(self, spark: SparkSession) -> DataFrame | None:
        """Global term -> df dictionary (None for pre-dict indexes).

        The dict table is SEGMENTED: the build writes one (term, df) rowset
        and every append adds another (O(batch) appends — see
        indexing/append.py).  This folds segments into the global view with a
        sum-per-term aggregate; a term-equality filter on the result pushes
        below the aggregate to the parquet scan (term-sorted files ->
        row-group pruning), so query-side df lookups stay tiny.
        ``compact_index`` physically merges segments back to one."""
        p = self.dict_path
        if not os.path.exists(p):
            return None
        return self._cached_df(
            spark, "term_dict",
            lambda: (
                spark.read.parquet(p)
                .groupBy("term")
                .agg(F.sum("df").alias("df"))
            ),
        )


def _assembler(spec: IndexSpec, hot_terms: list[str] | tuple[str, ...] = ()):
    """mapInPandas posting assembler over a partition sorted by
    (shard, term-hash, salt, doc_id).  Input rows are the packed
    (packed, term, tf) triples; shard and salt are recomputed here with the
    same arithmetic as :func:`_shard_salt_exprs` (the shuffle does not carry
    them).  Groups may span Arrow batches, so the tail
    group of each batch is carried into the next — the streaming analogue of
    the reference's flush-on-500-docs micro-batching (SolrWriter.java:101-122).

    Emits per-block pruning metadata as raw (max_tf, min_dl) ints — the BM25
    tf-norm is monotone increasing in tf and decreasing in dl, so
    tf_norm(max_tf, min_dl) bounds every posting in the block for ANY avgdl.
    Storing the raw pair instead of a precomputed norm keeps block metadata
    valid when incremental appends shift the corpus avgdl.  Per-block byte
    offsets + block-local delta restarts let the query side decode only
    surviving blocks (Block-Max WAND, Ding & Suel SIGIR 2011).
    """
    block = spec.block_size
    positions = spec.positions

    cols = [
        "shard", "term", "salt", "n_docs", "sum_tf", "doc_ids", "tfs", "dls",
        "block_max_tf", "block_min_dl", "block_last_id",
        "boffs_ids", "boffs_tfs", "boffs_dls",
        "n_blocks", "n_bytes",
    ]
    if positions:
        cols += ["pos", "boffs_pos"]

    num_shards, salt_buckets = spec.num_shards, spec.salt_buckets
    hot_set = frozenset(hot_terms)

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        """Batch-vectorized group assembly: ONE global varint encode per
        column, split into per-group byte slices via the per-value byte
        counts; block metadata via reduceat on global block starts.
        The only per-group Python is bytes slicing."""
        n = len(pdf)
        term = pdf["term"].to_numpy()
        packed = pdf["packed"].to_numpy(dtype=np.int64)
        ids = packed >> DL_BITS
        dls = packed & DL_MASK
        shard = (ids % num_shards).astype(np.int32)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        if hot_set:
            hot_mask = pdf["term"].isin(hot_set).to_numpy()
            salt = np.where(
                hot_mask, (ids // num_shards) % salt_buckets, 0
            ).astype(np.int32)
        else:
            salt = np.zeros(n, dtype=np.int32)

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

        # global block starts: every `block` postings within each group
        pos_in_group = np.arange(n) - np.repeat(starts, sizes)
        bstarts = np.flatnonzero(pos_in_group % block == 0)
        nblocks = -(-sizes // block)
        boff = np.zeros(n_groups + 1, dtype=np.int64)
        np.cumsum(nblocks, out=boff[1:])

        # delta-encode doc ids; the chain restarts (absolute) at EVERY block
        # start so blocks decode independently
        deltas = np.empty(n, dtype=np.int64)
        deltas[0] = ids[0]
        np.subtract(ids[1:], ids[:-1], out=deltas[1:])
        if n > 1:
            inner = deltas[1:][~change[1:]]
            if inner.size and inner.min() <= 0:
                raise ValueError("doc_ids not strictly increasing within group")
        deltas[bstarts] = ids[bstarts]
        ids_b, nb_ids = encode_varint_counts(deltas.astype(np.uint64))
        tfs_b, nb_tfs = encode_varint_counts(tfs.astype(np.uint64))
        dls_b, nb_dls = encode_varint_counts(dls.astype(np.uint64))
        off_ids = np.zeros(n_groups + 1, dtype=np.int64)
        off_tfs = np.zeros(n_groups + 1, dtype=np.int64)
        off_dls = np.zeros(n_groups + 1, dtype=np.int64)
        np.cumsum(np.add.reduceat(nb_ids, starts), out=off_ids[1:])
        np.cumsum(np.add.reduceat(nb_tfs, starts), out=off_tfs[1:])
        np.cumsum(np.add.reduceat(nb_dls, starts), out=off_dls[1:])

        # per-block byte offsets RELATIVE to the group's buffer start
        def block_offs(nb: np.ndarray, group_off: np.ndarray) -> list:
            pre = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(nb, out=pre[1:])
            rel = pre[bstarts] - np.repeat(group_off[:-1], nblocks)
            return [rel[boff[i]: boff[i + 1]].tolist() for i in range(n_groups)]

        # per-block pruning metadata: raw max tf / min dl (avgdl-independent)
        # + the block's LAST doc id (blocks partition the group's id range, so
        # the query kernel locates accumulated docs per block by searchsorted
        # and skips blocks holding none — without any decode)
        bmax_tf = np.maximum.reduceat(tfs, bstarts)
        bmin_dl = np.minimum.reduceat(dls, bstarts)
        bends = np.append(bstarts[1:], n) - 1
        blast = ids[bends]

        extra: dict[str, list | np.ndarray] = {}
        if positions:
            # position blobs arrive map-side-encoded (self-contained delta
            # chain per posting), so group assembly is pure byte
            # concatenation: one join + per-group/per-block offset slicing —
            # never a varint decode on the build path.
            pos_col = pdf["pos"]
            nb_pos = np.fromiter(
                (len(x) for x in pos_col), dtype=np.int64, count=n
            )
            pos_buf = memoryview(b"".join(pos_col))
            off_pos = np.zeros(n_groups + 1, dtype=np.int64)
            np.cumsum(np.add.reduceat(nb_pos, starts), out=off_pos[1:])
            extra["pos"] = [
                bytes(pos_buf[off_pos[i]: off_pos[i + 1]])
                for i in range(n_groups)
            ]
            extra["boffs_pos"] = block_offs(nb_pos, off_pos)

        return pd.DataFrame(
            {
                "shard": shard[starts],
                "term": term[starts],
                "salt": salt[starts],
                "n_docs": sizes.astype(np.int64),
                # per-row Σtf: lets corpus stats (total tokens -> avgdl) and
                # the dict table be derived from the compressed read-back —
                # no separate stats pass over the raw corpus
                "sum_tf": np.add.reduceat(tfs, starts).astype(np.int64),
                "doc_ids": [
                    ids_b[off_ids[i]: off_ids[i + 1]] for i in range(n_groups)
                ],
                "tfs": [tfs_b[off_tfs[i]: off_tfs[i + 1]] for i in range(n_groups)],
                "dls": [dls_b[off_dls[i]: off_dls[i + 1]] for i in range(n_groups)],
                "block_max_tf": [
                    bmax_tf[boff[i]: boff[i + 1]].astype(np.int32).tolist()
                    for i in range(n_groups)
                ],
                "block_min_dl": [
                    bmin_dl[boff[i]: boff[i + 1]].astype(np.int32).tolist()
                    for i in range(n_groups)
                ],
                "block_last_id": [
                    blast[boff[i]: boff[i + 1]].tolist() for i in range(n_groups)
                ],
                "boffs_ids": block_offs(nb_ids, off_ids),
                "boffs_tfs": block_offs(nb_tfs, off_tfs),
                "boffs_dls": block_offs(nb_dls, off_dls),
                "n_blocks": nblocks.astype(np.int32),
                "n_bytes": (
                    np.diff(off_ids) + np.diff(off_tfs) + np.diff(off_dls)
                ).astype(np.int64),
                **extra,
            },
            columns=cols,
        )

    def tail_group_mask(pdf: pd.DataFrame) -> np.ndarray:
        """Rows belonging to the final row's (term, shard, salt) group."""
        last_term = pdf["term"].iloc[-1]
        packed = pdf["packed"].to_numpy(dtype=np.int64)
        ids = packed >> DL_BITS
        l_id = int(ids[-1])
        same_term = (pdf["term"] == last_term).to_numpy()
        same_shard = (ids % num_shards) == (l_id % num_shards)
        if last_term in hot_set:
            same_salt = ((ids // num_shards) % salt_buckets) == (
                (l_id // num_shards) % salt_buckets
            )
        else:
            same_salt = np.ones(len(pdf), dtype=bool)
        return same_term & same_shard & same_salt

    def assemble(iterator):
        carry: pd.DataFrame | None = None
        for pdf in iterator:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # hold back the final (possibly incomplete) group
            tail_mask = tail_group_mask(pdf)
            # tail group start = first index from the end where mask is contiguous
            rev = tail_mask[::-1]
            tail_len = int(np.argmin(rev)) if not rev.all() else len(rev)
            cut = len(pdf) - tail_len
            carry = pdf.iloc[cut:]
            head = pdf.iloc[:cut]
            if len(head):
                yield emit(head)
        if carry is not None and len(carry):
            yield emit(carry)

    return assemble


def keyword_term(field: str, value: F.Column | str) -> F.Column:
    """The index term for an exact (untokenized) keyword field value:
    ``field:value`` — StrField analogue (schema.xml:288), case-preserving."""
    v = F.lit(value) if isinstance(value, str) else value
    return F.concat(F.lit(field + KW_SEP), v)


def _keyword_tf_rows(based: DataFrame, spec: IndexSpec) -> DataFrame | None:
    """(packed(doc_id, dl=1), term='field:value', tf=1) rows for every
    keyword field value.  Multi-valued fields explode (SolrWriter.java:67-71
    tuple-explode analogue); nulls are skipped (SolrWriter.java:65-66
    null-skip).  Pure Catalyst — no Python in this path."""
    if not spec.keyword_fields:
        return None
    schema = {f.name: f.dataType for f in based.schema.fields}
    parts: list[DataFrame] = []
    for field in spec.keyword_fields:
        dt = schema[field]
        if isinstance(dt, T.ArrayType):
            vals = F.explode(F.array_distinct(F.col(field))).alias("_kw")
        else:
            vals = F.col(field).cast("string").alias("_kw")
        part = based.select("doc_id", vals).filter(F.col("_kw").isNotNull())
        # keyword terms are positionless (StrField — no token stream); in a
        # positional index they ride with an empty blob, which phrase paths
        # never decode (phrases are content-term only).
        pos_cols = (
            [F.lit(b"").cast("binary").alias("pos")] if spec.positions else []
        )
        parts.append(
            part.select(
                (
                    F.shiftleft(F.col("doc_id"), DL_BITS) + F.lit(1)
                ).alias("packed"),
                keyword_term(field, F.col("_kw")).alias("term"),
                F.lit(1).cast("int").alias("tf"),
                *pos_cols,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _shard_salt_exprs(
    hot_terms: list[str], spec: IndexSpec
) -> tuple[F.Column, F.Column | None]:
    """Shard / salt as EXPRESSIONS over (packed, term) — the shuffle never
    carries them as columns, and the hot set rides the plan as a literal IN
    list (bounded: df > ratio·N terms) instead of a broadcast join.  Hot
    terms get a doc-derived salt so no single reducer owns a full hot
    posting list; cold terms keep salt 0.  With no hot terms the salt is
    constant — None tells callers to drop it from the shuffle/sort keys
    (a bare literal would be read as an ORDER BY ordinal)."""
    doc_id = F.shiftright(F.col("packed"), DL_BITS)
    shard = F.pmod(doc_id, F.lit(spec.num_shards)).cast("int")
    if not hot_terms:
        return shard, None
    salt = F.when(
        F.col("term").isin(hot_terms),
        F.pmod(
            (doc_id / spec.num_shards).cast("long"),
            F.lit(spec.salt_buckets),
        ).cast("int"),
    ).otherwise(F.lit(0))
    return shard, salt



def _murmur3_int(value: int, seed: int = 42) -> int:
    """Spark's Murmur3_x86_32.hashInt for a 4-byte int, signed result —
    the hash HashPartitioning applies to an int repartition key (seed 42).
    Pinned against F.hash by tests/test_r06_optimizations.py."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    k1 = (value & 0xFFFFFFFF) * c1 & 0xFFFFFFFF
    k1 = ((k1 << 15) | (k1 >> 17)) & 0xFFFFFFFF
    k1 = k1 * c2 & 0xFFFFFFFF
    h1 = seed ^ k1
    h1 = ((h1 << 13) | (h1 >> 19)) & 0xFFFFFFFF
    h1 = (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF
    h1 ^= 4  # total bytes hashed
    h1 ^= h1 >> 16
    h1 = h1 * 0x85EBCA6B & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = h1 * 0xC2B2AE35 & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


_SHARD_PREIMAGES: dict[int, list[int]] = {}

#: above this shard count the preimage array literal would bloat the plan;
#: fall back to the plain shard key (per-partition loads are small there).
_BALANCED_KEY_MAX_SHARDS = 4096


def _balanced_shard_key(shard_e: F.Column, num_shards: int) -> F.Column:
    """Partition-key expression that lands each shard on its OWN partition
    of a ``num_shards``-way HashPartitioning.

    ``repartition(n, shard)`` hashes the shard VALUE — with only n distinct
    values the hash collides badly (guide §2.5 "too few distinct keys":
    measured 18 of 32 partitions non-empty, one task owning 3 shards, a
    straggler tail that cost ~20% of the 4N-level build).  Mapping shard s
    to a precomputed murmur3 PREIMAGE of partition s makes the assignment a
    bijection; the mapping is pure integer arithmetic, deterministic, and
    cached per shard count."""
    if num_shards <= 1 or num_shards > _BALANCED_KEY_MAX_SHARDS:
        return shard_e
    pre = _SHARD_PREIMAGES.get(num_shards)
    if pre is None:
        need: dict[int, int] = {}
        x = 0
        while len(need) < num_shards:
            need.setdefault(_murmur3_int(x) % num_shards, x)
            x += 1
        pre = [need[i] for i in range(num_shards)]
        _SHARD_PREIMAGES[num_shards] = pre
    return F.element_at(
        F.array(*[F.lit(int(v)) for v in pre]), shard_e.cast("int") + 1
    )


def _dict_write_parts(spark: SparkSession, spec: IndexSpec) -> int:
    """Partition count for the dict / ngram segment writes: one file per ~4
    shards at scale (bounds file counts), FLOORED at the session parallelism
    (capped at 8) so a low-shard-count index never funnels its vocabulary
    sort+write through one task (r6b: the single-shard bench index spent
    ~2 s in 1-task dict/ngram writes; gram/term row-group pruning works
    per file, so a handful of files costs queries nothing)."""
    floor = min(8, spark.sparkContext.defaultParallelism)
    return max(1, spec.num_shards // 4, floor)


def _write_postings(
    postings: DataFrame,
    postings_path: str,
    spec: IndexSpec,
    mode: str = "append",
) -> None:
    """"Segment merge": re-shuffle the already-COMPRESSED posting rows so each
    shard lands in one term-sorted file — the analogue of the reference's
    optimize(maxSegments) at close (core/SolrWriter.java:112,
    hadoop/SolrOutputFormat.java:35).  Cheap: rows are compact binaries, so
    the exchange moves little data; on the append path it buys one segment
    file per shard per batch (measured faster than the 32-task × 32-dir
    dynamic-partition fan-out it avoids).  Term-sorted files maximize parquet
    row-group min/max pruning for the query-side term IN (...) filter.  The
    leading "shard" sort key satisfies FileFormatWriter's required ordering
    (else it inserts its own non-stable sort by the partition column,
    destroying the term ordering)."""
    postings = postings.repartition(
        spec.num_shards, _balanced_shard_key(F.col("shard"), spec.num_shards)
    )
    (
        postings.sortWithinPartitions("shard", "term", "salt")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(postings_path)
    )


def term_ngram_rows(terms: DataFrame) -> DataFrame:
    """(gram, term) rows: DISTINCT padded character bigrams of '^'+term+'$'
    per CONTENT term — the spellcheck candidate index (the classic n-gram
    upgrade over a full-dictionary edit-distance scan; Solr's equivalent
    structure is the spellcheck component's n-gram field).

    Why padded bigrams: a term within edit distance d of query q shares at
    least ``(len(q)+1) - 2d - dup(q)`` distinct grams with q (each edit
    destroys at most 2 bigrams of the padded string; dup(q) = q's duplicate
    gram count), so filtering candidates by shared-gram count with that
    threshold NEVER drops a true suggestion — suggest_terms falls back to
    the full scan when the threshold would be < 1 (very short queries)."""
    padded = F.concat(F.lit("^"), F.col("term"), F.lit("$"))
    grams = F.array_distinct(
        F.expr(
            "transform(sequence(1, length(_padded) - 1),"
            " i -> substring(_padded, i, 2))"
        )
    )
    return (
        terms.filter(~F.col("term").contains(KW_SEP))
        .withColumn("_padded", padded)
        .select(F.explode(grams).alias("gram"), "term")
    )


def _write_lineage(
    spark: SparkSession, postings_path: str, lineage_path: str, shards: list[int]
) -> None:
    built = spark.read.parquet(postings_path).filter(F.col("shard").isin(shards))
    lineage = built.groupBy("shard").agg(
        F.count("*").alias("terms"),
        F.sum("n_docs").alias("postings"),
        F.sum("n_bytes").alias("bytes"),
        (F.max("n_docs") / F.avg("n_docs")).alias("skew_ratio"),
        F.lit("committed").alias("status"),
        # segment tag: after appends a shard has MULTIPLE lineage rows whose
        # stats (skew_ratio especially) are per-segment, not per-shard —
        # consumers aggregate explicitly by filtering/grouping on this tag
        # instead of misreading mixed build+append rows as per-shard truth
        F.lit("build").alias("segment"),
    )
    lineage.write.mode("append").parquet(lineage_path)


def write_meta(out_dir: str, meta: dict) -> None:
    """Atomic meta.json replace (write tmp + os.replace)."""
    tmp = os.path.join(out_dir, "meta.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(out_dir, "meta.json"))


def _spec_meta(spec: IndexSpec) -> dict:
    return {
        k: (list(v) if isinstance(v, tuple) else v) for k, v in spec.__dict__.items()
    }


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

    # meta.json (written BEFORE the postings job, with the final stats + hot
    # set) is the source of truth for resume: without it, salting decisions
    # could not be reproduced, so any partial state is wiped.
    committed: set[int] = set()
    if not resume or not os.path.exists(meta_path):
        # clean slate: a rebuild into an existing dir must never append onto
        # stale postings (df inflation flips idf negative) — drop everything,
        # including compaction generation dirs (postings.genN / dict.genN).
        for name in os.listdir(out_dir):
            if name.split(".gen")[0] in (
                "postings", "lineage", "dict", "dict_ngrams", "docs"
            ):
                shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
        if os.path.exists(meta_path):
            os.remove(meta_path)
    else:
        if os.path.exists(lineage_path):
            committed = {
                r["shard"]
                for r in spark.read.parquet(lineage_path)
                .filter(F.col("status") == "committed")
                .select("shard")
                .collect()
            }
        # reconcile: a crash after a postings task commit but before the
        # lineage write leaves a partial uncommitted shard dir — appending
        # onto it would duplicate rows, so drop it first.
        for s in range(spec.num_shards):
            if s not in committed:
                shutil.rmtree(
                    os.path.join(postings_path, f"shard={s}"), ignore_errors=True
                )
    missing = [s for s in range(spec.num_shards) if s not in committed]

    have_meta = os.path.exists(meta_path)
    have_docs = have_meta and os.path.exists(os.path.join(docs_path, "_SUCCESS"))

    # ---- doc ids: dense deterministic rank (or a caller-provided id) ----
    from cascading_solr_spark.operators.textstats import spread_partitions

    ids_handle: DataFrame | None = None
    n_docs: int | None = None
    if spec.doc_id_field:
        # guide §2.5 input skew (r6b): a small single-file source scans as
        # 1-2 partitions, pinning the WHOLE build — SPIMI tokenize, sha256,
        # keyword/text-field legs — to 1-2 cores (the key_fields path gets
        # its spread for free from the rank join's exchange).  No-op on a
        # properly partitioned source.
        based = spread_partitions(source).withColumn(
            "doc_id", F.col(spec.doc_id_field).cast("long")
        )
        check_doc_id_range(based.select("doc_id"))
    else:
        ids_handle, n_docs = _rank_ids(source, spec.key_fields)
        based = source.join(ids_handle.hint("shuffle_hash"), list(spec.key_fields))
    prof.mark("doc_ids")

    meta: dict = {}
    hot_terms: list[str] = []
    avgdl = 0.0
    total_tokens = 0
    field_tokens: dict = {f: 0 for f in spec.text_fields}
    if have_meta:
        with open(meta_path) as fh:
            meta = json.load(fh)
        n_docs = meta["n_docs"]
        avgdl = meta["avgdl"]
        total_tokens = meta.get("total_tokens", 0)
        field_tokens = dict(meta.get("field_tokens", field_tokens))
        hot_terms = list(meta.get("hot_terms", ()))
    elif n_docs is None:
        # doc_id_field path: parquet sources answer count() from footers
        n_docs = source.count()

    if not n_docs:
        # 0-doc corpus -> a valid EMPTY index (the Solr empty-core
        # analogue): meta only.  The postings/docs/dict dirs are created by
        # the first append; Index serves schema-correct empty frames until
        # then, so every query/facet/spellcheck path works on the empty
        # index unchanged (tests/test_round4.py).
        docs_schema = based.select(
            "doc_id",
            *[c for c in spec.stored_fields],
            F.sha2(F.col(spec.content_field), 256).alias("sha256"),
            F.pmod(F.col("doc_id"), F.lit(spec.num_shards))
            .cast("int")
            .alias("shard"),
        ).schema
        write_meta(
            out_dir,
            {
                "spec": _spec_meta(spec),
                "n_docs": 0,
                "avgdl": 0.0,
                "total_tokens": 0,
                "field_tokens": {f: 0 for f in spec.text_fields},
                "next_doc_id": 0,
                "hot_terms": [],
                "postings_dirname": "postings",
                "dict_dirname": "dict",
                "ngrams_dirname": "dict_ngrams",
                "docs_schema": json.dumps(docs_schema.jsonValue()),
            },
        )
        if ids_handle is not None:
            ids_handle.unpersist()
        return Index.load(out_dir)

    pool = ThreadPoolExecutor(max_workers=3)
    term_stats: DataFrame | None = None
    try:
        # ---- docs table write (concurrent: JVM-side sha256+parquet overlaps
        # the python-worker sample/tokenize stages) ----
        def write_docs() -> None:
            docs = based.select(
                "doc_id",
                *[c for c in spec.stored_fields],
                F.sha2(F.col(spec.content_field), 256).alias("sha256"),
                F.pmod(F.col("doc_id"), F.lit(spec.num_shards))
                .cast("int")
                .alias("shard"),
            )
            (
                docs.repartition(spec.num_shards, "shard")
                .sortWithinPartitions("shard", "doc_id")
                .write.mode("overwrite")
                .partitionBy("shard")
                .parquet(docs_path)
            )

        serial_docs = os.environ.get("CSS_BUILD_SERIAL_DOCS") == "1"
        docs_future = None
        if not have_docs:
            if serial_docs:
                write_docs()
            else:
                docs_future = pool.submit(write_docs)

        # ---- hot-term detection on a HEAD SAMPLE (exact when the corpus
        # fits in hot_sample_docs — every test corpus does).  The hot SET
        # only steers shuffle salting, so an estimate suffices, and it avoids
        # a full (term, doc) stats pass at 10^12-file scale.  For a
        # file-backed source the head FILES are read directly (a parallel
        # pruned scan); a GlobalLimit would funnel the head through ONE task
        # — measured 35 s serial at 600k files, a pure serial component that
        # sank scaling efficiency.  The resulting set persists in meta.json
        # so resumes/appends/compactions salt identically even if the head
        # is not representative. ----
        if missing and not have_meta and spec.hot_term_df_ratio >= 1.0:
            # provably-empty hot set: df never exceeds n_sample, so a
            # threshold of ratio*n_sample >= n_sample cannot be crossed —
            # the whole sample tokenize pass would only confirm [] (r6b;
            # ratio >= 1 is the documented "salting off" configuration,
            # e.g. the bench's single-shard trace index)
            prof.mark("hot_detect")
        elif missing and not have_meta:
            frac = min(1.0, spec.hot_sample_docs / max(1, n_docs))
            sampled = source
            n_sample = n_docs
            if frac < 1.0:
                sampled = None
                # head FILES are only representative when the source plan is a
                # bare scan (a filter/projection between files and rows would
                # be bypassed by a raw read), and only a parquet read of them
                # can succeed — any failure falls back to the limit() path.
                try:
                    files = (
                        sorted(source.inputFiles())
                        if _is_plain_scan(source)
                        else []
                    )
                    if files and len(files) > 1:
                        k_files = min(len(files), int(frac * len(files)) + 1)
                        head = spark.read.parquet(*files[:k_files])
                        need = {
                            spec.content_field,
                            *spec.keyword_fields,
                            *spec.text_fields,
                        }
                        if need.issubset(set(head.columns)):
                            n_sample = head.count()  # parquet-footer served
                            sampled = head
                except Exception:
                    sampled = None
                if sampled is None and spec.doc_id_field:
                    # deterministic parallel sample on the caller's doc id
                    # (r6b): every k-th id — a scan-parallel pushed-down
                    # filter, where the GlobalLimit fallback below funnels
                    # the head through ONE task (the round-2 serial-funnel
                    # cost, re-measured on the single-file documents source).
                    # The hot set is an ESTIMATE by contract, so a different
                    # (better-spread) sample is as valid as the head.
                    k_mod = max(2, int(round(1.0 / frac)))
                    cand = source.filter(
                        F.pmod(
                            F.col(spec.doc_id_field).cast("long"),
                            F.lit(k_mod),
                        )
                        == 0
                    )
                    n_sample = cand.select(spec.doc_id_field).count()
                    if n_sample:
                        sampled = cand
                if sampled is None:
                    # non-file source: GlobalLimit funnels rows through ONE
                    # task — respread so the tokenize runs parallel
                    n_sample = spec.hot_sample_docs
                    sampled = source.limit(spec.hot_sample_docs).repartition(
                        spark.sparkContext.defaultParallelism
                    )
            # the sample tokenize pass needs the same input spread as the
            # main pass (a full-corpus or head-files sample inherits the
            # source's 1-2 scan partitions otherwise)
            sampled = spread_partitions(sampled).select(
                F.monotonically_increasing_id().alias("doc_id"),
                F.col(spec.content_field),
                *[F.col(f) for f in spec.keyword_fields],
                *[F.col(f) for f in spec.text_fields],
            )
            # df-estimation only — positions add nothing here, so the sample
            # pass always runs the cheaper positionless kernel
            sample_tf = sampled.select("doc_id", spec.content_field).mapInPandas(
                _spimi_tf_kernel(spec.content_field), TF_SCHEMA
            )
            kw_sample = _keyword_tf_rows(sampled, spec)
            if kw_sample is not None:
                sample_tf = sample_tf.unionByName(
                    kw_sample.select("packed", "term", "tf")
                )
            tf_sample = _text_field_tf_rows(sampled, spec, positions=False)
            if tf_sample is not None:
                sample_tf = sample_tf.unionByName(tf_sample)
            hot_threshold = max(2.0, spec.hot_term_df_ratio * n_sample)
            hot_terms = sorted(
                r["term"]
                for r in sample_tf.groupBy("term")
                .agg(F.count("*").alias("df"))
                .filter(F.col("df") > hot_threshold)
                .select("term")
                .collect()
            )
            prof.mark("hot_detect")

        # ---- meta v1 (BEFORE the postings job, so a crash mid-postings
        # resumes with identical salting decisions; avgdl/total_tokens are
        # patched from the read-back below) ----
        if not have_meta:
            meta = {
                "spec": _spec_meta(spec),
                "n_docs": n_docs,
                "avgdl": avgdl,
                "total_tokens": total_tokens,
                "next_doc_id": n_docs,
                "hot_terms": hot_terms,
                "postings_dirname": "postings",
                "dict_dirname": "dict",
                "ngrams_dirname": "dict_ngrams",
            }
            write_meta(out_dir, meta)

        # ---- postings: ONE streaming pass.  SPIMI tokenize -> salted
        # repartition-and-sort -> assembler -> shard files.  Nothing is
        # cached; the only big intermediate crosses the wire exactly once.
        if missing:
            src = based
            if len(missing) < spec.num_shards:
                # resume: shard = doc_id % num_shards is known pre-tokenize
                src = based.filter(
                    F.pmod(F.col("doc_id"), F.lit(spec.num_shards)).isin(missing)
                )
            tf_long = src.select("doc_id", spec.content_field).mapInPandas(
                _spimi_tf_kernel(spec.content_field, spec.positions),
                tf_schema(spec),
            )
            kw_rows = _keyword_tf_rows(src, spec)
            if kw_rows is not None:
                tf_long = tf_long.unionByName(kw_rows)
            tfield_rows = _text_field_tf_rows(src, spec, spec.positions)
            if tfield_rows is not None:
                tf_long = tf_long.unionByName(tfield_rows)
            shuffle_parts = int(
                spark.conf.get("spark.sql.shuffle.partitions", "32") or "32"
            )
            n_parts = max(spec.num_shards, shuffle_parts)
            # the assembler needs term CLUSTERING + ascending doc_id, not
            # alphabetic order — sorting by the term's 64-bit hash replaces
            # tens of millions of string comparisons with long comparisons.
            # (A hash collision merely splits a posting list into two rows;
            # the query kernels merge multi-row terms anyway.)  Alphabetic
            # file order is restored by the segment-merge write.  Shard and
            # salt ride the plan as EXPRESSIONS over (packed, term): the
            # shuffled rows stay three narrow fields.
            shard_e, salt_e = _shard_salt_exprs(hot_terms, spec)
            salt_keys = [salt_e] if salt_e is not None else []
            if spec.num_shards >= n_parts:
                # shard count >= sort width: keying the ONE exchange by shard
                # alone already gives every output partition exactly one
                # shard with full (term, salt) clustering, so the segment-
                # merge re-shuffle of the compressed rows is provably
                # redundant — write straight through (the append path's
                # single-exchange shape; guide §2.4).  Salting still spreads
                # hot terms WITHIN the sort, and at scale num_shards >>
                # cores keeps this the common case.
                arranged = tf_long.repartition(
                    spec.num_shards, _balanced_shard_key(shard_e, spec.num_shards)
                ).sortWithinPartitions(
                    shard_e, F.xxhash64("term"), *salt_keys, F.col("packed")
                )
                postings = arranged.mapInPandas(
                    _assembler(spec, hot_terms), schema=postings_schema(spec)
                )
                (
                    postings.sortWithinPartitions("shard", "term", "salt")
                    .write.mode("append")
                    .partitionBy("shard")
                    .parquet(postings_path)
                )
            else:
                # fewer shards than the session's sort width: sort wide on
                # (shard, term, salt) for parallelism, then let the segment
                # merge gather each shard's compressed rows into one
                # term-sorted file (the round-2 scaling shape)
                arranged = tf_long.repartition(
                    n_parts, shard_e, F.col("term"), *salt_keys
                ).sortWithinPartitions(
                    shard_e, F.xxhash64("term"), *salt_keys, F.col("packed")
                )
                postings = arranged.mapInPandas(
                    _assembler(spec, hot_terms), schema=postings_schema(spec)
                )
                _write_postings(postings, postings_path, spec, mode="append")
            prof.mark("postings_write")

            # ---- read-back over the COMPRESSED rows (tiny, column-pruned):
            # lineage checkpoint ∥ dict (global df) + corpus stats (Σtf).
            # The dict read covers ALL shards, so resumed/partial builds get
            # the same global table as fresh ones. ----
            lineage_future = pool.submit(
                _write_lineage, spark, postings_path, lineage_path, missing
            )
            term_stats = (
                spark.read.parquet(postings_path)
                .groupBy("term")
                .agg(F.sum("n_docs").alias("df"), F.sum("sum_tf").alias("ttf"))
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            # corpus token stats ride the dict write as an Observation
            # (accumulator-side aggregate over the written rows — the
            # append path's shape): no separate total_tokens / field_tokens
            # jobs over the cached stats (r6b)
            from pyspark.sql import Observation

            obs = Observation("build_tokens")
            observed = term_stats.observe(
                obs,
                F.sum(
                    F.when(~F.col("term").contains(KW_SEP), F.col("ttf"))
                ).alias("content_tokens"),
                *[
                    F.sum(
                        F.when(
                            F.col("term").startswith(f + KW_SEP), F.col("ttf")
                        )
                    ).alias(f"ftok_{i}")
                    for i, f in enumerate(spec.text_fields)
                ],
            )
            (
                observed.select("term", "df")
                .repartition(_dict_write_parts(spark, spec), "term")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .parquet(os.path.join(out_dir, "dict"))
            )
            # spellcheck candidate index, derived from the SAME cached vocab
            # (vocab-sized, never corpus-sized); gram-sorted files so the
            # query-side gram IN (...) filter row-group-prunes
            ngram_future = pool.submit(
                lambda: term_ngram_rows(term_stats.select("term"))
                .repartition(_dict_write_parts(spark, spec), "gram")
                .sortWithinPartitions("gram")
                .write.mode("overwrite")
                .parquet(os.path.join(out_dir, "dict_ngrams"))
            )
            # total CONTENT tokens (keyword rows are namespaced with ':') and
            # per-extra-text-field token totals (per-field avgdl = total /
            # n_docs: absent fields count as length 0, exact for dense
            # fields — documented deviation from Lucene's docCount(field)
            # denominator for sparse ones) — both read from the dict write's
            # Observation, zero extra jobs
            metrics = obs.get
            total_tokens = int(metrics["content_tokens"] or 0)
            avgdl = total_tokens / n_docs if n_docs else 0.0
            field_tokens = {
                f: int(metrics[f"ftok_{i}"] or 0)
                for i, f in enumerate(spec.text_fields)
            }
            lineage_future.result()
            ngram_future.result()
            # meta v2: final corpus stats (also self-heals a resumed build
            # whose v1 meta carried zeros)
            meta["total_tokens"] = total_tokens
            meta["avgdl"] = avgdl
            meta["field_tokens"] = field_tokens
            write_meta(out_dir, meta)
            prof.mark("lineage+dict")

        if docs_future is not None:
            docs_future.result()
        prof.mark("docs_join")
    finally:
        pool.shutdown(wait=True)
        for cached in (term_stats, ids_handle):
            if cached is not None:
                cached.unpersist()

    return Index(
        path=out_dir,
        spec=spec,
        n_docs=n_docs,
        avgdl=avgdl,
        total_tokens=total_tokens,
        hot_terms=tuple(hot_terms),
        field_tokens=field_tokens,
    )
