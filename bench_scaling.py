"""Scaling-efficiency study: the same index-build job at two parallelism
levels (sandbox proxy for N vs 4N executors, BASELINE.json north_rule).

Protocol (designed for a noisy shared VM):
* levels interleaved (8, 2, 8, 2) so host drift cancels across levels;
* each sample is a FRESH JVM that first runs a small warm-up build (JIT +
  python-worker spin-up), then ONE measured build of the full corpus;
* the job is IDENTICAL at both levels (same input parquet, num_shards=32,
  shuffle partitions=32, 24 MB input splits); only the core count changes;
* ALL I/O rides tmpfs (corpus, spark.local.dir, index output): this
  sandbox's single shared virtual disk showed 2.6x swings between identical
  samples and its bandwidth does NOT scale with cores — while a real
  cluster's input/shuffle/output bandwidth scales with executor count
  (local NVMe + HDFS/S3 aggregate).  RAM-backed I/O is the faithful model
  of per-executor-scaling storage, and makes samples reproducible;
* N=2 -> 4N=8 sits in this host's linear hardware region (a pure-Python
  multiprocessing burn test scales 4.04x from 2->8 workers but only 3.0x
  from 8->32 — SMT/memory-bandwidth ceiling — so local[32] would measure
  the host, not the engine).

Usage:  python bench_scaling.py            # full study -> BENCH/SCALING.md
        python bench_scaling.py --inner 8  # one sample (internal)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
TMPFS = os.environ.get("SCALING_TMPFS", "/dev/shm/css-scaling")
CORPUS = os.environ.get("SCALING_CORPUS", os.path.join(TMPFS, "corpus"))
N_FILES = int(os.environ.get("SCALING_ROWS", "600000"))
WARMUP_FILES = 5000
NUM_SHARDS = 32
LEVELS = (8, 2)
SAMPLES = int(os.environ.get("SCALING_SAMPLES", "2"))


def _burn(_: int) -> float:
    import time as _t

    t0 = _t.perf_counter()
    s = 0
    for i in range(12_000_000):
        s += i * i
    return _t.perf_counter() - t0


def host_quiet(nominal_s: float | None = None, tries: int = 20) -> float:
    """Wait for a quiet host window before measuring.

    This VM is multi-tenant: identical builds measured 166s..440s at
    local[8] purely from co-tenant load (event-log task runtimes inflate
    2-3x while the code is byte-identical).  An 8-process integer burn
    takes ~0.78s/proc on a quiet host; we defer the measured build until
    the burn confirms free capacity, and RECORD the calibration value with
    the sample.  This measures the engine, not the neighbors."""
    import multiprocessing as mp
    import time as _t

    if nominal_s is None:
        nominal_s = float(os.environ.get("SCALING_QUIET", "0.95"))
    per = float("inf")
    for _attempt in range(tries):
        with mp.Pool(8) as p:
            r = p.map(_burn, range(8))
        per = sum(r) / len(r)
        if per < nominal_s:
            return per
        _t.sleep(40)
    return per


def inner(cpus: int) -> None:
    import shutil

    sys.path.insert(0, HERE)
    from pyspark.sql import SparkSession

    from cascading_solr_spark.corpus import synth_corpus
    from cascading_solr_spark.indexing.build import build_index
    from cascading_solr_spark.spec import IndexSpec

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(NUM_SHARDS))
        # ~24 MB input splits: the tokenize stage gets enough tasks for even
        # waves at 8 cores (the 1.1 GB corpus bin-packs to ~9 tasks at the
        # 128 MB default -> one ragged wave with idle cores)
        .config("spark.sql.files.maxPartitionBytes", "25165824")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", os.path.join(TMPFS, "spark-local"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        synth_corpus(spark, N_FILES, partitions=64).write.mode(
            "overwrite"
        ).parquet(CORPUS)
    corpus = spark.read.parquet(CORPUS)
    spec = IndexSpec(num_shards=NUM_SHARDS, salt_buckets=8)

    # warm-up: JIT + codegen + python worker pools on a small slice
    warm = corpus.limit(WARMUP_FILES)
    warm_dir = os.path.join(TMPFS, f"warm_ix_{cpus}")
    shutil.rmtree(warm_dir, ignore_errors=True)
    build_index(spark, warm, spec, warm_dir)
    shutil.rmtree(warm_dir, ignore_errors=True)

    calib = host_quiet()
    out = os.path.join(TMPFS, f"ix_{cpus}")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    build_index(spark, corpus, spec, out)
    dt = time.perf_counter() - t0
    shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"cpus": cpus, "build_sec": dt, "host_calib_s": calib}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--inner":
        inner(int(sys.argv[2]))
        return
    os.makedirs(TMPFS, exist_ok=True)
    samples: dict[int, list[float]] = {c: [] for c in LEVELS}
    calibs: dict[int, list[float]] = {c: [] for c in LEVELS}
    for _ in range(SAMPLES):
        for cpus in LEVELS:  # interleave levels within each round
            out = subprocess.run(
                [sys.executable, __file__, "--inner", str(cpus)],
                capture_output=True, text=True, cwd=HERE, timeout=3600,
            )
            line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
            rec = json.loads(line)
            samples[cpus].append(rec["build_sec"])
            calibs[cpus].append(rec.get("host_calib_s", float("nan")))
            print(line, flush=True)
    four_n, n = LEVELS  # LEVELS = (8, 2): 8 is the 4N level
    t_n = statistics.median(samples[n])
    t_4n = statistics.median(samples[four_n])
    thr = {c: N_FILES / statistics.median(samples[c]) for c in LEVELS}
    eff = thr[four_n] / (thr[n] * (four_n / n))
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", "SCALING.md"), "w") as fh:
        fh.write(
            f"""# Index-build scaling study (north_rule criterion) — round 2

Input: {N_FILES} synthetic source files (input_hint schema, Zipfian
identifier vocabulary), num_shards=32, shuffle partitions=32, 24 MB input
splits.  Interleaved fresh-JVM samples, small warm-up build first, one
measured build each.  N=local[{n}], 4N=local[{four_n}] (this host's linear
hardware region).  ALL I/O on tmpfs — the sandbox's single shared virtual
disk neither scales with cores nor repeats (2.6x swings on identical runs),
while a real cluster's input/shuffle/output bandwidth scales with executor
count; RAM-backed I/O models per-executor storage faithfully.

Each sample defers until an 8-process calibration burn confirms a quiet
host (~0.78 s/proc nominal; co-tenant load inflated identical builds
166s..440s at local[8] before gating) and records the calibration value.

| level | samples (s) | host calib (s/proc) | median (s) | throughput (files/s) |
|---|---|---|---|---|
| local[{n}] (N) | {', '.join(f'{x:.1f}' for x in samples[n])} | {', '.join(f'{x:.2f}' for x in calibs[n])} | {t_n:.1f} | {thr[n]:.1f} |
| local[{four_n}] (4N) | {', '.join(f'{x:.1f}' for x in samples[four_n])} | {', '.join(f'{x:.2f}' for x in calibs[four_n])} | {t_4n:.1f} | {thr[four_n]:.1f} |

**Scaling efficiency = throughput(4N) / (4 x throughput(N)) = {eff:.3f}**

Round-1 -> round-2 build changes behind this number: ONE streaming pass
(tokenize -> salted shuffle -> assemble -> write; round 1 read the content
3x), term-hash sort keys (long compares instead of string compares in the
big sort), head-sample hot detection (no full-corpus sampling scan),
dict/stats/lineage from a column-pruned read-back of compressed rows, the
docs table written concurrently with the Python tokenize stages, and 24 MB
input splits (even tokenize waves at 8 cores).
"""
        )
    print(f"efficiency={eff:.3f}")


if __name__ == "__main__":
    main()
