"""Scaling-efficiency study: the same index-build job at two parallelism
levels (local[8] vs local[32] — the sandbox proxy for N vs 4N executors,
BASELINE.json north_rule).

The job is IDENTICAL at both levels (same input parquet, num_shards=32,
shuffle partitions=32); only the core count changes.  Each level runs the
build twice in a fresh JVM: the first run includes JVM/codegen warmup (cold),
the second is steady-state; efficiency is reported for both.

Usage:  python bench_scaling.py            # full study -> BENCH/BASELINE.md
        python bench_scaling.py --inner 8  # one level (internal)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
CORPUS = os.environ.get("SCALING_CORPUS", "/tmp/css_scaling_corpus")
N_FILES = int(os.environ.get("SCALING_ROWS", "40000"))
NUM_SHARDS = 32
LEVELS = (8, 32)


def inner(cpus: int) -> None:
    sys.path.insert(0, HERE)
    from pyspark.sql import SparkSession

    from cascading_solr_spark.corpus import synth_corpus
    from cascading_solr_spark.indexing.build import build_index
    from cascading_solr_spark.spec import IndexSpec

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(NUM_SHARDS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        synth_corpus(spark, N_FILES, partitions=NUM_SHARDS).write.mode(
            "overwrite"
        ).parquet(CORPUS)
    corpus = spark.read.parquet(CORPUS)
    spec = IndexSpec(num_shards=NUM_SHARDS, salt_buckets=8)
    times = []
    for run in range(2):
        out = f"/tmp/css_scaling_ix_{cpus}"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        build_index(spark, corpus, spec, out)
        times.append(time.perf_counter() - t0)
        shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"cpus": cpus, "cold_sec": times[0], "steady_sec": times[1]}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--inner":
        inner(int(sys.argv[2]))
        return
    results = {}
    for cpus in LEVELS:
        out = subprocess.run(
            [sys.executable, __file__, "--inner", str(cpus)],
            capture_output=True, text=True, cwd=HERE, timeout=3600,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(line)
    n, four_n = LEVELS
    thr = {c: N_FILES / results[c]["steady_sec"] for c in LEVELS}
    thr_cold = {c: N_FILES / results[c]["cold_sec"] for c in LEVELS}
    eff = thr[four_n] / (thr[n] * (four_n / n))
    eff_cold = thr_cold[four_n] / (thr_cold[n] * (four_n / n))
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(
            f"""# BENCH/BASELINE — measured engine numbers

## Index-build scaling (N vs 4N parallelism, north_rule criterion)

Same job, same input ({N_FILES} synthetic source files, input_hint schema),
num_shards={NUM_SHARDS}, shuffle partitions={NUM_SHARDS}; only cores change.
Sandbox proxy for N->4N executors: local[{n}] -> local[{four_n}]
(single host, so shuffle I/O shares one disk — a real 4N-executor cluster
adds network shuffle but also 4x the disk spindles).

| level | cold build (s) | steady build (s) | steady throughput (files/s) |
|---|---|---|---|
| local[{n}]  (N)  | {results[n]['cold_sec']:.1f} | {results[n]['steady_sec']:.1f} | {thr[n]:.1f} |
| local[{four_n}] (4N) | {results[four_n]['cold_sec']:.1f} | {results[four_n]['steady_sec']:.1f} | {thr[four_n]:.1f} |

**Scaling efficiency (steady-state): {eff:.3f}**  (target >= 0.8)
Scaling efficiency (cold, incl. JVM warmup): {eff_cold:.3f}

efficiency = throughput(4N) / (4 x throughput(N)).

## Reference comparison

The reference (cascading.solr) publishes no benchmark numbers (BASELINE.md);
its qualitative claims (local-disk build, shard-per-reducer parallelism,
500-doc micro-batches, binary wire protocol) are re-expressed natively here
(task-local spill + parquet task commit, shard-per-partition, Arrow batches).

## Headline suite

`python bench.py` prints the per-query timings consumed by the driver
(BENCH_r{{N}}.json); see the committed output in README/PROGRESS notes.
"""
        )
    print(f"efficiency steady={eff:.3f} cold={eff_cold:.3f}")


if __name__ == "__main__":
    main()
