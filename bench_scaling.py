"""Scaling-efficiency study: the same index-build job at two parallelism
levels (sandbox proxy for N vs 4N executors, BASELINE.json north_rule).

Protocol (designed for a noisy shared VM):
* levels interleaved (8, 2, 8, 2) so host drift cancels across levels;
* each sample is a FRESH JVM that first runs a small warm-up build (JIT +
  python-worker spin-up), then ONE measured build of the full corpus;
* the job is IDENTICAL at both levels (same input parquet, num_shards=32,
  shuffle partitions=32); only the core count changes;
* N=2 -> 4N=8 sits in this host's linear hardware region (a pure-Python
  multiprocessing burn test scales 4.04x from 2->8 workers but only 3.0x
  from 8->32 — SMT/memory-bandwidth ceiling — so local[32] would measure
  the host, not the engine).

Usage:  python bench_scaling.py            # full study -> BENCH/BASELINE.md
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
CORPUS = os.environ.get("SCALING_CORPUS", "/tmp/css_scaling_corpus")
N_FILES = int(os.environ.get("SCALING_ROWS", "600000"))
WARMUP_FILES = 5000
NUM_SHARDS = 32
LEVELS = (8, 2)
SAMPLES = int(os.environ.get("SCALING_SAMPLES", "2"))


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
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # shuffle/spill on tmpfs: this sandbox's virtual disk has noisy
        # shared bandwidth (identical samples varied 119s..311s while a pure
        # CPU burn test was stable); a real cluster has local NVMe per
        # executor.  RAM-backed local dirs make samples reproducible.
        .config("spark.local.dir", os.environ.get("SCALING_LOCAL_DIR", "/dev/shm/css-spark"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        synth_corpus(spark, N_FILES, partitions=64).write.mode(
            "overwrite"
        ).parquet(CORPUS)
    corpus = spark.read.parquet(CORPUS)
    spec = IndexSpec(num_shards=NUM_SHARDS, salt_buckets=8)

    # page-cache pre-warm: the first-ever cold read of the corpus from this
    # VM's disk once added >250s to a sample; a throwaway full-content scan
    # makes every sample measure compute, not first-touch disk
    from pyspark.sql import functions as F

    corpus.agg(F.sum(F.length("content"))).collect()

    # warm-up: JIT + codegen + python worker pools on a small slice
    warm = corpus.limit(WARMUP_FILES)
    shutil.rmtree(f"/tmp/css_warm_ix_{cpus}", ignore_errors=True)
    build_index(spark, warm, spec, f"/tmp/css_warm_ix_{cpus}")
    shutil.rmtree(f"/tmp/css_warm_ix_{cpus}", ignore_errors=True)

    out = f"/tmp/css_scaling_ix_{cpus}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    build_index(spark, corpus, spec, out)
    dt = time.perf_counter() - t0
    shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"cpus": cpus, "build_sec": dt}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--inner":
        inner(int(sys.argv[2]))
        return
    samples: dict[int, list[float]] = {c: [] for c in LEVELS}
    for _ in range(SAMPLES):
        for cpus in LEVELS:  # interleave levels within each round
            out = subprocess.run(
                [sys.executable, __file__, "--inner", str(cpus)],
                capture_output=True, text=True, cwd=HERE, timeout=3600,
            )
            line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
            rec = json.loads(line)
            samples[cpus].append(rec["build_sec"])
            print(line, flush=True)
    four_n, n = LEVELS  # LEVELS = (8, 2): 8 is the 4N level
    t_n = statistics.median(samples[n])
    t_4n = statistics.median(samples[four_n])
    thr = {c: N_FILES / statistics.median(samples[c]) for c in LEVELS}
    eff = thr[four_n] / (thr[n] * (four_n / n))
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", "SCALING.md"), "w") as fh:
        fh.write(
            f"""# Index-build scaling study (north_rule criterion)

Input: {N_FILES} synthetic source files (input_hint schema), num_shards=32,
shuffle partitions=32.  Interleaved fresh-JVM samples, small warm-up build
first, one measured build each.  N=local[{n}], 4N=local[{four_n}] (this host's
linear hardware region; see BENCH/BASELINE.md for the 8->32 host-ceiling
discussion).

| level | samples (s) | median (s) | throughput (files/s) |
|---|---|---|---|
| local[{n}] (N) | {', '.join(f'{x:.1f}' for x in samples[n])} | {t_n:.1f} | {thr[n]:.1f} |
| local[{four_n}] (4N) | {', '.join(f'{x:.1f}' for x in samples[four_n])} | {t_4n:.1f} | {thr[four_n]:.1f} |

**Scaling efficiency = throughput(4N) / (4 x throughput(N)) = {eff:.3f}**
"""
        )
    print(f"efficiency={eff:.3f}")


if __name__ == "__main__":
    main()
