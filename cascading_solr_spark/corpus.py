"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Input shape mandated by BASELINE.json input_hint:
``(repo:string, path:string, commit:string, lang:string, content:string)``.
Seeded, wall-clock-free, generated distributed (one Spark range -> mapInPandas
batch generation) so the bench corpus can be arbitrarily large without a
driver bottleneck.  Hot keywords (import/return/def/class/public/void) appear
at natural frequencies to create the skewed term distribution the salted
shuffle must handle.

Also provides the reference-test "products" fixture
(AbstractSolrSchemeTest.java:110-139 two handcrafted docs + the 100-row
volume fixture at :102-105) used for analyzer/query parity tests.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ["python", "java", "scala", "go", "javascript"]
EXT = {"python": "py", "java": "java", "scala": "scala", "go": "go", "javascript": "js"}

# seeded identifier vocabulary (camelCase + snake_case stems)
_STEMS = [
    "parse", "buffer", "stream", "index", "query", "shard", "merge", "token",
    "score", "fetch", "cache", "retry", "client", "server", "http", "json",
    "codec", "block", "batch", "write", "read", "split", "hash", "salt",
    "count", "limit", "offset", "field", "value", "table", "row", "column",
]
_HOT = {
    "python": ["import", "return", "def", "class", "self", "for", "if", "in"],
    "java": ["import", "return", "public", "void", "class", "static", "new", "final"],
    "scala": ["import", "return", "def", "class", "val", "var", "new", "object"],
    "go": ["import", "return", "func", "type", "struct", "var", "range", "nil"],
    "javascript": ["import", "return", "function", "const", "let", "var", "new", "async"],
}


_VOCAB_SIZE = 5000  # Zipfian identifier vocabulary (heavy tail, like real code)
_ZIPF_A = 1.35


def _ident(v: int) -> str:
    """Identifier #v: the 32 stems are the head of the distribution, the
    long tail derives numbered variants (buffer417, parse88, ...)."""
    s = _STEMS[v % len(_STEMS)]
    return s if v < len(_STEMS) else f"{s}{v}"


def _pick(rng: np.random.Generator, n: int) -> list[str]:
    """n identifiers with Zipf-distributed frequency: a few stopword-grade
    stems dominate (the salted-shuffle workload) while most identifiers are
    rare (selective high-idf terms — what real queries hit)."""
    vs = np.minimum(rng.zipf(_ZIPF_A, size=n) - 1, _VOCAB_SIZE - 1)
    return [_ident(int(v)) for v in vs]


def _gen_rows(start: int, stop: int) -> pd.DataFrame:
    rows = []
    for i in range(start, stop):
        rng = np.random.default_rng(42 + i)  # per-row seed: order-independent
        lang = LANGS[i % len(LANGS)]
        repo = f"org{i % 7}/proj{i % 23}"
        a, b_, c, d = _pick(rng, 4)
        name = f"{a}_{b_}"
        path = f"src/{c}/{name}.{i}.{EXT[lang]}"
        commit = hashlib.sha256(f"commit-{i}".encode()).hexdigest()[:12]
        n_funcs = int(rng.integers(2, 9))
        hot = _HOT[lang]
        lines = [f"{hot[0]} {c}.{d}"]
        for f_i in range(n_funcs):
            # camel/snake identifiers come from the BOUNDED stem set (their
            # catenated-whole tokens stay a small closed vocabulary); the
            # Zipf tail lives in standalone body tokens below
            s = [_STEMS[j] for j in rng.integers(0, len(_STEMS), size=5)]
            camel = s[0] + s[1].capitalize() + s[2].capitalize()
            snake = f"{s[3]}_{s[4]}"
            kw = hot[int(rng.integers(0, len(hot)))]
            lines.append(f"{hot[2]} {camel}({snake}, {s[1]}_count):")
            body_n = int(rng.integers(2, 40))
            for k in range(body_n):
                t = _pick(rng, 3)
                lines.append(
                    f"    {t[0]}_{t[1]} = {t[2]}{(k % 10)}.{s[k % 5]}() "
                    f"{kw} {hot[int(rng.integers(0, len(hot)))]}"
                )
            lines.append(f"    {hot[1]} {camel}Result")
        rows.append((repo, path, commit, lang, "\n".join(lines)))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def synth_corpus(spark: SparkSession, n_rows: int, partitions: int = 32) -> DataFrame:
    """Distributed deterministic corpus: same rows regardless of partitioning."""
    schema = "repo string, path string, commit string, lang string, content string"

    def gen(iterator):
        for pdf in iterator:
            ids = pdf["id"].to_numpy()
            if len(ids):
                yield _gen_rows(int(ids.min()), int(ids.max()) + 1)

    return (
        spark.range(0, n_rows, numPartitions=partitions)
        .mapInPandas(gen, schema=schema)
    )


def products_fixture(spark: SparkSession) -> DataFrame:
    """The reference's handcrafted two-doc fixture + semantics targets.

    Mirrors AbstractSolrSchemeTest.java:110-139: ("TurboWriter 2.3",
    cat=[wordprocessor, Japanese]) and ("Shasta 1.0", cat=[Chinese]).
    """
    data = [
        (1, "TurboWriter 2.3", 395.50, ["wordprocessor", "Japanese"], True,
         bytes([0, 1, 2, 3, 5])),
        (2, "Shasta 1.0", 95.00, ["Chinese"], False, bytes([0, 1, 2, 3, 5])),
    ]
    return spark.createDataFrame(
        data, "id int, name string, price double, cat array<string>, "
        "inStock boolean, image binary"
    )
