"""Generate an sf1.0-SHAPED measurement dataset (documents + embeddings).

The driver's round-end bench runs at a driver-generated sf1.0
(BENCH_r05.json: 50,000 documents rows, 20,000 embedding vectors) that is
not present on disk between rounds.  This script synthesizes a dataset with
the same SHAPE — row counts, vocabulary, doc-length distribution, lang/source
marginals, embedding cluster structure — by fitting the marginals of the
committed /root/testdata/sf0.1 tables and scaling 10x.  Deterministic
(numpy seed).  For optimization-round measurement ONLY: correctness gates
keep running on the real sf0.01/sf0.001 tables.

Usage: python scripts/gen_sf1_like.py [out_dir]   (default /root/testdata_sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1"
N_DOCS = 50_000
N_EMB = 20_000


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata_sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    rng = np.random.default_rng(412)

    # ---- documents: fit word frequencies, length, lang/source marginals ----
    words, wcounts = zip(
        *con.execute(
            f"""select w, count(*) c from (select unnest(string_split(text,' ')) w
            from read_parquet('{SRC}/documents.parquet')) group by 1 order by 1"""
        ).fetchall()
    )
    wprob = np.asarray(wcounts, float)
    wprob /= wprob.sum()
    lens = np.asarray(
        [
            r[0]
            for r in con.execute(
                f"select len(string_split(text,' ')) from read_parquet('{SRC}/documents.parquet')"
            ).fetchall()
        ]
    )
    langs, lcounts = zip(
        *con.execute(
            f"select lang, count(*) from read_parquet('{SRC}/documents.parquet') group by 1 order by 1"
        ).fetchall()
    )
    lprob = np.asarray(lcounts, float)
    lprob /= lprob.sum()

    doc_lens = rng.choice(lens, size=N_DOCS, replace=True)
    word_idx = rng.choice(len(words), size=int(doc_lens.sum()), p=wprob)
    texts = []
    off = 0
    warr = np.asarray(words, dtype=object)
    for L in doc_lens:
        texts.append(" ".join(warr[word_idx[off : off + L]]))
        off += L
    # a slice of exact duplicates, like the source's dup groups (~0.2%)
    n_dup = N_DOCS // 500
    dup_to = rng.integers(0, N_DOCS, size=n_dup)
    dup_at = rng.integers(0, N_DOCS, size=n_dup)
    for a, b in zip(dup_at, dup_to):
        texts[a] = texts[b]
    lang_col = rng.choice(langs, size=N_DOCS, p=lprob)
    src_col = [f"src{i}" for i in rng.integers(0, 20, size=N_DOCS)]
    import pandas as pd

    docs_py = pd.DataFrame(
        {
            "doc_id": np.arange(N_DOCS, dtype=np.int64),
            "text": texts,
            "lang": lang_col,
            "source": src_col,
            "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64),
        }
    )
    con.register("docs_py", docs_py)
    con.execute(
        f"copy (select * from docs_py) to '{out}/documents.parquet' (format parquet)"
    )

    # ---- embeddings: per-label mean + residual std from the source ----
    emb_rows = con.execute(
        f"select label, embedding from read_parquet('{SRC}/embeddings.parquet')"
    ).fetchall()
    labels_src = np.asarray([r[0] for r in emb_rows])
    mat = np.asarray([r[1] for r in emb_rows], dtype=np.float64)
    lab_vals = np.unique(labels_src)
    means = {v: mat[labels_src == v].mean(axis=0) for v in lab_vals}
    stds = {v: mat[labels_src == v].std(axis=0) for v in lab_vals}
    lab_p = np.asarray([(labels_src == v).mean() for v in lab_vals])
    lab_col = rng.choice(lab_vals, size=N_EMB, p=lab_p)
    vecs = np.empty((N_EMB, mat.shape[1]), dtype=np.float32)
    for v in lab_vals:
        m = lab_col == v
        vecs[m] = (
            means[v][None, :] + rng.standard_normal((m.sum(), mat.shape[1])) * stds[v][None, :]
        ).astype(np.float32)
    emb_py = pd.DataFrame(
        {
            "vec_id": np.arange(N_EMB, dtype=np.int64),
            "embedding": [v for v in vecs],
            "label": lab_col.astype(np.int32),
        }
    )
    con.register("emb_py", emb_py)
    con.execute(
        f"copy (select vec_id, embedding, label from emb_py) to '{out}/embeddings.parquet' (format parquet)"
    )
    print(f"wrote {out}: {N_DOCS} docs, {N_EMB} embeddings")


if __name__ == "__main__":
    main()
