"""Mirror of the driver's correctness gate: run every __spark_entry__
queries()[name] at sf0.01 and compare row-count + schema + values against
oracle_sql()[name] via DuckDB (order-insensitive, exact after rounding)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


#: The driver's oracle check stops after this many entries — discovered in
#: round 4, where CORRECTNESS_r04 recorded precisely the first 50 of 54
#: queries() keys in dict order and SILENTLY dropped the rest
#: (ft_batch_search, ft_topk_per_lang, ev_sessionize, ix_lineage).  Keeping
#: the registry at or under the cap is the only way every entry gets its
#: per-round correctness signal; merge near-duplicates into tagged unions
#: rather than exceeding it.
DRIVER_ORACLE_CAP = 50


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_registry_fits_the_driver_cap():
    """FAIL LOUDLY if an added entry would silently fall out of the driver's
    per-round check (the round-4 regression this guards against)."""
    assert len(QUERIES) <= DRIVER_ORACLE_CAP, (
        f"queries() has {len(QUERIES)} entries but the driver only checks "
        f"the first {DRIVER_ORACLE_CAP}; these would be silently unchecked: "
        f"{list(QUERIES)[DRIVER_ORACLE_CAP:]} — merge entries instead"
    )


def test_checked_set_never_shrinks_vs_last_round():
    """Every current queries() key must appear in the most recent
    CORRECTNESS_r{N}.json (when one exists for this registry version) or be
    positioned within the driver cap so the NEXT round checks it."""
    import json
    import re

    repo = os.path.dirname(os.path.abspath(entrymod.__file__))
    rounds = sorted(
        (
            int(m.group(1)), os.path.join(repo, f)
        )
        for f in os.listdir(repo)
        for m in [re.match(r"CORRECTNESS_r(\d+)\.json$", f)]
        if m
    )
    assert rounds, "no CORRECTNESS files found"
    with open(rounds[-1][1]) as fh:
        checked = set(json.load(fh))
    within_cap = set(list(QUERIES)[:DRIVER_ORACLE_CAP])
    for name in QUERIES:
        assert name in checked or name in within_cap, (
            f"{name} is neither in the latest CORRECTNESS file nor within "
            f"the first {DRIVER_ORACLE_CAP} positions — it would never be "
            f"oracle-checked"
        )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    got = _normalize(QUERIES[name](spark, SF_DIR).toPandas())
    want = _normalize(duck.sql(ORACLES[name]).df())
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    assert list(got.columns) == list(want.columns), (
        f"{name}: cols {list(got.columns)} != {list(want.columns)}"
    )
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=0, atol=1e-12
    )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
