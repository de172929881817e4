"""Local twin of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row count, column names, and an order-insensitive value hash."""

import hashlib
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if isinstance(v, float):
        return format(v, ".9g")
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _value_hash(rows, cols):
    cols_sorted = sorted(cols)
    lines = sorted(
        "\x1f".join(_norm_cell(r[c]) for c in cols_sorted) for r in rows
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    con.execute("SET TimeZone='UTC'")
    return con


ORACLES = entry_mod.oracle_sql()
CHECKED = sorted(ORACLES.keys())


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(spark, ddb, name):
    qfn = entry_mod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    srows = [r.asDict() for r in sdf.collect()]
    scols = list(sdf.columns)

    ddf = ddb.execute(ORACLES[name]).fetch_df()
    drows = ddf.to_dict("records")
    dcols = list(ddf.columns)

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"
    assert _value_hash(srows, scols) == _value_hash(drows, dcols), (
        f"{name}: value hash mismatch"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert {"doc_id", "quality_m", "fingerprint", "is_canonical"} <= set(df.columns)


def test_rows_only_crawl_queries(spark):
    qs = entry_mod.queries()
    tr = qs["crawl_trace"](spark, SF_DIR)
    assert tr.count() > 0
    spans = qs["crawl_documents_spans"](spark, SF_DIR)
    assert spans.where("kind = 'media'").count() > 0
    feats = qs["crawl_media_features"](spark, SF_DIR)
    # the driver canonicalizer sorts EVERY column in pandas — unhashable
    # cells (lists/arrays) crash it (the one red row in r01); emulate it.
    fpdf = feats.toPandas()
    fpdf.sort_values(list(fpdf.columns))
    assert len(fpdf) > 0
    seen = qs["crawl_seen_set"](spark, SF_DIR)
    assert seen.count() > 0
