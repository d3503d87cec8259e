"""Driver-contract smoke: entry() runs, queries()/oracle_sql() aligned,
and a sample of oracles verified against DuckDB at sf0.001 (the full
58-query check runs via tools/oracle_check.py at sf0.01)."""

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def test_queries_have_oracles():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    missing = set(os_) - set(qs)
    assert not missing, f"oracles without queries: {missing}"
    rows_only = set(qs) - set(os_)
    # r3: zero rows-only entries — sim_ivf_kmeans (unrolled-Lloyd SQL) and
    # pack_sequences (recursive-CTE greedy replay) both graduated to
    # hash-oracled; any new rows-only entry must be argued here explicitly
    assert rows_only == set()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"uuid", "url", "depth", "code"} <= set(df.columns)


@pytest.mark.parametrize(
    "name",
    ["x4_uuid", "o1_frontier_pop", "dedup_exact", "text_tokens",
     "sim_ivf_assign", "crawl_hostgraph", "crawl_prioritize"],
)
def test_oracle_sample(spark, name):
    from tools.oracle_check import normalize

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    sdf = entrymod.queries()[name](spark, SF)
    srows = [r.asDict() for r in sdf.collect()]
    ddf = con.sql(entrymod.oracle_sql()[name])
    drows = [dict(zip(ddf.columns, row)) for row in ddf.fetchall()]
    scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
    assert scols == dcols
    assert normalize(srows, scols) == normalize(drows, dcols)


def test_no_entry_is_an_expression_bomb(spark):
    """r3 VERDICT #8: a per-entry wall-clock tripwire so a future Catalyst
    expression bomb (r3: band_sketches cost 283 s at sf0.01, truncating the
    driver's correctness ledger) is caught by pytest instead of by a
    half-empty CORRECTNESS ledger. Analysis cost is sf-independent, so
    sf0.001 with a 150 s/entry budget catches the failure mode cheaply
    (the bomb class it guards against is ≥250 s; 150 s tolerates a 2-3×
    co-tenant slowdown of the ~30-45 s crawl E2E entry — r4: a concurrent
    Spark job pushed it to 93 s and tripped the old 75 s cap falsely).
    Every entry EXECUTES fully (noop sink — no collect, no row caps)."""
    import time

    slow = {}
    for name, fn in entrymod.queries().items():
        t0 = time.monotonic()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        if dt > 150.0:
            slow[name] = round(dt, 1)
    assert not slow, f"entries over the 150s sf0.001 budget: {slow}"
