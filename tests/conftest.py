import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onionnet_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("ONIONNET_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MED = os.environ.get("ONIONNET_TEST_SF_DIR_MED", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("ONIONNET_SHUFFLE_PARTITIONS", "8")
    s = get_spark("onionnet-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def tpch_graph(spark, sf_dir):
    from onionnet_spark.sources.tpch_graph import build_graph

    return build_graph(spark, sf_dir).persist()


def rows_to_set(df, float_round=6):
    """DataFrame -> set of tuples with column order sorted by name."""
    cols = sorted(df.columns)
    out = set()
    for r in df.select(*cols).collect():
        t = tuple(
            round(v, float_round) if isinstance(v, float) else v for v in r
        )
        out.add(t)
    return out


def duck_to_set(sf_dir, sql, float_round=6):
    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = set()
    for row in res.fetchall():
        t = tuple(
            round(row[i], float_round) if isinstance(row[i], float) else row[i]
            for i in order
        )
        out.add(t)
    return out
