"""The driver's correctness gate, inside pytest (north rule: verified
by ``python -m pytest -x -q``): run each oracle-paired query on Spark
and DuckDB at sf0.001 and compare rows/columns/value-multisets.

A fast representative subset runs here; the full 23-pair sweep is
``python scripts/check_oracles.py`` (also green at sf0.01).
"""

import duckdb
import pytest

import __spark_entry__ as em
from scripts.check_oracles import TABLES, df_multiset

SF = "/root/testdata/sf0.001"

SUBSET = [
    "clean_text", "mention_candidates", "vocab_ranked", "exact_dup_groups",
    "token_counts", "quality", "lang_id", "ann_topk", "micro_prf_sets",
    "per_source_detail", "salted_source_counts", "pricing_summary",
    "revenue_by_nation", "top_orders_per_customer", "event_sessions",
    "ner_spans", "doc_fingerprint", "simhash",
    "simhash_near_pairs",
    # fixture-backed (single-row python oracle materialized to parquet)
    "flagship_triples", "etl_stl_triples", "mentions_trie", "attributes",
    "minhash_fast", "encoder_grids", "neural_ner", "ann_pq",
    "near_dup_lsh_fast",
]


@pytest.fixture(scope="module", autouse=True)
def _fixture_sf():
    import os

    old = os.environ.get("DEEPIE_ORACLE_SF_DIR")
    os.environ["DEEPIE_ORACLE_SF_DIR"] = SF
    yield
    if old is None:
        os.environ.pop("DEEPIE_ORACLE_SF_DIR", None)
    else:
        os.environ["DEEPIE_ORACLE_SF_DIR"] = old


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_pair(spark, duck, name):
    sdf = em.queries()[name](spark, SF)
    srows = sdf.collect()
    res = duck.execute(em.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    sm = df_multiset(sdf.columns, [[r[c] for c in sdf.columns] for r in srows])
    dm = df_multiset(dcols, drows)
    assert sm == dm
