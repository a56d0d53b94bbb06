import pytest

from deepie_spark.operators import metrics as M

DDL = (
    "url string, subject string, predicate string, "
    "object map<string,string>"
)


@pytest.fixture()
def pg(spark):
    gold = spark.createDataFrame(
        [
            ("u1", "A", "founder", {"@value": "B"}),
            ("u1", "C", "award", {"@value": "X", "on_date": "1999"}),
            ("u2", "D", "ceo", {"@value": "E"}),
        ],
        DDL,
    )
    pred = spark.createDataFrame(
        [
            ("u1", "A", "founder", {"@value": "B"}),      # tp
            ("u1", "C", "award", {"on_date": "1999", "@value": "X"}),  # tp (map order)
            ("u2", "D", "ceo", {"@value": "WRONG"}),       # fp (fn for gold)
            ("u2", "Z", "star", {"@value": "Q"}),          # fp
        ],
        DDL,
    )
    return pred, gold


def test_triple_counts_map_order_insensitive(spark, pg):
    pred, gold = pg
    row = M.triple_counts(pred, gold).first()
    assert (row["tp"], row["fp"], row["fn"]) == (2, 2, 1)


def test_micro_prf_formulas(spark, pg):
    pred, gold = pg
    row = M.micro_prf(M.triple_counts(pred, gold)).first()
    assert abs(row["precision"] - 2 / 4) < 1e-6
    assert abs(row["recall"] - 2 / 3) < 1e-6
    assert abs(row["f1"] - (2 * 2 / (2 * 2 + 2 + 1))) < 1e-6


def test_per_predicate_detail(spark, pg):
    pred, gold = pg
    rows = {r["predicate"]: r for r in M.per_predicate_prf(pred, gold).collect()}
    assert rows["founder"]["tp"] == 1 and rows["founder"]["fp"] == 0
    assert rows["ceo"]["fp"] == 1 and rows["ceo"]["fn"] == 1
    assert rows["star"]["fp"] == 1 and rows["star"]["tp"] == 0


def test_dedup_before_scoring(spark):
    # duplicate predictions must count once (set semantics,
    # train.py:231-233)
    gold = spark.createDataFrame([("u1", "A", "p", {"@value": "B"})], DDL)
    pred = spark.createDataFrame(
        [("u1", "A", "p", {"@value": "B"})] * 3, DDL
    )
    row = M.triple_counts(pred, gold).first()
    assert (row["tp"], row["fp"], row["fn"]) == (1, 0, 0)


def test_entity_prf(spark, pg):
    pred, gold = pg
    row = M.entity_prf(pred, gold).first()
    # pred subjects: u1A u1C u2D u2Z ; gold: u1A u1C u2D
    assert abs(row["precision"] - 3 / 4) < 1e-6
    assert abs(row["recall"] - 1.0) < 1e-6


def test_badcases(spark, pg):
    pred, gold = pg
    kinds = [r["kind"] for r in M.badcases(pred, gold).collect()]
    assert kinds.count("fp") == 2 and kinds.count("fn") == 1
