"""Corpus-curation CLI: language/quality/dedup stages wired over the
oracle-checked operators, with a consistent drop report."""

import json

import pytest


class _Args:
    def __init__(self, **kw):
        self.id_col = "doc_id"
        self.text_col = "text"
        self.langs = None
        self.min_quality = 0.0
        self.dedup = "none"
        self.verify_threshold = 0.8
        self.__dict__.update(kw)


@pytest.fixture(scope="module")
def docs_path(spark, tmp_path_factory):
    base = "the quick brown fox jumps over the lazy dog " * 8
    rows = [
        (1, base),                           # keeper of a dup cluster
        (2, base + "tail"),                  # near-dup of 1
        (3, base),                           # exact dup of 1
        (4, "le la les de et " * 30),        # french-ish
        (5, "@@@@ ##### !!!! ??? ::::"),     # junk -> low quality
        (6, "the data and the engine share work " * 12),
    ]
    p = tmp_path_factory.mktemp("cur") / "docs"
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(str(p))
    return str(p)


def test_curate_all_stages(spark, docs_path, tmp_path):
    from scripts.curate_corpus import curate

    out = str(tmp_path / "curated")
    report = curate(
        spark,
        _Args(input=docs_path, output=out, langs="en",
              min_quality=0.3, dedup="cluster"),
    )
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert report["n_in"] == 6 and report["n_out"] == len(kept)
    assert 4 not in kept        # language filter
    assert 5 not in kept        # quality filter
    assert kept & {1, 2, 3} == {1}  # dedup keeps the min-id doc
    assert 6 in kept
    assert report["dropped_lang_ok"] >= 1
    assert report["dropped_quality_ok"] >= 1
    assert report["dropped_dedup_ok"] >= 2


def test_curate_exact_only_and_report_consistency(spark, docs_path, tmp_path):
    from scripts.curate_corpus import curate

    out = str(tmp_path / "curated2")
    report = curate(spark, _Args(input=docs_path, output=out, dedup="exact"))
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {1, 2, 4, 5, 6}  # only the exact dup (3) dropped
    assert report["n_out"] == 5 and report["dropped_dedup_ok"] == 1


def test_curate_cli_main(spark, docs_path, tmp_path, capsys):
    """main() end-to-end (argparse -> getOrCreate reuses the session)."""
    from scripts.curate_corpus import main

    out = str(tmp_path / "curated3")
    rc = main(["--input", docs_path, "--output", out, "--dedup", "none"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["n_in"] == report["n_out"] == 6
    assert spark.read.parquet(out).count() == 6


def test_curate_user_columns_named_like_operator_outputs(spark, tmp_path):
    """A documents table that already carries columns named lang_pred /
    quality / keep must curate cleanly (operator outputs are aliased to
    reserved _curate_* names before joining) and pass the user columns
    through to the output untouched."""
    from scripts.curate_corpus import curate

    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 8, "x", 9.9, False),
        (2, "@@@@ ##### !!!! ??? ::::", "y", -1.0, True),
    ]
    src = tmp_path / "docs_collide"
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang_pred string, quality double, keep boolean"
    ).write.parquet(str(src))
    out = str(tmp_path / "curated_collide")
    report = curate(
        spark,
        _Args(input=str(src), output=out, langs="en",
              min_quality=0.3, dedup="exact"),
    )
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert report["n_in"] == 2 and set(got) == {1}
    # the user's like-named columns survive verbatim
    assert got[1]["lang_pred"] == "x"
    assert got[1]["quality"] == 9.9
    assert got[1]["keep"] is False


def test_curate_reserved_names_raise(spark, tmp_path):
    from scripts.curate_corpus import curate

    src = tmp_path / "docs_reserved"
    spark.createDataFrame(
        [(1, "text", True)], "doc_id bigint, text string, _keep boolean"
    ).write.parquet(str(src))
    with pytest.raises(ValueError, match="reserved"):
        curate(spark, _Args(input=str(src), output=str(tmp_path / "o")))
