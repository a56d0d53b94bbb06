from deepie_spark.functions import textnorm as tn
from deepie_spark.sources.synth import gen_corpus


def test_extract_text_basic():
    html = b"<html><head><title>t</title><style>p{}</style></head><body><p>Hello <b>world</b></p><p>Bye</p><!-- c --></body></html>"
    assert tn.extract_text_py(html) == "t Hello world Bye"


def test_extract_text_entities_nbsp_preserved():
    html = "<p>a&nbsp;b &amp; c</p>".encode()
    assert tn.extract_text_py(html) == "a\xa0b & c"


def test_extract_text_none_and_bad_utf8():
    assert tn.extract_text_py(None) == ""
    assert "�" in tn.extract_text_py(b"<p>\xff\xfe</p>")


def test_clean_text_reference_chars():
    # data_loader_v2.py:185-186 semantics
    assert tn.clean_text_py("a®b◆c") == "abc"


def test_strip_nbsp_and_digit_norm():
    assert tn.strip_nbsp_py("a\xa0b") == "ab"
    assert tn.digit_norm_py("abc123x9") == "abc000x0"


def test_corpus_text_is_extractor_output():
    pages, _, _ = gen_corpus(80)
    for p in pages:
        assert p["text"] == tn.extract_text_py(p["html"])
        assert "\n" not in p["text"]


def test_column_exprs_match_python(spark):
    rows = [("a®b◆c\xa0d 12x",)]
    df = spark.createDataFrame(rows, "text string")
    out = df.select(
        tn.clean_text_col(df.text).alias("c"),
        tn.strip_nbsp_col(df.text).alias("n"),
        tn.digit_norm_col(df.text).alias("d"),
    ).first()
    t = rows[0][0]
    assert out["c"] == tn.clean_text_py(t)
    assert out["n"] == tn.strip_nbsp_py(t)
    assert out["d"] == tn.digit_norm_py(t)


def test_batched_udf_byte_identity(spark):
    """The input_hint per-row invariant: batched UDF == row oracle."""
    pages, _, _ = gen_corpus(60)
    df = spark.createDataFrame(
        [(p["url"], p["html"]) for p in pages], "url string, html binary"
    )
    got = {
        r["url"]: r["text"]
        for r in df.mapInPandas(
            tn.extract_text_batches, "url string, text string"
        ).collect()
    }
    for p in pages:
        assert got[p["url"]] == p["text"]
