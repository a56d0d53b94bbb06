"""Robustness fuzzing: the extraction kernels must never crash on
arbitrary input text (crawl data is adversarial by nature)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from deepie_spark.functions.textnorm import clean_text_py, extract_text_py
from deepie_spark.operators.attributes import AttributeExtractor

_attr_ex = AttributeExtractor()


@settings(max_examples=120, deadline=None)
@given(st.text(max_size=300))
def test_extract_page_never_crashes(extractor_holder, s):
    ex = extractor_holder
    triples = ex.extract_page_py(s)
    for t in triples:
        assert t["subject"] and t["predicate"]
        assert "@value" in t["object"]
        # every extracted surface is a substring of the cleaned text
        # modulo the decode-time NBSP strip
        cleaned = clean_text_py(s).replace("\xa0", "")
        assert t["subject"] in cleaned


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=400))
def test_extract_text_never_crashes(b):
    out = extract_text_py(b)
    assert isinstance(out, str)
    assert "\n" not in out and "\t" not in out


@settings(max_examples=80, deadline=None)
@given(st.text(max_size=200))
def test_attribute_extractor_never_crashes(s):
    for a in _attr_ex.extract_record_py(s):
        assert s[a["val_start"]:a["val_end"]] == a["value"]


import pytest  # noqa: E402


@pytest.fixture(scope="module")
def extractor_holder(extractor):
    return extractor
