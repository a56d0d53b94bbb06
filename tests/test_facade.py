"""Top-level API facade: every exported symbol resolves lazily."""

import pytest


def test_every_export_resolves():
    import deepie_spark as ds

    for name in ds._EXPORTS:
        obj = getattr(ds, name)
        assert callable(obj) or isinstance(obj, type), name


def test_unknown_attribute_raises():
    import deepie_spark as ds

    with pytest.raises(AttributeError):
        ds.definitely_not_a_symbol
    assert "KgPipeline" in dir(ds)
