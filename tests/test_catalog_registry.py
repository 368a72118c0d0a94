"""Catalog registry hygiene: duplicate query names must fail at
import time, not silently shadow an oracle-gated operator."""
from __future__ import annotations

import pytest


def test_duplicate_registration_raises():
    from syslog_ng_spark import catalog

    before = dict(catalog.QUERIES)
    with pytest.raises(ValueError, match="duplicate query registration"):

        @catalog.register("pii_redact")
        def shadow(spark, sf_dir):  # pragma: no cover
            raise AssertionError

    # the failed registration must not have mutated the catalog
    assert catalog.QUERIES == before


def test_catalog_reimport_is_consistent():
    import importlib

    from syslog_ng_spark import catalog

    n_q, n_o = len(catalog.QUERIES), len(catalog.ORACLES)
    again = importlib.import_module("syslog_ng_spark.catalog")
    assert again is catalog
    assert len(again.QUERIES) == n_q
    assert len(again.ORACLES) == n_o
    # every oracle belongs to a registered query
    assert set(catalog.ORACLES) <= set(catalog.QUERIES)
