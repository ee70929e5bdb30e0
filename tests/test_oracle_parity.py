"""Golden/oracle tests: every registered query must match its DuckDB oracle
on the same parquet inputs — the same gate the driver runs at sf0.01
(here at sf0.001 for speed; run with SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
for the full-size check)."""

from __future__ import annotations

import numpy as np
import pytest

from sqlserver_cdc_to_kafka_spark.registry import load_all
from tools.check_oracle import canonicalize

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    got = canonicalize(q.fn(spark, sf_dir).toPandas())
    if q.oracle is None:
        assert len(got) >= 0  # rows-only contract: must execute
        return
    want = canonicalize(duck.execute(q.oracle).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"rows {len(got)} != {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(w.dtype, np.floating):
            assert np.isclose(
                g.astype(float), w.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True
            ).all(), f"column {c} differs"
        elif g.dtype == object:
            assert (g.fillna("<null>") == w.fillna("<null>")).all(), f"column {c} differs"
        else:
            assert g.equals(w), f"column {c} differs"
