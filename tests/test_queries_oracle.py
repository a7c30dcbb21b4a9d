"""Every declared query with an oracle must hash-match DuckDB (t2 replica).

Runs at sf0.001 by default (fast); set PIXELS_SPARK_TEST_SF_DIR=/root/testdata/sf0.01
to replicate the driver's exact scale.
"""

from __future__ import annotations

import pytest

from pixels_spark.queries import load_all_modules

from .oracle import compare

REGISTRY = load_all_modules()
WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.sql is not None)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.sql is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, sf_dir, name):
    q = REGISTRY[name]
    problems = compare(spark, sf_dir, q.fn, q.sql)
    assert not problems, f"{name}: " + "; ".join(problems)


# As of r10 every declared query is oracled, so this class is empty —
# the guard avoids pytest's skipped placeholder for an empty
# parametrize; the test resurrects automatically if a rows-only query
# is ever declared again.
if ROWS_ONLY:

    @pytest.mark.parametrize("name", ROWS_ONLY)
    def test_rows_only_runs(spark, sf_dir, name):
        q = REGISTRY[name]
        df = q.fn(spark, sf_dir)
        assert df.count() >= 0
