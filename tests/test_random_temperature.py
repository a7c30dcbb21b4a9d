"""Property-style randomized check of temperature_mix engine parity.

The operator claims its kept SET (not just its size) is engine-
reproducible: exact-decimal normalizer, IEEE-exact sqrt, fixed
parenthesization, integer bucket-vs-threshold verdict. Hypothesis
generates random stratum layouts (including single-doc strata and one
dominant stratum) and DuckDB must keep the IDENTICAL doc set when it
replays the arithmetic.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pixels_spark.functions.sampling import temperature_mix

# list of stratum sizes, 1..6 strata, each 1..120 docs
layouts = st.lists(st.integers(1, 120), min_size=1, max_size=6)

_DUCK_SQL = """
WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_s FROM docs GROUP BY lang),
cq AS (SELECT lang, n_s,
              CAST(sqrt(CAST(n_s AS DOUBLE)) AS DECIMAL(18,6)) AS sq_s FROM c),
t AS (SELECT CAST(sum(sq_s) AS DOUBLE) AS S,
             CAST(sum(n_s) AS BIGINT) AS n_tot FROM cq),
thr AS (SELECT lang,
               CAST(floor(least(1.0, ((CAST(n_tot AS DOUBLE) * 0.4)
                    * (CAST(sq_s AS DOUBLE) / S)) / n_s) * 10000) AS BIGINT)
                 AS threshold
        FROM cq CROSS JOIN t)
SELECT d.doc_id FROM docs d JOIN thr ON d.lang = thr.lang
WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) % 10000 < thr.threshold
ORDER BY d.doc_id
"""


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sizes=layouts)
def test_temperature_mix_kept_set_matches_duckdb(spark, sizes):
    rows = []
    next_id = 0
    for s, n in enumerate(sizes):
        for _ in range(n):
            rows.append((next_id, f"lang{s}"))
            next_id += 1
    pdf = pd.DataFrame(rows, columns=["doc_id", "lang"])
    df = spark.createDataFrame(pdf)
    got = sorted(
        r["doc_id"]
        for r in temperature_mix(df, "doc_id", "lang", target_frac=0.4).collect()
    )
    con = duckdb.connect()
    try:
        con.register("docs", pdf)
        want = [r[0] for r in con.execute(_DUCK_SQL).fetchall()]
    finally:
        con.close()
    assert got == want
