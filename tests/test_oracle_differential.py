"""Generic differential gate: every registered query either matches its
DuckDB oracle (value-level) or, when oracle-less, at least runs and
returns a stable schema. Mirrors the driver's t2 check at a smaller SF
so the suite stays fast; the driver runs the same thing at sf0.01.
"""

import pytest

from faexport_db_spark.queries import ORACLES, QUERIES
from faexport_db_spark.testing import assert_oracle_match


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query(spark, sf_small, name):
    df = QUERIES[name](spark, sf_small)
    oracle = ORACLES.get(name)
    if oracle is None:
        rows = df.count()
        assert rows >= 0
        assert df.schema is not None
    else:
        assert_oracle_match(df, oracle, sf_small, name=name)
