"""The whole registered query surface vs the DuckDB oracle.

This mirrors the driver's correctness gate: every queries() entry with
an oracle must match row-count + columns + values exactly (the engine's
decimal-exact aggregation makes bit-exact float matches achievable).
Queries without an oracle just have to run and return a DataFrame.
"""

import pytest

from nyc_data_pipeline_spark import registry
from nyc_data_pipeline_spark.testing import check_query

registry.load_all()
ALL_QUERIES = sorted(registry.QUERIES)


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    errors = check_query(spark, name, sf_dir)
    assert not errors, f"{name}: " + "; ".join(errors[:5])


def test_every_query_has_oracle_or_is_whitelisted():
    # Non-SQL-expressible ops are allowed to skip the oracle, but the
    # list must stay deliberate (driver downgrades them to rows-only).
    no_oracle = set(registry.QUERIES) - set(registry.ORACLE)
    allowed = {
        name
        for name in registry.QUERIES
        if name.startswith(("approx_", "stream_live_", "mm_decode"))
        or name in registry.NO_ORACLE_OK
    }
    assert no_oracle <= allowed, f"missing oracles: {sorted(no_oracle - allowed)}"
