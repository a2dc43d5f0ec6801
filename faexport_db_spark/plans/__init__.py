"""Plan auditing: machine-checkable physical-plan quality.

"Would this plan survive a 100× scale-up?" is a property of the
physical plan, not the output — so the engine asserts it: filters
reach the parquet scan (PushedFilters), projections prune the read
schema (ReadSchema), dim joins broadcast, shuffle counts match the
operator's minimum, Python never appears on hot paths that have
expression forms. ``tests/test_plans.py`` pins these for the flagship
queries; regressions that would only show up at cluster scale fail CI
at sf0.001.
"""

from faexport_db_spark.plans.audit import (  # noqa: F401
    assert_plan,
    codegen_span_count,
    formatted_plan,
    join_strategies,
    pushed_filters,
    read_schemas,
    shuffle_count,
)
