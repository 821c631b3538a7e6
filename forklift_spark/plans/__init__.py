"""Plans — physical-plan inspection guards (SURVEY.md §4, §5.3)."""

from .guards import (  # noqa: F401
    assert_broadcast_join,
    assert_no_row_python_udf,
    assert_pushed_filters,
    assert_pruned_columns,
    count_exchanges,
    executed_plan,
    formatted_plan,
)
