from .inspect import (
    physical_plan,
    scan_read_schemas,
    pushed_filters,
    has_broadcast_join,
    exchange_count,
    wholestage_codegen_count,
    python_eval_count,
    assert_column_pruned,
    assert_filter_pushed,
    assert_no_shuffle,
    assert_broadcast_join,
)

__all__ = [
    "physical_plan", "scan_read_schemas", "pushed_filters",
    "has_broadcast_join", "exchange_count", "wholestage_codegen_count",
    "python_eval_count", "assert_column_pruned", "assert_filter_pushed",
    "assert_no_shuffle", "assert_broadcast_join",
]
