from .audit import (  # noqa: F401
    assert_no_cartesian,
    explain_str,
    has_pushed_filters,
    read_schema_columns,
    wholestage_spans,
)
