from .audit import assert_no_cartesian, explain_str, has_pushed_filters, wholestage_spans  # noqa: F401
