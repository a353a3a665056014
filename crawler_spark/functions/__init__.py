"""Scalar-function surface (SURVEY.md §2.8) — re-exported helpers."""

from ..canon import canonicalize_expr, host_of_expr  # noqa: F401
from ..operators.dedup import md5_hash61, normalize_text, shingles_col  # noqa: F401
