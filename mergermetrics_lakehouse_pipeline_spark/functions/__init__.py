from .cleaning import (
    dedupe_by_keys,
    extract_variant,
    normalize_text,
    parse_date_multi,
    sanitize_price,
    standardize_values,
    surrogate_key,
    valid_numeric_or_sentinel,
)
from .dates import month_spine, build_dim_date

__all__ = [
    "dedupe_by_keys",
    "extract_variant",
    "normalize_text",
    "parse_date_multi",
    "sanitize_price",
    "standardize_values",
    "surrogate_key",
    "valid_numeric_or_sentinel",
    "month_spine",
    "build_dim_date",
]
