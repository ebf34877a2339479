from .cleaning import audit_columns, clean_id, typed_select
from .math import round2, safe_div_null, safe_div_zero, safe_pct_capped

__all__ = [
    "audit_columns",
    "clean_id",
    "typed_select",
    "round2",
    "safe_div_null",
    "safe_div_zero",
    "safe_pct_capped",
]
