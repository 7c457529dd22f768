from .text import (
    extract_text,
    language_id,
    quality_score_cols,
    rolling_fingerprint,
    token_count_col,
    url_dimension_cols,
)

__all__ = [
    "extract_text",
    "language_id",
    "quality_score_cols",
    "rolling_fingerprint",
    "token_count_col",
    "url_dimension_cols",
]
