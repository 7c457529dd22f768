from .text import (
    content_fingerprint_col,
    extract_text,
    language_id_col,
    quality_score_cols,
    sha60_col,
    token_count_col,
    url_dimension_cols,
)

__all__ = [
    "content_fingerprint_col",
    "extract_text",
    "language_id_col",
    "quality_score_cols",
    "sha60_col",
    "token_count_col",
    "url_dimension_cols",
]
