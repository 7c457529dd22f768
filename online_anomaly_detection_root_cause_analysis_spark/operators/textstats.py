"""Text-analysis operators over the documents table: quality scoring,
token counting, language-ID, fingerprinting — the per-document feature
stage of a training-data pipeline. All JVM column math (codegen, no
Python in the plan) — see functions/text.py."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    bpe_ish_piece_count_col,
    content_fingerprint_col,
    language_id_col,
    quality_score_cols,
    token_count_col,
)


def document_text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    q = quality_score_cols(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        q["n_chars"].cast("long").alias("n_chars"),
        q["n_tokens"].cast("long").alias("n_tokens"),
        bpe_ish_piece_count_col(F.col(text_col)).cast("long").alias("n_pieces"),
        (F.floor(q["punct_ratio"] * 1e6 + 0.5) / 1e6).alias("punct_ratio"),
        (F.floor(q["stopword_ratio"] * 1e6 + 0.5) / 1e6).alias("stopword_ratio"),
        (F.floor(q["mean_token_len"] * 1e6 + 0.5) / 1e6).alias("mean_token_len"),
        (F.floor(q["quality_score"] * 1e6 + 0.5) / 1e6).alias("quality_score"),
    )


def document_language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        language_id_col(F.col(text_col)).alias("lang_pred"),
    )


def document_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        content_fingerprint_col(F.col(text_col)).alias("fingerprint"),
        F.sha2(F.col(text_col), 256).alias("sha256"),
    )
