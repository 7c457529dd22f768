"""MacroBase composite detector + RCA summarizer chain (reference
§2.6 -> §2.7 -> §2.9), batch form.

The reference wires EWFeatureTransform -> EWAppxPercentileAuxiliary ->
ExponentiallyDecayingEmergingItemsets as keyed process functions on a
constant key (EWAppxPercentileOutlierClassifier.scala:27-55,
EWStreamingSummarizer.scala:19-21) — an intentionally serial tail
consuming ~1 row per window slide. Here the same chain runs inside a
single-group `applyInPandas` (batch) / `applyInPandasWithState`
(streaming, streaming/state.py); the distributed work (windowing,
breakdowns) happens before it, exactly like the reference
(SURVEY.md §4.1 "pre-aggregation before single-threaded stateful ops").

Float stabilization mirrors the reference's golden tests
(EWStreamingSummarizerTest.scala:101-120): inputs rounded at 10dp
before scoring, scores at 7dp before classification.
"""

from __future__ import annotations

import math
from typing import Iterable, Iterator

import pandas as pd

from ..algorithms.ewfeature import EWFeatureSpec, EWFeatureTransform
from ..algorithms.ewpercentile import EWAppxPercentileAuxiliary
from ..algorithms.models import AggregatedRecordsWBaseline, AnomalyEvent, Dimension
from ..algorithms.summarizer import (
    ExponentiallyDecayingEmergingItemsets,
    SummarizerSpec,
)


def _round_half_up(x: float, scale: int) -> float:
    # BigDecimal.setScale(scale, HALF_UP) analog
    if math.isnan(x) or math.isinf(x):
        return x
    factor = 10.0**scale
    return math.floor(x * factor + 0.5) / factor


def run_macrobase_chain(
    rows: Iterable[tuple[int, float, float, dict[str, str]]],
    detector_spec: EWFeatureSpec,
    summarizer_spec: SummarizerSpec,
    dim_group: str | None = None,
    dim_level: int = 1,
) -> list[dict]:
    """Drive (seq, current, baseline, {dim_name: dim_value}) rows
    through scorer -> classifier -> summarizer; returns emitted RCA
    summaries as dicts with long-form dimension members.

    Rows follow the reference readCSV convention
    (EWStreamingSummarizerTest.scala:19-51): every dimension is level 1
    with group = its column name unless overridden."""
    scorer = EWFeatureTransform(detector_spec)
    classifier = EWAppxPercentileAuxiliary(detector_spec)
    summarizer = ExponentiallyDecayingEmergingItemsets.from_spec(summarizer_spec)

    out: list[dict] = []
    n_summaries = 0
    for seq, current, baseline, dims in rows:
        breakdown = {
            Dimension(name, str(value), dim_group or name, dim_level): current
            for name, value in dims.items()
        }
        record = AggregatedRecordsWBaseline(
            current=_round_half_up(current, 10),
            baseline=baseline,
            current_dimensions_breakdown=breakdown,
            baseline_dimensions_breakdown=breakdown,
            dimensions_hierarchy={},
            records_in_baseline_offset=1,
        )
        for rec1, score in scorer.process(record, record.current):
            for rec2, is_outlier in classifier.process(rec1, _round_half_up(score, 7)):
                event = AnomalyEvent(
                    anomaly_id=str(seq),
                    detected_at=seq,
                    epoch=seq,
                    record=rec2,
                    is_outlier=is_outlier,
                )
                for result in summarizer.process(event):
                    n_summaries += 1
                    for d in result.dimension_summaries:
                        out.append(
                            {
                                "summary_id": n_summaries,
                                "detected_at": result.detected_at,
                                "support": result.support,
                                "num_records": result.num_records,
                                "ratio_to_inliers": result.ratio_to_inliers,
                                "n_dims": len(result.dimension_summaries),
                                "dim_name": d.dimension.name,
                                "dim_value": d.dimension.value,
                            }
                        )
    return out


MACROBASE_OUTPUT_SCHEMA = (
    "summary_id long, detected_at long, support double, num_records double, "
    "ratio_to_inliers double, n_dims int, dim_name string, dim_value string"
)


def macrobase_summaries(
    df,
    detector_spec: EWFeatureSpec,
    summarizer_spec: SummarizerSpec,
):
    """Spark wrapper: df(seq long, current double, baseline double,
    dims map<string,string>) -> long-form RCA summary rows.

    Single-group applyInPandas — the deliberate serialization point;
    upstream aggregation is where the cluster parallelism lives."""
    from pyspark.sql import functions as F

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        rows = (
            (int(r.seq), float(r.current), float(r.baseline), dict(r.dims))
            for r in pdf.itertuples()
        )
        out = run_macrobase_chain(rows, detector_spec, summarizer_spec)
        if not out:
            return pd.DataFrame(
                columns=[
                    "summary_id",
                    "detected_at",
                    "support",
                    "num_records",
                    "ratio_to_inliers",
                    "n_dims",
                    "dim_name",
                    "dim_value",
                ]
            )
        return pd.DataFrame(out)

    return (
        df.select("seq", "current", "baseline", "dims")
        .groupBy(F.lit(0).alias("_k"))
        .applyInPandas(lambda _key, pdf: fn(pdf), MACROBASE_OUTPUT_SCHEMA)
    )
