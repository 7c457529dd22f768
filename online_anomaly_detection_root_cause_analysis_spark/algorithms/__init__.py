"""Pure-Python ports of the MacroBase sketch/stream algorithms used by
the reference (no Spark imports — these run inside Arrow-batched
`applyInPandas(WithState)` stages or plain pytest).

Semantics are ported from /root/reference/online-ad-rca (MacroBase
lineage); implementation is new Python. Where the reference relies on
JVM hash order or `scala.util.Random` streams, this port substitutes
deterministic insertion-order iteration and Python's seeded RNG, and
parity is defined at the reference's own golden-test level
(SURVEY.md §7.4.6).
"""

from .models import (
    AggregatedRecordsWBaseline,
    AnomalyEvent,
    Dimension,
    DimensionSummary,
    ItemsetWithCount,
    RCAResult,
)
from .mad import MAD
from .reservoir import AChao, AdaptableDampedReservoir
from .amc import AmortizedMaintenanceCounter
from .encoder import IntegerEncoder
from .riskratio import RiskRatioResult, compute_risk_ratio
from .fptree import StreamingFPGrowth, StreamingFPTree

__all__ = [
    "AChao",
    "AdaptableDampedReservoir",
    "AggregatedRecordsWBaseline",
    "AmortizedMaintenanceCounter",
    "AnomalyEvent",
    "Dimension",
    "DimensionSummary",
    "IntegerEncoder",
    "ItemsetWithCount",
    "MAD",
    "RCAResult",
    "RiskRatioResult",
    "StreamingFPGrowth",
    "StreamingFPTree",
    "compute_risk_ratio",
]
