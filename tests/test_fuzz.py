"""Property/fuzz tests (hypothesis) for the code that faces UNTRUSTED
bytes at 100 TB — container-header parsers and the scalar stats
replays. The r3/r4 ADVICE bugs (zero-dim headers, JPEG fill bytes)
lived exactly here: a parser that crashes on one corrupt payload kills
a whole Spark stage, so the invariant under fuzz is "never raise,
return None or a sane tuple".
"""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from online_anomaly_detection_root_cause_analysis_spark.algorithms.hstrees import (
    HalfSpaceTrees,
)
from online_anomaly_detection_root_cause_analysis_spark.algorithms.stats import (
    compute_contribution,
    contribution_change_percentage,
    contribution_to_overall_change_percentage,
    hierarchical_cost,
    value_change_percentage,
)
from online_anomaly_detection_root_cause_analysis_spark.operators.multimodal import (
    MAX_DECODE_PIXELS,
    _fake_decode,
    _safe_dims,
    parse_image_header,
    parse_wav_header,
)

payloads = st.binary(max_size=512)
# payloads that start with real magics but arbitrary garbage after
magic_payloads = st.one_of(
    st.binary(max_size=200).map(lambda b: b"\x89PNG\r\n\x1a\n" + b),
    st.binary(max_size=200).map(lambda b: b"GIF89a" + b),
    st.binary(max_size=200).map(lambda b: b"\xff\xd8" + b),
    st.binary(max_size=200).map(lambda b: b"RIFF" + b),
    st.binary(max_size=200).map(lambda b: b"RIFF\x00\x01\x00\x00WAVE" + b),
)


@settings(max_examples=400, deadline=None)
@given(st.one_of(payloads, magic_payloads))
def test_image_header_parser_never_raises(payload):
    out = parse_image_header(payload)
    assert out is None or (
        isinstance(out, tuple) and len(out) == 2
        and all(isinstance(v, int) for v in out)
    )
    safe = _safe_dims(payload)
    if safe is not None:
        w, h = safe
        assert w > 0 and h > 0 and w * h <= MAX_DECODE_PIXELS


@settings(max_examples=400, deadline=None)
@given(st.one_of(payloads, magic_payloads))
def test_wav_header_parser_never_raises(payload):
    out = parse_wav_header(payload)
    if out is not None:
        rate, ch, bits, frames = out
        assert rate > 0 and ch > 0 and frames >= 0


@settings(max_examples=200, deadline=None)
@given(payloads)
def test_fake_decode_total(payload):
    w, h, mean = _fake_decode(payload)
    assert w >= 1 and h >= 1 and 0.0 <= mean <= 255.0


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(min_value=0, max_value=2**32 - 1),
    h=st.integers(min_value=0, max_value=2**32 - 1),
)
def test_arbitrary_png_declared_dims_are_safe(w, h):
    """ANY header-declared dimension pair either passes the sanity cap
    or is rejected — never an unbounded allocation driver."""
    png = (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00"
    )
    assert parse_image_header(png) == (w, h)
    safe = _safe_dims(png)
    if w <= 0 or h <= 0 or w * h > MAX_DECODE_PIXELS:
        assert safe is None
    else:
        assert safe == (w, h)


finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)


@settings(max_examples=300, deadline=None)
@given(b=finite, c=finite, bt=finite, ct=finite)
def test_stats_scalars_never_raise(b, c, bt, ct):
    """The Scala-Double replays must absorb every zero-denominator /
    sign combination like IEEE doubles do, never raise like Python
    division does."""
    for strict in (False, True):
        contribution_to_overall_change_percentage(b, c, bt, ct, strict_parity=strict)
    value_change_percentage(b, c)
    contribution_change_percentage(b, c, bt, ct)
    compute_contribution(b, c, bt, ct)
    hierarchical_cost(b, c, 1.0 if bt == 0 else c / bt if bt else 1.0, 0.5)


@settings(max_examples=100, deadline=None)
@given(
    xs=st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False), min_size=1, max_size=200
    )
)
def test_hstrees_update_total(xs):
    """Any [0,1] stream: scores only after the first block, always
    non-negative, bounded by trees * window."""
    hs = HalfSpaceTrees(n_trees=4, depth=4, window=16, threshold=2.0, seed=7)
    for i, x in enumerate(xs, start=1):
        score, flag = hs.update(x)
        if i <= 16:
            assert score is None and not flag
        elif score is not None:
            assert 0 <= score <= 4 * 16
