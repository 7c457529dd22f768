"""Kafka JSON front door + typed dimension parsers (VERDICT r1
next-steps #4/#7): the `from_json`-based record path behind the same
records API, unit-tested without a broker — the parse/projection
stages are identical for batch frames of JSON strings and the real
`format("kafka")` stream."""

import datetime

from pyspark.sql import functions as F

from online_anomaly_detection_root_cause_analysis_spark.config import (
    DimensionSpec,
    EngineConfig,
)
from online_anomaly_detection_root_cause_analysis_spark.sources.kafka import (
    input_record_schema,
    kafka_reader_options,
    parse_json_records,
)
from online_anomaly_detection_root_cause_analysis_spark.sources.records import (
    build_typed_records,
)
from online_anomaly_detection_root_cause_analysis_spark.streaming.job import (
    long_form_window_aggs,
)


def _typed_cfg() -> EngineConfig:
    return EngineConfig(
        timestamp_field="created_at",
        value_field="amount",
        dimensions=[
            DimensionSpec("region", group="spatial", value_type="string"),
            DimensionSpec("store_sk", group="spatial", parent="region", value_type="int"),
            DimensionSpec("is_promo", group="delivery", value_type="bool"),
        ],
    )


JSON_ROWS = [
    '{"created_at": "2024-01-01T00:00:05", "amount": 12.5, "region": "eu", "store_sk": 7, "is_promo": true}',
    '{"created_at": "2024-01-01T00:01:05", "amount": 3.0, "region": "us", "store_sk": 12, "is_promo": false}',
    # missing dimension field -> null dimension, row kept
    '{"created_at": "2024-01-01T00:02:05", "amount": 1.0, "region": "eu"}',
    # malformed JSON -> whole row dropped (PERMISSIVE null struct)
    '{"created_at": "2024-01-01T00:03:05", "amount": ',
]


def test_parse_json_records_typed_dims(spark):
    cfg = _typed_cfg()
    raw = spark.createDataFrame([(r,) for r in JSON_ROWS], "value string")
    rec = parse_json_records(raw, cfg)

    # reference parsers normalize every value_type to string
    assert dict(rec.dtypes) == {
        "ts": "timestamp",
        "value": "double",
        "region": "string",
        "store_sk": "string",
        "is_promo": "string",
    }
    rows = {r.ts: r for r in rec.collect()}
    assert len(rows) == 3  # malformed row dropped
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 5)
    assert rows[t0].region == "eu"
    assert rows[t0].store_sk == "7"  # IntDimensionParser toString
    assert rows[t0].is_promo == "true"  # BooleanDimensionParser toString
    t1 = datetime.datetime(2024, 1, 1, 0, 1, 5)
    assert rows[t1].is_promo == "false"
    t2 = datetime.datetime(2024, 1, 1, 0, 2, 5)
    assert rows[t2].store_sk is None and rows[t2].is_promo is None


def test_levels_derived_and_aggs_green(spark):
    """Typed config drives the whole long-form aggregation: levels come
    from the parent-chain fixpoint (AppConfig.scala:49-72), dims from
    the typed parsers."""
    cfg = _typed_cfg()
    assert cfg.levels == {"region": 1, "store_sk": 2, "is_promo": 1}

    raw = spark.createDataFrame([(r,) for r in JSON_ROWS], "value string")
    rec = parse_json_records(raw, cfg)
    aggs = long_form_window_aggs(rec, cfg, size_s=300, slide_s=None)
    got = {
        (r.dim_name, r.dim_value): (r.dim_group, r.dim_level, r.dim_sum)
        for r in aggs.collect()
    }
    assert got[("region", "eu")] == ("spatial", 1, 13.5)
    assert got[("store_sk", "7")] == ("spatial", 2, 12.5)
    assert got[("is_promo", "true")] == ("delivery", 1, 12.5)
    assert got[("__total__", "__total__")][2] == 16.5


def test_build_typed_records_on_native_timestamp(spark):
    """ts_pattern=None path: source column already a timestamp (the
    parquet tables)."""
    cfg = EngineConfig(
        timestamp_field="ts",
        value_field="value",
        dimensions=[DimensionSpec("event_type", group="type")],
    )
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rec = build_typed_records(df, cfg)
    dtypes = dict(rec.dtypes)
    assert dtypes["ts"] in ("timestamp", "timestamp_ntz")  # parquet stores ntz
    assert dtypes["value"] == "double" and dtypes["event_type"] == "string"
    assert rec.count() == df.count()


def test_input_record_schema_shapes():
    schema = input_record_schema(_typed_cfg())
    assert [f.name for f in schema.fields] == [
        "created_at", "amount", "region", "store_sk", "is_promo",
    ]
    assert schema["store_sk"].dataType.typeName() == "integer"
    assert schema["is_promo"].dataType.typeName() == "boolean"


def test_streaming_json_front_door(spark, tmp_path):
    """The JSON record path under Structured Streaming: JSON lines
    streamed file-by-file (the broker stand-in; the real front door is
    format('kafka') with the same parse stage) -> parse_json_records
    -> windowed long-form aggregation == the same computation on the
    batch frame."""
    import json as jsonlib
    import os

    import numpy as np

    rng = np.random.RandomState(3)
    rows = []
    for i in range(600):
        ts = f"2024-01-01T{i // 120:02d}:{(i // 2) % 60:02d}:{(i * 7) % 60:02d}"
        rows.append(
            jsonlib.dumps(
                {
                    "created_at": ts,
                    "amount": round(float(rng.uniform(1, 50)), 2),
                    "region": ["eu", "us", "ap"][i % 3],
                    "store_sk": int(i % 7),
                    "is_promo": bool(i % 2),
                }
            )
        )
    src = tmp_path / "jsonl"
    src.mkdir()
    for c in range(4):
        f = src / f"chunk-{c:03d}.jsonl"
        f.write_text("\n".join(rows[c * 150 : (c + 1) * 150]) + "\n")
        os.utime(f, (1e9 + c, 1e9 + c))

    cfg = _typed_cfg()
    raw_stream = (
        spark.readStream.format("text").option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    rec_stream = parse_json_records(raw_stream, cfg)
    aggs_stream = long_form_window_aggs(rec_stream, cfg, 300, 60)
    q = (
        aggs_stream.writeStream.format("memory").queryName("json_front_door")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        tuple(r[:3]): (r.dim_group, r.dim_level, round(r.dim_sum, 6), r.dim_count)
        for r in spark.sql("SELECT * FROM json_front_door").collect()
    }

    raw_batch = spark.createDataFrame([(r,) for r in rows], "value string")
    want_df = long_form_window_aggs(parse_json_records(raw_batch, cfg), cfg, 300, 60)
    want = {
        tuple(r[:3]): (r.dim_group, r.dim_level, round(r.dim_sum, 6), r.dim_count)
        for r in want_df.collect()
    }
    # streaming append-mode emits only watermark-finalized windows —
    # a subset of the batch grid, but every emitted row must match
    assert len(got) > 0
    for k, v in got.items():
        assert want[k] == v, k
    # all but the last slide's windows finalize with the 0s watermark
    assert len(got) >= len(want) * 0.8


def test_config_from_dict_reference_shape():
    """application.conf input_stream layout round-trips into
    EngineConfig with the same level fixpoint (AppConfig.scala:49-81);
    uses the reference's own TPC-DS dimension config as the vector."""
    from online_anomaly_detection_root_cause_analysis_spark.config import (
        config_from_dict,
    )

    cfg = config_from_dict(
        {
            "timestamp_field": "sale_at",
            "value_field": "ws_quantity",
            "dimensions": {
                "names": ["ca_city", "ca_county", "ca_state", "sm_code"],
                "definitions": {
                    "ca_city": {"value_type": "string", "parent_dimension": "ca_county", "group": "spatial"},
                    "ca_county": {"value_type": "string", "parent_dimension": "ca_state", "group": "spatial"},
                    "ca_state": {"value_type": "string", "parent_dimension": "root", "group": "spatial"},
                    "sm_code": {"value_type": "string", "parent_dimension": "root", "group": "delivery"},
                },
            },
            "summary_size": 5,
        }
    )
    assert cfg.dimension_names == ["ca_city", "ca_county", "ca_state", "sm_code"]
    assert cfg.levels == {"ca_state": 1, "ca_county": 2, "ca_city": 3, "sm_code": 1}
    assert cfg.group("sm_code") == "delivery"
    # root pairs omitted (DimensionHierarchiesBuilder.scala:9-16)
    assert sorted(cfg.hierarchy_pairs()) == [
        ("ca_city", "ca_county"), ("ca_county", "ca_state"),
    ]


def test_kafka_offset_selection():
    """S2 offset mapping (InputRecordStreamBuilder.scala:20-25)."""
    base = dict(bootstrap_servers="b:9092", topic="ad_input")
    assert kafka_reader_options(**base)["startingOffsets"] == "earliest"
    assert kafka_reader_options(**base, starting="LATEST")["startingOffsets"] == "latest"
    opts = kafka_reader_options(**base, starting="1700000000000")
    assert opts["startingTimestamp"] == "1700000000000"
    assert "startingOffsets" not in opts
    assert opts["kafka.bootstrap.servers"] == "b:9092"
    assert opts["subscribe"] == "ad_input"
