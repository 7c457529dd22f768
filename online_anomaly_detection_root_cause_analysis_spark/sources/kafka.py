"""Kafka JSON front door (reference S1/S2).

Rebuilds the reference's actual input path —
sources/kafka/GenericJsonConsumer.scala:11-21 (JSON Kafka consumer),
serialization/JSONDeserializationSchema.java:47-87 (schemaless JSON ->
ObjectNode), sources/kafka/InputRecordStreamBuilder.scala:10-41
(offset selection + record building) — Spark-first: `format("kafka")`
+ `from_json` against a config-derived schema, so parsing happens
JVM-side inside the scan stage (no Jackson-per-record Python).

The sandbox has no Kafka broker or spark-sql-kafka jars, so
`kafka_json_records` (the readStream builder) is exercised only down
to its option construction; `parse_json_records` — everything after
the raw bytes — runs identically on batch DataFrames of JSON strings
and is fully unit-tested (tests/test_kafka_json.py).

Semantics deviations, documented:
- Malformed JSON: the reference's ObjectMapper throws and fails the
  job (JSONDeserializationSchema.java:73 readValue); here from_json is
  PERMISSIVE -> null struct -> row dropped, the streaming-sane choice.
- Offset selection (InputRecordStreamBuilder.scala:20-25): earliest |
  latest | epoch-millis timestamp map onto startingOffsets /
  startingTimestamp (Kafka source options).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import EngineConfig
from .records import build_typed_records

# the reference's fixed timestamp pattern (models/InputRecord.scala:14)
TIMESTAMP_PATTERN = "yyyy-MM-dd'T'HH:mm:ss"

_VALUE_TYPES = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "bool": T.BooleanType(),
}


def input_record_schema(cfg: EngineConfig) -> T.StructType:
    """JSON value-payload schema derived from the engine config — the
    schema the reference reads field-by-field from Jackson ObjectNodes
    (InputRecordStreamBuilder.scala:33-41, DimensionsBuilder.scala:
    10-44). Declaring it up front lets Catalyst prune and codegen the
    parse."""
    fields = [
        T.StructField(cfg.timestamp_field, T.StringType()),
        T.StructField(cfg.value_field, T.DoubleType()),
    ]
    fields += [
        T.StructField(d.name, _VALUE_TYPES[d.value_type]) for d in cfg.dimensions
    ]
    return T.StructType(fields)


def parse_json_records(
    raw: DataFrame,
    cfg: EngineConfig,
    value_col: str = "value",
    ts_pattern: str = TIMESTAMP_PATTERN,
) -> DataFrame:
    """Raw Kafka value bytes/strings -> typed records (ts, value,
    dims...). Works on batch and streaming frames. Dimension typing
    follows DimensionSpec.value_type with the reference's toString
    normalization (utils/dimension/parsers/*.scala)."""
    payload = raw.select(
        F.from_json(F.col(value_col).cast("string"), input_record_schema(cfg)).alias(
            "_v"
        )
    )
    # malformed JSON -> PERMISSIVE all-null struct; a record without a
    # parseable timestamp is unusable (the reference NPEs on it), so
    # the null-ts filter drops exactly those rows
    flat = payload.select("_v.*")
    return build_typed_records(flat, cfg, ts_pattern=ts_pattern).filter(
        F.col("ts").isNotNull()
    )


def kafka_reader_options(
    bootstrap_servers: str,
    topic: str,
    starting: str = "earliest",
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """Offset selection (S2, InputRecordStreamBuilder.scala:20-25):
    'earliest' | 'latest' | an epoch-millis timestamp string (the
    reference's setStartFromTimestamp takes millis; Spark's
    startingTimestamp option is also millis). Pure function so the
    mapping is testable without a broker."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    s = str(starting).lower()
    if s in ("earliest", "latest"):
        opts["startingOffsets"] = s
    else:
        opts["startingTimestamp"] = str(int(s))
    return opts


def kafka_json_records(
    spark: SparkSession,
    cfg: EngineConfig,
    bootstrap_servers: str,
    topic: str,
    starting: str = "earliest",
) -> DataFrame:
    """readStream.format('kafka') -> parse_json_records. Requires the
    spark-sql-kafka package on the cluster (absent in this sandbox —
    the file-stream stand-in in sources/pages.py covers streaming
    tests here; swapping front doors is this one call)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(bootstrap_servers, topic, starting).items():
        reader = reader.option(k, v)
    raw = reader.load()
    return parse_json_records(raw, cfg)
