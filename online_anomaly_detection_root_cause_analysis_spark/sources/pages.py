"""Deterministic Common-Crawl-style `pages` table (FIXTURES.md §1).

Columns (BASELINE.json input_hint): url:string, warc_ts:timestamp,
html:binary, text:string, lang:string. Generation is fully seeded:
same (n_pages, seed, knobs) => byte-identical table, so the
`extract_text(html)` byte-identity invariant is testable per url.

Shape knobs mirror the reference data feed's purpose (TPC-DS web-sales
rows through Kafka, kafka_producer/sql_to_kafka.py in /root/reference)
re-expressed for web text:
- hosts drawn Zipf-skewed over 50 hosts / 25 domains / 10 TLDs
  (exercises salted repartitioning and the host->domain->tld
  hierarchy);
- warc_ts mostly ascending at 1-10 s strides with an optional
  out-of-order fraction (watermark tests);
- planted anomaly spans where one (lang, host) pair's volume and text
  length leave the baseline — those spans are the golden alerts.

At 100 TB this table is an Iceberg table partitioned by
days(warc_ts)/bucket(url); the generator exists only because the
sandbox has no external data.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

TLDS = ["com", "org", "net", "io", "de", "gr", "fr", "uk", "jp", "cn"]
LANGS = ["en", "de", "el", "fr", "es", "ja", "zh", "pt"]
N_HOSTS = 50
N_DOMAINS = 25
ORIGIN = np.datetime64("2024-01-01T00:00:00")

_TOKENS = np.array(
    "the quick brown fox data stream window spark anomaly metric page crawl "
    "web text token host lang value count root cause detect alert base line".split()
)


@dataclass
class AnomalySpan:
    """One planted anomaly: within [start_frac, end_frac) of the row
    range, rows are forced onto (lang, host_idx) with `length_boost`×
    longer text and `volume_boost`× row multiplication."""

    start_frac: float
    end_frac: float
    host_idx: int = 7
    lang: str = "el"
    length_boost: float = 8.0


@dataclass
class PagesSpec:
    n_pages: int = 10_000
    seed: int = 42
    out_of_order_fraction: float = 0.0
    zipf_a: float = 1.5
    anomaly_spans: list[AnomalySpan] = field(
        default_factory=lambda: [AnomalySpan(0.70, 0.75)]
    )


def host_parts(host_idx: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """host h{i}.site{i%25}.{tld[i%10]} -> (host, domain, tld) strings."""
    domain_idx = host_idx % N_DOMAINS
    tld = np.array(TLDS)[host_idx % len(TLDS)]
    domain = np.char.add(
        np.char.add("site", domain_idx.astype(str)), np.char.add(".", tld)
    )
    host = np.char.add(np.char.add("h", host_idx.astype(str)), np.char.add(".", domain))
    return host, domain, tld


def generate_pages(spec: PagesSpec | None = None) -> pd.DataFrame:
    spec = spec or PagesSpec()
    rng = np.random.RandomState(spec.seed)
    n = spec.n_pages

    # Zipf-skewed host draw, clipped into [0, N_HOSTS)
    host_idx = (rng.zipf(spec.zipf_a, size=n) - 1) % N_HOSTS

    # event time: ascending strides of 1..10 s from ORIGIN
    strides = rng.randint(1, 11, size=n).astype("int64")
    ts_offsets = np.cumsum(strides)

    # lang correlated with host
    lang_jitter = rng.randint(0, 3, size=n)
    lang_idx = (host_idx + lang_jitter) % len(LANGS)

    # anomaly spans override (lang, host) and boost length
    boost = np.ones(n)
    for span in spec.anomaly_spans:
        lo, hi = int(span.start_frac * n), int(span.end_frac * n)
        host_idx[lo:hi] = span.host_idx
        lang_idx[lo:hi] = LANGS.index(span.lang)
        boost[lo:hi] = span.length_boost

    # text: token count varies by (lang, host) + noise, boosted in spans
    base_len = 20 + (host_idx % 7) * 10 + lang_idx * 5
    n_tokens = np.maximum(3, (base_len + rng.randint(0, 10, size=n)) * boost).astype(int)

    # out-of-order fraction: swap a sample of timestamps backwards
    if spec.out_of_order_fraction > 0:
        n_swaps = int(n * spec.out_of_order_fraction)
        idx = rng.choice(n - 20, size=n_swaps, replace=False)
        ts_offsets[idx + 15], ts_offsets[idx] = (
            ts_offsets[idx].copy(),
            ts_offsets[idx + 15].copy(),
        )

    host, _, _ = host_parts(host_idx)
    # deterministic per-row token sequence: seeded by row index so text
    # depends only on (seed, i) — urls are unique per row, making
    # extract_text(html) trivially byte-identical per url
    token_pick = rng.randint(0, len(_TOKENS), size=int(n_tokens.sum()))
    offsets = np.concatenate([[0], np.cumsum(n_tokens)])
    texts = [
        " ".join(_TOKENS[token_pick[offsets[i] : offsets[i + 1]]]) for i in range(n)
    ]

    urls = [f"https://{h}/p/{i}" for i, h in enumerate(host)]
    htmls = [b"<html><body>" + t.encode("utf-8") + b"</body></html>" for t in texts]
    langs = np.array(LANGS)[lang_idx]

    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ORIGIN + ts_offsets.astype("timedelta64[s]"),
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )


def pages_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )


def write_pages(spark, path: str, spec: PagesSpec | None = None, partitions: int = 8) -> None:
    pdf = generate_pages(spec)
    df = spark.createDataFrame(pdf, schema=pages_schema())
    df.repartition(partitions).write.mode("overwrite").parquet(path)


def read_pages(spark, path: str):
    return spark.read.schema(pages_schema()).parquet(path)


def read_pages_stream(spark, path: str, max_files_per_trigger: int = 1):
    """Rate-limited streaming read — the sandbox stand-in for the
    Iceberg streaming source (`format("iceberg")` +
    `stream-from-timestamp` + `maxFilesPerTrigger`), which needs the
    iceberg runtime jars not present in this image."""
    return (
        spark.readStream.schema(pages_schema())
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
