"""Deterministic re-syntheses of the reference test fixtures
(FIXTURES.md §2-3; originals in /root/reference/online-ad-rca/src/
test/resources/ are not copied — same shape, planted root causes)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def make_simple_low_metric(n: int = 100, seed: int = 42) -> pd.DataFrame:
    """Analog of low_metric_simple.csv: columns A1..A4 + metric A5.
    Regular rows are A1=k..A4=k+3 with metric 1/(k+4); every 16th row
    is the planted anomaly subset sharing A1=0 with an outlying (high)
    metric. Golden: top summary dimension is A1=0."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        if i % 16 == 0:
            a2 = int(rng.randint(1, 7))
            rows.append((0, a2, a2 + 1, a2 + 2, 1.0 / (a2 + 3)))
        else:
            k = int(rng.randint(10, 95))
            rows.append((k, k + 1, k + 2, k + 3, 1.0 / (k + 4)))
    return pd.DataFrame(rows, columns=["A1", "A2", "A3", "A4", "A5"])


def make_sensor10k_power(n: int = 10479, seed: int = 42) -> pd.DataFrame:
    """Analog of sensor10k_filtered.csv: (power_drain, device_id),
    ~1000 devices, one hot device '2040' (~7% of rows) drawing
    U(0.80, 1.00) vs everyone else's clipped N(0.34, 0.15).
    Golden: the single root cause is device_id=2040."""
    rng = np.random.RandomState(seed)
    is_hot = rng.rand(n) < 0.069
    device = np.where(
        is_hot, 2040, rng.randint(1000, 3000, size=n)
    )
    # avoid accidental normal rows on the hot device
    device[(~is_hot) & (device == 2040)] = 2041
    power = np.where(
        is_hot,
        rng.uniform(0.80, 1.00, size=n),
        np.clip(rng.normal(0.34, 0.15, size=n), 0.001, 0.79),
    )
    return pd.DataFrame(
        {"power_drain": np.round(power, 12), "device_id": device.astype(str)}
    )


def make_sensor10k_temp(n: int = 10479, seed: int = 42) -> pd.DataFrame:
    """Analog of low_metric_sensor10k.csv: (device_id, model,
    firmware_version, temperature); anomalous hot rows are concentrated
    on model=M101 + firmware_version=0.4. Golden: summaries implicate
    only firmware_version=0.4 and/or model=M101."""
    rng = np.random.RandomState(seed)
    models = np.array(["M101", "M104", "M204", "M205", "M404", "M606"])
    firmwares = np.array(["0.2.4", "0.3.1", "0.3.2", "0.4"])
    model = models[rng.randint(0, len(models), size=n)]
    firmware = firmwares[rng.randint(0, len(firmwares), size=n)]
    device = rng.randint(1000, 3000, size=n).astype(str)
    temp = np.clip(rng.normal(0.014, 0.001, size=n), 0.0125, None)
    hot = rng.rand(n) < 0.08
    model[hot] = "M101"
    firmware[hot] = "0.4"
    temp[hot] = rng.uniform(0.30, 0.47, size=int(hot.sum()))
    return pd.DataFrame(
        {
            "device_id": device,
            "model": model,
            "firmware_version": firmware,
            "temperature": np.round(temp, 12),
        }
    )
