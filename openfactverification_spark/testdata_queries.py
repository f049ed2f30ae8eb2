"""Operator-coverage queries over the driver's parquet tables (placeholder —
populated incrementally as operators land)."""

from __future__ import annotations

TESTDATA_QUERIES: dict = {}
TESTDATA_ORACLES: dict[str, str] = {}
