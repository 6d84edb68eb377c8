"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qround(col: Column, digits: int = 4) -> Column:
    """Deterministic cross-engine quantization: floor(x*10^d + 0.5)/10^d.

    Spark's round() is HALF_UP, DuckDB's is banker's — they disagree on
    .5 boundaries, which breaks value-hash comparison. This formula is the
    same arithmetic on both engines (mirror in SQL as
    floor(x * 10^d + 0.5) / 10^d)."""
    scale = 10**digits
    return F.floor(col * scale + F.lit(0.5)) / scale
