"""Per-request option inheritance — follow-object overrides.

A follow expression can yield objects whose properties override the
session's options for that one request: `mergeWithObject`
(xidelbase.pas:1810-1842), applied in `TFollowToList.merge`'s object
branch (1505-1526). Recognized pure-data-source keys: url, method, post/
data/input, header(s), form, input-format.

Spark form: option columns on the frontier row, COALESCEd with session
defaults — one projection, no join (defaults are literals), matching the
reference's precedence: request object > command line."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DATA_SOURCE_KEYS = {"header", "headers", "post", "data", "input", "url", "form", "method", "input-format"}


@dataclass
class SessionOptions:
    method: str = "GET"
    input_format: str = "auto"
    error_handling: str = ""
    wait_ms: int = 0
    extra: dict = field(default_factory=dict)


def effective_options(frontier: DataFrame, defaults: SessionOptions) -> DataFrame:
    """Coalesce per-request override columns (nullable) with defaults.
    Missing override columns are treated as absent."""
    cols = dict(
        method=F.lit(defaults.method),
        input_format=F.lit(defaults.input_format),
        error_handling=F.lit(defaults.error_handling),
        wait_ms=F.lit(defaults.wait_ms).cast("long"),
    )
    out = frontier
    for name, default in cols.items():
        if name in frontier.columns:
            out = out.withColumn(name, F.coalesce(F.col(name), default))
        else:
            out = out.withColumn(name, default)
    return out
