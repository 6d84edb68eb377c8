"""HTTP error-handling policy — `--error-handling '1xx=retry,4xx=abort,…'`.

The reference maps status-code classes to actions in `httpReact`
(xidelbase.pas:2241-2249): retry (sleep + refetch), ignore (empty body,
keep processing), skip (drop the document), abort. Per-request overrides
come from follow-object options (tests/tests.sh:128-129).

Spark form: the policy is a tiny table → CASE expression over the fetch
result's status column; retries re-enqueue with attempt+1 (bounded)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VALID_ACTIONS = {"retry", "ignore", "skip", "abort", "accept"}


def parse_policy(spec: str) -> dict[str, str]:
    """'1xx=retry,4xx=abort,5xx=skip' → {'1xx': 'retry', ...}.
    Keys: exact codes ('404') or classes ('4xx'). 2xx defaults to accept."""
    out: dict[str, str] = {}
    for part in filter(None, (p.strip() for p in spec.split(","))):
        k, _, v = part.partition("=")
        if v not in VALID_ACTIONS:
            raise ValueError(f"unknown error action {v!r} in {spec!r}")
        out[k.strip()] = v
    return out


def action_for(status: Column, policy: dict[str, str]) -> Column:
    """CASE expression: exact code match wins over class match; default
    accept for 2xx, skip otherwise (the reference treats unhandled errors
    as fatal per phase; we default to the safe drop)."""
    expr = None
    # exact codes first (higher precedence)
    for k, v in sorted(policy.items(), key=lambda kv: (len(kv[0]) != 3 or "x" in kv[0], kv[0])):
        if "x" in k:
            cls = int(k[0])
            cond = (status >= cls * 100) & (status < (cls + 1) * 100)
        else:
            cond = status == int(k)
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    default = F.when((status >= 200) & (status < 300), "accept").otherwise("skip")
    return expr.otherwise(default) if expr is not None else default


def apply_policy(
    fetched: DataFrame,
    policy: dict[str, str],
    *,
    status_col: str = "status",
    max_attempts: int = 3,
) -> dict[str, DataFrame]:
    """Split fetch results by action:
    - 'accepted': flow to extraction (ignore → body nulled)
    - 'retry': re-enqueue (attempt+1, dropped past max_attempts)
    - 'dropped': skip/abort rows (abort also raises driver-side if present)
    """
    tagged = fetched.withColumn("__action", action_for(F.col(status_col), policy))
    accepted = tagged.where(F.col("__action").isin("accept", "ignore")).withColumn(
        "body",
        F.when(F.col("__action") == "ignore", F.lit(None).cast("string")).otherwise(
            F.col("body") if "body" in fetched.columns else F.lit(None).cast("string")
        ),
    ).drop("__action")
    attempt = F.col("attempt") if "attempt" in fetched.columns else F.lit(0)
    retry = (
        tagged.where(F.col("__action") == "retry")
        .withColumn("attempt", attempt + 1)
        .where(F.col("attempt") < max_attempts)
        .drop("__action")
    )
    dropped = tagged.where(F.col("__action").isin("skip", "abort")).drop("__action")
    return {"accepted": accepted, "retry": retry, "dropped": dropped}
