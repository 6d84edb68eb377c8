"""Multipage templates — scripted crawls as a declarative job spec.

The reference walks a template DOM of <action>/<page>/<post>/<pattern>/
<variable>/<loop>/<if>/<call> nodes (readme.txt:394-430; engine wired at
xidelbase.pas:2593-2605, 2894-2928; semantics pinned by tests/tests.sh:
84-127). Pages are fetched one at a time with `{expr}` interpolation of
the shared variable state (readme.txt:417-419).

Spark re-expression: the spec is a Python structure interpreted by a thin
driver loop — each <page> is one fetch (a lookup join against the
documents table here; the fetch stage on a cluster), each extraction is a
pattern/selector run appending to the shared variable change log. <loop>
explodes over a variable's values, <if> compares a variable, <call> jumps
to another action — all driver-side control flow, exactly where the
reference keeps it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .patterns import compile_pattern, match_spans


@dataclass
class MultipageState:
    log: list[tuple[str, str]] = field(default_factory=list)  # (var, value) in order

    def set(self, name: str, value: str) -> None:
        self.log.append((name, value))

    def get(self, name: str) -> str | None:
        for k, v in reversed(self.log):
            if k == name:
                return v
        return None

    def get_all(self, name: str) -> list[str]:
        return [v for k, v in self.log if k == name]

    def interpolate(self, template: str) -> str:
        out = template
        # innermost-first single-pass {var} interpolation
        for k in {k for k, _ in self.log}:
            out = out.replace("{" + k + "}", self.get(k) or "")
        return out


class MultipageRunner:
    """Interpret a multipage spec against a documents table."""

    def __init__(self, spark: SparkSession, docs: DataFrame, id_col: str = "doc_id"):
        self.spark = spark
        self.docs = docs
        self.id_col = id_col
        self.pages_fetched: list[str] = []

    def _fetch_spans(self, url: str) -> list[dict] | None:
        rows = self.docs.where(F.col(self.id_col) == url).select("spans").collect()
        self.pages_fetched.append(url)
        if not rows:
            return None
        return sorted(
            ({"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"],
              "offset": s["offset"]} for s in rows[0]["spans"]),
            key=lambda s: s["offset"],
        )

    def run(self, spec: dict, action: str | None = None) -> MultipageState:
        state = MultipageState()
        actions = spec["actions"]
        name = action or spec.get("main") or next(iter(actions))
        self._run_steps(actions, actions[name], state)
        return state

    def _run_steps(self, actions: dict, steps: list[dict], state: MultipageState) -> None:
        for step in steps:
            if "variable" in step:
                v = step["variable"]
                state.set(v["name"], state.interpolate(str(v["value"])))
            elif "page" in step:
                url = state.interpolate(step["page"])
                spans = self._fetch_spans(url)
                if spans is None:
                    continue
                if "extract" in step:
                    res = match_spans(spans, compile_pattern(step["extract"]))
                    if res:
                        for var, val in res:
                            state.set(var, val)
            elif "loop" in step:
                lp = step["loop"]
                values = state.get_all(lp["over"]) if isinstance(lp["over"], str) else list(lp["over"])
                for v in values:
                    state.set(lp["var"], v)
                    self._run_steps(actions, lp["do"], state)
            elif "if" in step:
                c = step["if"]
                taken = state.get(c["var"]) == c.get("equals")
                branch = c.get("then", []) if taken else c.get("else", [])
                self._run_steps(actions, branch, state)
            elif "call" in step:
                self._run_steps(actions, actions[step["call"]], state)
            else:  # pragma: no cover
                raise ValueError(f"unknown multipage step: {step}")
