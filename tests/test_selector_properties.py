"""Property-based cross-check of the selector engine.

Random trees × random path expressions: the Catalyst higher-order-function
engine (extract/xpath.py) must agree with an independent, obviously-correct
Python reference evaluator that walks the same node list with plain loops.
The expressions go through the real parser, so grammar + compiler + axis
algebra are all under test.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from xidel_spark.extract.nodes import NODES_TYPE, _parse_xml_py
from xidel_spark.extract.xpath import REVERSE_AXES, compile_xpath

TAGS = ["a", "b", "c"]
ATTRS = ["k", "m"]


@st.composite
def trees(draw, depth=0):
    tag = draw(st.sampled_from(TAGS))
    attrs = {
        a: draw(st.sampled_from(["1", "2"]))
        for a in ATTRS
        if draw(st.booleans())
    }
    n_kids = 0 if depth >= 3 else draw(st.integers(0, 3))
    kids = [draw(trees(depth + 1)) for _ in range(n_kids)]  # type: ignore[call-arg]
    return (tag, attrs, kids)


def render(t) -> str:
    tag, attrs, kids = t
    a = "".join(f' {k}="{v}"' for k, v in attrs.items())
    return f"<{tag}{a}>" + "".join(render(k) for k in kids) + f"</{tag}>"


@st.composite
def path_exprs(draw):
    steps = []
    first_axis = draw(st.sampled_from(["//", "/"]))
    n = draw(st.integers(1, 3))
    for i in range(n):
        if i == 0:
            prefix = first_axis
        else:
            prefix = draw(st.sampled_from(["/", "//"]))
        axis = draw(st.sampled_from(
            ["", "", "", "following-sibling::", "preceding-sibling::",
             "parent::", "ancestor::", "descendant::"]
        ))
        test = draw(st.sampled_from(TAGS + ["*"]))
        pred = draw(st.sampled_from(
            ["", "[1]", "[2]", "[last()]", "[@k]", "[@k='1']", "[@m='2']"]
        ))
        steps.append(f"{prefix}{axis}{test}{pred}")
    return "".join(steps)


# ---------------------------------------------------------------------------
# independent reference evaluator (plain loops over the node dict list)
# ---------------------------------------------------------------------------

def _ref_axis(nodes, c, axis):
    byid = {n["id"]: n for n in nodes}
    if axis == "child":
        out = [n for n in nodes if n["parent"] == c["id"]]
    elif axis == "descendant":
        out = [n for n in nodes if c["id"] in n["anc"]]
    elif axis == "descendant-or-self":
        out = [n for n in nodes if c["id"] in n["anc"] or n["id"] == c["id"]]
    elif axis == "parent":
        out = [byid[c["parent"]]] if c["parent"] >= 0 else []
    elif axis == "ancestor":
        out = [byid[a] for a in c["anc"]]
    elif axis == "following-sibling":
        out = [n for n in nodes if n["parent"] == c["parent"] and n["id"] > c["id"]]
    elif axis == "preceding-sibling":
        out = [n for n in nodes if n["parent"] == c["parent"] and n["id"] < c["id"]]
    elif axis == "self":
        out = [c]
    else:  # pragma: no cover
        raise ValueError(axis)
    out.sort(key=lambda n: n["id"])
    if axis in REVERSE_AXES:
        out.reverse()  # axis order for positional predicates
    return out


def _ref_test(n, test):
    if test == "*":
        return not n["tag"].startswith("#")
    if test == "node()":
        return n["tag"] != "#skip"
    return n["tag"] == test


def _ref_eval(nodes, path):
    ctx = [nodes[0]]
    for step in path.steps:
        nxt_ids = set()
        ordered = []
        for c in ctx:
            matched = [n for n in _ref_axis(nodes, c, step.axis) if _ref_test(n, step.test)]
            for p in step.preds:
                kind = p[0]
                if kind == "pos":
                    matched = matched[p[1] - 1 : p[1]]
                elif kind == "last":
                    i = len(matched) - 1 - p[1]
                    matched = matched[i : i + 1] if i >= 0 else []
                elif kind == "attr-exists":
                    matched = [n for n in matched if p[1] in (n["attrs"] or {})]
                elif kind == "attr-cmp":
                    _, name, op, val = p
                    matched = [
                        n for n in matched
                        if (n["attrs"] or {}).get(name) is not None
                        and ((n["attrs"][name] == val) == (op == "="))
                    ]
                else:  # pragma: no cover
                    raise ValueError(p)
            for n in matched:
                if n["id"] not in nxt_ids:
                    nxt_ids.add(n["id"])
                    ordered.append(n)
        ordered.sort(key=lambda n: n["id"])
        ctx = ordered
    return [n["id"] for n in ctx]


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(tree=trees(), expr=path_exprs())
def test_catalyst_engine_matches_reference_evaluator(spark, tree, expr):
    nodes = _parse_xml_py(render(tree))
    try:
        sel = compile_xpath(expr)
    except ValueError:
        return  # grammar rejections are out of scope here
    expected = _ref_eval(nodes, sel.paths[0])
    df = spark.createDataFrame([(nodes,)], f"nodes: {NODES_TYPE.simpleString()}")
    [row] = df.select(sel.ids(F.col("nodes")).alias("ids")).collect()
    assert list(row["ids"]) == expected, (expr, render(tree))
