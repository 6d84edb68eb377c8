"""--json-mode compatibility matrix (standard / jsoniq / deprecated / unified).

The reference parameterizes its whole JSON surface on one switch
(TXQueryCompatibilityOptions, xidelbase.pas:562-570; configureParsers at
691-731), pinned by tests/tests.sh:322-366 with goldens
tests/output/jsonmode/*. The behavioral axes, extracted from those goldens
(data file tests/data2.json = ``[null, {"a": null, "b": 1}]``):

| axis                                  | standard | jsoniq | deprecated | unified |
|---------------------------------------|----------|--------|------------|---------|
| parsed JSON null is an ITEM (count 1) | no       | yes    | yes        | no      |
| () in constructors becomes null       | no       | yes    | no         | no      |
| object value (1,2) becomes an array   | no       | yes    | no         | no      |
| [..] flattens member sequences        | no       | yes    | yes        | no      |
| node values copied (root re-anchored) | no       | yes    | no         | no      |
| bare true/false/null literals         | no       | yes    | yes        | yes     |
| {"a":1}.a dot notation                | no       | no     | yes        | yes     |

Spark-first re-expression: modes are a frozen config; the mode-dependent
operations are pure Column transforms (`null_count`, `is_null`,
`ctor_array_size`, `member_counts`) usable on any parsed-JSON columns.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class JsonMode:
    name: str
    null_is_item: bool
    ctor_empty_to_null: bool
    ctor_seq_to_array: bool
    array_flattens: bool
    copies_nodes: bool
    json_literals: bool
    dot_notation: bool


MODES: dict[str, JsonMode] = {
    "standard": JsonMode("standard", False, False, False, False, False, False, False),
    "jsoniq": JsonMode("jsoniq", True, True, True, True, True, True, False),
    "deprecated": JsonMode("deprecated", True, False, False, True, False, True, True),
    "unified": JsonMode("unified", False, False, False, False, False, True, True),
}
# --json-mode default == unified (tests.sh:325 'jsonmode/default')
MODES["default"] = MODES["unified"]


def null_count(is_json_null: Column, mode: JsonMode) -> Column:
    """count($v) where $v is a parsed JSON slot: a literal JSON null is an
    item under jsoniq/deprecated, the empty sequence under standard/unified
    (goldens jsonmode/*-null)."""
    if mode.null_is_item:
        return F.lit(1)
    return F.when(is_json_null, F.lit(0)).otherwise(F.lit(1))


def is_null(is_json_null: Column, mode: JsonMode) -> Column:
    """jn:is-null($v): only a null ITEM is null — in empty-sequence modes
    the slot vanished, so is-null sees () and answers false."""
    if mode.null_is_item:
        return is_json_null
    return F.lit(False)


def ctor_object_value_count(member_count: Column, mode: JsonMode) -> Column:
    """count($o?k) for map/object constructor {"k": <seq of n items>}:
    jsoniq turns () into null (count 1) and (1,2) into ONE array;
    the other modes keep the sequence as-is (goldens jsonmode/{standard,
    jsoniq,deprecated,default} columns 1 and 3)."""
    if mode.ctor_empty_to_null and mode.ctor_seq_to_array:
        return F.lit(1)  # () → null, seq → array: always exactly one item
    return member_count


def ctor_array_size(member_counts: Column, mode: JsonMode) -> Column:
    """array:size([m1, m2, ...]) given each member expression's item count
    (array<int>): flattening modes (jsoniq/deprecated) splice every item —
    an () member simply vanishes, it does NOT become null (golden
    jsonmode/jsoniq column 5 is 4, not 5); standard/unified keep one member
    per expression (golden column 5: 3)."""
    if mode.array_flattens:
        return F.aggregate(member_counts, F.lit(0), lambda a, c: a + c)
    return F.size(member_counts)


def member_item_counts(member_counts: Column, mode: JsonMode, upto: int = 3) -> Column:
    """string-join((1 to upto)! count($a(.))) — item counts of the first
    `upto` members after construction (goldens column 6: '013' vs '111'):
    flattened members are single items; kept members report their sequence
    length; indexes past the array answer 0 items (empty lookup)."""
    if mode.array_flattens:
        sz = F.least(ctor_array_size(member_counts, mode), F.lit(upto))
        filler = F.when(sz < upto, F.array_repeat(F.lit("0"), F.lit(upto) - sz)).otherwise(
            F.array().cast("array<string>")
        )
        ones = F.transform(F.sequence(F.lit(1), sz), lambda _: F.lit("1"))
        return F.array_join(F.concat(ones, filler), "")
    return F.array_join(
        F.transform(F.slice(member_counts, 1, upto), lambda c: c.cast("string")), ""
    )


def root_name_of_node_value(orig_root: Column, node_name: Column, mode: JsonMode) -> Column:
    """name(root($o?b)) for a node value: jsoniq COPIES nodes into
    constructors, so the copy's root is the node itself; other modes keep
    the original tree (goldens column 2: 'b' vs 'a')."""
    return F.lit(node_name) if mode.copies_nodes else orig_root


def parse_literal(token: Column, mode: JsonMode) -> Column:
    """bare true/false/null tokens: literal values when json_literals, else
    a path-step lookup (which fails against no context → empty/null)."""
    if mode.json_literals:
        return F.when(token.isin("true", "false", "null"), token)
    return F.lit(None).cast("string")


def dot_access(obj: Column, key: str, mode: JsonMode) -> Column:
    """{"a":1}.a — deprecated/unified extension; standard/jsoniq reject it
    (goldens jsonmode/*-dotnotation)."""
    if mode.dot_notation:
        return F.try_element_at(obj, F.lit(key))
    return F.lit(None).cast("string")
