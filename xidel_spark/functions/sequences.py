"""XPath sequence operations over array columns (1-based semantics).

The reference's sequences are flat ordered value lists (readme.txt:143-147);
on Spark a sequence is an ArrayType cell. These wrappers preserve XPath's
1-based indexing and edge rules on top of Catalyst array functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def index_of(arr: Column, value: Column | str) -> Column:
    """fn:index-of — ALL 1-based positions of value (XPath returns a
    sequence, not just the first hit)."""
    value = F.lit(value) if isinstance(value, str) else value
    return F.filter(
        F.transform(arr, lambda x, i: F.when(x == value, i + 1).otherwise(F.lit(None))),
        lambda p: p.isNotNull(),
    )


def distinct_values(arr: Column) -> Column:
    return F.array_distinct(arr)


def subsequence(arr: Column, start: int, length: int | None = None) -> Column:
    """fn:subsequence — 1-based start."""
    if length is None:
        return F.slice(arr, start, F.size(arr))
    return F.slice(arr, start, length)


def insert_before(arr: Column, pos: int, value: Column) -> Column:
    head = F.slice(arr, 1, pos - 1) if pos > 1 else F.array().cast("array<string>")
    tail = F.slice(arr, pos, F.greatest(F.size(arr) - (pos - 1), F.lit(0)))
    return F.concat(head, F.array(value), tail)


def remove_at(arr: Column, pos: int) -> Column:
    """fn:remove — drop the item at 1-based pos."""
    return F.filter(arr, lambda x, i: i + 1 != pos)


def reverse_seq(arr: Column) -> Column:
    return F.reverse(arr)


def head(arr: Column) -> Column:
    # try_element_at: empty sequence → empty (NULL), not an ANSI error
    return F.try_element_at(arr, F.lit(1))


def tail(arr: Column) -> Column:
    return F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0)))


def sort_seq(arr: Column) -> Column:
    return F.array_sort(arr)
