"""XQuery 3.1 map:/array: modules + JSONiq jn:/libjn: functions on columns.

The reference ships the full fn/map/array/jn/libjn libraries (467
signatures in internettools web/functions.xml; readme.txt:139-176 shows the
JSON surface). These are the high-traffic ones, re-expressed as thin
Catalyst wrappers over Spark map/array columns — each stays inside
whole-stage codegen.

Naming: map:get → map_get etc.; jn:members returns the array itself (Spark
rows model sequences as arrays); jn:null()/jn:is-null use a NULL-marker
string since the engine models JSON null per --json-mode
(functions/jsonmode.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# ---- map: module (XQuery 3.1 §17.1) ---------------------------------------

def map_size(m: Column) -> Column:
    return F.size(m)


def map_keys(m: Column) -> Column:
    """map:keys — sorted here: Spark map iteration order is insertion-based
    and engine-specific, a sorted key list is the deterministic choice."""
    return F.array_sort(F.map_keys(m))


def map_contains(m: Column, key) -> Column:
    return F.array_contains(F.map_keys(m), key)


def map_get(m: Column, key) -> Column:
    return F.try_element_at(m, F.lit(key) if isinstance(key, str) else key)


def map_put(m: Column, key, value) -> Column:
    """map:put — later entry wins on duplicate keys (map_concat keeps the
    LAST duplicate under spark.sql.mapKeyDedupPolicy=LAST_WIN; we filter
    the old key out first so the semantics hold under any policy)."""
    kept = F.map_filter(m, lambda k, _: k != key)
    return F.map_concat(
        kept, F.map_from_arrays(F.array(F.lit(key)), F.array(value))
    )


def map_remove(m: Column, key) -> Column:
    return F.map_filter(m, lambda k, _: k != key)


def map_entry(key, value) -> Column:
    return F.map_from_arrays(F.array(F.lit(key)), F.array(value))


def map_merge(*maps: Column) -> Column:
    """map:merge with the default 'use-first' duplicate policy: earlier
    maps win, so concat in reverse with the later-filtered-out keys."""
    out = maps[0]
    for m in maps[1:]:
        missing = F.map_filter(
            m, lambda k, _: ~F.array_contains(F.map_keys(out), k)
        )
        out = F.map_concat(out, missing)
    return out


# ---- array: module (XQuery 3.1 §17.3) -------------------------------------

def array_size(a: Column) -> Column:
    return F.size(a)


def array_get(a: Column, i) -> Column:
    """array:get — 1-based; out-of-range answers empty (try_ semantics;
    the reference raises FOAY0001, callers that need the error check size)."""
    return F.try_element_at(a, F.lit(i) if isinstance(i, int) else i)


def array_head(a: Column) -> Column:
    return F.try_element_at(a, F.lit(1))


def array_tail(a: Column) -> Column:
    return F.slice(a, 2, F.greatest(F.size(a) - 1, F.lit(0)))


def array_reverse(a: Column) -> Column:
    return F.reverse(a)


def array_join_arrays(*arrays: Column) -> Column:
    return F.concat(*arrays)


def array_append(a: Column, value) -> Column:
    return F.concat(a, F.array(value))


def array_subarray(a: Column, start, length=None) -> Column:
    if length is None:
        return F.slice(a, start, F.size(a))
    return F.slice(a, start, length)


def array_insert_before(a: Column, pos: int, value) -> Column:
    return F.concat(
        F.slice(a, 1, pos - 1), F.array(value), F.slice(a, pos, F.size(a))
    )


def array_remove(a: Column, pos: int) -> Column:
    return F.concat(F.slice(a, 1, pos - 1), F.slice(a, pos + 1, F.size(a)))


def array_flatten(a: Column) -> Column:
    """array:flatten over one nesting level (deep flattening is repeated
    application; Spark arrays are homogeneously typed)."""
    return F.flatten(a)


def array_for_each(a: Column, f) -> Column:
    return F.transform(a, f)


def array_filter(a: Column, f) -> Column:
    return F.filter(a, f)


def array_fold_left(a: Column, zero, f) -> Column:
    return F.aggregate(a, zero, f)


# ---- jn: / libjn: (JSONiq, readme.txt:139-160) -----------------------------

def jn_keys(m: Column) -> Column:
    return map_keys(m)


def jn_size(a: Column) -> Column:
    return F.size(a)


def jn_members(a: Column) -> Column:
    return a


def libjn_values(m: Column) -> Column:
    """libjn:values — values in key-sorted order (see map_keys)."""
    return F.transform(map_keys(m), lambda k: F.try_element_at(m, k))


def libjn_intersect(a: Column, b: Column) -> Column:
    """libjn:intersect over two objects: keys present in both, values from
    the first (the reference's object intersection)."""
    return F.map_filter(a, lambda k, _: F.array_contains(F.map_keys(b), k))


def libjn_project(m: Column, keys: Column) -> Column:
    """libjn:project — keep only the listed keys."""
    return F.map_filter(m, lambda k, _: F.array_contains(keys, k))


def libjn_remove_keys(m: Column, keys: Column) -> Column:
    return F.map_filter(m, lambda k, _: ~F.array_contains(keys, k))


def libjn_accumulate(maps: Column) -> Column:
    """libjn:accumulate over an array of objects: first value per key wins."""
    empty = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>")
    )
    return F.aggregate(
        maps,
        empty,
        lambda acc, m: F.map_concat(
            acc, F.map_filter(m, lambda k, _: ~F.array_contains(F.map_keys(acc), k))
        ),
    )
