"""DFS-rank encoding for crawl order.

The reference's crawl order is depth-first, link-document-order: a followed
document is fully processed (including its own follows) before its later
siblings (xidelbase.pas:2007-2020 `processFollowTo`, top loop 2115-2121;
goldens tests/output/{tef,maxlevel0..3}).

We reproduce that order as a *sort key* rather than control flow: every
visit gets a rank string made of fixed-width lowercase-hex segments, one
segment per tree level: ``rank(child) = rank(parent) || seg(link_index)``.
Because segments are fixed width, plain string comparison equals
lexicographic path comparison, and a parent's rank (a strict prefix) sorts
before all of its descendants — exactly DFS pre-order.

Width 8 hex digits supports 2^32 links per page / seeds per run.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SEG_WIDTH = 8
SEG_FMT = "%08x"


def seg(idx: Column | int) -> Column:
    """Fixed-width hex segment for a link/seed index (Catalyst expression)."""
    if isinstance(idx, int):
        return F.lit(SEG_FMT % idx)
    return F.format_string(SEG_FMT, idx)


def seg_py(idx: int) -> str:
    return SEG_FMT % idx
