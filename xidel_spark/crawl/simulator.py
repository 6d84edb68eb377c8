"""Sequential reference simulator of xidel's follow loop (test oracle).

A faithful, driver-side Python re-implementation of the reference's
recursive fetch loop, used ONLY as a test oracle to validate the
distributed engine on small graphs (including by property-based tests):

- `TProcessingContext.process` (xidelbase.pas:1996-2137): top-level FIFO of
  data sources, then recursive descent.
- `TFollowToList.add` (xidelbase.pas:1484-1491): dedup happens at ENQUEUE
  time against the global duplication list; a deduped entry never reaches
  the frontier. Items are added to the dup list even if the depth limit
  later prevents their retrieval (`processFollowTo`, xidelbase.pas:2007-2020
  checks `recursionLevel + 1 <= followMaxLevel` at fetch time, after the
  enqueue already registered them).
- depth: seeds are level 0; children level = parent + 1.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class SimResult:
    visit_order: list[str] = field(default_factory=list)   # urls in visit order (repeats if dedup off)
    visit_depths: list[int] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)            # every enqueued url (the dup list)


def simulate_crawl(
    links: dict[str, list[str]],
    seeds: list[str],
    *,
    max_depth: int | None = None,
    dedup: bool = True,
) -> SimResult:
    """Replay xidel's sequential crawl semantics.

    `links[url]` is the document's outgoing link targets in document order.
    `max_depth=None` means unlimited (reference default 99999).
    """
    if max_depth is None:
        max_depth = 1 << 30
    res = SimResult()

    def enqueue(target_list: list[tuple[str, int]], url: str, depth: int) -> None:
        # TFollowToList.add: drop iff an equal request was EVER enqueued.
        if dedup:
            if url in res.seen:
                return
            res.seen.add(url)
        else:
            res.seen.add(url)
        target_list.append((url, depth))

    def visit(url: str, depth: int) -> None:
        res.visit_order.append(url)
        res.visit_depths.append(depth)
        children: list[tuple[str, int]] = []
        for child in links.get(url, []):
            enqueue(children, child, depth + 1)
        # processFollowTo: fetch children only if depth+1 <= max_depth;
        # each child fully processed (DFS) before its later siblings.
        if depth + 1 <= max_depth:
            for child, d in children:
                visit(child, d)

    frontier: list[tuple[str, int]] = []
    for s in seeds:
        enqueue(frontier, s, 0)
    # top-level loop (xidelbase.pas:2115-2121): FIFO over data sources
    for url, depth in frontier:
        if depth <= max_depth:
            visit(url, depth)
    return res
