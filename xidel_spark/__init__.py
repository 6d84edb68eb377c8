"""xidel_spark — a PySpark-native crawl-frontier + extraction engine.

A from-scratch reimplementation of the *semantics* of benibela/xidel's
``--follow``/``--extract`` recursive-fetch loop (reference at
/root/reference/xidelbase.pas) as a distributed Spark pipeline:

- documents are rows of an interleaved text+media spans table
  (``doc_id, spans: array<struct<kind,text,media_ref,offset>>``),
- the crawl frontier / URL-seen set / DFS crawl order are computed as
  iterative DataFrame fixpoints (no per-row Python in the hot path),
- extraction is vectorized (built-in column functions first, Arrow-batched
  pandas UDFs where semantics demand).

Nothing in here is a port: the reference is a single-threaded Pascal CLI;
this package re-expresses what it computes on Spark's execution model.
"""

__version__ = "0.1.0"
