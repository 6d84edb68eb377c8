"""Download sink — the reference's --download target resolution + save.

Path rules are a faithful re-derivation of `TDownload.process`
(xidelbase.pas:999-1075), pinned by /root/reference/tests/downloadTests.sh:

  target 'foo/bar/xyz' → directory foo/bar, name xyz
  target 'foo/bar/'    → foo/bar/<url path>/<basename>
  target 'foo/bar/.'   → foo/bar/<basename>
  target '.'/'./.'/existing dir → <dir>/<basename>
  target './'          → ./<url path>/<basename>
  target '-'           → stdout (returned as None path)
  empty basename       → index.html; query/#fragment never reach the name;
  Content-Disposition filename overrides the url; '..' is scrubbed.

Spark form: the path is a vectorized column (one Arrow batch per
partition), and the save is executor-side `foreachPartition` writes — the
object-store pattern; no driver collect.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..urlnorm import _remove_dot_segments


def resolve_download_path(
    url: str,
    target: str,
    content_disposition_name: str | None = None,
    is_existing_dir=lambda p: False,
) -> str | None:
    """None means 'print to stdout' (target '-')."""
    real_url = url
    if "://" in real_url:  # remote: keep only the path component
        rest = real_url.split("://", 1)[1]
        real_url = "/" + rest.split("/", 1)[1] if "/" in rest else ""
        real_url = real_url.split("#", 1)[0].split("?", 1)[0]
    if content_disposition_name:
        real_url = content_disposition_name
    j = real_url.rfind("/")
    if j < 0:
        real_path, real_file = "", real_url
    else:
        real_path, real_file = real_url[: j + 1], real_url[j + 1 :]
    if ".." in real_path:
        real_path = real_path.lstrip("/").replace("\\", "/")
        real_path = _remove_dot_segments("/" + real_path)
    real_path = real_path.lstrip("/")

    to = target
    for pre in ("http://", "https://"):
        if to.lower().startswith(pre):
            to = to[len(pre):]
    if to == "-":
        return None
    if to.endswith("/."):
        to = to + "/" + real_file
    elif to.endswith("/"):
        to = to + "/" + real_path + real_file
    elif to == "." or is_existing_dir(to):
        to = to + "/" + real_file
    if to.endswith("/") or to == "":
        to += "index.html"
    # filesystem-normalize: // and /./ are the same file
    while "//" in to:
        to = to.replace("//", "/")
    while "/./" in to:
        to = to.replace("/./", "/")
    if to.startswith("./"):
        to = to[2:]
    return to


def download_path_col(url: Column, target: str) -> Column:
    @F.pandas_udf(StringType())
    def _resolve(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: resolve_download_path(u, target))

    return _resolve(url)


def download_sink(
    docs: DataFrame, out_root: str, *, target: str = "./", url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """(url, path) after writing each body to out_root/<resolved path> from
    the executors (foreachPartition — the object-store write pattern)."""
    planned = docs.select(
        F.col(url_col).alias("url"),
        F.col(body_col).alias("body"),
        download_path_col(F.col(url_col), target).alias("path"),
    )

    def write_partition(rows):
        for r in rows:
            if r["path"] is None:
                continue
            full = os.path.join(out_root, r["path"])
            os.makedirs(os.path.dirname(full) or ".", exist_ok=True)
            with open(full, "w") as f:
                f.write(r["body"] or "")

    planned.foreachPartition(write_partition)
    return planned.select("url", "path")
