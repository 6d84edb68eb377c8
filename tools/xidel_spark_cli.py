"""xidel-style CLI over the Spark engine — the reference's core invocation
shape (readme.txt:1-60):

    python tools/xidel_spark_cli.py '<a>3</a>' -e ' 3 + . '
    python tools/xidel_spark_cli.py page.html -e "//a/@href" -e 'count(//a)'
    python tools/xidel_spark_cli.py '<p class="c">x</p>' -e 'p.c'   # CSS auto
    echo '<a>3</a>' | python tools/xidel_spark_cli.py - -e .

Inputs: a literal markup string (starts with '<'), a file path, or '-'
for stdin — the reference's TDataObject source forms (xidelbase.pas:
1393-1406). Each -e argument goes through the same extraction-kind
auto-detection the engine uses (pattern/css/xpath) and evaluates through
the selector engine or the expression compiler. Output honors
--output-format / --output-separator / --output-header / --output-footer /
--output-declaration (io/golden_output.serialize_document byte rules).

One SparkSession on local[*]; documents parse through the same Arrow tree
builder the distributed pipeline uses — this CLI is the single-document
degenerate case of the cluster engine, not a separate code path.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="xidel_spark", add_help=True)
    p.add_argument("input", help="markup literal, file path, or '-' (stdin)")
    p.add_argument("-e", "--extract", action="append", default=[], metavar="EXPR",
                   help="expression / selector / pattern (repeatable)")
    p.add_argument("--output-format", default="adhoc",
                   choices=["adhoc", "xml", "html", "xml-wrapped", "json-wrapped", "bash", "cmd"])
    p.add_argument("--output-separator", default=None)
    p.add_argument("--output-header", default=None)
    p.add_argument("--output-footer", default=None)
    p.add_argument("--output-declaration", default=None)
    p.add_argument("--output-encoding", default="UTF-8")
    p.add_argument("--extract-kind", default="auto",
                   choices=["auto", "xpath", "css", "pattern"])
    return p


def load_markup(arg: str) -> str:
    if arg == "-":
        return sys.stdin.read()
    if arg.lstrip().startswith("<"):
        return arg
    return Path(arg).read_text()


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    markup = load_markup(args.input)

    from pyspark.sql import functions as F

    from xidel_spark.exprlang import compile_expr, detect_kind
    from xidel_spark.extract.css import compile_css
    from xidel_spark.extract.nodes import parse_auto_nodes
    from xidel_spark.extract.xpath import compile_xpath
    from xidel_spark.io.golden_output import encode_output, serialize_document
    from xidel_spark.session import get_spark

    spark = get_spark("xidel_spark_cli", master="local[*]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    nd = (
        spark.createDataFrame([(markup,)], "m string")
        .select(parse_auto_nodes(F.col("m")).alias("nodes"))
        .localCheckpoint()
    )

    cols = []
    for i, expr in enumerate(args.extract):
        kind = args.extract_kind if args.extract_kind != "auto" else detect_kind(expr)
        if kind == "pattern":
            raise SystemExit(
                "pattern templates run through extract/patterns.py specs; "
                "the CLI accepts xpath/css expressions"
            )
        if kind == "css":
            col = compile_css(expr).values(F.col("nodes"))
        else:
            col = compile_expr(expr).values(nodes=F.col("nodes"))
        cols.append(col.alias(f"e{i}"))
    row = nd.select(*cols).first() if cols else None

    items: list[tuple[str | None, str]] = []
    if row is not None:
        for i in range(len(args.extract)):
            for v in row[f"e{i}"] or []:
                items.append((None, v))
    out = serialize_document(
        items,
        fmt=args.output_format,
        separator=args.output_separator,
        header=args.output_header,
        footer=args.output_footer,
        declaration=args.output_declaration,
        encoding=args.output_encoding,
    )
    sys.stdout.buffer.write(encode_output(out, args.output_encoding))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
