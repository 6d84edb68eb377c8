"""Expression language: the reference's -e string surface compiled to
pure Catalyst columns (parser.py grammar, compiler.py value model).

    from xidel_spark.exprlang import compile_expr, detect_kind
    ce = compile_expr("if ($a > 5) then 'big' else 'small'")
    df.select(ce.column(env={"a": F.col("a")}))
"""

from .compiler import CompiledExpr, Compiler, TV, compile_expr
from .parser import detect_kind, parse_expr

__all__ = [
    "CompiledExpr",
    "Compiler",
    "TV",
    "compile_expr",
    "parse_expr",
    "detect_kind",
]
