"""Expression compiler: AST → pure Catalyst columns.

Value model: a compile-time-typed value TV(col, kind), kind one of
  'long' 'double' 'string' 'bool' 'null' 'any'        (scalars)
  'nodes'                                             (array<int> node ids)
  'seq:<scalar-kind>'                                 (array columns)

Everything compiles to built-in pyspark.sql.functions — no Python UDFs, so
expressions stay in whole-stage codegen and embed inside higher-order
lambdas (for/some/every compile to transform/exists/forall).

Weak-typing rules (readme.txt:167-176):
  * arithmetic coerces operands with try_cast (1 + "2" = 3);
  * general comparison dispatches on static kinds: numeric if either side
    is numeric, boolean if either side is boolean ('false' = false() is
    true), else xidel's case-insensitive numeric-aware collation
    ('9xy' = '9XY' < '10XY' < 'xy') via the pure-Catalyst collation key;
  * sequences compare existentially (//a = 'x' ⇔ some item equals).

Node-set atomization takes the node's string value (extract/nodes.py keeps
the full string value on each node row).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..extract.xpath import Path, _eval_steps
from ..functions.collation import collation_key_expr
from . import parser as P

NUM_KINDS = {"long", "double"}

# Static recursion bound for JSON tree walks (_jstring / _json_descend).
# Catalyst has no recursion, so nesting unrolls into the expression tree;
# the bound is an expression-SIZE ceiling, not a row scan. Walks that
# would truncate raise at runtime instead of returning silently
# incomplete results; deep corpora raise the bound via this env knob.
JSON_DEPTH = int(os.environ.get("XIDEL_SPARK_JSON_DEPTH", "6"))
_SPARK_TYPE = {
    "long": "bigint",
    "double": "double",
    "string": "string",
    "bool": "boolean",
    "nodes": "int",
    "null": "string",
    "any": "string",
    "xmlstr": "string",  # serialized constructed nodes
}


@dataclass
class TV:
    col: Column
    kind: str
    # for 'nodes' values: the node array the ids index into. None = the
    # compiler's context document; a static document literal
    # ('(<html>..</html>)//td') carries its own constant array here.
    backing: Column | None = None
    # for JSONiq object/array literals: the canonical compact JSON
    # serialization of the item ('[1,2,{"a":123}]') — the value space stays
    # the seq/map model, this rides along for json output forms
    jtext: Column | None = None
    # for 'jsonv' values: the STATIC null flavor when known (env-bound
    # $json); None = runtime-only (sequence elements)
    jnull: bool | None = None
    # constructor type for --print-type-annotations ('xs:int' etc.)
    atype: str | None = None
    # STATIC container contents for literal maps/arrays whose keys are
    # constants: dict[str, TV] | list[TV]. Lets heterogeneous values
    # (node sets, empty sequences, ranges) survive inside containers —
    # the runtime col remains the string-typed degradation
    # (jsonmode/standard golden: map {"b": $x} → name(root($o?b)))
    static_items: object | None = None

    @property
    def is_seq(self) -> bool:
        return self.kind == "nodes" or self.kind.startswith("seq:")

    @property
    def elem_kind(self) -> str:
        if self.kind == "nodes":
            return "nodes"  # one node id — context items stay node-kinded
        if self.kind.startswith("seq:"):
            return self.kind[4:]
        return self.kind


def _empty_seq(elem_kind: str) -> Column:
    return F.array().cast(f"array<{_SPARK_TYPE.get(elem_kind, 'string')}>")


class XQError(ValueError):
    """a DYNAMIC XQuery error the reference reports to stderr and prints
    nothing for (e.g. ebv of a multi-item sequence in standard json-mode);
    the harness emits no output for the action and continues. Carries the
    error code as (ns, local) so multipage <try>/<catch errors="..">
    clauses can match (goldens multipageTry/multipageTryHttp)."""

    def __init__(self, msg: str, ns: str = "err", local: str | None = None):
        super().__init__(msg)
        self.ns = ns
        self.local = local if local is not None else msg.split(":", 1)[0].strip()


def jsonv(variant: Column, nulls_are_items: bool) -> Column:
    """deep JSON value: struct<v: variant, jn: boolean>. `jn` carries the
    json-mode null flavor AT RUNTIME (jsoniq/deprecated: null is an item;
    standard/unified: null accesses are the empty sequence) so values from
    different parse functions stay distinguishable inside one sequence
    (jsonmode/*-equals goldens)."""
    return F.struct(variant.alias("v"), F.lit(nulls_are_items).alias("jn"))


class Compiler:
    """One compilation context: variable env + optional node array/context.

    env values may be plain Columns (kind 'any') or TVs. `nodes` is the
    per-row node-struct array (extract/nodes.py) that path expressions
    evaluate against; `ctx` is the context item for '.' (defaults to the
    document root node when `nodes` is given).
    """

    def __init__(
        self,
        env: Mapping[str, Column | TV] | None = None,
        nodes: Column | None = None,
        ctx: TV | None = None,
        pos: Column | None = None,
        size: Column | None = None,
        funcs: Mapping[str, "P.FuncDecl"] | None = None,
        dot_notation: bool = True,
        json_mode: str = "unified",
        annotate: bool = False,
    ):
        self.funcs = dict(funcs or {})
        self.dot_notation = dot_notation
        self.json_mode = json_mode
        self.annotate = annotate
        self._call_depth = 0
        self.env = dict(env or {})
        self.nodes = nodes
        if ctx is None and nodes is not None:
            ctx = TV(F.array(F.lit(0).cast("int")), "nodes")
        self.ctx = ctx
        self.pos = pos
        self.size = size
        # xidel `var := value` extension: assignments recorded here feed
        # the variable change log (extract/changelog.py); hidden indexes
        # were cleared by x:clear-log (varlog goldens)
        self.assignments: list[tuple[str, TV]] = []
        self.hidden_assignments: set[int] = set()

    def bind(self, **kw) -> "Compiler":
        c = Compiler(self.env, self.nodes, self.ctx, self.pos, self.size, self.funcs,
                     dot_notation=self.dot_notation, json_mode=self.json_mode,
                     annotate=self.annotate)
        c.assignments = self.assignments  # shared: nested assigns surface
        c.hidden_assignments = self.hidden_assignments
        c._call_depth = self._call_depth
        if getattr(self, "doc_loader", None) is not None:
            c.doc_loader = self.doc_loader  # fn:doc hook survives rebinding
        for k, v in kw.items():
            if k == "__ctx":
                c.ctx = v
            elif k == "__pos":
                c.pos = v
            elif k == "__size":
                c.size = v
            else:
                c.env[k] = v
        return c

    # -- coercions ----------------------------------------------------------

    def _backing(self, tv: TV | None = None) -> Column:
        """the node array a nodeset indexes: its own literal backing (doc
        constructors) or the compiler's context document."""
        if tv is not None and tv.backing is not None:
            return tv.backing
        if self.nodes is None:
            raise ValueError("expr: node value requested without a node array")
        return self.nodes

    def _first(self, tv: TV) -> TV:
        """first item of a sequence (XPath scalar contexts atomize);
        empty sequence → NULL (try_element_at — ANSI element_at raises)."""
        if tv.kind == "nodes":
            first = F.try_element_at(tv.col, F.lit(1))
            return TV(
                F.when(first.isNotNull(), self._node_text(first, tv)), "string"
            )
        if tv.kind.startswith("seq:"):
            return TV(F.try_element_at(tv.col, F.lit(1)), tv.elem_kind)
        return tv

    def _node_text(self, node_id: Column, tv: TV | None = None) -> Column:
        return F.element_at(self._backing(tv), node_id.cast("int") + 1)["text"]

    def to_number(self, tv: TV) -> Column:
        tv = self._first(tv)
        if tv.kind == "double":
            return tv.col
        if tv.kind == "long":
            return tv.col.cast("double")
        if tv.kind == "bool":
            return F.when(tv.col, F.lit(1.0)).otherwise(F.lit(0.0))
        return tv.col.cast("string").try_cast("double")

    def to_long(self, tv: TV) -> Column:
        tv = self._first(tv)
        if tv.kind == "long":
            return tv.col
        return self.to_number(tv).cast("long")

    def to_string(self, tv: TV) -> Column:
        tv = self._first(tv)
        if tv.kind == "string":
            return tv.col
        if tv.kind == "long":
            return tv.col.cast("string")
        if tv.kind == "double":
            c = tv.col
            return (
                F.when(F.isnan(c), F.lit("NaN"))
                .when(c == F.lit(float("inf")), F.lit("INF"))
                .when(c == F.lit(float("-inf")), F.lit("-INF"))
                # IEEE negative zero prints as '-0' (reference goldens
                # division/multiplication matrices); CAST(-0.0 AS STRING)
                # is the only Catalyst form that still sees the sign
                .when(
                    (c == F.lit(0.0)) & c.cast("string").startswith("-"),
                    F.lit("-0"),
                )
                .when(
                    (c == F.floor(c)) & (F.abs(c) < F.lit(1e15)),
                    c.cast("long").cast("string"),
                )
                .otherwise(c.cast("string"))
            )
        if tv.kind == "bool":
            return F.when(tv.col, F.lit("true")).otherwise(F.lit("false"))
        if tv.kind == "map":
            return F.to_json(tv.col)
        if tv.kind == "jsonv":
            if tv.jnull is False:
                # standard/unified: the top-level array IS a sequence —
                # atomizing it for a string context is err:XPTY0004
                # (jsonmode/standard-stringvalue prints nothing)
                raise XQError("XPTY0004: sequence in string context")
            return self._jstring(tv.col["v"])
        return tv.col.cast("string")

    def _jstring(self, v: Column, depth: int | None = None) -> Column:
        """string value of a variant: null → 'null', objects → '', arrays
        concatenate member strings, scalars their lexical form
        (jsonmode/jsoniq-stringvalue: '[null,{..}]' → 'null'). Arrays
        nested past JSON_DEPTH raise instead of truncating silently."""
        if depth is None:
            depth = JSON_DEPTH
        base = F.when(v.isNull(), F.lit("")).when(
            F.coalesce(F.is_variant_null(v), F.lit(False)), F.lit("null")
        )
        scalar = F.coalesce(F.try_variant_get(v, "$", "string"), F.lit(""))
        if depth <= 0:
            # a nonempty ARRAY here would stringify incompletely — raise
            # (assert_true is NULL on ok, so the when() is a no-op wrapper)
            deep = F.coalesce(
                F.schema_of_variant(v).startswith("ARRAY")
                & (F.size(F.try_variant_get(v, "$", "array<variant>")) > 0),
                F.lit(False),
            )
            chk = F.assert_true(
                ~deep,
                F.lit("xidel_spark: JSON nested deeper than "
                      "XIDEL_SPARK_JSON_DEPTH — raise the env bound"),
            )
            # branches MUST differ or SimplifyConditionals folds the CASE
            # away and the assert never evaluates (round-5 review); at
            # runtime chk is always NULL (assert_true raised otherwise),
            # so the otherwise-branch is unreachable
            guarded = F.when(chk.isNull(), scalar).otherwise(F.lit(None))
            return base.otherwise(guarded)
        sch = F.schema_of_variant(v)
        members = F.try_variant_get(v, "$", "array<variant>")
        arr = F.concat_ws(
            "", F.transform(members, lambda m: self._jstring(m, depth - 1))
        )
        return (
            base.when(sch.startswith("ARRAY"), arr)
            .when(sch.startswith("OBJECT") | sch.startswith("STRUCT"), F.lit(""))
            .otherwise(scalar)
        )

    def ebv(self, tv: TV) -> Column:
        if tv.kind == "jsonv":
            if tv.jnull is False:
                # standard/unified: the 2-item doc array has no ebv —
                # err:FORG0006 (jsonmode/standard-boolean prints nothing)
                raise XQError("FORG0006: ebv of a multi-item sequence")
            v = tv.col["v"]
            return v.isNotNull() & ~F.coalesce(F.is_variant_null(v), F.lit(False))
        if tv.kind == "map":
            return F.size(F.map_keys(tv.col)) >= 0  # a map item is truthy
        """effective boolean value (XPath 2.0 §2.4.3)."""
        if tv.is_seq:
            return F.size(tv.col) > 0
        if tv.kind == "bool":
            return F.coalesce(tv.col, F.lit(False))
        if tv.kind in NUM_KINDS:
            c = tv.col.cast("double")
            return F.coalesce((c != 0) & ~F.isnan(c), F.lit(False))
        if tv.kind == "null":
            return F.lit(False)
        return F.coalesce(F.length(tv.col.cast("string")) > 0, F.lit(False))

    def to_seq(self, tv: TV) -> TV:
        if tv.is_seq:
            return tv
        if tv.kind == "null":
            # JSONiq null is an ITEM (count(null)=1) whose printed form is
            # the word 'null' — NOT an empty sequence (jsonmode literals)
            return TV(F.array(F.lit("null")), "seq:string")
        if tv.kind == "map":
            # a map is one item; its seq form stringifies (json text)
            return TV(F.array(self.to_string(tv)), "seq:string")
        if tv.kind == "jsonv":
            # count semantics per null flavor: absent → 0 always; a json
            # null is an item only in jsoniq/deprecated (jn=true). The seq
            # keeps the struct identity; atomize_seq stringifies.
            v, jn = tv.col["v"], tv.col["jn"]
            empty = (
                v.isNull()
                | (F.coalesce(F.is_variant_null(v), F.lit(False)) & ~jn)
            )
            return TV(
                F.when(empty, F.array().cast("array<struct<v:variant,jn:boolean>>"))
                .otherwise(F.array(tv.col)),
                "seq:jsonv",
            )
        col = F.when(tv.col.isNull(), _empty_seq(tv.kind)).otherwise(F.array(tv.col))
        return TV(col, f"seq:{tv.kind}")

    def atomize_seq(self, tv: TV) -> TV:
        """sequence of strings (node sets → string values)."""
        if tv.kind == "nodes":
            return TV(
                F.transform(tv.col, lambda i: self._node_text(i, tv)), "seq:string"
            )
        if tv.kind == "seq:jsonv":
            return TV(
                F.transform(tv.col, lambda e: self._jstring(e["v"])), "seq:string"
            )
        out = self.to_seq(tv)
        if out.kind == "seq:jsonv":
            return TV(
                F.transform(out.col, lambda e: self._jstring(e["v"])), "seq:string"
            )
        return out

    # -- dispatch -------------------------------------------------------------

    def compile(self, ast) -> TV:
        m = getattr(self, "_c_" + type(ast).__name__.lower(), None)
        if m is None:
            raise ValueError(f"expr: no compiler for {type(ast).__name__}")
        return m(ast)

    # -- leaves ---------------------------------------------------------------

    def _c_lit(self, n: P.Lit) -> TV:
        if n.kind == "null":
            return TV(F.lit(None).cast("string"), "null")
        return TV(F.lit(n.value), n.kind)

    def _c_assign(self, n: P.Assign) -> TV:
        """`$v := e` (readme.txt:131-135): evaluates to the value, binds
        the variable for LATER siblings in the same sequence (the compile
        walks sequences left-to-right over this mutable env), and records
        the assignment for the change-log surface."""
        tv = self.compile(n.value)
        self.env[n.name] = tv
        self.assignments.append((n.name, tv))
        return tv

    def _c_varref(self, n: P.VarRef) -> TV:
        if n.name not in self.env:
            raise ValueError(f"expr: unbound variable ${n.name}")
        v = self.env[n.name]
        return v if isinstance(v, TV) else TV(v, "any")

    def _c_contextitem(self, n: P.ContextItem) -> TV:
        if self.ctx is None:
            raise ValueError("expr: '.' used without a context item")
        return self.ctx

    def _c_xstring(self, n: P.XString) -> TV:
        cols = [
            F.lit(p) if isinstance(p, str) else F.coalesce(self.to_string(self.compile(p)), F.lit(""))
            for p in n.parts
        ]
        return TV(F.concat(*cols) if cols else F.lit(""), "string")

    # -- paths ----------------------------------------------------------------

    def _path_value(self, ids: Column, path: Path, backing: Column) -> TV:
        if path.attr is not None:
            attr = path.attr
            vals = F.transform(
                ids,
                lambda i: F.try_element_at(
                    F.element_at(backing, i.cast("int") + 1)["attrs"], F.lit(attr)
                ),
            )
            return TV(F.filter(vals, lambda v: v.isNotNull()), "seq:string")
        return TV(ids, "nodes", backing=backing)

    def _c_pathroot(self, n: P.PathRoot) -> TV:
        if self.ctx is not None and self.ctx.kind == "jsonv":
            return self._json_path(self.ctx, n.path)
        backing = self._backing(self.ctx if self.ctx is not None else None)
        root = self.ctx.col if (self.ctx and self.ctx.kind == "nodes") else F.array(
            F.lit(0).cast("int")
        )
        return self._path_value(_eval_steps(backing, root, n.path), n.path, backing)

    def _c_pathapply(self, n: P.PathApply) -> TV:
        base = self.compile(n.base)
        if base.kind == "jsonv":
            return self._json_path(base, n.path)
        if base.kind != "nodes":
            raise ValueError("expr: '/' step applied to a non-node value")
        backing = self._backing(base)
        return self._path_value(_eval_steps(backing, base.col, n.path), n.path, backing)

    # -- json path navigation (readme.txt:147-149; golden
    #    inputformatAutoJson: '(. / f, . // property)' over a json doc) ----

    @staticmethod
    def _json_members(v: Column) -> Column:
        """children of a json value: array members, or object field
        values (objects enumerate via a map<string,variant> cast —
        variant_get paths must be constant, so keys can't be walked)."""
        return F.coalesce(
            F.try_variant_get(v, "$", "array<variant>"),
            F.map_values(F.try_variant_get(v, "$", "map<string,variant>")),
            F.array().cast("array<variant>"),
        )

    def _json_descend(self, v: Column, name: str, depth: int | None = None) -> Column:
        """array<variant> of every `name` field in document order, any
        depth up to JSON_DEPTH (an expression-size ceiling, not a scan).
        Residual unvisited members at the floor raise at runtime rather
        than silently dropping descendants."""
        if depth is None:
            depth = JSON_DEPTH
        own = F.try_variant_get(v, f"$.{name}", "variant")
        here = F.when(own.isNotNull(), F.array(own)).otherwise(
            F.array().cast("array<variant>")
        )
        if depth <= 0:
            leftover = F.coalesce(F.size(self._json_members(v)) > 0, F.lit(False))
            chk = F.assert_true(
                ~leftover,
                F.lit("xidel_spark: JSON '//' walk exceeded "
                      "XIDEL_SPARK_JSON_DEPTH — raise the env bound"),
            )
            # differing branches keep the assert alive (see _jstring)
            return F.when(chk.isNull(), here).otherwise(
                F.lit(None).cast("array<variant>"))
        below = F.flatten(
            F.transform(self._json_members(v),
                        lambda m: self._json_descend(m, name, depth - 1))
        )
        return F.concat(here, below)

    def _json_canon(self, v: Column, depth: int | None = None) -> Column:
        """canonical JSON text of a variant for structural comparison:
        object keys sorted recursively, numbers in one lexical form (1 and
        1.0 compare equal) — the reference's deep-equal is structural, so
        serialized-text comparison must not depend on key order or numeric
        lexical form (to_json preserves both)."""
        if depth is None:
            depth = JSON_DEPTH
        isnull = v.isNull() | F.coalesce(F.is_variant_null(v), F.lit(False))
        sch = F.schema_of_variant(v)
        # integers keep their EXACT lexical form (a double round-trip
        # would merge values beyond 2^53 — round-5 review); fractional
        # kinds canonicalize through the double printer so 1.0 == 1
        int_kind = sch.rlike("^(BIGINT|INT|SMALLINT|TINYINT)")
        num = F.when(int_kind, F.to_json(v)).otherwise(
            self.to_string(TV(F.try_variant_get(v, "$", "double"), "double")))
        numeric = sch.rlike("^(BIGINT|INT|SMALLINT|TINYINT|DOUBLE|FLOAT|DECIMAL)")
        if depth <= 0:
            leftover = F.coalesce(F.size(self._json_members(v)) > 0, F.lit(False))
            chk = F.assert_true(
                ~leftover,
                F.lit("xidel_spark: deep-equal exceeded "
                      "XIDEL_SPARK_JSON_DEPTH — raise the env bound"),
            )
            out = (F.when(isnull, F.lit("null"))
                   .when(numeric, num)
                   .otherwise(F.to_json(v)))
            # differing branches keep the assert alive (see _jstring)
            return F.when(chk.isNull(), out).otherwise(F.lit(None))
        arr = F.concat(
            F.lit("["),
            F.concat_ws(",", F.transform(
                F.try_variant_get(v, "$", "array<variant>"),
                lambda m: self._json_canon(m, depth - 1),
            )),
            F.lit("]"),
        )
        # key-only comparator: default struct ordering would try to order
        # the VARIANT value field (INVALID_ORDERING_TYPE)
        entries = F.array_sort(
            F.map_entries(F.try_variant_get(v, "$", "map<string,variant>")),
            lambda a, b: F.when(a["key"] < b["key"], F.lit(-1))
            .when(a["key"] > b["key"], F.lit(1))
            .otherwise(F.lit(0)),
        )
        obj = F.concat(
            F.lit("{"),
            F.concat_ws(",", F.transform(
                entries,
                lambda e: F.concat(self._json_quote(e["key"]), F.lit(":"),
                                   self._json_canon(e["value"], depth - 1)),
            )),
            F.lit("}"),
        )
        return (
            F.when(isnull, F.lit("null"))
            .when(sch.startswith("ARRAY"), arr)
            .when(sch.startswith("OBJECT") | sch.startswith("STRUCT")
                  | sch.startswith("MAP"), obj)
            .when(numeric, num)
            .otherwise(F.to_json(v))
        )

    def _json_path(self, base: TV, path) -> TV:
        jn = base.col["jn"]
        cur = F.array(base.col["v"])  # array<variant> working set
        for step in path.steps:
            if step.test in ("node()",) and step.axis in ("self",):
                continue
            if step.preds or step.test.startswith("#") or step.test == "*":
                raise ValueError("expr: unsupported json path step")
            if step.axis == "child":
                cur = F.flatten(F.transform(
                    cur,
                    lambda v: F.coalesce(
                        F.when(
                            F.try_variant_get(v, f"$.{step.test}", "variant").isNotNull(),
                            F.array(F.try_variant_get(v, f"$.{step.test}", "variant")),
                        ),
                        F.array().cast("array<variant>"),
                    ),
                ))
            elif step.axis in ("descendant", "descendant-or-self"):
                cur = F.flatten(F.transform(
                    cur, lambda v: self._json_descend(v, step.test)
                ))
            else:
                raise ValueError(f"expr: unsupported json axis {step.axis!r}")
        if path.attr is not None:
            raise ValueError("expr: '@' on a json value")
        return TV(
            F.transform(cur, lambda v: F.struct(v.alias("v"), jn.alias("jn"))),
            "seq:jsonv",
        )

    # -- sequences --------------------------------------------------------------

    def _unify(self, tvs: list[TV]) -> tuple[list[Column], str]:
        kinds = {t.kind for t in tvs}
        if kinds <= {"long"}:
            return [t.col for t in tvs], "long"
        if kinds <= NUM_KINDS:
            return [t.col.cast("double") for t in tvs], "double"
        if kinds <= {"bool"}:
            return [t.col for t in tvs], "bool"
        return [self.to_string(t) for t in tvs], "string"

    def _seq_cast(self, t: TV, kind: str) -> Column:
        """t as array<kind> (t already scalar-or-seq of a unifiable kind)."""
        seq = t if t.is_seq else self.to_seq(t)
        if seq.elem_kind == kind:
            return seq.col
        if kind == "string":
            ek = seq.elem_kind
            return F.transform(seq.col, lambda x: self.to_string(TV(x, ek)))
        return F.transform(seq.col, lambda x: x.cast(_SPARK_TYPE[kind]))

    def ann_string(self, tv: TV) -> Column:
        """--print-type-annotations form of one item: constructor-typed
        values as T("lexical"), strings quoted with '"' doubled,
        numbers/booleans plain (goldens adhoc11/adhoc9b/bash-escape7)."""
        s = self.to_string(tv)
        if tv.atype:
            return F.concat(F.lit(tv.atype + '("'), s, F.lit('")'))
        if tv.kind in ("string", "any", "nodes", "xmlstr"):
            return F.concat(
                F.lit('"'), F.replace(s, F.lit('"'), F.lit('""')), F.lit('"')
            )
        return s

    def _compile_items(self, items) -> list[TV]:
        parts = []
        for item in items:
            before = len(self.assignments)
            parts.append(self.compile(item))
            # assignments surfaced while compiling this item (e.g. inside
            # an inlined function body) bind for LATER items — golden
            # moduleFuncImportGlobalMut2: setglobal(), "xx:" || $newglobal
            for an, atv in self.assignments[before:]:
                self.env[an] = atv
        return parts

    def _c_seqexpr(self, n: P.SeqExpr) -> TV:
        if not n.items:
            return TV(_empty_seq("string"), "seq:string")
        return self._seq_from_tvs(self._compile_items(n.items))

    def _seq_from_tvs(self, parts: list[TV]) -> TV:
        if parts and all(p.kind in ("jsonv", "seq:jsonv") for p in parts):
            # deep-json items keep their struct<v,jn> identity in sequence
            # (the *-equals goldens iterate parse variants; json path
            # results concatenate — inputformatAutoJson)
            cols = [p.col if p.kind == "seq:jsonv" else self.to_seq(p).col
                    for p in parts]
            return TV(F.concat(*cols), "seq:jsonv")
        if self.annotate:
            # annotated element strings, marked so printers don't re-quote
            out = []
            for p in parts:
                if p.is_seq:
                    seq = self.atomize_seq(p)
                    ek = "string" if p.kind == "nodes" else seq.elem_kind
                    out.append(F.transform(
                        seq.col, lambda x: self.ann_string(TV(x, ek))
                    ))
                else:
                    a = self.ann_string(p)
                    out.append(
                        F.when(a.isNull(), _empty_seq("string")).otherwise(F.array(a))
                    )
            return TV(F.concat(*out), "seq:string", atype="__annotated__")
        parts = [self.atomize_seq(p) if p.kind == "nodes" else p for p in parts]
        elems = {p.elem_kind for p in parts}
        if elems <= {"long"}:
            kind = "long"
        elif elems <= NUM_KINDS:
            kind = "double"
        elif elems <= {"bool"}:
            kind = "bool"
        elif elems <= {"string"}:
            kind = "string"
        else:  # mixed atomic types: store as strings (printed form)
            kind = "string"
        return TV(F.concat(*[self._seq_cast(p, kind) for p in parts]), f"seq:{kind}")

    def _c_rangeexpr(self, n: P.RangeExpr) -> TV:
        lo = self.to_long(self.compile(n.lo))
        hi = self.to_long(self.compile(n.hi))
        # '5 to 1' is the EMPTY sequence (F.sequence would count down)
        col = F.when(lo <= hi, F.sequence(lo, hi)).otherwise(_empty_seq("long"))
        return TV(col, "seq:long")

    def _c_filterexpr(self, n: P.FilterExpr) -> TV:
        cur = self.compile(n.base)
        for pred in n.preds:
            seq = cur if cur.is_seq else self.to_seq(cur)
            ek = seq.elem_kind
            out_kind = seq.kind if seq.kind != "nodes" else "nodes"

            size = F.size(seq.col)

            # closure factory, NOT default args — PySpark inspects the HOF
            # lambda's signature and rejects extra (defaulted) parameters
            def make_fn(pred, ek, size):
                def fn(el, i):
                    ctx = TV(F.array(el), "nodes", backing=seq.backing) if ek == "nodes" else TV(el, ek)
                    sub = self.bind(__ctx=ctx, __pos=i + 1, __size=size)
                    tv = sub.compile(pred)
                    if tv.kind in NUM_KINDS:  # numeric predicate = position test
                        return (i + 1).cast("double") == sub.to_number(tv)
                    return sub.ebv(tv)

                return fn

            # carry the node-array backing through the filter — a predicate
            # over a document-literal node set would otherwise atomize its
            # ids against the context document's array (wrong values)
            cur = TV(F.filter(seq.col, make_fn(pred, ek, size)), out_kind, backing=seq.backing)
        return cur

    # -- operators ---------------------------------------------------------------

    def _c_unaryop(self, n: P.UnaryOp) -> TV:
        v = self.compile(n.expr)
        if n.op == "+":
            return TV(self.to_number(v), "double") if v.kind not in NUM_KINDS else v
        if v.kind == "long":
            return TV(-v.col, "long")
        return TV(-self.to_number(v), "double")

    def _c_binop(self, n: P.BinOp) -> TV:
        op = n.op
        if op in ("and", "or"):
            l, r = self.ebv(self.compile(n.left)), self.ebv(self.compile(n.right))
            return TV(l & r if op == "and" else l | r, "bool")
        if op == "||":
            l = F.coalesce(self.to_string(self.compile(n.left)), F.lit(""))
            r = F.coalesce(self.to_string(self.compile(n.right)), F.lit(""))
            return TV(F.concat(l, r), "string")
        if op == "|":
            l, r = self.compile(n.left), self.compile(n.right)
            if l.kind != "nodes" or r.kind != "nodes":
                raise ValueError("expr: '|' union requires node sequences")
            # both sides of a '|' share a document in practice (paths from
            # one root); keep whichever literal backing is present so the
            # union's ids still resolve against the right node array
            backing = l.backing if l.backing is not None else r.backing
            return TV(
                F.array_sort(F.array_distinct(F.concat(l.col, r.col))),
                "nodes",
                backing=backing,
            )
        if op in ("+", "-", "*", "div", "idiv", "mod"):
            return self._arith(op, self.compile(n.left), self.compile(n.right))
        return self._compare(op, self.compile(n.left), self.compile(n.right))

    def _arith(self, op: str, l: TV, r: TV) -> TV:
        # singleton sequences atomize FIRST so a seq:long operand (e.g. a
        # FLWOR result) keeps integer arithmetic — routing it through
        # to_number would turn -1 * 0 into -0.0 (property cross-check
        # falsifier '(0 + (0 - 1)) * (0 + (let $v := 0 return $v + 0))')
        if l.is_seq and l.kind != "nodes":
            l = self._first(l)
        if r.is_seq and r.kind != "nodes":
            r = self._first(r)
        both_long = l.kind == "long" and r.kind == "long"
        if both_long and op in ("+", "-", "*", "idiv", "mod"):
            a, b = l.col, r.col
            if op == "+":
                return TV(a + b, "long")
            if op == "-":
                return TV(a - b, "long")
            if op == "*":
                return TV(a * b, "long")
            if op == "idiv":
                # XPath idiv truncates toward zero (Spark's long div would
                # too, but route through double for the shared zero guard)
                ad, bd = a.cast("double"), b.cast("double")
                return TV(F.when(bd != 0, ad / bd).cast("long"), "long")
            return TV(a % b, "long")
        a, b = self.to_number(l), self.to_number(r)
        if op == "+":
            return TV(a + b, "double")
        if op == "-":
            return TV(a - b, "double")
        if op == "*":
            return TV(a * b, "double")
        if op == "div":
            # XPath double division: x div 0 = ±INF, 0 div 0 = NaN — ANSI
            # Spark raises DIVIDE_BY_ZERO instead, so branch explicitly
            # (CaseWhen evaluates per-row lazily, the a/b arm never sees 0).
            # The INF sign respects the ZERO's sign too: 1 div -0 = -INF
            # (reference division matrix golden).
            neg_b = b.cast("string").startswith("-")
            inf, ninf = F.lit(float("inf")), F.lit(float("-inf"))
            zero = (
                # Spark sorts NaN above every value (NaN > 0 is TRUE), so
                # the NaN guard must come first
                F.when(F.isnan(a) | (a == 0), F.lit(float("nan")))
                .when(a > 0, F.when(neg_b, ninf).otherwise(inf))
                .when(a < 0, F.when(neg_b, inf).otherwise(ninf))
            )
            return TV(F.when(b == 0, zero).otherwise(a / b), "double")
        if op == "idiv":
            return TV(F.when(b != 0, a / b).cast("long"), "long")
        # mod is a - trunc(a div b)*b in the reference (arithmetic, not
        # IEEE fmod): a zero remainder from a NONZERO dividend is +0, only
        # a ±0 dividend keeps its sign (-1 mod -1 = 0 but -0 mod -1 = -0)
        r = a % b
        r = F.when((r == 0) & ~(a == 0), F.lit(0.0)).otherwise(r)
        return TV(F.when(b == 0, F.lit(float("nan"))).otherwise(r), "double")

    _GENERAL = {"=", "!=", "<", "<=", ">", ">="}
    _VALUE = {"eq": "=", "ne": "!=", "lt": "<", "le": "<=", "gt": ">", "ge": ">="}

    def _compare(self, op: str, l: TV, r: TV) -> TV:
        if op in self._VALUE:  # value comparison: scalars, same dispatch
            return TV(self._cmp_scalar(self._VALUE[op], self._first(l), self._first(r)), "bool")
        # general comparison: existential over sequences
        if l.is_seq and r.is_seq:
            ls, rs = self.atomize_seq(l), self.atomize_seq(r)
            col = F.exists(
                ls.col,
                lambda a: F.exists(
                    rs.col, lambda b: self._cmp_scalar(op, TV(a, ls.elem_kind), TV(b, rs.elem_kind))
                ),
            )
            return TV(col, "bool")
        if l.is_seq or r.is_seq:
            seq, scalar, flip = (l, r, False) if l.is_seq else (r, l, True)
            ss = self.atomize_seq(seq)
            sc = self._first(scalar)

            def one(a):
                lt = TV(a, ss.elem_kind)
                return (
                    self._cmp_scalar(op, sc, lt) if flip else self._cmp_scalar(op, lt, sc)
                )

            return TV(F.exists(ss.col, one), "bool")
        return TV(self._cmp_scalar(op, l, r), "bool")

    def _cmp_scalar(self, op: str, l: TV, r: TV) -> Column:
        # nodes that reach scalar comparison atomize to string values
        if l.kind == "nodes":
            l = self._first(l)
        if r.kind == "nodes":
            r = self._first(r)
        if l.kind in NUM_KINDS or r.kind in NUM_KINDS or (
            l.kind == "any" and r.kind == "any"
        ):
            if l.kind == "any" and r.kind == "any":
                # dynamic: numeric when both castable, else collation strings
                ln, rn = l.col.try_cast("double"), r.col.try_cast("double")
                return F.when(
                    ln.isNotNull() & rn.isNotNull(), self._cmp_op(op, ln, rn)
                ).otherwise(
                    self._cmp_op(
                        op,
                        collation_key_expr(l.col.cast("string")),
                        collation_key_expr(r.col.cast("string")),
                    )
                )
            return self._cmp_op(op, self.to_number(l), self.to_number(r))
        if l.kind == "bool" or r.kind == "bool":
            return self._cmp_op(op, self._as_bool(l), self._as_bool(r))
        return self._cmp_op(
            op, collation_key_expr(self.to_string(l)), collation_key_expr(self.to_string(r))
        )

    def _as_bool(self, tv: TV) -> Column:
        if tv.kind == "bool":
            return tv.col
        s = F.lower(F.trim(self.to_string(tv)))
        return (
            F.when(s.isin("true", "1"), F.lit(True))
            .when(s.isin("false", "0"), F.lit(False))
            .otherwise(F.lit(None).cast("boolean"))
        )

    @staticmethod
    def _cmp_op(op: str, a: Column, b: Column) -> Column:
        if op == "=":
            return a == b
        if op == "!=":
            return a != b
        if op == "<":
            return a < b
        if op == "<=":
            return a <= b
        if op == ">":
            return a > b
        return a >= b

    # -- control flow -----------------------------------------------------------

    def _c_ifexpr(self, n: P.IfExpr) -> TV:
        cond = self.ebv(self.compile(n.cond))
        t, e = self.compile(n.then), self.compile(n.els)
        if t.kind == e.kind:
            return TV(F.when(cond, t.col).otherwise(e.col), t.kind)
        if t.is_seq or e.is_seq:
            ts, es = self.atomize_seq(t) if t.is_seq else self.to_seq(t), (
                self.atomize_seq(e) if e.is_seq else self.to_seq(e)
            )
            if ts.kind != es.kind:
                ts = TV(
                    F.transform(ts.col, lambda x: self.to_string(TV(x, ts.elem_kind))),
                    "seq:string",
                )
                es = TV(
                    F.transform(es.col, lambda x: self.to_string(TV(x, es.elem_kind))),
                    "seq:string",
                )
            return TV(F.when(cond, ts.col).otherwise(es.col), ts.kind)
        cols, kind = self._unify([t, e])
        return TV(F.when(cond, cols[0]).otherwise(cols[1]), kind)

    def _c_quant(self, n: P.Quant) -> TV:
        def go(i: int, comp: "Compiler") -> Column:
            if i == len(n.clauses):
                return comp.ebv(comp.compile(n.cond))
            var, src = n.clauses[i]
            tv = comp.compile(src)
            seq = tv if tv.is_seq else comp.to_seq(tv)
            ek = seq.elem_kind

            def body(el):
                bound = comp.bind(**{var: TV(F.array(el), "nodes", backing=seq.backing) if ek == "nodes" else TV(el, ek)})
                return go(i + 1, bound)

            hof = F.exists if n.mode == "some" else F.forall
            return hof(seq.col, body)

        return TV(go(0, self), "bool")

    def _c_flwor(self, n: P.Flwor) -> TV:
        if n.group_by is not None:
            return self._c_flwor_grouped(n)
        if n.count_var is not None:
            return self._c_flwor_counted(n)
        if n.order_by is not None:
            return self._c_flwor_ordered(n)
        out_kind: list[str] = []

        def go(i: int, comp: "Compiler") -> Column:
            """returns an ARRAY column of results for the remaining clauses."""
            if i == len(n.clauses):
                body = comp.compile(n.ret)
                body_seq = body if body.is_seq else comp.to_seq(body)
                if body_seq.kind == "nodes":
                    body_seq = comp.atomize_seq(body_seq)
                out_kind.append(body_seq.elem_kind)
                col = body_seq.col
                if n.where is not None:
                    cond = comp.ebv(comp.compile(n.where))
                    col = F.when(cond, col).otherwise(_empty_seq(body_seq.elem_kind))
                return col
            word, var, src = n.clauses[i]
            if word == "let":
                return go(i + 1, comp.bind(**{var: comp.compile(src)}))
            tv = comp.compile(src)
            seq = tv if tv.is_seq else comp.to_seq(tv)
            ek = seq.elem_kind

            def body(el):
                bound = comp.bind(
                    **{var: TV(F.array(el), "nodes", backing=seq.backing) if ek == "nodes" else TV(el, ek)}
                )
                return go(i + 1, bound)

            return F.flatten(F.transform(seq.col, body))

        col = go(0, self)
        return TV(col, f"seq:{out_kind[0] if out_kind else 'string'}")

    def _single_for(self, n: P.Flwor, what: str):
        """(var, src, lets) of the single-for FLWOR form, or a routing
        error — the distributed path for multi-for shapes is the library
        FLWOR (queries_fn.py), mirroring SURVEY §2.3's split."""
        fors = [c for c in n.clauses if c[0] == "for"]
        if len(fors) != 1 or not n.clauses or n.clauses[0][0] != "for" \
                or any(c[0] != "let" for c in n.clauses[1:]):
            raise ValueError(
                f"expr: {what} supports the single-for FLWOR form here; "
                "multi-for shapes route through queries_fn.py"
            )
        _, var, src = n.clauses[0]
        return var, src, n.clauses[1:]

    def _c_flwor_counted(self, n: P.Flwor) -> TV:
        """`for $x in E count $c [where] return B` — $c is the 1-based
        tuple position, bound via the HOF index argument."""
        var, src, lets = self._single_for(n, "'count'")
        tv = self.compile(src)
        seq = tv if tv.is_seq else self.to_seq(tv)
        ek = seq.elem_kind
        out_kind: list[str] = []

        def body(el, i):
            bound = self.bind(**{
                var: TV(F.array(el), "nodes", backing=seq.backing)
                if ek == "nodes" else TV(el, ek)
            })
            bound = bound.bind(**{n.count_var: TV((i + F.lit(1)).cast("long"), "long")})
            for _, lv, lsrc in lets:
                bound = bound.bind(**{lv: bound.compile(lsrc)})
            btv = bound.compile(n.ret)
            bseq = btv if btv.is_seq else bound.to_seq(btv)
            if bseq.kind == "nodes":
                bseq = bound.atomize_seq(bseq)
            out_kind.append(bseq.elem_kind)
            col = bseq.col
            if n.where is not None:
                cond = bound.ebv(bound.compile(n.where))
                col = F.when(cond, col).otherwise(_empty_seq(bseq.elem_kind))
            return col

        col = F.flatten(F.transform(seq.col, body))
        return TV(col, f"seq:{out_kind[0] if out_kind else 'string'}")

    def _c_flwor_grouped(self, n: P.Flwor) -> TV:
        """XQuery 3.0 `group by` for the single-for form: tuples whose
        grouping key compares equal collapse to one group, the for
        variable rebinds to the SEQUENCE of its group's values, other let
        variables rebind to their grouped value sequences, and groups emit
        in first-appearance order (array_distinct preserves it). `count`
        binds the group position, `where` filters groups, `order by`
        reorders them. Pure Catalyst (transform/filter/array_distinct) —
        the distributed grouping path is the library operator
        (queries_fn.py flwor_group_order); this is the in-string surface
        (reference readme changelog:79-84)."""
        if len(n.group_by) != 1:
            raise ValueError(
                "expr: multi-key 'group by' routes through the library FLWOR"
            )
        gvar = n.group_by[0]
        var, src, lets = self._single_for(n, "'group by'")
        tv = self.compile(src)
        seq = tv if tv.is_seq else self.to_seq(tv)
        if seq.kind == "nodes":
            seq = self.atomize_seq(seq)
        ek = seq.elem_kind
        kkind: list[str] = []
        lkinds: dict[str, str] = {}

        def env_of(el) -> "Compiler":
            bound = self.bind(**{var: TV(el, ek)})
            for _, lv, lsrc in lets:
                ltv = bound.compile(lsrc)
                lkinds.setdefault(lv, ltv.elem_kind if ltv.is_seq else ltv.kind)
                bound = bound.bind(**{lv: ltv})
            return bound

        def key_tv(el) -> TV:
            env = env_of(el)
            if gvar == var:
                ktv = TV(el, ek)
            elif gvar in env.env:
                ktv = env.env[gvar]
                if not isinstance(ktv, TV):
                    ktv = TV(ktv, "any")
            else:
                raise ValueError(f"expr: 'group by ${gvar}' is not bound")
            ktv = env._first(ktv)
            kkind.append(ktv.kind if ktv.kind in ("long", "double", "bool", "string")
                         else "string")
            return ktv

        def key_struct(el):
            env = env_of(el)
            ktv = key_tv(el)
            kv = ktv.col if kkind[-1] != "string" else env.to_string(ktv)
            # ks: null-safe equality surface (empty keys group together)
            ks = F.coalesce(env.to_string(ktv), F.lit("\x00absent"))
            return F.struct(ks.alias("ks"), kv.alias("kv"))

        karr = F.array_distinct(F.transform(seq.col, key_struct))
        if n.order_by is not None:
            okey_ast, desc = n.order_by

            def order_struct(kstr):
                genv = self.bind(**{gvar: TV(kstr["kv"], kkind[0])})
                otv = genv.compile(okey_ast)
                ok = (genv.to_number(otv) if otv.kind in NUM_KINDS
                      else collation_key_expr(genv.to_string(otv)))
                return F.struct(ok.alias("o"), kstr["ks"].alias("ks"),
                                kstr["kv"].alias("kv"))

            karr = F.transform(
                F.sort_array(F.transform(karr, order_struct), asc=not desc),
                lambda s: F.struct(s["ks"].alias("ks"), s["kv"].alias("kv")),
            )
        out_kind: list[str] = []

        def per_group(kstr, gi):
            members = F.filter(seq.col, lambda el: key_struct(el)["ks"] == kstr["ks"])
            genv = self.bind(**{
                var: TV(members, f"seq:{ek}"),
                gvar: TV(kstr["kv"], kkind[0]),
            })
            for _, lv, lsrc in lets:
                if lv == gvar:
                    continue
                genv = genv.bind(**{lv: TV(
                    F.flatten(F.transform(members, lambda el: self._seq_cast(
                        env_of(el).env[lv], lkinds[lv]))),
                    f"seq:{lkinds[lv]}",
                )})
            if n.count_var is not None:
                genv = genv.bind(**{
                    n.count_var: TV((gi + F.lit(1)).cast("long"), "long")
                })
            btv = genv.compile(n.ret)
            bseq = btv if btv.is_seq else genv.to_seq(btv)
            if bseq.kind == "nodes":
                bseq = genv.atomize_seq(bseq)
            out_kind.append(bseq.elem_kind)
            col = bseq.col
            if n.where is not None:
                cond = genv.ebv(genv.compile(n.where))
                col = F.when(cond, col).otherwise(_empty_seq(bseq.elem_kind))
            return col

        col = F.flatten(F.transform(karr, per_group))
        return TV(col, f"seq:{out_kind[0] if out_kind else 'string'}")

    def _c_flwor_ordered(self, n: P.Flwor) -> TV:
        """FLWOR with 'order by': single-for form (for $v in seq [lets]
        [where] order by key [descending] return body) — keys materialize
        per tuple, sort_array orders the tuple stream (struct sort is
        key-first), then the body maps over the sorted stream. Multi-for
        cartesian ordering routes to the library FLWOR."""
        fors = [c for c in n.clauses if c[0] == "for"]
        if len(fors) != 1 or n.clauses[0][0] != "for":
            raise ValueError(
                "expr: 'order by' supports the single-for FLWOR form here; "
                "multi-for ordering routes through queries_fn.py"
            )
        _, var, src = n.clauses[0]
        lets = n.clauses[1:]
        if any(c[0] != "let" for c in lets):
            raise ValueError("expr: 'order by' needs lets-only after the for")
        key_ast, desc = n.order_by
        tv = self.compile(src)
        seq = tv if tv.is_seq else self.to_seq(tv)
        ek = seq.elem_kind

        def env_for(comp: "Compiler", el):
            bound = comp.bind(
                **{var: TV(F.array(el), "nodes", backing=seq.backing) if ek == "nodes" else TV(el, ek)}
            )
            for _, lv, lsrc in lets:
                bound = bound.bind(**{lv: bound.compile(lsrc)})
            return bound

        def key_col(el):
            env = env_for(self, el)
            ktv = env.compile(key_ast)
            if ktv.kind in NUM_KINDS:
                return env.to_number(ktv)
            # orderable key: the collation key string (xidel default order)
            return collation_key_expr(env.to_string(ktv))

        keyed = F.transform(
            seq.col, lambda el: F.struct(key_col(el).alias("k"), el.alias("v"))
        )
        if n.where is not None:
            keyed = F.filter(
                keyed, lambda s: env_for(self, s["v"]).ebv(
                    env_for(self, s["v"]).compile(n.where)
                )
            )
        ordered = F.sort_array(keyed, asc=not desc)
        out_kind: list[str] = []

        def body(s):
            env = env_for(self, s["v"])
            btv = env.compile(n.ret)
            bseq = btv if btv.is_seq else env.to_seq(btv)
            if bseq.kind == "nodes":
                bseq = env.atomize_seq(bseq)
            out_kind.append(bseq.elem_kind)
            return bseq.col

        col = F.flatten(F.transform(ordered, body))
        return TV(col, f"seq:{out_kind[0] if out_kind else 'string'}")

    # -- computed constructors -----------------------------------------------

    def _xml_escape(self, c: Column, attr: bool = False) -> Column:
        c = F.replace(c, F.lit("&"), F.lit("&amp;"))
        c = F.replace(c, F.lit("<"), F.lit("&lt;"))
        c = F.replace(c, F.lit(">"), F.lit("&gt;"))
        if attr:
            c = F.replace(c, F.lit('"'), F.lit("&quot;"))
        return c

    def _content_str(self, tv: TV) -> Column:
        """serialize one content item: constructed-xml strings embed
        verbatim, atomic sequences join with ' ' escaped (XQuery content
        rules for the shapes the goldens pin)."""
        if tv.kind == "xmlstr":
            return F.coalesce(tv.col, F.lit(""))
        if tv.kind == "seq:xmlstr":
            return F.array_join(tv.col, "")
        if tv.is_seq:
            seq = self.atomize_seq(tv)
            strs = F.transform(
                seq.col, lambda x: self._xml_escape(self.to_string(TV(x, seq.elem_kind)))
            )
            return F.array_join(strs, " ")
        return F.coalesce(self._xml_escape(self.to_string(tv)), F.lit(""))

    def _c_elemctor(self, n: P.ElemCtor) -> TV:
        attrs = F.lit("")
        for a in n.attrs:
            av = self._xml_escape(self.to_string(self.compile(a.value)), attr=True)
            attrs = F.concat(
                attrs, F.lit(f" {a.name}=\""), F.coalesce(av, F.lit("")), F.lit('"')
            )
        content = F.lit("")
        prev_atomic = False
        for c in n.content:
            tv = self.compile(c)
            atomic = tv.kind not in ("xmlstr", "seq:xmlstr")
            if prev_atomic and atomic:
                # adjacent atomics in element content join with a space
                content = F.concat(content, F.lit(" "))
            content = F.concat(content, self._content_str(tv))
            prev_atomic = atomic
        open_tag = F.concat(F.lit("<"), F.lit(n.name), attrs)
        col = F.when(
            content == "", F.concat(open_tag, F.lit("/>"))
        ).otherwise(
            F.concat(open_tag, F.lit(">"), content, F.lit(f"</{n.name}>"))
        )
        return TV(col, "xmlstr")

    def _c_attrctor(self, n: P.AttrCtor) -> TV:
        # a standalone attribute constructor atomizes to its string value
        return TV(self.to_string(self.compile(n.value)), "string")

    def _c_textctor(self, n: P.TextCtor) -> TV:
        return TV(self._xml_escape(self.to_string(self.compile(n.value))), "xmlstr")

    # -- XPath 3.1 / 4.0 operators ----------------------------------------------

    def _c_arrow(self, n: P.Arrow) -> TV:
        return self._c_call(P.Call(n.qname, [n.base] + list(n.args)))

    def _c_simplemap(self, n: P.SimpleMap) -> TV:
        src = self.compile(n.src)
        seq = src if src.is_seq else self.to_seq(src)
        ek = seq.elem_kind
        if (isinstance(n.body, P.Call)
                and n.body.qname.split(":")[-1] == "doc"
                and n.body.args and isinstance(n.body.args[0], P.Lit)
                and getattr(self, "doc_loader", None) is not None):
            # 'x / doc("...")' (the path-step-call rewrite): doc() ignores
            # the context item, so the loaded document's nodes repeat per
            # source item and the result STAYS a node set with the new
            # document's backing (golden regression_doconline)
            dtv = self.compile(n.body)
            if dtv.kind == "nodes":
                col = F.flatten(F.transform(seq.col, lambda _el: dtv.col))
                return TV(col, "nodes", backing=dtv.backing)
        out_kind: list[str] = []

        def body(el, i):
            ctx = TV(F.array(el), "nodes", backing=seq.backing) if ek == "nodes" else TV(el, ek)
            sub = self.bind(__ctx=ctx, __pos=i + 1, __size=F.size(seq.col))
            tv = sub.compile(n.body)
            tv_seq = tv if tv.is_seq else sub.to_seq(tv)
            if tv_seq.kind == "nodes":
                tv_seq = sub.atomize_seq(tv_seq)
            out_kind.append(tv_seq.elem_kind)
            return tv_seq.col

        col = F.flatten(F.transform(seq.col, body))
        return TV(col, f"seq:{out_kind[0] if out_kind else 'string'}")

    def json_form(self, tv: TV) -> Column:
        """canonical compact JSON text of an item (no spaces): numbers and
        booleans raw, strings quoted+escaped, null, objects/arrays via
        their serialization identity."""
        if tv.jtext is not None:
            return tv.jtext
        if tv.kind == "null":
            return F.lit("null")
        if tv.kind in NUM_KINDS:
            return self.to_string(tv)
        if tv.kind == "bool":
            return self.to_string(tv)
        if tv.kind == "map":
            return F.to_json(tv.col)
        if tv.is_seq:
            seq = self.atomize_seq(tv)
            inner = F.transform(
                seq.col,
                lambda x: self.json_form(TV(x, seq.elem_kind))
                if seq.elem_kind != "string"
                else self._json_quote(x),
            )
            return F.concat(F.lit("["), F.call_function("array_join", inner, F.lit(",")), F.lit("]"))
        return self._json_quote(self.to_string(tv))

    @staticmethod
    def _json_quote(c: Column) -> Column:
        c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
        c = F.replace(c, F.lit('"'), F.lit('\\"'))
        c = F.replace(c, F.lit("\n"), F.lit("\\n"))
        c = F.replace(c, F.lit("\r"), F.lit("\\r"))
        c = F.replace(c, F.lit("\t"), F.lit("\\t"))
        return F.concat(F.lit('"'), c, F.lit('"'))

    def _c_trycatch(self, n: P.TryCatch) -> TV:
        """try/catch over the ops with a defined dynamic-error model in
        this corpus: integer division — err:FOAR0001 when the divisor is
        ±0, err:FOAR0002 when an operand is non-finite (golden
        divisionInt). Other expressions compile through (no error path in
        a column plan); the handler sees $__err_code."""
        if isinstance(n.expr, P.BinOp) and n.expr.op in ("idiv", "mod"):
            a = self.to_number(self.compile(n.expr.left))
            b = self.to_number(self.compile(n.expr.right))
            # an INFINITE divisor is fine (-1 idiv -INF = 0); only a
            # non-finite DIVIDEND or NaN divisor raises FOAR0002
            nonfinite = (
                F.isnan(a) | F.isnan(b) | (F.abs(a) == F.lit(float("inf")))
            )
            def handler(code: str) -> Column:
                sub = self.bind(__err_code=TV(F.lit(code), "string"))
                return sub.to_string(sub.compile(n.handler))
            value = self.to_string(self._arith(n.expr.op, TV(a, "double"), TV(b, "double")))
            if n.expr.op == "idiv":
                return TV(
                    F.when(b == 0, handler("err:FOAR0001"))
                    .when(nonfinite, handler("err:FOAR0002"))
                    .otherwise(value),
                    "string",
                )
        return self.compile(n.expr)

    def _c_windowexpr(self, n: P.WindowExpr) -> TV:
        """for tumbling|sliding window — windows as array slices: start
        positions from the start-when condition, tumbling windows run to
        the next start, sliding windows to the first end-when hit (golden
        xquery5). One Catalyst expression, no shuffle, no Python."""
        src = self.compile(n.src)
        seq = src if src.is_seq else self.to_seq(src)
        ek = seq.elem_kind
        backing = seq.backing
        size = F.size(seq.col)
        idxs = F.when(size > 0, F.sequence(F.lit(1), size)).otherwise(
            _empty_seq("long")
        )

        def cond(cond_ast):
            def fn(i):
                el = F.element_at(seq.col, i.cast("int"))
                ctx = (TV(F.array(el), "nodes", backing=backing)
                       if ek == "nodes" else TV(el, ek))
                sub = self.bind(__ctx=ctx, __pos=i, __size=size)
                return sub.ebv(sub.compile(cond_ast))
            return fn

        starts = F.filter(idxs, cond(n.start))
        if n.mode == "tumbling":
            wins = F.transform(
                starts,
                lambda s, j: F.slice(
                    seq.col, s.cast("int"),
                    (F.coalesce(F.try_element_at(starts, (j + 2).cast("int")) - 1, size)
                     - s + 1).cast("int"),
                ),
            )
        elif n.end is None:
            wins = F.transform(
                starts, lambda s: F.slice(seq.col, s.cast("int"), (size - s + 1).cast("int"))
            )
        else:
            endc = cond(n.end)

            def win(s):
                ends = F.filter(idxs, lambda i: (i >= s) & endc(i))
                e = F.coalesce(F.try_element_at(ends, F.lit(1)), size.cast("bigint"))
                return F.slice(seq.col, s.cast("int"), (e - s + 1).cast("int"))

            wins = F.transform(starts, win)

        out_kind: list[str] = []

        def body(w):
            wkind = seq.kind if seq.is_seq else f"seq:{ek}"
            sub = self.bind(**{n.var: TV(w, wkind, backing=backing)})
            tv = sub.compile(n.ret)
            tv_seq = tv if tv.is_seq else sub.to_seq(tv)
            if tv_seq.kind == "nodes":
                tv_seq = sub.atomize_seq(tv_seq)
            out_kind.append(tv_seq.elem_kind)
            return tv_seq.col

        col = F.flatten(F.transform(wins, body))
        return TV(col, f"seq:{out_kind[0] if out_kind else 'string'}")

    def _c_maplit(self, n: P.MapLit) -> TV:
        """JSONiq object → map<string,string> (values stringified — the
        weak-typing print forms; typed maps would need per-key schemas).
        The compile-time pair kinds also build the object's JSON
        serialization identity (jtext)."""
        kv = []
        jparts: list[Column] = []
        vtvs: list[TV] = []  # value TVs, compiled once and reused below
        for kast, vast in n.pairs:
            ktv, vtv = self.compile(kast), self.compile(vast)
            vtvs.append(vtv)
            kv.append(self.to_string(ktv))
            kv.append(self.to_string(vtv))
            jparts.append(
                F.concat(self._json_quote(self.to_string(ktv)), F.lit(":"),
                         self.json_form(vtv))
            )
        jtext = F.concat(
            F.lit("{"),
            F.concat_ws(",", *jparts) if jparts else F.lit(""),
            F.lit("}"),
        )
        static = None
        if all(isinstance(k, P.Lit) and k.kind == "string" for k, _v in n.pairs):
            static = {}
            for (k, vast), tv in zip(n.pairs, vtvs):
                empty_lit = (isinstance(vast, P.SeqExpr)
                             and not isinstance(vast, P.ArrayLit)
                             and not vast.items)
                if self.json_mode == "jsoniq":
                    # JSONiq objects: () becomes a null ITEM, nodes are
                    # COPIED (detached — root() is the node itself), and
                    # sequences collapse to one array item
                    # (jsonmode/jsoniq golden: 1 / b / 1)
                    if empty_lit:
                        tv = TV(F.array(F.lit("null")), "seq:string")
                    elif tv.kind == "nodes":
                        tv = TV(tv.col, tv.kind, backing=tv.backing,
                                atype="__detached__")
                    elif tv.is_seq:
                        tv = TV(tv.col, tv.kind, backing=tv.backing,
                                atype="__arritem__")
                # deprecated objects keep standard map semantics (the
                # golden's count($o?c) = 2); only the ARRAY constructor
                # flattens in deprecated mode
                static[k.value] = tv
        return TV(
            F.create_map(*kv) if kv else F.create_map().cast("map<string,string>"),
            "map",
            jtext=jtext,
            static_items=static,
        )

    def _c_arraylit(self, n) -> TV:
        # each item AST compiles exactly ONCE: the TVs feed both the
        # sequence column and the jtext/static_items views, so `$x := ...`
        # inside the literal logs a single change-log entry and the
        # Catalyst tree isn't doubled
        items = self._compile_items(n.items)
        base = (TV(_empty_seq("string"), "seq:string") if not n.items
                else self._seq_from_tvs(items))
        if self.json_mode in ("jsoniq", "deprecated"):
            # JSONiq/deprecated array constructors FLATTEN: () vanishes,
            # static ranges expand to members (jsonmode/jsoniq: size 4)
            flat: list[TV] | None = []
            for iast, tv in zip(n.items, items):
                if (isinstance(iast, P.SeqExpr) and not isinstance(iast, P.ArrayLit)
                        and not iast.items):
                    continue
                if isinstance(iast, P.RangeExpr) and isinstance(iast.lo, P.Lit) \
                        and isinstance(iast.hi, P.Lit):
                    for v in range(int(iast.lo.value), int(iast.hi.value) + 1):
                        flat.append(TV(F.lit(v), "long"))
                    continue
                if tv.kind == "nodes" and self.json_mode == "jsoniq":
                    tv = TV(tv.col, tv.kind, backing=tv.backing,
                            atype="__detached__")
                if tv.is_seq and tv.kind != "nodes":
                    flat = None  # dynamic sequence: no static flattening
                    break
                flat.append(tv)
            if flat is not None:
                jparts2 = [self.json_form(t) for t in flat]
                return TV(
                    base.col, base.kind, backing=base.backing,
                    jtext=F.concat(F.lit("["), F.concat_ws(",", *jparts2)
                                   if jparts2 else F.lit(""), F.lit("]")),
                    static_items=flat,
                )
        jparts = [self.json_form(t) for t in items]
        jtext = F.concat(
            F.lit("["),
            F.concat_ws(",", *jparts) if jparts else F.lit(""),
            F.lit("]"),
        )
        return TV(base.col, base.kind, backing=base.backing, jtext=jtext,
                  static_items=items)

    def _c_lookup(self, n: P.Lookup) -> TV:
        if n.dot and not self.dot_notation:
            # '.prop' access disabled (--json-mode standard/jsoniq)
            return TV(_empty_seq("string"), "seq:string")
        base = self.compile(n.base)
        if base.static_items is not None:
            key = n.key
            if isinstance(key, P.Lit):
                key = key.value
            if isinstance(base.static_items, dict) and isinstance(key, str) \
                    and key != "*":
                hit = base.static_items.get(key)
                return hit if hit is not None else TV(_empty_seq("string"), "seq:string")
            if isinstance(base.static_items, list):
                if isinstance(key, (int, float)):
                    i = int(key)
                    if 1 <= i <= len(base.static_items):
                        return base.static_items[i - 1]
                    return TV(_empty_seq("string"), "seq:string")
                if not isinstance(key, str):
                    # dynamic index over a static array: per-item atomized
                    # string sequences behind a position CASE (enough for
                    # count()/string contexts — jsonmode/standard's
                    # (1 to 3) ! count($a(.)))
                    idx = self.to_long(self.compile(key))

                    def _to_strs(seq):
                        # closure factory — a defaulted lambda arg would
                        # receive transform's INDEX column instead
                        ek = seq.elem_kind
                        if ek == "string":
                            return seq.col
                        return F.transform(seq.col, lambda x: self.to_string(TV(x, ek)))

                    out = _empty_seq("string")
                    for i, item in enumerate(base.static_items):
                        seq = self.atomize_seq(item) if item.is_seq \
                            else self.to_seq(item)
                        out = F.when(idx == i + 1, _to_strs(seq)).otherwise(out)
                    return TV(out, "seq:string")
        if base.kind == "jsonv":
            key = n.key
            if not isinstance(key, (int, str)):
                kv = self.compile(key)
                if isinstance(key, P.Lit):
                    key = key.value
                elif kv.kind == "long" and isinstance(n.key, P.Lit):
                    key = n.key.value
                else:
                    raise ValueError("expr: dynamic lookup key on a json value")
            if isinstance(key, str) and key == "*":
                raise ValueError("expr: '?*' on a json value")
            path = f"$[{int(key) - 1}]" if isinstance(key, (int, float)) or (
                isinstance(key, str) and key.lstrip("-").isdigit()
            ) else f"$.{key}"
            v = F.variant_get(base.col["v"], path, "variant")
            return TV(
                F.struct(v.alias("v"), base.col["jn"].alias("jn")),
                "jsonv", jnull=base.jnull,
            )
        key = n.key
        if base.kind == "map":
            if key == "*":  # libjn:values
                return TV(F.map_values(base.col), "seq:string")
            kcol = (
                F.lit(key) if isinstance(key, str)
                else self.to_string(self.compile(key)) if not isinstance(key, int)
                else F.lit(str(key))
            )
            return TV(F.try_element_at(base.col, kcol), "string")
        seq = base if base.is_seq else self.to_seq(base)
        if key == "*":
            return seq
        if isinstance(key, int):
            return TV(F.try_element_at(seq.col, F.lit(key)), seq.elem_kind)
        idx = self.to_long(self.compile(key)) if not isinstance(key, str) else None
        if idx is None:
            raise ValueError(f"expr: string lookup {key!r} on a non-map value")
        return TV(F.try_element_at(seq.col, idx.cast("int")), seq.elem_kind)

    # static kind → the xs types it satisfies (instance-of is a DYNAMIC
    # type test in XPath, but the compile-time kind IS the dynamic type in
    # this value model, so the answer is decidable statically)
    _KIND_TYPES = {
        "long": {"xs:integer", "xs:long", "xs:int", "xs:decimal", "xs:numeric",
                 "xs:anyAtomicType", "item()"},
        "double": {"xs:double", "xs:numeric", "xs:anyAtomicType", "item()"},
        "string": {"xs:string", "xs:untypedAtomic", "xs:anyAtomicType", "item()"},
        "bool": {"xs:boolean", "xs:anyAtomicType", "item()"},
        "nodes": {"node()", "element()", "item()"},
        "map": {"map()", "item()"},
        "xmlstr": {"node()", "element()", "item()"},
    }

    def _c_instanceof(self, n: P.InstanceOf) -> TV:
        tv = self.compile(n.expr)
        t = n.type_qname if (":" in n.type_qname or n.type_qname.endswith("()")) \
            else f"xs:{n.type_qname}"
        if tv.is_seq and tv.kind != "nodes":
            ek = tv.elem_kind
            elem_ok = t in self._KIND_TYPES.get(ek, {"item()"})
            size = F.size(tv.col)
            if n.occurrence in ("*", "+"):
                cond = F.lit(elem_ok) & (size >= (1 if n.occurrence == "+" else 0))
            elif n.occurrence == "?":
                cond = F.lit(elem_ok) & (size <= 1)
            else:
                cond = F.lit(elem_ok) & (size == 1)
            # the EMPTY sequence matches ANY type with '?' or '*' (vacuous)
            cond = F.when(size == 0, F.lit(n.occurrence in ("?", "*"))).otherwise(cond)
            return TV(cond, "bool")
        if tv.kind == "nodes":
            ok = t in self._KIND_TYPES["nodes"]
            n_items = F.size(tv.col)
            card = {
                "": n_items == 1, "?": n_items <= 1,
                "*": F.lit(True), "+": n_items >= 1,
            }[n.occurrence]
            return TV(F.lit(ok) & card, "bool")
        if tv.kind == "any":
            # DYNAMIC type test on an untyped (column-bound) value: an
            # untypedAtomic matches xs:T iff its lexical form is in T's
            # lexical space — the weak-typing reading, decided at runtime
            # by the xs constructor lattice (out-of-facet → NULL)
            col = tv.col.cast("string")
            if t in ("item()", "xs:anyAtomicType", "xs:string", "xs:untypedAtomic"):
                ok_col = col.isNotNull()
            elif t.endswith("()"):  # node kind tests never match atomics
                ok_col = F.lit(False)
            else:
                from ..functions.registry import BUILTINS

                try:
                    ok_col = BUILTINS.call(t, col).isNotNull()
                except KeyError:
                    raise ValueError(f"expr: unknown type {t!r} in 'instance of'") from None
            return TV(
                F.when(tv.col.isNull(), F.lit(n.occurrence in ("?", "*")))
                .otherwise(ok_col),
                "bool",
            )
        ok = t in self._KIND_TYPES.get(tv.kind, set())
        card = F.lit(True) if n.occurrence in ("", "?", "*", "+") else F.lit(False)
        scalar_ok = F.when(tv.col.isNull(), F.lit(n.occurrence in ("?", "*"))).otherwise(
            F.lit(ok)
        )
        return TV(scalar_ok & card, "bool")

    def _c_castableas(self, n: P.CastableAs) -> TV:
        v = self._c_castas(P.CastAs(n.expr, n.type_qname))
        col = v.col
        return TV(col.isNotNull(), "bool")

    def _c_otherwise(self, n: P.Otherwise) -> TV:
        l, r = self.compile(n.left), self.compile(n.right)
        if not l.is_seq and not r.is_seq and l.kind == r.kind:
            return TV(F.coalesce(l.col, r.col), l.kind)
        ls = self.atomize_seq(l) if l.kind == "nodes" else (l if l.is_seq else self.to_seq(l))
        rs = self.atomize_seq(r) if r.kind == "nodes" else (r if r.is_seq else self.to_seq(r))
        if ls.kind != rs.kind:
            ls = TV(self._seq_cast(ls, "string"), "seq:string")
            rs = TV(self._seq_cast(rs, "string"), "seq:string")
        return TV(F.when(F.size(ls.col) > 0, ls.col).otherwise(rs.col), ls.kind)

    # -- casts / calls -------------------------------------------------------------

    _CASTS = {
        "xs:integer": ("to_long", "long"),
        "xs:int": ("to_long", "long"),
        "xs:long": ("to_long", "long"),
        "xs:double": ("to_number", "double"),
        "xs:float": ("to_number", "double"),
        "xs:string": ("to_string", "string"),
        "xs:untypedAtomic": ("to_string", "string"),
        "xs:boolean": ("_as_bool", "bool"),
    }

    def _c_castas(self, n: P.CastAs) -> TV:
        v = self._first(self.compile(n.expr))
        t = n.type_qname if ":" in n.type_qname else f"xs:{n.type_qname}"
        if t == "xs:decimal":
            return TV(self.to_number(v).cast("decimal(38,18)").cast("double"), "double")
        if t in self._CASTS:
            meth, kind = self._CASTS[t]
            return TV(getattr(self, meth)(v), kind)
        from ..functions.registry import BUILTINS

        try:  # xs constructor lattice (functions/xsd.py) via the registry
            # double inputs go through to_string so the constructor sees
            # the canonical lexical form ('3', not the cast artifact '3.0')
            arg = self.to_string(v) if v.kind == "double" else v.col
            return TV(BUILTINS.call(t, arg), "any")
        except KeyError:
            raise ValueError(f"expr: unsupported cast target {t!r}") from None

    # xs constructor result kinds (numeric facets format like their
    # primitive: xs:float(10) prints '10', not '10.0' — golden adhoc11)
    _XS_KINDS = {
        "float": "double", "double": "double", "decimal": "double",
        "numeric": "double",
        "integer": "long", "int": "long", "long": "long", "short": "long",
        "byte": "long", "unsignedByte": "long", "unsignedShort": "long",
        "unsignedInt": "long", "unsignedLong": "long",
        "nonNegativeInteger": "long", "nonPositiveInteger": "long",
        "negativeInteger": "long", "positiveInteger": "long",
        "boolean": "bool",
    }

    # registry functions whose return shape the static typer should know
    # (sequence-valued returns would otherwise degrade to scalar 'any',
    # breaking count()/'!'/existential semantics downstream)
    _REGISTRY_KINDS = {
        "tokenize": "seq:string",
        "extract-all": "seq:string",
        "analyze-string-matches": "seq:string",
        "string-to-codepoints": "seq:long",
        "codepoints-to-string": "string",
        "distinct-values": "seq:string",
        "subsequence": "seq:string",
        "insert-before": "seq:string",
        "remove": "seq:string",
        "reverse": "seq:string",
        "sort": "seq:string",
        "upper-case": "string",
        "lower-case": "string",
        "normalize-space": "string",
        "substring": "string",
        "substring-before": "string",
        "substring-after": "string",
        "translate": "string",
        "replace": "string",
        "encode-for-uri": "string",
        "string-length": "long",
        "abs": "double",
        "ceiling": "double",
        "floor": "double",
        "round": "double",
        "matches": "bool",
        "contains": "bool",
        "starts-with": "bool",
        "ends-with": "bool",
        "compare": "long",
    }

    def _c_call(self, n: P.Call) -> TV:
        name = n.qname
        local = name.split(":", 1)[-1]
        if name in self.funcs:
            # prolog-declared function: inline the body with params bound
            # (static expansion — a recursive declaration has no base-case
            # short-circuit in a column plan, hence the depth guard)
            if self._call_depth > 16:
                raise ValueError(
                    f"expr: recursive local function {name!r} exceeds the "
                    f"static-inline depth (column plans cannot recurse)"
                )
            fd = self.funcs[name]
            args = [self.compile(a) for a in n.args]
            if len(args) != len(fd.params):
                raise ValueError(
                    f"expr: {name!r} expects {len(fd.params)} args, got {len(args)}"
                )
            bound = self.bind(**dict(zip(fd.params, args)))
            bound._call_depth = self._call_depth + 1
            return bound.compile(fd.body)
        if local == "eval":
            # eval("expr") (readme.txt:205): compile-time expansion for
            # constant strings — the only form a static column plan can
            # express (per-row dynamic strings would need a row-wise
            # interpreter; the reference flags eval as trusted-input-only)
            if n.args and isinstance(n.args[0], P.Lit) and n.args[0].kind == "string":
                # a second options-map argument ({"language": ...}) selects
                # the dialect in the reference; one engine compiles both
                return self.compile(P.parse_expr(n.args[0].value))
            raise ValueError("expr: eval() supports constant strings only")
        args = [self.compile(a) for a in n.args]
        # map-typed arguments: route the jn:/map: accessors to the native
        # Spark map functions (the registry forms work on JSON strings)
        if args and args[0].kind == "map":
            if local == "keys":
                return TV(F.map_keys(args[0].col), "seq:string")
            if local == "values":
                return TV(F.map_values(args[0].col), "seq:string")
            if local == "size":
                return TV(F.size(F.map_keys(args[0].col)).cast("long"), "long")
            if local == "contains" and len(args) == 2:
                return TV(
                    F.array_contains(F.map_keys(args[0].col), self.to_string(args[1])),
                    "bool",
                )
            if local == "get" and len(args) == 2:
                return TV(
                    F.try_element_at(args[0].col, self.to_string(args[1])), "string"
                )
        if local == "get" and n.args and isinstance(n.args[0], P.Lit) \
                and n.args[0].kind == "string":
            # get("name"[, default]) — variable read by constant name
            # (tests/more.actions scripts); unset -> default or ''
            vname = n.args[0].value
            if vname in self.env:
                v = self.env[vname]
                return v if isinstance(v, TV) else TV(v, "any")
            # unset without an explicit default → EMPTY sequence (golden
            # multipageIf0 prints nothing, not an empty line)
            return args[1] if len(args) > 1 else TV(_empty_seq("string"), "seq:string")
        if local in ("extract", "extract-all") and len(n.args) >= 2 \
                and isinstance(n.args[1], P.Lit):
            # extract(string, regex[, group]) (readme.txt:191-194) — the
            # regex/group are compile-time constants here (regexp_extract
            # wants them as Python values)
            src_c = self.to_string(self.compile(n.args[0]))
            regex = str(n.args[1].value)
            group = 0
            if len(n.args) > 2 and isinstance(n.args[2], P.Lit):
                group = int(n.args[2].value)
            if local == "extract":
                return TV(F.regexp_extract(src_c, regex, group), "string")
            return TV(
                F.regexp_extract_all(src_c, F.lit(regex), F.lit(group)),
                "seq:string",
            )
        if local == "trace" and args:
            # trace(value, label): identity on the value (label goes to the
            # reference's stderr log, which the engine does not reproduce)
            return args[0]
        if local == "doc" and n.args and isinstance(n.args[0], P.Lit) \
                and getattr(self, "doc_loader", None) is not None:
            loaded = self.doc_loader(str(n.args[0].value))
            if loaded is not None:
                backing, roots = loaded
                return TV(
                    F.array(*[F.lit(r).cast("int") for r in roots]),
                    "nodes", backing=backing,
                )
        if local == "json" and len(args) == 1 and args[0].kind != "jsonv":
            # json(raw): parse with the session json-mode's null flavor
            flag = self.json_mode in ("jsoniq", "deprecated")
            return TV(
                jsonv(F.try_parse_json(self.to_string(args[0])), flag),
                "jsonv", jnull=flag,
            )
        if local == "parse-json" and len(args) == 1:
            # jn:parse-json keeps nulls as items; fn:parse-json (XPath 3.1)
            # maps them to the empty sequence (jsonmode/*-equals)
            flag = name.startswith("jn:")
            return TV(
                jsonv(F.try_parse_json(self.to_string(args[0])), flag),
                "jsonv", jnull=flag,
            )
        if local == "keys" and len(args) == 1 and args[0].kind == "jsonv":
            # '$json()' — keys of an object, members of an array
            # (readme.txt:150; golden encodingJson: ["aèb"]() -> 'aèb')
            v = args[0].col["v"]
            sch = F.schema_of_variant(v)
            members = F.transform(
                F.try_variant_get(v, "$", "array<variant>"),
                lambda m: self._jstring(m),
            )
            keys = F.json_object_keys(F.to_json(v))
            return TV(
                F.when(sch.startswith("ARRAY"), members)
                .when(sch.startswith("OBJECT") | sch.startswith("STRUCT"), keys)
                .otherwise(_empty_seq("string")),
                "seq:string",
            )
        if local == "is-null" and len(args) == 1 and args[0].kind == "jsonv":
            a = args[0]
            return TV(
                F.coalesce(F.is_variant_null(a.col["v"]), F.lit(False)) & a.col["jn"],
                "bool",
            )
        if local == "deep-equal" and len(args) == 2 and \
                args[0].kind == "jsonv" and args[1].kind == "jsonv":
            a, b = args
            return TV(
                a.col["jn"].eqNullSafe(b.col["jn"])
                & self._json_canon(a.col["v"]).eqNullSafe(
                    self._json_canon(b.col["v"])),
                "bool",
            )
        if local == "size" and args and args[0].static_items is not None \
                and isinstance(args[0].static_items, list):
            # array:size over a static array literal (jsonmode/standard)
            return TV(F.lit(len(args[0].static_items)).cast("long"), "long")
        if local == "root" and args and args[0].kind != "nodes":
            # root of a non-node / empty value: the empty sequence
            # (jsonmode/default: name(root($a(1))) over () prints '')
            return TV(_empty_seq("string"), "seq:string")
        if local == "root" and args and args[0].atype == "__detached__":
            # a COPIED node (JSONiq object/array member) roots at itself
            return args[0]
        if local == "root" and args and args[0].kind == "nodes":
            # root(node): the tree's root ELEMENT (fragment literals root
            # at their top element — name(root(<a><b/></a>//b)) = 'a')
            src = args[0]
            backing = self._backing(src)
            root_el = F.try_element_at(
                F.filter(
                    backing,
                    lambda nd: (nd["parent"] <= 0) & ~nd["tag"].startswith("#"),
                ),
                F.lit(1),
            )
            rid = F.coalesce(root_el["id"], F.lit(0))
            return TV(F.array(rid.cast("int")), "nodes", backing=backing)
        if local == "name" and args:
            if args[0].kind != "nodes":
                return TV(F.lit(""), "string")  # name(()) = ''
            first = F.try_element_at(args[0].col, F.lit(1))
            backing = self._backing(args[0])
            tag = F.element_at(backing, first.cast("int") + 1)["tag"]
            return TV(
                F.when(first.isNull() | tag.startswith("#"), F.lit(""))
                .otherwise(tag),
                "string",
            )
        if local == "clear-log":
            # x:clear-log([name]): hide prior change-log entries — the
            # compile-order log IS the runtime log in this static model
            # (assignments append during left-to-right sequence compile)
            if n.args and isinstance(n.args[0], P.Lit):
                nm = n.args[0].value
                for ai, (an, _tv) in enumerate(self.assignments):
                    if an == nm:
                        self.hidden_assignments.add(ai)
            else:
                self.hidden_assignments.update(range(len(self.assignments)))
            return TV(_empty_seq("string"), "seq:string")
        if local == "get-log":
            visible = [
                (an, tv) for ai, (an, tv) in enumerate(self.assignments)
                if ai not in self.hidden_assignments
            ]
            if not n.args:  # full log: {"name": .., "value": ..} per entry
                items = [
                    F.concat(F.lit('{"name": "' + an + '", "value": '),
                             self.json_form(tv), F.lit("}"))
                    for an, tv in visible
                ]
                return TV(F.array(*items) if items else _empty_seq("string"),
                          "seq:string")
            # per-name: each entry's value as a JSONiq array '[v]'
            names = sorted({an for an, _ in visible})
            arg_s = self.to_string(args[0])
            out = _empty_seq("string")
            for nm in names:
                forms = [F.concat(F.lit("["), self.json_form(tv), F.lit("]"))
                         for an, tv in visible if an == nm]
                out = F.when(arg_s == nm, F.array(*forms)).otherwise(out)
            return TV(out, "seq:string")
        if local == "system" and n.args and isinstance(n.args[0], P.Lit) \
                and str(n.args[0].value).startswith("echo "):
            # system(cmd) is deliberately NOT executed (SURVEY §2.3 —
            # arbitrary shell exec has no place in a distributed engine);
            # the harness-replay surface simulates the one PURE form the
            # reference's own test pins — `echo X` → "X\n" (golden system)
            return TV(F.lit(str(n.args[0].value)[5:] + "\n"), "string")
        if local in ("int", "integer") and n.args \
                and isinstance(n.args[0], P.Lit) and n.args[0].kind == "string":
            import re as _re

            if not _re.match(r"^\s*[+-]?\d+\s*$", str(n.args[0].value)):
                # static out-of-lexical-space constructor argument: the
                # dynamic error FORG0001 (multipageTry's int("f"))
                raise XQError(f"FORG0001: {n.args[0].value!r} is not an integer")
        sf = getattr(self, "_f_" + local.replace("-", "_"), None)
        if sf is not None:
            return sf(args)
        from ..functions.registry import BUILTINS

        # bare names resolve through fn: then the default-importable x:/pxp:
        # extension namespaces (registry.resolve)
        fn = BUILTINS.resolve(name)
        cols = []
        for a in args:
            if a.kind == "nodes":
                cols.append(self.to_string(a))
            elif a.kind == "double" and name.startswith("xs:"):
                # xs constructors take the canonical lexical form of a
                # double ('3', 'NaN', 'INF'), not the cast artifact '3.0'
                cols.append(self.to_string(a))
            else:
                cols.append(a.col)
        kind = "any"
        atype = None
        if ":" not in name or name.startswith("fn:"):
            kind = self._REGISTRY_KINDS.get(local, "any")
        elif name.startswith("xs:"):
            kind = self._XS_KINDS.get(local, "any")
            atype = name
        return TV(fn(*cols), kind, atype=atype)

    # special forms: functions whose semantics need the typed value model
    def _f_string(self, args: list[TV]) -> TV:
        src = args[0] if args else self.ctx
        if src is None:
            raise ValueError("expr: string() without context")
        return TV(F.coalesce(self.to_string(src), F.lit("")), "string")

    def _f_number(self, args: list[TV]) -> TV:
        src = args[0] if args else self.ctx
        if src is None:
            raise ValueError("expr: number() without context")
        n = self.to_number(src)
        return TV(F.coalesce(n, F.lit(float("nan"))), "double")

    def _f_boolean(self, args: list[TV]) -> TV:
        return TV(self.ebv(args[0]), "bool")

    def _f_not(self, args: list[TV]) -> TV:
        return TV(~self.ebv(args[0]), "bool")

    def _f_count(self, args: list[TV]) -> TV:
        tv = args[0]
        if tv.atype == "__arritem__":
            return TV(F.lit(1).cast("long"), "long")  # a collapsed array item
        if tv.kind == "jsonv":
            tv = self.to_seq(tv)  # null-flavor count semantics
        if tv.is_seq:
            return TV(F.size(tv.col).cast("long"), "long")
        return TV(
            F.when(tv.col.isNull(), F.lit(0)).otherwise(F.lit(1)).cast("long"), "long"
        )

    def _f_exists(self, args: list[TV]) -> TV:
        tv = args[0]
        col = F.size(tv.col) > 0 if tv.is_seq else tv.col.isNotNull()
        return TV(col, "bool")

    def _f_empty(self, args: list[TV]) -> TV:
        return TV(~self._f_exists(args).col, "bool")

    def _f_concat(self, args: list[TV]) -> TV:
        cols = [F.coalesce(self.to_string(a), F.lit("")) for a in args]
        return TV(F.concat(*cols), "string")

    def _f_string_join(self, args: list[TV]) -> TV:
        seq = self.atomize_seq(args[0])
        if seq.elem_kind != "string":
            seq = TV(
                F.transform(seq.col, lambda x: self.to_string(TV(x, seq.elem_kind))),
                "seq:string",
            )
        sep = self.to_string(args[1]) if len(args) > 1 else F.lit("")
        # F.array_join's python wrapper wants a str delimiter; the SQL
        # builtin takes a column — call it directly
        return TV(F.call_function("array_join", seq.col, sep), "string")

    def _f_join(self, args: list[TV]) -> TV:
        if len(args) == 1:
            args = [args[0], TV(F.lit(" "), "string")]
        return self._f_string_join(args)

    def _f_sum(self, args: list[TV]) -> TV:
        seq = self.atomize_seq(args[0])
        if seq.elem_kind == "long":
            # xs:integer arithmetic stays integer (xidelbase.pas sum over
            # integer sequences); a double seed would turn sum((0)) into
            # 0.0 and poison downstream -0 serialization. xs:integer is
            # arbitrary-precision in the reference; we document the
            # 64-bit envelope.
            col = F.aggregate(
                seq.col,
                F.lit(0).cast("long"),
                lambda acc, x: acc + F.coalesce(x.cast("long"), F.lit(0).cast("long")),
            )
            return TV(col, "long")
        col = F.aggregate(
            seq.col,
            F.lit(0.0),
            lambda acc, x: acc + F.coalesce(self.to_number(TV(x, seq.elem_kind)), F.lit(0.0)),
        )
        return TV(col, "double")

    def _f_avg(self, args: list[TV]) -> TV:
        s = self._f_sum(args)
        n = F.size(self.atomize_seq(args[0]).col)
        return TV(F.when(n > 0, s.col / n).otherwise(F.lit(None).cast("double")), "double")

    def _f_object(self, args: list[TV]) -> TV:
        """object((k1,v1,k2,v2,...)) — the deprecated object constructor
        (golden regression_object1): alternating key/value sequence → map."""
        if not args:
            return TV(F.create_map().cast("map<string,string>"), "map")
        seq = self.atomize_seq(args[0]) if args[0].is_seq else self.to_seq(args[0])
        ks = F.filter(seq.col, lambda x, i: i % 2 == 0)
        vs = F.filter(seq.col, lambda x, i: i % 2 == 1)
        return TV(F.map_from_arrays(ks, vs), "map")

    def _f_min(self, args: list[TV]) -> TV:
        return self._minmax(args[0], F.array_min)

    def _f_max(self, args: list[TV]) -> TV:
        return self._minmax(args[0], F.array_max)

    def _minmax(self, tv: TV, agg) -> TV:
        seq = self.atomize_seq(tv)
        if seq.elem_kind in NUM_KINDS:
            return TV(agg(seq.col), seq.elem_kind)
        # weak typing: all-numeric strings compare numerically, otherwise by
        # collation. Both when-branches must share one type (ANSI would
        # coerce a string branch to double and crash), so the numeric
        # branch is formatted via to_string and the collation branch picks
        # the ORIGINAL item via min/max over struct<key,value> pairs
        # (struct comparison is field-by-field: key decides, value rides).
        nums = F.transform(seq.col, lambda x: x.cast("string").try_cast("double"))
        all_numeric = ~F.exists(nums, lambda x: x.isNull())
        num_result = self.to_string(TV(agg(nums), "double"))
        keyed = F.transform(
            seq.col,
            lambda x: F.struct(
                collation_key_expr(x.cast("string")).alias("k"),
                x.cast("string").alias("v"),
            ),
        )
        str_result = agg(keyed)["v"]
        return TV(F.when(all_numeric, num_result).otherwise(str_result), "string")

    def _f_resolve_uri(self, args: list[TV]) -> TV:
        """resolve-uri(rel[, base]): the 1-arg form resolves against the
        static base URI — the current document's URL (the harness binds it
        as the magic $url; goldens regression_multipage3/3b)."""
        from ..urlnorm import resolve_url_expr

        rel = self.to_string(args[0])
        if len(args) >= 2:
            base = self.to_string(args[1])
        else:
            b = self.env.get("url")
            if b is None:
                base = F.lit("")
            else:
                base = b.col if isinstance(b, TV) else b
        return TV(resolve_url_expr(rel, base), "string")

    def _f_outer_xml(self, args: list[TV]) -> TV:
        return self._serialize_xml(args, inner=False)

    def _f_inner_xml(self, args: list[TV]) -> TV:
        return self._serialize_xml(args, inner=True)

    def _serialize_xml(self, args: list[TV], inner: bool) -> TV:
        """outer-xml(/) / inner-xml(node) — the pure-Catalyst serializer
        (extract/nodes._serialize_expr), so it composes with any
        HOF-derived node set."""
        from ..extract.nodes import inner_xml_expr, outer_xml_expr

        tv = args[0] if args else self.ctx
        if tv is None or tv.kind != "nodes":
            raise ValueError("expr: outer-xml/inner-xml need a node argument")
        first = F.coalesce(F.try_element_at(tv.col, F.lit(1)), F.lit(0))
        fn = inner_xml_expr if inner else outer_xml_expr
        return TV(fn(self.nodes, first), "string")

    def _f_last(self, args: list[TV]) -> TV:
        if self.size is None:
            raise ValueError("expr: last() outside a predicate")
        return TV(self.size.cast("long"), "long")

    def _f_position(self, args: list[TV]) -> TV:
        if self.pos is None:
            raise ValueError("expr: position() outside a predicate")
        return TV(self.pos.cast("long"), "long")


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


class CompiledExpr:
    """compile once, evaluate as a Column under any env/node binding."""

    def __init__(self, source: str, json_literals: bool = True):
        self.source = source
        # module imports surface on .imports for the caller to load
        # (registry.load_module / harness); parsing proceeds without them
        self.imports: list[tuple[str | None, str, str | None]] = []
        stripped = P.IMPORT_MODULE.sub(
            lambda m: self.imports.append((m.group(1), m.group(2), m.group(3))) or "",
            P._PROLOG.sub("", source),
        )
        stripped = _rewrite_pattern_bindings(stripped)
        # $Q{..xqt-errors..}code braced-URI variable → $__err_code
        import re as _re

        stripped = _re.sub(r"\$Q\{[^}]*xqt-errors[^}]*\}(\w+)", r"$__err_\1", stripped)
        # static direct XML constructors become constant node-array vars:
        # '(<html>..</html>)//td' navigates a compile-time literal
        rewritten, self._doc_literals = P.extract_doc_literals(stripped)
        if not rewritten.strip():
            # '-e ""' / import-only prologs: the empty sequence
            self.ast, self._funcs = P.SeqExpr([]), {}
        else:
            self.ast, self._funcs = P.parse_expr_full(rewritten, json_literals=json_literals)

    def _env_with_docs(self, env):
        if not self._doc_literals:
            return env
        from ..extract.nodes import literal_nodes

        env = dict(env or {})
        for name, markup in self._doc_literals.items():
            backing, roots = literal_nodes(markup)
            env[name] = TV(
                F.array(*[F.lit(r).cast("int") for r in roots]), "nodes",
                backing=backing,
            )
        return env

    def tv(self, env=None, nodes=None, ctx=None) -> TV:
        c = Compiler(env=self._env_with_docs(env), nodes=nodes, ctx=ctx,
                     funcs=self._funcs)
        return c.compile(self.ast)

    def column(self, env=None, nodes=None, ctx=None) -> Column:
        """native-typed result column (arrays for sequence values)."""
        return self.tv(env, nodes, ctx).col

    def values(self, env=None, nodes=None, ctx=None) -> Column:
        """array<string> of printed items — the reference's -e output model
        (one line per sequence item)."""
        c = Compiler(env=self._env_with_docs(env), nodes=nodes, ctx=ctx,
                     funcs=self._funcs)
        tv = c.compile(self.ast)
        if tv.is_seq:
            seq = c.atomize_seq(tv)
            if seq.elem_kind != "string":
                return F.transform(
                    seq.col, lambda x: c.to_string(TV(x, seq.elem_kind))
                )
            return seq.col
        s = c.to_string(tv)
        return F.when(s.isNull(), _empty_seq("string")).otherwise(F.array(s))

    def string(self, env=None, nodes=None, ctx=None) -> Column:
        """items joined with newline (stdout shape)."""
        return F.array_join(self.values(env, nodes, ctx), "\n")

    def with_assignments(
        self, env=None, nodes=None, ctx=None
    ) -> tuple[Column, list[tuple[str, Column]]]:
        """(result column, [(var, value column), ...]) — the `v := e`
        assignments in evaluation order, printed-form columns, ready to
        feed the variable change log (extract/changelog.py)."""
        c = Compiler(env=self._env_with_docs(env), nodes=nodes, ctx=ctx,
                     funcs=self._funcs)
        tv = c.compile(self.ast)
        log = [(name, c.to_string(v))
               for i, (name, v) in enumerate(c.assignments)
               if i not in c.hidden_assignments]
        return tv.col, log


_PATBIND = __import__("re").compile(r"\b(let|for)\s*<")


def _rewrite_pattern_bindings(src: str) -> str:
    """`let <a>{$foo}</a> := <a>123</a> return ..` — pattern-destructuring
    bindings (goldens regression_mutablevariable1/2): when BOTH the
    template and the source are static markup, match at compile time and
    rewrite to plain let bindings of the captured values. Non-static
    shapes fall through unchanged (and fail to parse, honestly)."""
    import re as _re

    out = src
    for _ in range(8):  # nested occurrences
        m = _PATBIND.search(out)
        if m is None:
            return out
        # lazy import: harness.template is a pure-python node matcher; the
        # package-level import would cycle (harness.sim imports compiler)
        from ..harness.template import match_template

        t_start = out.index("<", m.start())
        t_end = P._scan_markup(out, t_start, allow_braces=True)
        if t_end is None:
            return out
        template = out[t_start:t_end]
        rest = out[t_end:]
        kw = ":=" if m.group(1) == "let" else "in"
        rest_l = rest.lstrip()
        if not rest_l.startswith(kw):
            return out
        after = t_end + (len(rest) - len(rest_l)) + len(kw)
        rest2 = out[after:]
        rest2_l = rest2.lstrip()
        if not rest2_l.startswith("<"):
            return out
        s_start = after + (len(rest2) - len(rest2_l))
        s_end = P._scan_markup(out, s_start)
        if s_end is None:
            return out
        source_markup = out[s_start:s_end]
        from ..extract.nodes import _parse_auto_py, _parse_xml_py

        nodes = _parse_xml_py(source_markup) or _parse_auto_py(source_markup)
        if not nodes:
            return out
        try:
            caps = match_template(template, nodes)
        except ValueError:
            return out
        parts = []
        for name, expr, nid in caps or []:
            if name is None or expr.strip() != ".":
                return out
            val = nodes[nid].get("text") or ""
            parts.append("$" + name + " := '" + val.replace("'", "''") + "'")
        if not parts:
            return out
        out = out[: m.start()] + "let " + ", ".join(parts) + out[s_end:]
    return out


def compile_expr(source: str, json_literals: bool = True) -> CompiledExpr:
    return CompiledExpr(source, json_literals=json_literals)
