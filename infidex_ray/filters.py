"""Infiscript filter language: parser, evaluator, Arrow-expression compiler.

Re-implements the reference filter DSL
(grammar: src/Infidex/Api/Infiscript.bnf; parser:
src/Infidex/Api/FilterParser.cs; execution semantics:
src/Infidex/Filtering/FilterVM.cs:200-359):

* comparisons `= != < <= > >=` — equality is case-insensitive STRING
  comparison of both operands (FilterVM.AreEqual, :330-338); ordering tries
  numeric parse first, falls back to case-insensitive string compare
  (FilterVM.CompareTo, :340-358)
* AND/&&, OR/||, NOT/! — non-boolean operands coerce to false
* CONTAINS / STARTS WITH / ENDS WITH — OrdinalIgnoreCase
* LIKE — SQL pattern, % → .* and _ → . (:256-266); MATCHES — regex,
  IgnoreCase, invalid pattern → false (:269-281)
* IN, BETWEEN (inclusive), IS [NOT] NULL (null or empty string)
* ternary `cond ? a : b`; a filter is true iff the expression yields True

Two execution paths:
* ``evaluate(ast, row)`` / ``eval_mask(ast, table)`` — row semantics for
  post-filtering search results (small sets; ResultProcessor.ApplyFilter)
* ``to_arrow_expression(ast)`` — compiles the pushdown-able subset to a
  ``pyarrow.dataset`` expression for ``ray.data.read_parquet(filter=...)`` /
  ``Dataset.filter(expr)`` so predicates prune at the scan (the 100-TB path);
  raises ``UnsupportedExpression`` for constructs that need row evaluation.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class FilterParseError(ValueError):
    pass


class UnsupportedExpression(ValueError):
    pass


# --- AST ---------------------------------------------------------------------


@dataclass
class Ident:
    name: str


@dataclass
class Literal:
    value: str  # kept as raw string; numeric coercion happens at compare time


@dataclass
class Compare:
    op: str  # '=' '!=' '<' '<=' '>' '>='
    field: "Node"
    value: "Node"


@dataclass
class BoolOp:
    op: str  # 'and' | 'or'
    left: "Node"
    right: "Node"


@dataclass
class Not:
    operand: "Node"


@dataclass
class StringOp:
    op: str  # 'contains' | 'startswith' | 'endswith' | 'like' | 'matches'
    field: "Node"
    pattern: "Node"


@dataclass
class In:
    field: "Node"
    values: list


@dataclass
class Between:
    field: "Node"
    low: "Node"
    high: "Node"


@dataclass
class NullCheck:
    field: "Node"
    negated: bool


@dataclass
class Ternary:
    cond: "Node"
    if_true: "Node"
    if_false: "Node"


@dataclass
class DerivedFilter:
    """Arbitrary-predicate escape hatch (src/Infidex/Api/DerivedFilter.cs):
    wraps a Python callable ``row_dict -> bool`` for conditions the DSL
    cannot express. Evaluable and composable in the AST, but NOT compilable
    to bytecode (FilterCompiler.cs:74-76 throws) and has no Arrow pushdown —
    it always routes through the row evaluator."""

    predicate: object  # Callable[[dict], bool]


Node = object

# --- tokenizer (FilterParser.cs:500-660) -------------------------------------

_KEYWORDS = {
    "AND", "OR", "NOT", "BETWEEN", "IN", "CONTAINS", "STARTS", "ENDS",
    "LIKE", "MATCHES", "IS", "NULL", "WITH",
}


def _tokenize(expr: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    i, n = 0, len(expr)
    while i < n:
        c = expr[i]
        if c.isspace():
            i += 1
            continue
        if c in "()?,:":
            tokens.append((c, c))
            i += 1
            continue
        if c in "=<>":
            op = c
            i += 1
            if i < n and expr[i] == "=":
                op += "="
                i += 1
            tokens.append(("op", op))
            continue
        if c == "!":
            i += 1
            if i < n and expr[i] == "=":
                tokens.append(("op", "!="))
                i += 1
            else:
                tokens.append(("NOT", "!"))
            continue
        if c in "&|":
            i += 1
            if i < n and expr[i] == c:
                i += 1
            tokens.append(("AND" if c == "&" else "OR", c))
            continue
        if c in "'\"":
            quote = c
            i += 1
            start = i
            while i < n and expr[i] != quote:
                i += 1
            if i >= n:
                raise FilterParseError("Unterminated string literal - missing closing quote.")
            tokens.append(("value", expr[start:i]))
            i += 1
            continue
        if c.isalpha() or c == "_":
            start = i
            while i < n and (expr[i].isalnum() or expr[i] == "_"):
                i += 1
            word = expr[start:i]
            upper = word.upper()
            tokens.append((upper if upper in _KEYWORDS else "ident", word))
            continue
        if c.isdigit() or (c == "-" and i + 1 < n and expr[i + 1].isdigit()):
            start = i
            i += 1
            while i < n and (expr[i].isdigit() or expr[i] == "."):
                i += 1
            tokens.append(("value", expr[start:i]))
            continue
        raise FilterParseError(f"Unexpected character {c!r} at position {i}")
    return tokens


# --- parser (recursive descent per Infiscript.bnf) ---------------------------


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.tokens = tokens
        self.pos = 0

    def peek(self, k: int = 0):
        p = self.pos + k
        return self.tokens[p] if p < len(self.tokens) else (None, None)

    def take(self, expected: str | None = None):
        tt, tv = self.peek()
        if tt is None:
            raise FilterParseError("Unexpected end of expression")
        if expected is not None and tt != expected:
            raise FilterParseError(f"Expected {expected}, got {tv!r}")
        self.pos += 1
        return tt, tv

    def parse(self) -> Node:
        node = self.ternary()
        if self.peek()[0] is not None:
            raise FilterParseError(f"Unexpected token {self.peek()[1]!r}")
        return node

    def ternary(self) -> Node:
        cond = self.or_expr()
        if self.peek()[0] == "?":
            self.take("?")
            if_true = self.ternary()
            self.take(":")
            if_false = self.ternary()
            return Ternary(cond, if_true, if_false)
        return cond

    def or_expr(self) -> Node:
        node = self.and_expr()
        while self.peek()[0] == "OR":
            self.take()
            node = BoolOp("or", node, self.and_expr())
        return node

    def and_expr(self) -> Node:
        node = self.not_expr()
        while self.peek()[0] == "AND":
            self.take()
            node = BoolOp("and", node, self.not_expr())
        return node

    def not_expr(self) -> Node:
        if self.peek()[0] == "NOT":
            self.take()
            return Not(self.primary())
        return self.primary()

    def primary(self) -> Node:
        tt, tv = self.peek()
        if tt == "(":
            self.take("(")
            node = self.ternary()
            self.take(")")
            return node
        if tt == "value":
            # bare literal — legal as a ternary branch ("? 'adult' : 'minor'")
            self.take()
            return Literal(tv)
        if tt != "ident":
            raise FilterParseError(f"Expected identifier, got {tv!r}")
        self.take()
        field = Ident(tv)
        tt, tv = self.peek()
        if tt == "IS":
            self.take()
            negated = False
            if self.peek()[0] == "NOT":
                self.take()
                negated = True
            self.take("NULL")
            return NullCheck(field, negated)
        if tt == "BETWEEN":
            self.take()
            low = self.value()
            self.take("AND")
            high = self.value()
            return Between(field, low, high)
        if tt == "IN":
            self.take()
            self.take("(")
            values = [self.value()]
            while self.peek()[0] == ",":
                self.take(",")
                values.append(self.value())
            self.take(")")
            return In(field, values)
        if tt == "CONTAINS":
            self.take()
            return StringOp("contains", field, self.value())
        if tt == "STARTS":
            self.take()
            self.take("WITH")
            return StringOp("startswith", field, self.value())
        if tt == "ENDS":
            self.take()
            self.take("WITH")
            return StringOp("endswith", field, self.value())
        if tt == "LIKE":
            self.take()
            return StringOp("like", field, self.value())
        if tt == "MATCHES":
            self.take()
            return StringOp("matches", field, self.value())
        if tt == "op":
            self.take()
            return Compare(tv, field, self.value())
        raise FilterParseError(f"Expected operator after identifier, got {tv!r}")

    def value(self) -> Node:
        tt, tv = self.peek()
        if tt == "value":
            self.take()
            return Literal(tv)
        if tt == "ident":
            self.take()
            return Ident(tv)
        raise FilterParseError(f"Expected value, got {tv!r}")


def parse(expression: str) -> Node:
    """Filter.Parse — expression string → AST."""
    if not expression or expression.isspace():
        raise FilterParseError("Empty filter expression")
    return _Parser(_tokenize(expression)).parse()


# --- row evaluation (FilterVM semantics) -------------------------------------


def _operand(node: Node, row: dict):
    if isinstance(node, Ident):
        return row.get(node.name)
    if isinstance(node, Literal):
        return node.value
    return evaluate(node, row)


def _are_equal(left, right) -> bool:
    """FilterVM.AreEqual (:330-338): case-insensitive string equality."""
    if left is None and right is None:
        return True
    if left is None or right is None:
        return False
    return _to_str(left).lower() == _to_str(right).lower()


def _to_str(v) -> str:
    if isinstance(v, bool):
        return "True" if v else "False"  # .NET bool.ToString()
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def _compare_to(left, right) -> int:
    """FilterVM.CompareTo (:340-358): numeric first, else string."""
    if left is None and right is None:
        return 0
    if left is None:
        return -1
    if right is None:
        return 1
    try:
        ln, rn = float(_to_str(left)), float(_to_str(right))
        return (ln > rn) - (ln < rn)
    except (TypeError, ValueError):
        ls, rs = _to_str(left).lower(), _to_str(right).lower()
        return (ls > rs) - (ls < rs)


def _is_null(v) -> bool:
    return v is None or (isinstance(v, str) and v == "")


def evaluate(node: Node, row: dict):
    """Evaluate AST against one row (field-name → value mapping)."""
    if isinstance(node, Compare):
        left = _operand(node.field, row)
        right = _operand(node.value, row)
        if node.op == "=":
            return _are_equal(left, right)
        if node.op == "!=":
            return not _are_equal(left, right)
        c = _compare_to(left, right)
        return {"<": c < 0, "<=": c <= 0, ">": c > 0, ">=": c >= 0}[node.op]
    if isinstance(node, BoolOp):
        left = evaluate(node.left, row) is True
        right = evaluate(node.right, row) is True
        return (left and right) if node.op == "and" else (left or right)
    if isinstance(node, Not):
        return not (evaluate(node.operand, row) is True)
    if isinstance(node, StringOp):
        text = _to_str(_operand(node.field, row) or "")
        pattern = _to_str(_operand(node.pattern, row) or "")
        tl, pl = text.lower(), pattern.lower()
        if node.op == "contains":
            return pl in tl
        if node.op == "startswith":
            return tl.startswith(pl)
        if node.op == "endswith":
            return tl.endswith(pl)
        if node.op == "like":
            rx = "^" + re.escape(pattern).replace("%", ".*").replace("_", ".") + "$"
            return re.search(rx, text, re.IGNORECASE) is not None
        if node.op == "matches":
            try:
                return re.search(pattern, text, re.IGNORECASE) is not None
            except re.error:
                return False
    if isinstance(node, In):
        value = _operand(node.field, row)
        return any(_are_equal(value, _operand(v, row)) for v in node.values)
    if isinstance(node, Between):
        value = _operand(node.field, row)
        return (
            _compare_to(value, _operand(node.low, row)) >= 0
            and _compare_to(value, _operand(node.high, row)) <= 0
        )
    if isinstance(node, NullCheck):
        isnull = _is_null(_operand(node.field, row))
        return not isnull if node.negated else isnull
    if isinstance(node, Ternary):
        # VM semantics (FilterVM.cs:133-138): JUMP_IF_FALSE fires only on a
        # literal False — any non-bool condition value takes the TRUE branch
        cond = evaluate(node.cond, row)
        return evaluate(node.if_false if cond is False else node.if_true, row)
    if isinstance(node, DerivedFilter):
        return bool(node.predicate(row))
    if isinstance(node, Ident):
        return row.get(node.name)
    if isinstance(node, Literal):
        return node.value
    raise TypeError(f"Unknown node {node!r}")


def matches_row(node: Node, row: dict) -> bool:
    """Filter truth: result must be exactly True (FilterVM.Execute, :26-46)."""
    return evaluate(node, row) is True


def eval_mask(node: Node, table) -> "list[bool]":
    """Row-wise mask over a pyarrow Table (post-filter path)."""
    rows = table.to_pylist()
    return [matches_row(node, r) for r in rows]


# --- Arrow pushdown compiler -------------------------------------------------


def _coerce_for_arrow(raw: str):
    try:
        f = float(raw)
        return int(f) if f.is_integer() and "." not in raw else f
    except ValueError:
        return raw


def to_arrow_expression(node: Node):
    """Compile the pushdown-able subset to a ``pyarrow.dataset`` expression
    (used with ``ray.data.read_parquet(filter=...)`` / ``Dataset.filter`` so
    row groups are pruned at the scan). NOTE: Arrow comparisons are typed and
    case-sensitive — exact parity with the VM's stringly, case-insensitive
    semantics holds for numeric fields and case-normalized string data; use
    the row evaluator when that distinction matters."""
    import pyarrow.dataset as pds

    if isinstance(node, Compare):
        if not isinstance(node.field, Ident) or not isinstance(node.value, Literal):
            raise UnsupportedExpression("comparison requires field op literal")
        f = pds.field(node.field.name)
        v = _coerce_for_arrow(node.value.value)
        return {
            "=": f == v, "!=": f != v, "<": f < v, "<=": f <= v,
            ">": f > v, ">=": f >= v,
        }[node.op]
    if isinstance(node, BoolOp):
        left, right = to_arrow_expression(node.left), to_arrow_expression(node.right)
        return (left & right) if node.op == "and" else (left | right)
    if isinstance(node, Not):
        return ~to_arrow_expression(node.operand)
    if isinstance(node, In):
        if not isinstance(node.field, Ident):
            raise UnsupportedExpression("IN requires a field")
        vals = [
            _coerce_for_arrow(v.value) for v in node.values if isinstance(v, Literal)
        ]
        if len(vals) != len(node.values):
            raise UnsupportedExpression("IN values must be literals")
        return pds.field(node.field.name).isin(vals)
    if isinstance(node, Between):
        if not (
            isinstance(node.field, Ident)
            and isinstance(node.low, Literal)
            and isinstance(node.high, Literal)
        ):
            raise UnsupportedExpression("BETWEEN requires literals")
        f = pds.field(node.field.name)
        return (f >= _coerce_for_arrow(node.low.value)) & (
            f <= _coerce_for_arrow(node.high.value)
        )
    if isinstance(node, NullCheck):
        f = pds.field(node.field.name)
        return f.is_valid() if node.negated else ~f.is_valid()
    raise UnsupportedExpression(f"{type(node).__name__} has no Arrow pushdown")


def filter_dataset(ds, expression):
    """Filter a ray.data.Dataset by an Infiscript expression (string or AST,
    incl. DerivedFilter nodes): Arrow pushdown when the expression compiles,
    else a vectorizable row-mask map_batches."""
    ast = parse(expression) if isinstance(expression, str) else expression
    import pyarrow as pa

    try:
        expr = to_arrow_expression(ast)

        def _apply_expr(batch: pa.Table) -> pa.Table:
            return batch.filter(expr)  # vectorized Arrow kernel, no row loop

        return ds.map_batches(_apply_expr, batch_format="pyarrow")
    except UnsupportedExpression:
        pass

    def _apply(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(eval_mask(ast, batch)))

    return ds.map_batches(_apply, batch_format="pyarrow")


# --- fluent builder (Api/FilterBuilder.cs:20-138) ----------------------------

_MISSING = object()


class FilterBuilder:
    """Fluent filter construction over the Infiscript AST — the programmatic
    mirror of the string parser (reference: src/Infidex/Api/FilterBuilder.cs:
    20-138). Chainable ``where/and_/or_`` (field equality, range, or an AST
    node), ``not_()`` negating the whole current expression, and grouped
    sub-expressions via a callable::

        f = (FilterBuilder.where("lang", "en")
             .and_range("n_chars", 200, 1500)
             .or_(lambda b: b.where("lang", "de").and_("tier", 1))
             .build())

    ``build()`` returns the AST node accepted by ``Query.filter``,
    ``matches_row`` and ``filter_dataset``. Values are stringified into
    ``Literal`` (numeric coercion happens at compare time, like parsed
    expressions)."""

    def __init__(self, initial=None):
        self._f = initial

    # -- entry points ------------------------------------------------------
    @classmethod
    def where(cls, field, value=_MISSING) -> "FilterBuilder":
        """Where(Filter) / Where(field, value) (FilterBuilder.cs:20-34)."""
        return cls(cls._value_node(field, value))

    @classmethod
    def where_range(cls, field, low=None, high=None) -> "FilterBuilder":
        return cls(cls._range_node(field, low, high))

    # -- connectives -------------------------------------------------------
    def and_(self, field, value=_MISSING) -> "FilterBuilder":
        return self._combine("and", self._sub_node(field, value))

    def and_range(self, field, low=None, high=None) -> "FilterBuilder":
        return self._combine("and", self._range_node(field, low, high))

    def or_(self, field, value=_MISSING) -> "FilterBuilder":
        return self._combine("or", self._sub_node(field, value))

    def or_range(self, field, low=None, high=None) -> "FilterBuilder":
        return self._combine("or", self._range_node(field, low, high))

    def not_(self) -> "FilterBuilder":
        """Negates the CURRENT whole expression (FilterBuilder.cs:93-100)."""
        if self._f is not None:
            self._f = Not(self._f)
        return self

    def build(self):
        return self._f

    # -- internals ---------------------------------------------------------
    def _combine(self, op: str, node) -> "FilterBuilder":
        if node is None:
            return self
        self._f = node if self._f is None else BoolOp(op, self._f, node)
        return self

    @classmethod
    def _sub_node(cls, field, value):
        if callable(field) and not isinstance(field, str) and value is _MISSING:
            # grouped sub-expression (FilterBuilder.cs:102-122)
            sub = field(cls())
            return sub.build() if isinstance(sub, cls) else sub
        return cls._value_node(field, value)

    @staticmethod
    def _value_node(field, value):
        if value is _MISSING:
            return field  # already an AST node (or None)
        return Compare("=", Ident(field), Literal(_lit(value)))

    @staticmethod
    def _range_node(field, low, high):
        if low is not None and high is not None:
            return Between(Ident(field), Literal(_lit(low)), Literal(_lit(high)))
        if low is not None:
            return Compare(">=", Ident(field), Literal(_lit(low)))
        if high is not None:
            return Compare("<=", Ident(field), Literal(_lit(high)))
        return None


def _lit(value) -> str:
    if isinstance(value, bool):
        return "true" if value else "false"
    return str(value)
