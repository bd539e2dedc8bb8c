"""Infiscript bytecode: compiler, stack VM, and INFISCRIPT-V1 serialization.

Port of the reference's compiled-filter pipeline
(src/Infidex/Filtering/FilterCompiler.cs:23-325, FilterVM.cs:26-359,
BytecodeSerializer.cs:9-164, ConstantPool.cs:9-170,
BytecodeInstruction.cs:8-108):

* ``compile_filter(expr_or_ast)`` — AST → stack bytecode with a deduplicated
  constant pool; AND/OR compile to the reference's DUP + peeking-JUMP
  short-circuit pattern, ternary to JUMP_IF_FALSE/JUMP.
* ``FilterVM`` — executes bytecode over a row dict; comparison semantics are
  the same case-insensitive stringly helpers the AST evaluator uses
  (filters._are_equal / _compare_to), so both paths stay row-identical.
* ``serialize`` / ``deserialize`` — the portable INFISCRIPT-V1 binary format
  (magic + uint16 version + constant pool with C# 7-bit-varint string
  lengths + instruction stream), byte-layout-compatible with the reference
  writer so filters can be persisted and shipped across processes.

``DerivedFilter`` (arbitrary Python predicate) cannot be compiled — the
compiler raises, mirroring FilterCompiler.cs:74-76.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from . import filters as flt

MAGIC = b"INFISCRIPT-V1"
VERSION = 1

# Opcode byte values — BytecodeInstruction.cs:8-56
PUSH_FIELD = 0x01
PUSH_CONST = 0x02
POP = 0x03
DUP = 0x04
EQ = 0x10
NEQ = 0x11
LT = 0x12
LTE = 0x13
GT = 0x14
GTE = 0x15
AND = 0x20
OR = 0x21
NOT = 0x22
CONTAINS = 0x30
STARTS_WITH = 0x31
ENDS_WITH = 0x32
LIKE = 0x33
MATCHES = 0x34
IN = 0x40
BETWEEN = 0x41
IS_NULL = 0x50
IS_NOT_NULL = 0x51
JUMP = 0x60
JUMP_IF_FALSE = 0x61
JUMP_IF_TRUE = 0x62
HALT = 0xFF

_VALID_OPCODES = frozenset(
    [PUSH_FIELD, PUSH_CONST, POP, DUP, EQ, NEQ, LT, LTE, GT, GTE, AND, OR, NOT,
     CONTAINS, STARTS_WITH, ENDS_WITH, LIKE, MATCHES, IN, BETWEEN, IS_NULL,
     IS_NOT_NULL, JUMP, JUMP_IF_FALSE, JUMP_IF_TRUE, HALT]
)
_NEEDS_OPERAND = frozenset([PUSH_FIELD, PUSH_CONST, JUMP, JUMP_IF_FALSE, JUMP_IF_TRUE])

_OPNAMES = {
    PUSH_FIELD: "PUSH_FIELD", PUSH_CONST: "PUSH_CONST", POP: "POP", DUP: "DUP",
    EQ: "EQ", NEQ: "NEQ", LT: "LT", LTE: "LTE", GT: "GT", GTE: "GTE",
    AND: "AND", OR: "OR", NOT: "NOT", CONTAINS: "CONTAINS",
    STARTS_WITH: "STARTS_WITH", ENDS_WITH: "ENDS_WITH", LIKE: "LIKE",
    MATCHES: "MATCHES", IN: "IN", BETWEEN: "BETWEEN", IS_NULL: "IS_NULL",
    IS_NOT_NULL: "IS_NOT_NULL", JUMP: "JUMP", JUMP_IF_FALSE: "JUMP_IF_FALSE",
    JUMP_IF_TRUE: "JUMP_IF_TRUE", HALT: "HALT",
}


@dataclass
class Instruction:
    opcode: int
    op1: int = 0
    op2: int = 0

    def __str__(self) -> str:
        name = _OPNAMES.get(self.opcode, hex(self.opcode))
        if self.op1 == 0 and self.op2 == 0:
            return name
        if self.op2 == 0:
            return f"{name} {self.op1}"
        return f"{name} {self.op1}, {self.op2}"


class ConstantPool:
    """Deduplicating constant pool: strings, doubles, string arrays
    (ConstantPool.cs:9-170 — arrays are not deduplicated)."""

    def __init__(self) -> None:
        self.constants: list = []
        self._index: dict = {}

    def add_string(self, value: str) -> int:
        key = ("s", value)
        if key in self._index:
            return self._index[key]
        self.constants.append(value)
        self._index[key] = len(self.constants) - 1
        return self._index[key]

    def add_number(self, value: float) -> int:
        key = ("n", float(value))
        if key in self._index:
            return self._index[key]
        self.constants.append(float(value))
        self._index[key] = len(self.constants) - 1
        return self._index[key]

    def add_array(self, values: list) -> int:
        self.constants.append(list(values))
        return len(self.constants) - 1

    def get(self, i: int):
        return self.constants[i]


@dataclass
class CompiledFilter:
    constants: ConstantPool
    instructions: list[Instruction] = field(default_factory=list)

    def disassemble(self) -> str:
        lines = ["=== Constant Pool ==="]
        for i, c in enumerate(self.constants.constants):
            if isinstance(c, list):
                lines.append(f"  [{i}] Array: [{', '.join(map(str, c))}]")
            else:
                lines.append(f"  [{i}] {c}")
        lines.append("")
        lines.append("=== Instructions ===")
        for i, ins in enumerate(self.instructions):
            lines.append(f"  {i:04d}: {ins}")
        return "\n".join(lines)


class CompileError(ValueError):
    pass


class _Compiler:
    """FilterCompiler.cs:23-325 over the filters.py AST node types."""

    def __init__(self) -> None:
        self.pool = ConstantPool()
        self.ins: list[Instruction] = []

    def compile(self, node) -> CompiledFilter:
        self._node(node)
        self.ins.append(Instruction(HALT))
        return CompiledFilter(self.pool, self.ins)

    def _operand(self, node) -> None:
        """Push a comparison operand: field ref, literal, or nested filter."""
        if isinstance(node, flt.Ident):
            self.ins.append(
                Instruction(PUSH_FIELD, self.pool.add_string(node.name))
            )
        elif isinstance(node, flt.Literal):
            self.ins.append(
                Instruction(PUSH_CONST, self.pool.add_string(node.value))
            )
        else:
            self._node(node)

    def _node(self, node) -> None:
        if isinstance(node, flt.BoolOp):
            # DUP + peeking JUMP short-circuit (FilterCompiler.cs:85-118)
            self._node(node.left)
            self.ins.append(Instruction(DUP))
            jpos = len(self.ins)
            self.ins.append(
                Instruction(JUMP_IF_FALSE if node.op == "and" else JUMP_IF_TRUE, 0)
            )
            self.ins.append(Instruction(POP))
            self._node(node.right)
            self.ins[jpos].op1 = len(self.ins)
        elif isinstance(node, flt.Not):
            self._node(node.operand)
            self.ins.append(Instruction(NOT))
        elif isinstance(node, flt.Compare):
            self._operand(node.field)
            self._operand(node.value)
            self.ins.append(
                Instruction(
                    {"=": EQ, "!=": NEQ, "<": LT, "<=": LTE, ">": GT, ">=": GTE}[
                        node.op
                    ]
                )
            )
        elif isinstance(node, flt.StringOp):
            self._operand(node.field)
            self._operand(node.pattern)
            self.ins.append(
                Instruction(
                    {
                        "contains": CONTAINS,
                        "startswith": STARTS_WITH,
                        "endswith": ENDS_WITH,
                        "like": LIKE,
                        "matches": MATCHES,
                    }[node.op]
                )
            )
        elif isinstance(node, flt.In):
            self._operand(node.field)
            values = []
            for v in node.values:
                if not isinstance(v, flt.Literal):
                    raise CompileError("IN list must be literal values")
                values.append(v.value)
            self.ins.append(Instruction(PUSH_CONST, self.pool.add_array(values)))
            self.ins.append(Instruction(IN))
        elif isinstance(node, flt.Between):
            self._operand(node.field)
            self._operand(node.low)
            self._operand(node.high)
            self.ins.append(Instruction(BETWEEN))
        elif isinstance(node, flt.NullCheck):
            self._operand(node.field)
            self.ins.append(Instruction(IS_NOT_NULL if node.negated else IS_NULL))
        elif isinstance(node, flt.Ternary):
            # FilterCompiler.CompileTernary (:225-253)
            self._node(node.cond)
            false_jpos = len(self.ins)
            self.ins.append(Instruction(JUMP_IF_FALSE, 0))
            self.ins.append(Instruction(POP))
            self._node(node.if_true)
            end_jpos = len(self.ins)
            self.ins.append(Instruction(JUMP, 0))
            self.ins[false_jpos].op1 = len(self.ins)
            self.ins.append(Instruction(POP))
            self._node(node.if_false)
            self.ins[end_jpos].op1 = len(self.ins)
        elif isinstance(node, flt.Ident):
            self.ins.append(Instruction(PUSH_FIELD, self.pool.add_string(node.name)))
        elif isinstance(node, flt.Literal):
            self.ins.append(Instruction(PUSH_CONST, self.pool.add_string(node.value)))
        elif isinstance(node, flt.DerivedFilter):
            raise CompileError(
                "DerivedFilter (custom predicates) cannot be compiled to bytecode"
            )
        else:
            raise CompileError(f"Unknown filter node: {type(node).__name__}")


def compile_filter(expr_or_ast) -> CompiledFilter:
    node = flt.parse(expr_or_ast) if isinstance(expr_or_ast, str) else expr_or_ast
    return _Compiler().compile(node)


# --- VM ----------------------------------------------------------------------


class FilterVM:
    """Stack VM (FilterVM.cs:26-359). Comparison helpers are shared with the
    AST evaluator so both execution paths return identical rows."""

    def execute(self, cf: CompiledFilter, row: dict) -> bool:
        stack: list = []
        ins = cf.instructions
        consts = cf.constants
        ip = 0
        n = len(ins)
        while ip < n:
            i = ins[ip]
            op = i.opcode
            if op == PUSH_FIELD:
                stack.append(row.get(consts.get(i.op1)))
            elif op == PUSH_CONST:
                stack.append(consts.get(i.op1))
            elif op == POP:
                stack.pop()
            elif op == DUP:
                stack.append(stack[-1])
            elif op == EQ:
                r, l = stack.pop(), stack.pop()
                stack.append(flt._are_equal(l, r))
            elif op == NEQ:
                r, l = stack.pop(), stack.pop()
                stack.append(not flt._are_equal(l, r))
            elif op in (LT, LTE, GT, GTE):
                r, l = stack.pop(), stack.pop()
                c = flt._compare_to(l, r)
                stack.append(
                    {LT: c < 0, LTE: c <= 0, GT: c > 0, GTE: c >= 0}[op]
                )
            elif op == AND:
                r, l = stack.pop(), stack.pop()
                stack.append((l is True) and (r is True))
            elif op == OR:
                r, l = stack.pop(), stack.pop()
                stack.append((l is True) or (r is True))
            elif op == NOT:
                v = stack.pop()
                stack.append(not (v is True))
            elif op in (CONTAINS, STARTS_WITH, ENDS_WITH, LIKE, MATCHES):
                import re

                pattern = flt._to_str(stack.pop() or "")
                text = flt._to_str(stack.pop() or "")
                if op == CONTAINS:
                    stack.append(pattern.lower() in text.lower())
                elif op == STARTS_WITH:
                    stack.append(text.lower().startswith(pattern.lower()))
                elif op == ENDS_WITH:
                    stack.append(text.lower().endswith(pattern.lower()))
                elif op == LIKE:
                    rx = (
                        "^"
                        + re.escape(pattern).replace("%", ".*").replace("_", ".")
                        + "$"
                    )
                    stack.append(re.search(rx, text, re.IGNORECASE) is not None)
                else:  # MATCHES
                    try:
                        stack.append(
                            re.search(pattern, text, re.IGNORECASE) is not None
                        )
                    except re.error:
                        stack.append(False)
            elif op == IN:
                arr = stack.pop()
                value = stack.pop()
                if not isinstance(arr, list):
                    stack.append(False)
                else:
                    stack.append(any(flt._are_equal(value, item) for item in arr))
            elif op == BETWEEN:
                mx, mn, value = stack.pop(), stack.pop(), stack.pop()
                stack.append(
                    flt._compare_to(value, mn) >= 0 and flt._compare_to(value, mx) <= 0
                )
            elif op == IS_NULL:
                stack.append(flt._is_null(stack.pop()))
            elif op == IS_NOT_NULL:
                stack.append(not flt._is_null(stack.pop()))
            elif op == JUMP:
                ip = i.op1 - 1
            elif op == JUMP_IF_FALSE:
                v = stack[-1]  # peek, don't pop (FilterVM.cs:133-138)
                if v is False:
                    ip = i.op1 - 1
            elif op == JUMP_IF_TRUE:
                v = stack[-1]
                if v is True:
                    ip = i.op1 - 1
            elif op == HALT:
                break
            else:
                raise ValueError(f"Unknown opcode: {hex(op)}")
            ip += 1
        if not stack:
            return False
        return stack.pop() is True


# --- INFISCRIPT-V1 serialization --------------------------------------------


def _write_7bit(n: int) -> bytes:
    """C# BinaryWriter 7-bit-encoded int (string length prefix)."""
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def _read_7bit(data: bytes, pos: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _write_cs_string(s: str) -> bytes:
    enc = s.encode("utf-8")
    return _write_7bit(len(enc)) + enc


def _read_cs_string(data: bytes, pos: int) -> tuple[str, int]:
    n, pos = _read_7bit(data, pos)
    return data[pos : pos + n].decode("utf-8"), pos + n


def _serialize_pool(pool: ConstantPool) -> bytes:
    out = bytearray(struct.pack("<i", len(pool.constants)))
    for c in pool.constants:
        if isinstance(c, str):
            out.append(1)  # ConstantType.String
            out += _write_cs_string(c)
        elif isinstance(c, float):
            out.append(2)  # ConstantType.Number
            out += struct.pack("<d", c)
        elif isinstance(c, list):
            out.append(3)  # ConstantType.Array
            out += struct.pack("<i", len(c))
            for item in c:
                out += _write_cs_string("" if item is None else str(item))
        else:
            raise ValueError(f"Unsupported constant type: {type(c)}")
    return bytes(out)


def _deserialize_pool(data: bytes) -> ConstantPool:
    pool = ConstantPool()
    (count,) = struct.unpack_from("<i", data, 0)
    pos = 4
    for _ in range(count):
        t = data[pos]
        pos += 1
        if t == 1:
            s, pos = _read_cs_string(data, pos)
            pool.constants.append(s)
            pool._index[("s", s)] = len(pool.constants) - 1
        elif t == 2:
            (num,) = struct.unpack_from("<d", data, pos)
            pos += 8
            pool.constants.append(num)
            pool._index[("n", num)] = len(pool.constants) - 1
        elif t == 3:
            (alen,) = struct.unpack_from("<i", data, pos)
            pos += 4
            arr = []
            for _ in range(alen):
                s, pos = _read_cs_string(data, pos)
                arr.append(s)
            pool.constants.append(arr)
        else:
            raise ValueError(f"Unknown constant type: {t}")
    return pool


def serialize(cf: CompiledFilter) -> bytes:
    """BytecodeSerializer.Serialize (:17-52): magic | uint16 version |
    int32 pool-size | pool | int32 n-instructions | instruction stream."""
    pool_data = _serialize_pool(cf.constants)
    out = bytearray(MAGIC)
    out += struct.pack("<H", VERSION)
    out += struct.pack("<i", len(pool_data))
    out += pool_data
    out += struct.pack("<i", len(cf.instructions))
    for ins in cf.instructions:
        out.append(ins.opcode)
        if ins.opcode in _NEEDS_OPERAND:
            out += struct.pack("<i", ins.op1)
            if ins.op2 != 0:
                out += struct.pack("<i", ins.op2)
    return bytes(out)


def deserialize(data: bytes) -> CompiledFilter:
    """BytecodeSerializer.Deserialize (:57-117), including its operand2
    peek heuristic (a byte that is not a valid opcode after operand1 is
    read as operand2)."""
    if data[: len(MAGIC)] != MAGIC:
        raise ValueError(
            f"Invalid magic header: expected {MAGIC!r}, got {data[:len(MAGIC)]!r}"
        )
    pos = len(MAGIC)
    (version,) = struct.unpack_from("<H", data, pos)
    pos += 2
    if version != VERSION:
        raise ValueError(f"Unsupported version: {version}, expected {VERSION}")
    (pool_size,) = struct.unpack_from("<i", data, pos)
    pos += 4
    pool = _deserialize_pool(data[pos : pos + pool_size])
    pos += pool_size
    (n_ins,) = struct.unpack_from("<i", data, pos)
    pos += 4
    instructions: list[Instruction] = []
    for _ in range(n_ins):
        opcode = data[pos]
        pos += 1
        op1 = op2 = 0
        if opcode in _NEEDS_OPERAND:
            (op1,) = struct.unpack_from("<i", data, pos)
            pos += 4
            if pos < len(data) and data[pos] not in _VALID_OPCODES:
                (op2,) = struct.unpack_from("<i", data, pos)
                pos += 4
        instructions.append(Instruction(opcode, op1, op2))
    return CompiledFilter(pool, instructions)


def is_valid_bytecode(data: bytes) -> bool:
    return len(data) >= len(MAGIC) + 2 and data[: len(MAGIC)] == MAGIC


def get_version(data: bytes) -> int:
    if len(data) < len(MAGIC) + 2:
        raise ValueError("Data too short to contain version")
    return struct.unpack_from("<H", data, len(MAGIC))[0]


def save_to_file(cf: CompiledFilter, path: str) -> None:
    with open(path, "wb") as f:
        f.write(serialize(cf))


def load_from_file(path: str) -> CompiledFilter:
    with open(path, "rb") as f:
        return deserialize(f.read())
