"""DB2 DDL parser — CREATE TABLE / DECLARE GTT / ALTER TABLE / DISTRIBUTE BY HASH.

Re-expresses the reference parser's semantics (reference: db2ice/parser.py:120-684)
with the same two-pass structure: pass 1 materializes tables from CREATE/DECLARE
statements; pass 2 links ALTER TABLE (partition / ADD CONSTRAINT PRIMARY KEY)
and DISTRIBUTE BY HASH statements back onto them. The ALTER link is an
equi-match on upper-cased table name with a null-tolerant schema predicate
(parser.py:207-261); DISTRIBUTE BY HASH binds to the *most recently created*
table, an order-dependent quirk preserved on purpose (parser.py:263-274).

Parsing happens on the driver: DDL inputs are KB-scale text, so a distributed
parse would be the wrong altitude. For bulk catalogs, ``parse_many`` accepts an
iterator of scripts and stays embarrassingly parallel per script.
"""

from __future__ import annotations

import re
from typing import Optional

from ..model import ColumnDef, ConstraintDef, PartitionSpec, TableDef

# CREATE [VOLATILE] [GLOBAL TEMPORARY] TABLE [schema.]name (
_CREATE_RE = re.compile(
    r'CREATE\s+(?:(VOLATILE)\s+)?(?:(GLOBAL\s+TEMPORARY)\s+)?TABLE\s+'
    r'(?:(["\w]+)\.)?(["\w]+)\s*\(',
    re.IGNORECASE,
)

_DECLARE_RE = re.compile(
    r'DECLARE\s+GLOBAL\s+TEMPORARY\s+TABLE\s+(?:(["\w]+)\.)?(["\w]+)\s*\(',
    re.IGNORECASE,
)

# Every DB2 type token the reference recognizes (parser.py:138-146), longest
# alternatives first so e.g. "CHARACTER VARYING" wins over "CHARACTER".
# Deliberate fix vs the reference: DECFLOAT is listed *before* DECIMAL|DEC.
# The reference's alternation order makes "DECFLOAT" parse as "DEC"
# (parser.py:139), which silently bypasses its own DECFLOAT→DOUBLE rule
# (mapper.py:279-287) and its README's documented mapping — we implement the
# documented semantics.
_TYPE_RE = re.compile(
    r'(SMALLINT|INTEGER|INT|BIGINT|DECFLOAT|DECIMAL|DEC|NUMERIC|REAL|FLOAT|DOUBLE|'
    r'CHARACTER\s+VARYING|CHAR\s+VARYING|VARCHAR|LONG\s+VARCHAR|CHARACTER|CHAR|CLOB|'
    r'GRAPHIC|VARGRAPHIC|LONG\s+VARGRAPHIC|DBCLOB|'
    r'BINARY\s+VARYING|VARBINARY|BINARY|BLOB|'
    r'DATE|TIMESTAMP|TIME|XML|ROWID|BOOLEAN)'
    r'(?:\s*\(\s*(\d+)(?:\s*,\s*(\d+))?\s*\))?',
    re.IGNORECASE,
)

_CONSTRAINT_KEYWORDS = ("PRIMARY KEY", "FOREIGN KEY", "UNIQUE", "CHECK", "CONSTRAINT")


def _unquote(ident: Optional[str]) -> str:
    if ident is None:
        return ""
    return ident.strip('"').strip("'").strip("`")


def _scan_statements(ddl: str) -> list[str]:
    """Split on ';' / '@' terminators, ignoring those inside strings/parens
    (parser.py:292-331)."""
    out: list[str] = []
    buf: list[str] = []
    in_str = False
    depth = 0
    for i, ch in enumerate(ddl):
        if ch == "'" and (i == 0 or ddl[i - 1] != "\\"):
            in_str = not in_str
        if not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
        if ch in ";@" and not in_str and depth == 0:
            stmt = "".join(buf).strip()
            if stmt:
                out.append(stmt)
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


def _drop_leading_comments(stmt: str) -> str:
    """Skip '--'-only lines before the first code line (parser.py:276-290)."""
    kept: list[str] = []
    seen_code = False
    for line in stmt.split("\n"):
        s = line.strip()
        if not seen_code and (s.startswith("--") or not s):
            continue
        seen_code = True
        kept.append(line)
    return "\n".join(kept)


def _drop_inline_comments(s: str) -> str:
    """Truncate each line at a '--' that is outside string literals
    (parser.py:433-448)."""
    out = []
    for line in s.split("\n"):
        in_str = False
        cut = len(line)
        for i, ch in enumerate(line):
            if ch == "'" and (i == 0 or line[i - 1] != "\\"):
                in_str = not in_str
            elif ch == "-" and not in_str and line[i: i + 2] == "--":
                cut = i
                break
        out.append(line[:cut])
    return "\n".join(out)


def _closing_paren(s: str, start: int) -> int:
    """Index of the ')' matching the '(' at ``start``; -1 if unbalanced
    (parser.py:412-431)."""
    depth = 0
    in_str = False
    for i in range(start, len(s)):
        ch = s[i]
        if ch == "'" and (i == 0 or s[i - 1] != "\\"):
            in_str = not in_str
        if not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return i
    return -1


def _split_top_level(s: str) -> list[str]:
    """Split on commas at paren-depth 0 outside strings (parser.py:472-498)."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    in_str = False
    for ch in s:
        if ch == "'" and (not buf or buf[-1] != "\\"):
            in_str = not in_str
        if not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append("".join(buf))
                buf = []
                continue
        buf.append(ch)
    if buf:
        parts.append("".join(buf))
    return parts


class DB2DdlParser:
    """Parses a DB2 DDL script into TableDef objects (parser.py:120-205).

    ``decfloat_as_dec=True`` reproduces the reference's observed behavior of
    tokenizing DECFLOAT as DEC (its alternation-order bug, parser.py:139);
    the default implements the reference's *documented* semantics where
    DECFLOAT reaches the DECFLOAT→DOUBLE rule (mapper.py:279-287, README).
    """

    def __init__(self, decfloat_as_dec: bool = False) -> None:
        self.errors: list[str] = []
        self.warnings: list[str] = []
        self.decfloat_as_dec = decfloat_as_dec

    def parse(self, ddl: str) -> list[TableDef]:
        self.errors = []
        self.warnings = []
        statements = _scan_statements(ddl)
        tables: list[TableDef] = []

        # Pass 1 — CREATE TABLE and DECLARE GTT produce tables, in script order.
        for stmt in statements:
            body = _drop_leading_comments(stmt.strip())
            if not body:
                continue
            if re.match(r'^\s*CREATE\s+(?:VOLATILE\s+)?(?:GLOBAL\s+TEMPORARY\s+)?TABLE',
                        body, re.IGNORECASE):
                try:
                    t = self._table_from_create(body)
                    if t:
                        tables.append(t)
                except Exception as exc:  # pragma: no cover - defensive
                    self.errors.append(f"Failed to parse statement: {exc}")
            elif re.match(r'^\s*DECLARE\s+GLOBAL\s+TEMPORARY\s+TABLE', body,
                          re.IGNORECASE):
                try:
                    t = self._table_from_declare(body)
                    if t:
                        tables.append(t)
                except Exception as exc:  # pragma: no cover - defensive
                    self.errors.append(f"Failed to parse DECLARE statement: {exc}")

        # Pass 2 — link ALTER / DISTRIBUTE statements to pass-1 tables.
        for stmt in statements:
            body = _drop_leading_comments(stmt.strip())
            if not body:
                continue
            if re.match(r'^\s*ALTER\s+TABLE', body, re.IGNORECASE):
                self._link_alter(body, tables)
            elif re.match(r'^\s*DISTRIBUTE\s+BY\s+HASH', body, re.IGNORECASE):
                self._link_distribute(body, tables)

        return tables

    def parse_many(self, scripts) -> list[TableDef]:
        """Parse an iterable of independent DDL scripts (bulk catalogs)."""
        out: list[TableDef] = []
        for script in scripts:
            out.extend(self.parse(script))
        return out

    # -- statement handlers ---------------------------------------------

    def _table_from_create(self, stmt: str) -> Optional[TableDef]:
        m = _CREATE_RE.search(stmt)
        if not m:
            self.errors.append("Could not parse table name")
            return None
        table = TableDef(raw_ddl=stmt)
        table.volatile = m.group(1) is not None
        table.global_temporary = m.group(2) is not None
        table.schema = _unquote(m.group(3)) if m.group(3) else None
        table.name = _unquote(m.group(4))
        return self._fill_body(stmt, m.end() - 1, table)

    def _table_from_declare(self, stmt: str) -> Optional[TableDef]:
        m = _DECLARE_RE.search(stmt)
        if not m:
            self.errors.append("Could not parse DECLARE GLOBAL TEMPORARY TABLE")
            return None
        table = TableDef(raw_ddl=stmt, global_temporary=True)
        table.schema = _unquote(m.group(1)) if m.group(1) else None
        table.name = _unquote(m.group(2))
        return self._fill_body(stmt, m.end() - 1, table)

    def _fill_body(self, stmt: str, search_from: int,
                   table: TableDef) -> Optional[TableDef]:
        open_at = stmt.find("(", search_from)
        if open_at == -1:
            self.errors.append("Could not find column definitions")
            return None
        close_at = _closing_paren(stmt, open_at)
        if close_at == -1:
            self.errors.append("Could not find end of column definitions")
            return None
        self._fill_columns(stmt[open_at + 1: close_at], table)
        self._fill_options(stmt[close_at + 1:], table)
        return table

    def _fill_columns(self, block: str, table: TableDef) -> None:
        block = _drop_inline_comments(block)
        for part in _split_top_level(block):
            part = part.strip()
            if not part:
                continue
            if self._looks_like_constraint(part):
                c = self._constraint_from(part)
                if c:
                    table.constraints.append(c)
            else:
                col = self._column_from(part)
                if col:
                    table.columns.append(col)

    @staticmethod
    def _looks_like_constraint(part: str) -> bool:
        upper = part.upper().strip()
        return any(upper.startswith(kw) or f" {kw}" in upper
                   for kw in _CONSTRAINT_KEYWORDS)

    def _column_from(self, col_def: str) -> Optional[ColumnDef]:
        col_def = col_def.strip()
        if not col_def:
            return None
        name_m = re.match(r'^(["\w]+)', col_def)
        if not name_m:
            self.warnings.append(f"Could not parse column name: {col_def[:50]}")
            return None
        name = _unquote(name_m.group(1))
        rest = col_def[name_m.end():].strip()

        type_m = _TYPE_RE.match(rest)
        if not type_m:
            self.warnings.append(f"Could not parse data type for column {name}")
            return None
        data_type = re.sub(r"\s+", " ", type_m.group(1).upper())
        col = ColumnDef(name=name, data_type=data_type, raw_definition=col_def)
        if data_type == "DECFLOAT" and self.decfloat_as_dec:
            # reproduce the reference's parse: "DECFLOAT(16)" → DEC, no params
            col.data_type = "DEC"
        else:
            if type_m.group(2):
                col.length = int(type_m.group(2))
                col.precision = col.length
            if type_m.group(3):
                col.scale = int(type_m.group(3))
        rest = rest[type_m.end():].strip()
        upper = rest.upper()

        col.nullable = "NOT NULL" not in upper
        dflt = re.search(r"DEFAULT\s+(\S+|'[^']*')", rest, re.IGNORECASE)
        if dflt:
            col.default = dflt.group(1)
        if "GENERATED ALWAYS" in upper:
            col.generated = "ALWAYS"
        elif "GENERATED BY DEFAULT" in upper:
            col.generated = "BY DEFAULT"
        col.for_bit_data = "FOR BIT DATA" in upper
        ccsid = re.search(r"CCSID\s+(\w+)", rest, re.IGNORECASE)
        if ccsid:
            col.ccsid = ccsid.group(1)
        fproc = re.search(r"FIELDPROC\s+(\S+)", rest, re.IGNORECASE)
        if fproc:
            col.fieldproc = fproc.group(1)
        return col

    def _constraint_from(self, text: str) -> Optional[ConstraintDef]:
        upper = text.upper()
        c = ConstraintDef(kind="")
        named = re.match(r'CONSTRAINT\s+(["\w]+)', text, re.IGNORECASE)
        if named:
            c.name = _unquote(named.group(1))

        if "PRIMARY KEY" in upper:
            c.kind = "PRIMARY KEY"
            m = re.search(r'PRIMARY\s+KEY\s*\(([^)]+)\)', text, re.IGNORECASE)
            if m:
                c.columns = [_unquote(x.strip()) for x in m.group(1).split(",")]
        elif "FOREIGN KEY" in upper:
            c.kind = "FOREIGN KEY"
            m = re.search(
                r'FOREIGN\s+KEY\s*\(([^)]+)\)\s*REFERENCES\s+(["\w.]+)\s*\(([^)]+)\)',
                text, re.IGNORECASE)
            if m:
                c.columns = [_unquote(x.strip()) for x in m.group(1).split(",")]
                c.reference_table = m.group(2)
                c.reference_columns = [_unquote(x.strip())
                                       for x in m.group(3).split(",")]
        elif "UNIQUE" in upper:
            c.kind = "UNIQUE"
            m = re.search(r'UNIQUE\s*\(([^)]+)\)', text, re.IGNORECASE)
            if m:
                c.columns = [_unquote(x.strip()) for x in m.group(1).split(",")]
        elif "CHECK" in upper:
            c.kind = "CHECK"
            m = re.search(r'CHECK\s*\((.+)\)', text, re.IGNORECASE | re.DOTALL)
            if m:
                c.check_condition = m.group(1).strip()

        return c if c.kind else None

    def _fill_options(self, options: str, table: TableDef) -> None:
        upper = options.upper()
        ts = re.search(r'IN\s+(["\w]+)', options, re.IGNORECASE)
        if ts:
            table.tablespace = _unquote(ts.group(1))
        if "EDITPROC" in upper:
            m = re.search(r'EDITPROC\s+(["\w.]+)', options, re.IGNORECASE)
            if m:
                table.editproc = m.group(1)
        if "VALIDPROC" in upper:
            m = re.search(r'VALIDPROC\s+(["\w.]+)', options, re.IGNORECASE)
            if m:
                table.validproc = m.group(1)
        if "AUDIT" in upper:
            m = re.search(r'AUDIT\s+(NONE|CHANGES|ALL)', options, re.IGNORECASE)
            if m:
                table.audit = m.group(1).upper()
        if "DATA CAPTURE" in upper:
            m = re.search(r'DATA\s+CAPTURE\s+(NONE|CHANGES)', options, re.IGNORECASE)
            if m:
                table.data_capture = m.group(1).upper()
        m = re.search(r'CCSID\s+(ASCII|UNICODE|EBCDIC)', options, re.IGNORECASE)
        if m:
            table.ccsid = m.group(1).upper()
        if "PARTITION BY" in upper:
            pm = re.search(r'PARTITION\s+BY\s+(RANGE|HASH)\s*\(([^)]+)\)',
                           options, re.IGNORECASE)
            if pm:
                table.partition = PartitionSpec(
                    kind=pm.group(1).upper(),
                    columns=[_unquote(x.strip()) for x in pm.group(2).split(",")],
                    raw_definition=pm.group(0),
                )

    # -- pass-2 linkers ---------------------------------------------------

    def _link_alter(self, stmt: str, tables: list[TableDef]) -> None:
        """Left-join semantics: unmatched ALTERs log a warning
        (parser.py:207-261)."""
        head = re.match(r'ALTER\s+TABLE\s+(?:(["\w]+)\.)?(["\w]+)', stmt,
                        re.IGNORECASE)
        if not head:
            return
        schema = _unquote(head.group(1)) if head.group(1) else None
        name = _unquote(head.group(2))

        target = None
        for t in tables:
            if t.name.upper() == name.upper() and (
                    schema is None or (t.schema and t.schema.upper() == schema.upper())):
                target = t
                break
        if target is None:
            ref = f"{schema}.{name}" if schema else name
            self.warnings.append(f"ALTER TABLE references unknown table: {ref}")
            return

        pm = re.search(r'PARTITION\s+BY\s+(RANGE|HASH)\s*\(([^)]+)\)', stmt,
                       re.IGNORECASE)
        if pm:
            target.partition = PartitionSpec(
                kind=pm.group(1).upper(),
                columns=[_unquote(x.strip()) for x in pm.group(2).split(",")],
                raw_definition=pm.group(0),
            )

        pk = re.search(r'ADD\s+CONSTRAINT\s+(["\w]+)\s+PRIMARY\s+KEY\s*\(([^)]+)\)',
                       stmt, re.IGNORECASE)
        if pk and not any(c.kind == "PRIMARY KEY" for c in target.constraints):
            target.constraints.append(ConstraintDef(
                kind="PRIMARY KEY",
                name=_unquote(pk.group(1)),
                columns=[_unquote(x.strip()) for x in pk.group(2).split(",")],
            ))

    @staticmethod
    def _link_distribute(stmt: str, tables: list[TableDef]) -> None:
        """DB2 convention: applies to the preceding CREATE TABLE
        (parser.py:263-274)."""
        m = re.search(r'DISTRIBUTE\s+BY\s+HASH\s*\(([^)]+)\)', stmt, re.IGNORECASE)
        if m and tables:
            tables[-1].distribute_by_hash = _unquote(m.group(1).strip())
