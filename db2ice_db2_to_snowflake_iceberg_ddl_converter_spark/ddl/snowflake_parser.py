"""Snowflake-Standard DDL parser.

Re-expresses the reference's second dialect (reference:
db2ice/snowflake_converter.py:87-337): a finditer scan over
``CREATE [OR REPLACE] [TRANSIENT|TEMPORARY|DYNAMIC|EXTERNAL|HYBRID] TABLE
[IF NOT EXISTS]`` headers, paren-matched column blocks, 3-part name handling,
column modifiers (NOT NULL / DEFAULT / IDENTITY / AUTOINCREMENT / COMMENT /
COLLATE / MASKING POLICY), table constraints (PK / FK / UNIQUE, optionally
CONSTRAINT-named), and table options (CLUSTER BY / COMMENT /
DATA_RETENTION_TIME_IN_DAYS / CHANGE_TRACKING).
"""

from __future__ import annotations

import re
from typing import Optional

from ..model import SnowflakeColumnDef, SnowflakeTableDef

_HEADER_RE = re.compile(
    r'CREATE\s+(?:OR\s+REPLACE\s+)?'
    r'(?:(TRANSIENT|TEMPORARY|DYNAMIC|EXTERNAL|HYBRID)\s+)?TABLE\s+'
    r'(?:IF\s+NOT\s+EXISTS\s+)?([^\s(]+)\s*\(',
    re.IGNORECASE,
)


def _split_csv_depth0(text: str) -> list[str]:
    """Comma-split at paren depth 0 (snowflake_converter.py:315-337)."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    for ch in text:
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


def _idents(csv: str) -> list[str]:
    return [x.strip().strip('"') for x in csv.split(",")]


class SnowflakeDdlParser:
    """Scans a Snowflake DDL script into SnowflakeTableDef objects
    (snowflake_converter.py:87-118)."""

    def parse(self, ddl: str) -> list[SnowflakeTableDef]:
        tables: list[SnowflakeTableDef] = []
        for m in _HEADER_RE.finditer(ddl):
            modifier = (m.group(1) or "").upper() or None
            raw_name = m.group(2).strip()

            open_at = m.end() - 1
            block, after = self._paren_block(ddl, open_at)
            if block is None:
                continue

            rest = ddl[after:].strip()
            semi = rest.find(";")
            options = rest[:semi] if semi != -1 else rest

            tables.append(self._build_table(raw_name, block, options, modifier))
        return tables

    @staticmethod
    def _paren_block(text: str, start: int) -> tuple[Optional[str], int]:
        """Content inside the paren at ``start`` plus index just past it
        (snowflake_converter.py:120-137). Note: intentionally not
        string-aware, matching the reference."""
        if start >= len(text) or text[start] != "(":
            return None, start
        depth = 0
        for i in range(start, len(text)):
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
                if depth == 0:
                    return text[start + 1: i], i + 1
        return None, start

    def _build_table(self, raw_name: str, block: str, options: str,
                     modifier: Optional[str]) -> SnowflakeTableDef:
        parts = raw_name.replace('"', "").split(".")
        table = SnowflakeTableDef(
            name=parts[-1],
            schema=parts[-2] if len(parts) >= 2 else None,
            database=parts[-3] if len(parts) >= 3 else None,
            transient=modifier == "TRANSIENT",
            temporary=modifier == "TEMPORARY",
            dynamic=modifier == "DYNAMIC",
            external=modifier == "EXTERNAL",
            hybrid=modifier == "HYBRID",
        )
        self._fill_columns(table, block)
        self._fill_options(table, options)
        return table

    def _fill_columns(self, table: SnowflakeTableDef, block: str) -> None:
        for part in _split_csv_depth0(block):
            part = part.strip()
            if not part:
                continue
            upper = part.upper()
            if upper.startswith("PRIMARY KEY"):
                m = re.search(r"\((.*?)\)", part)
                if m:
                    table.primary_key = _idents(m.group(1))
            elif upper.startswith("FOREIGN KEY"):
                self._add_fk(table, part)
            elif upper.startswith("UNIQUE"):
                m = re.search(r"\((.*?)\)", part)
                if m:
                    table.unique_keys.append(_idents(m.group(1)))
            elif upper.startswith("CONSTRAINT"):
                if "PRIMARY KEY" in upper:
                    m = re.search(r"PRIMARY\s+KEY\s*\((.*?)\)", part, re.IGNORECASE)
                    if m:
                        table.primary_key = _idents(m.group(1))
                elif "FOREIGN KEY" in upper:
                    self._add_fk(table, part)
                elif "UNIQUE" in upper:
                    m = re.search(r"UNIQUE\s*\((.*?)\)", part, re.IGNORECASE)
                    if m:
                        table.unique_keys.append(_idents(m.group(1)))
            else:
                col = self._column_from(part)
                if col:
                    table.columns.append(col)

    @staticmethod
    def _add_fk(table: SnowflakeTableDef, part: str) -> None:
        m = re.search(
            r"FOREIGN\s+KEY\s*\((.*?)\)\s*REFERENCES\s+([^\s(]+)\s*\((.*?)\)",
            part, re.IGNORECASE)
        if m:
            table.foreign_keys.append({
                "columns": _idents(m.group(1)),
                "ref_table": m.group(2).strip(),
                "ref_columns": _idents(m.group(3)),
            })

    @staticmethod
    def _column_from(col_def: str) -> Optional[SnowflakeColumnDef]:
        # snowflake_converter.py:222-285
        if col_def.startswith('"'):
            m = re.match(r'"([^"]+)"\s+(.*)', col_def)
            if not m:
                return None
            name, rest = m.group(1), m.group(2)
        else:
            halves = col_def.split(None, 1)
            if len(halves) < 2:
                return None
            name, rest = halves[0], halves[1]

        type_m = re.match(r"(\w+(?:\s*\([^)]+\))?)", rest, re.IGNORECASE)
        if not type_m:
            return None
        col = SnowflakeColumnDef(name=name.strip('"'),
                                 data_type=type_m.group(1).upper())
        tail = rest[type_m.end():].strip()
        upper = tail.upper()

        col.nullable = "NOT NULL" not in upper
        dflt = re.search(r"DEFAULT\s+([^\s,]+(?:\([^)]*\))?)", tail, re.IGNORECASE)
        if dflt:
            col.default = dflt.group(1)
        if "IDENTITY" in upper or "AUTOINCREMENT" in upper:
            im = re.search(r"(?:IDENTITY|AUTOINCREMENT)\s*(?:\(([^)]+)\))?", tail,
                           re.IGNORECASE)
            col.identity = im.group(1) if im and im.group(1) else "1,1"
        cm = re.search(r"COMMENT\s+'([^']*)'", tail, re.IGNORECASE)
        if cm:
            col.comment = cm.group(1)
        co = re.search(r"COLLATE\s+([^\s,]+)", tail, re.IGNORECASE)
        if co:
            col.collate = co.group(1)
        mp = re.search(r"WITH\s+MASKING\s+POLICY\s+([^\s,]+)", tail, re.IGNORECASE)
        if mp:
            col.masking_policy = mp.group(1)
        return col

    @staticmethod
    def _fill_options(table: SnowflakeTableDef, options: str) -> None:
        if not options:
            return
        m = re.search(r"CLUSTER\s+BY\s*\((.*?)\)", options, re.IGNORECASE)
        if m:
            table.cluster_by = _idents(m.group(1))
        m = re.search(r"COMMENT\s*=\s*'([^']*)'", options, re.IGNORECASE)
        if m:
            table.comment = m.group(1)
        m = re.search(r"DATA_RETENTION_TIME_IN_DAYS\s*=\s*(\d+)", options,
                      re.IGNORECASE)
        if m:
            table.data_retention_days = int(m.group(1))
        if "CHANGE_TRACKING" in options.upper():
            m = re.search(r"CHANGE_TRACKING\s*=\s*(TRUE|FALSE)", options,
                          re.IGNORECASE)
            if m:
                table.change_tracking = m.group(1).upper() == "TRUE"
