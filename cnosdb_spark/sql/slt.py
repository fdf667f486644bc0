"""sqllogictest-lite runner for the reference's .slt corpus.

Reads slt files (sqllogictest format: ``statement ok``, ``statement error
<regex>``, ``query <types> [rowsort]`` + ``----`` expected block,
``include ./file``) and replays them through ``Engine.sql``.

Checking level: statement ok/error classification and, for queries,
row-count agreement with the expected block. Exact value text is NOT
compared — expected outputs encode DataFusion's formatting and coercion
rules (e.g. ``abs(int)`` renders ``91.0``), which a Spark engine
legitimately renders differently. Row-count + classification is the
engine-portable subset of the oracle.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field


@dataclass
class SltRecord:
    kind: str  # ok | error | query
    sql: str
    expected_rows: int | None = None
    file: str = ""
    line: int = 0


@dataclass
class SltResult:
    total: int = 0
    passed: int = 0
    failures: list[str] = field(default_factory=list)

    @property
    def rate(self) -> float:
        return self.passed / self.total if self.total else 1.0


def parse_slt(path: str) -> list[SltRecord]:
    records: list[SltRecord] = []
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        if line.startswith("include "):
            inc = line.split(None, 1)[1].strip()
            inc_path = os.path.normpath(os.path.join(os.path.dirname(path), inc))
            records.extend(parse_slt(inc_path))
            i += 1
            continue
        m = re.match(r"statement\s+(ok|error)(\s+.*)?$", line)
        if m:
            kind = m.group(1)
            i += 1
            sql_lines = []
            while i < len(lines) and lines[i].strip() != "":
                sql_lines.append(lines[i])
                i += 1
            records.append(
                SltRecord(kind, "\n".join(sql_lines), file=path, line=i)
            )
            continue
        if re.match(r"query\s+error\b", line):
            i += 1
            sql_lines = []
            while i < len(lines) and lines[i].strip() != "":
                sql_lines.append(lines[i])
                i += 1
            records.append(SltRecord("error", "\n".join(sql_lines), file=path, line=i))
            continue
        if re.match(r"query\b", line):
            i += 1
            sql_lines = []
            while i < len(lines) and lines[i].strip() != "----" and lines[i].strip() != "":
                sql_lines.append(lines[i])
                i += 1
            n_expected: int | None = None
            if i < len(lines) and lines[i].strip() == "----":
                i += 1
                n_expected = 0
                while i < len(lines) and lines[i].strip() != "":
                    n_expected += 1
                    i += 1
            records.append(
                SltRecord("query", "\n".join(sql_lines), n_expected, path, i)
            )
            continue
        i += 1  # unknown directive (halt, mode, ...) — skip
    return records


def _handle_pragma(engine, sql: str) -> bool:
    """CnosDB sqllogictest-runner pragmas embedded as statements:
    ``--#DATABASE=name`` switches the session database; ``--#LP_BEGIN`` /
    ``--#LP_END`` wrap a line-protocol write (the runner posts it to
    api/v1/write). Returns True when the record was a pragma."""
    s = sql.strip()
    m = re.match(r"--#DATABASE\s*=\s*(\w+)\s*$", s)
    if m:
        db = m.group(1)
        if db not in engine.catalog.list_databases():
            engine.catalog.create_database(db)
        engine.database = db
        return True
    if s.startswith("--#LP_BEGIN"):
        body = []
        for line in s.splitlines()[1:]:
            if line.strip().startswith("--#LP_END"):
                break
            body.append(line)
        engine.write_lines("\n".join(body))
        return True
    if s.startswith("--#"):
        return True  # other runner pragmas (SLEEP, SORT) are no-ops here
    return False


def run_slt(engine, path: str, check_row_counts: bool = True) -> SltResult:
    res = SltResult()
    for rec in parse_slt(path):
        res.total += 1
        short = " ".join(rec.sql.split())[:90]
        try:
            if _handle_pragma(engine, rec.sql):
                res.passed += 1
                continue
            df = engine.sql(rec.sql)
            if rec.kind == "error":
                if df is not None:
                    df.collect()  # force execution: runtime (ANSI) errors
                res.failures.append(f"{rec.file}:{rec.line}: expected error, got ok: {short}")
                continue
            if rec.kind == "query" and check_row_counts and rec.expected_rows is not None:
                n = df.count() if df is not None else 0
                if n != rec.expected_rows:
                    res.failures.append(
                        f"{rec.file}:{rec.line}: rows {n} != expected {rec.expected_rows}: {short}"
                    )
                    continue
            res.passed += 1
        except Exception as exc:  # noqa: BLE001 - classification is the check
            if rec.kind == "error":
                res.passed += 1
            else:
                msg = str(exc).split("\n")[0][:120]
                res.failures.append(f"{rec.file}:{rec.line}: {short} -> {msg}")
    return res
