"""CnosDB-dialect → Spark SQL rewrites for the DQL surface.

The reference extends DataFusion SQL with a handful of function forms
(parser: /root/reference query_server/query/src/sql/parser.rs; analyzer
rewrites under query_server/query/src/extension/analyse/). Spark SQL
already covers almost everything; this module textually rewrites the
remaining forms:

  time_window(t, interval 'X' [, interval 'Y' [, TIMESTAMP 'Z']])
      → window(t, 'X' [, 'Y' [, 'Z']])          (transform_time_window.rs)
  first(t, v) / last(t, v) → min_by(v, t) / max_by(v, t)
      ({first,last}.rs; null-skipping matches Spark min_by/max_by)
  topk(col, k) / bottom(col, k) in the projection
      → col ... ORDER BY col DESC/ASC LIMIT k
      (transform_topk_func_to_topk_node.rs: single selector, k ∈ [1,255])
  exact_count(x) → count(x)                     (transform_exact_count...)

Rewrites are token-aware enough for real queries (they respect quoted
strings) without a full SQL parser.
"""

from __future__ import annotations

import re

_TOPK_RE = re.compile(r"\b(topk|bottom)\s*\(", re.I)
_TW_RE = re.compile(r"\btime_window\s*\(", re.I)
_FIRST_LAST_RE = re.compile(r"\b(first|last)\s*\(", re.I)
_EXACT_COUNT_RE = re.compile(r"\bexact_count\s*\(", re.I)
_INTERVAL_RE = re.compile(r"^\s*interval\s+'([^']+)'\s*$", re.I)
_TS_RE = re.compile(r"^\s*timestamp\s+('?[^']+'?)\s*$", re.I)

MAX_K = 255


def _find_call_end(sql: str, open_paren: int) -> int:
    """Index just past the matching ')' for the '(' at ``open_paren``."""
    depth = 0
    i = open_paren
    in_str: str | None = None
    while i < len(sql):
        ch = sql[i]
        if in_str:
            if ch == in_str:
                in_str = None
        elif ch in ("'", '"'):
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError(f"unbalanced parentheses in SQL near offset {open_paren}")


def _split_args(argstr: str) -> list[str]:
    args: list[str] = []
    depth = 0
    in_str: str | None = None
    cur: list[str] = []
    for ch in argstr:
        if in_str:
            cur.append(ch)
            if ch == in_str:
                in_str = None
            continue
        if ch in ("'", '"'):
            in_str = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur and "".join(cur).strip():
        args.append("".join(cur).strip())
    return args


_CAST_INTERVAL_RE = re.compile(
    r"cast\s*\(\s*'([^']+)'\s+as\s+interval\s*\)", re.I
)


def rewrite_time_window(sql: str) -> str:
    """time_window(t, interval '10 milliseconds'[, interval '5 ms']) →
    window(t, '10 milliseconds'[, '5 ms']). Spark's window() is the same
    Expand-based operator the reference's analyzer builds — EXCEPT when
    window %% slide != 0: there the reference emits all
    ceil(window/slide) windows per row unconditionally (its Expand filter
    only checks membership in the newest window,
    transform_time_window.rs:358-374), so a point can land in a window
    whose end == t. Spark's window() drops those; for parity that case is
    rewritten to an explicit explode over the reference's window
    arithmetic (make_window_expr, transform_time_window.rs:251-296)."""
    from ..functions.timeseries import _parse_duration

    if len(_TW_RE.findall(sql)) > 1:
        # the reference plans exactly one window per query
        # (transform_time_window.rs rejects a second TimeWindow expr)
        raise ValueError("only one time_window per query is supported")
    while True:
        m = _TW_RE.search(sql)
        if not m:
            return sql
        open_p = sql.index("(", m.start())
        end = _find_call_end(sql, open_p)
        args = _split_args(sql[open_p + 1 : end - 1])
        if not 2 <= len(args) <= 4:
            raise ValueError("time_window expects 2-4 arguments")
        out = [args[0]]
        for a in args[1:3]:
            im = _INTERVAL_RE.match(a)
            cm = _CAST_INTERVAL_RE.fullmatch(a.strip())
            out.append(f"'{im.group(1)}'" if im else (f"'{cm.group(1)}'" if cm else a))
        durs = []
        for q in out[1:3]:
            try:
                durs.append(int(_parse_duration(q.strip("'\"")).total_seconds() * 1e6))
            except (ValueError, AttributeError):
                durs.append(None)
        max_us = 365 * 86_400_000_000
        for d in durs:
            if d is not None and not (0 < d <= max_us):
                # duration ∈ (0, 365d] (transform_time_window.rs:143-151,
                # applied to both window and slide)
                raise ValueError("time_window durations must be in (0s, 365d]")
        if (
            len(durs) == 2
            and durs[0] and durs[1]
            and durs[0] % durs[1] != 0
        ):
            if (durs[0] + durs[1] - 1) // durs[1] > 100:
                raise ValueError("Too many overlapping windows")
            start_mod = 0
            if len(args) == 4:
                off = _start_to_offset(args[3], out[1])  # modulus = window
                start_mod = int(
                    _parse_duration(off.strip("'\"")).total_seconds() * 1e6
                )
            repl = _sliding_expand_expr(out[0], durs[0], durs[1], start_mod)
        else:
            if len(args) == 4:
                out.append(
                    _start_to_offset(args[3], out[2] if len(out) > 2 else out[1])
                )
            repl = f"window({', '.join(out)})"
        sql = sql[: m.start()] + repl + sql[end:]


def _sliding_expand_expr(time_arg: str, w_us: int, s_us: int, start_mod_us: int) -> str:
    """Reference-exact sliding expansion: windows i = 0..ceil(w/s)-1 at
    last_start - i*slide where last_start = t - ((t - start%w + s) mod s)
    (make_window_expr, transform_time_window.rs:251-296), emitted for every
    row — INCLUDING windows whose end == t (right-boundary divergence from
    Spark's window())."""
    n = (w_us + s_us - 1) // s_us
    t = f"unix_micros(cast({time_arg} as timestamp))"
    ls = f"({t} - pmod({t} - {start_mod_us} + {s_us}, {s_us}))"
    return (
        f"explode(transform(sequence(0, {n - 1}), i -> named_struct("
        f"'start', timestamp_micros({ls} - i * {s_us}), "
        f"'end', timestamp_micros({ls} - i * {s_us} + {w_us}))))"
    )


def rewrite_exploded_groupby(sql: str) -> str:
    """A generator is not allowed in an aggregate select list, so
    ``SELECT explode(ARR) AS w, <aggs> FROM t GROUP BY w`` (produced by
    the sliding-window expansion) is restructured to
    ``SELECT w, <aggs> FROM (SELECT explode(ARR) AS w, * FROM t)
    GROUP BY w`` — the same Expand-below-Aggregate plan the reference
    builds (transform_time_window.rs build_sliding_window_plan)."""
    m = re.search(r"\bexplode\(", sql, re.I)
    if not m:
        return sql
    open_p = sql.index("(", m.start())
    end = _find_call_end(sql, open_p)
    am = re.match(r"\s+as\s+(\w+)", sql[end:], re.I)
    if not am:
        return sql
    alias = am.group(1)
    rest = sql[end + am.end():]
    if not re.search(rf"\bgroup\s+by\s+{alias}\b", rest, re.I):
        return sql
    sel = sql.lower().rfind("select", 0, m.start())
    if sel < 0:
        return sql
    fm = re.search(r"\bfrom\s+([\w.]+)", rest, re.I)
    if not fm:
        return sql
    explode_expr = sql[m.start():end]
    items_before = sql[sel + 6 : m.start()].strip()
    items_after = rest[: fm.start()].strip()
    table = fm.group(1)
    inner = f"(select {explode_expr} as {alias}, * from {table})"
    new_sql = (
        sql[:sel]
        + f"select {items_before} {alias} {items_after} from {inner}"
        + rest[fm.end():]
    )
    return new_sql


def _start_to_offset(start_arg: str, slide_quoted: str) -> str:
    """The reference's 4th time_window argument is an ABSOLUTE start
    timestamp (transform_time_window.rs); Spark's ``window`` takes a
    startTime OFFSET past epoch-aligned boundaries. Convert:
    offset = start_ts mod <modulus> (µs) — the caller passes the slide for
    Spark's window(), or the WINDOW duration for the explode-based sliding
    expansion (the reference's i64_start_time = start %% window,
    transform_time_window.rs:270-273)."""
    from datetime import datetime, timezone

    from ..functions.timeseries import _parse_duration

    s = start_arg.strip()
    tm = _TS_RE.match(s)
    if tm:
        s = tm.group(1)
    s = s.strip("'\"")
    try:
        ts = datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return start_arg  # already an offset duration string
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
    epoch_us = int((ts - datetime(1970, 1, 1)).total_seconds() * 1_000_000)
    slide_us = int(_parse_duration(slide_quoted.strip("'\"")).total_seconds() * 1_000_000)
    return f"'{epoch_us % slide_us} microseconds'"


_APPROX_DISTINCT_RE = re.compile(r"\bapprox_distinct\s*\(", re.I)


def rewrite_approx_distinct(sql: str) -> str:
    """approx_distinct(x) → approx_count_distinct(x) (DataFusion name →
    Spark name; both HLL-based)."""
    return _APPROX_DISTINCT_RE.sub("approx_count_distinct(", sql)


def rewrite_first_last(sql: str) -> str:
    """first(t, v) → min_by(v, t); last(t, v) → max_by(v, t). Only rewrites
    two-argument calls — Spark's own one-argument first()/last() window
    aggregates pass through untouched."""
    pos = 0
    while True:
        m = _FIRST_LAST_RE.search(sql, pos)
        if not m:
            return sql
        fn = m.group(1).lower()
        open_p = sql.index("(", m.start())
        end = _find_call_end(sql, open_p)
        args = _split_args(sql[open_p + 1 : end - 1])
        if len(args) != 2:
            pos = end
            continue
        target = "min_by" if fn == "first" else "max_by"
        repl = f"{target}({args[1]}, {args[0]})"
        sql = sql[: m.start()] + repl + sql[end:]
        pos = m.start() + len(repl)


def rewrite_exact_count(sql: str) -> str:
    return _EXACT_COUNT_RE.sub("count(", sql)


def rewrite_selector(sql: str) -> str:
    """topk(col, k)/bottom(col, k) in the projection → col + ORDER BY +
    LIMIT appended to the (single, un-suffixed) SELECT. Parity rules from
    the reference analyzer: exactly one selector per query, no nesting,
    k ∈ [1, 255]."""
    matches = list(_TOPK_RE.finditer(sql))
    if not matches:
        return sql
    if len(matches) > 1:
        raise ValueError("only one topk/bottom selector is allowed per query")
    m = matches[0]
    fn = m.group(1).lower()
    open_p = sql.index("(", m.start())
    end = _find_call_end(sql, open_p)
    args = _split_args(sql[open_p + 1 : end - 1])
    if len(args) != 2:
        raise ValueError(f"{fn} expects exactly 2 arguments")
    col, k_str = args
    try:
        k = int(k_str)
    except ValueError as exc:
        raise ValueError(f"{fn} k must be an integer literal") from exc
    if not 1 <= k <= MAX_K:
        raise ValueError(f"{fn} k must be in [1, {MAX_K}], got {k}")
    if re.search(r"\b(order\s+by|limit)\b", sql, re.I):
        raise ValueError(f"{fn} cannot be combined with ORDER BY/LIMIT")
    body = sql[: m.start()] + col + sql[end:]
    direction = "DESC" if fn == "topk" else "ASC"
    return f"{body.rstrip().rstrip(';')} ORDER BY {col} {direction} NULLS LAST LIMIT {k}"


_TIME_INT_CMP = re.compile(
    r"\b(time)\s*(<=|>=|<|>|=|!=)\s*(-?\d+)(?![\d.\w])", re.I
)


def rewrite_time_int_comparison(sql: str) -> str:
    """``time <op> <integer>`` → epoch-microsecond comparison (Spark's
    native precision; the reference coerces as ns — µs keeps insert and
    comparison consistent at Spark precision, see catalog.insert)."""
    return _TIME_INT_CMP.sub(
        lambda m: f"{m.group(1)} {m.group(2)} timestamp_micros({m.group(3)})",
        sql,
    )


def rewrite_dql(sql: str) -> str:
    sql = rewrite_time_window(sql)
    sql = rewrite_exploded_groupby(sql)
    sql = rewrite_first_last(sql)
    sql = rewrite_exact_count(sql)
    sql = rewrite_approx_distinct(sql)
    sql = rewrite_time_int_comparison(sql)
    sql = rewrite_selector(sql)
    return sql
