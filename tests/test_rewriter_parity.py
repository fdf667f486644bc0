"""Unit tests for the round-4 DataFusion-dialect parity rewrites
(cnosdb_spark/sql/rewriter.py) — fast, no SparkSession needed for the
pure-text checks."""

from __future__ import annotations

import pytest

from cnosdb_spark.sql.rewriter import (
    escape_like_pattern_backslashes,
    rewrite_bool_string_cast,
    rewrite_concat_null_skip,
    rewrite_corr,
    rewrite_dql,
)


def test_concat_becomes_null_skipping():
    out = rewrite_concat_null_skip("SELECT concat('-', '1', NULL, '2')")
    assert out == "SELECT concat_ws('', '-', '1', NULL, '2')"
    # concat_ws itself untouched
    assert rewrite_concat_null_skip("SELECT concat_ws('|', a, b)") == (
        "SELECT concat_ws('|', a, b)"
    )


def test_corr_zero_variance_guard_shape():
    out = rewrite_corr("SELECT corr(1, 2) FROM t")
    assert "covar_pop" in out and "stddev_pop" in out and "WHEN" in out
    with pytest.raises(ValueError, match="expects 2 arguments"):
        rewrite_corr("SELECT corr(1, 2, 3) FROM t")


def test_bool_string_cast_renders_01():
    out = rewrite_bool_string_cast(
        "SELECT CAST(startswith(t0, t1) AS STRING) FROM m"
    )
    assert "CAST(CAST(startswith(t0, t1) AS INT) AS STRING)" in out
    # CAST to other types untouched
    same = "SELECT CAST(startswith(t0, t1) AS INT) FROM m"
    assert rewrite_bool_string_cast(same) == same


def test_like_pattern_backslash_doubles():
    out = escape_like_pattern_backslashes(r"SELECT a LIKE('X\Yf') FROM m")
    assert r"'X\\Yf'" in out


def test_unsupported_cast_float_to_timestamp():
    with pytest.raises(ValueError, match="Float64 to Timestamp"):
        rewrite_dql("SELECT CAST(0.777 AS TIMESTAMP)")


def test_unsupported_cast_timestamp_to_double():
    with pytest.raises(ValueError, match="Timestamp.*to Float64"):
        rewrite_dql("SELECT CAST(to_timestamp(1) AS DOUBLE) FROM m")
    with pytest.raises(ValueError, match="Timestamp.*to Float64"):
        rewrite_dql("SELECT CAST(time AS DOUBLE) FROM m")
    # string target stays fine
    rewrite_dql("SELECT CAST(time AS STRING) FROM m")


def test_chr_out_of_range_literal():
    with pytest.raises(ValueError, match="too large for encoding"):
        rewrite_dql("SELECT chr(4134107298484193642)")
    rewrite_dql("SELECT chr(128512)")  # valid code point


def test_sum_of_string_literal_planning_error():
    with pytest.raises(ValueError, match="does not support inputs of type Utf8"):
        rewrite_dql("SELECT SUM(+ ('-991419863')) FROM m0")
    rewrite_dql("SELECT SUM(f0) FROM m0")


def test_invalid_string_to_boolean_cast():
    with pytest.raises(ValueError, match="Boolean type"):
        rewrite_dql("SELECT CAST('0.946' AS BOOLEAN)")
    with pytest.raises(ValueError, match="Boolean type"):
        rewrite_dql("SELECT CAST(CAST(0.9464 AS STRING) AS BOOLEAN) FROM m")
    rewrite_dql("SELECT CAST('true' AS BOOLEAN)")


def test_duplicate_order_by_only_when_unprojected():
    with pytest.raises(ValueError, match="unique"):
        rewrite_dql("SELECT m0.f0 FROM m0 ORDER BY m0.f1 ASC, m0.f1 ASC")
    # duplicated key IS projected → fine (function.slt:2191)
    rewrite_dql("SELECT m3.f0 FROM m3 ORDER BY m3.f0 ASC, m3.f0 ASC")
    # window-internal ORDER BY never triggers it
    rewrite_dql("SELECT rank() OVER (ORDER BY a, a) FROM t")


def test_left_right_count_clamps():
    out = rewrite_dql("SELECT right(t0, 5276657375400990514) FROM m1")
    assert "2147483647" in out and "5276657375400990514" not in out


def test_fuzzer_literal_pair_folds_wrap_i64():
    # arrow-rs non-checked kernels wrap (sqlancer/select.slt:760, :2298)
    out = rewrite_dql(
        "SELECT a FROM m WHERE (((9223372036854775807)-(-1826088151))) IN (1)"
    )
    assert "(-9223372035028687658)" in out
    out = rewrite_dql("SELECT ((-1424580636)*(1068537236)) AS x")
    assert "(-1522217455250562096)" in out
    # truncate-toward-zero division, NULL on zero divisor (divide_opt)
    assert "(-3)" in rewrite_dql("SELECT ((-7)/(2))")
    assert "(NULL)" in rewrite_dql("SELECT ((7)/(0))")
    # Rust rem takes the dividend's sign; %0 is left for Spark to raise
    assert "(-1)" in rewrite_dql("SELECT ((-7)%(2))")
    assert "(7)%(0)" in rewrite_dql("SELECT ((7)%(0))")


def test_fuzzer_column_pair_try_ops():
    out = rewrite_dql("SELECT x FROM m WHERE CAST(((m.f0)/(m.f0)) AS BOOLEAN)")
    assert "try_divide((m.f0), (m.f0))" in out
    out = rewrite_dql("SELECT ((m.f0)*(m.f0)) AS sq FROM m")
    assert "try_multiply((m.f0), (m.f0))" in out and "pmod" in out


def test_fuzzer_arith_precedence_guards():
    # mixed-precedence chains must not re-associate
    out = rewrite_dql("SELECT (a)+(b)*(c), x/(b)/(c), a*(b)/(c) FROM t")
    assert "try_multiply((b), (c))" in out
    assert "x/(b)/(c)" in out and "a*(b)/(c)" in out
    # tpch's decimal products stay untouched (identifier left operand)
    sql = "SELECT sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS s FROM l"
    assert rewrite_dql(sql) == sql


def test_left_right_negative_count_clamps_int_safe():
    # a huge negative drop-count must not overflow Spark's INT substr args
    out = rewrite_dql("SELECT left(t0, -9999999999) FROM m1")
    assert "substr" in out and "2147483646" in out
    assert "-9999999999" not in out


def test_replace_empty_search_propagates_null():
    # the expansion's inner concat later becomes NULL-skipping
    # concat_ws('') — the CASE guard must keep replace(NULL,'','x') NULL
    out = rewrite_dql("SELECT replace(f0, '', 'x') FROM m")
    assert "CASE WHEN (f0) IS NULL" in out
    assert "CAST(NULL AS STRING)" in out


def test_concat_inside_string_literal_untouched():
    sql = "SELECT 'x concat(a) y', concat(a, b) FROM m"
    out = rewrite_concat_null_skip(sql)
    assert "'x concat(a) y'" in out
    assert "concat_ws('', a, b)" in out


def test_fuzzer_div_mod_fold_wraps_i64_min():
    # arrow-rs wrapping kernels: i64::MIN / -1 wraps to i64::MIN,
    # i64::MIN % -1 is 0 — neither may emit an out-of-i64 literal
    out = rewrite_dql("SELECT ((-9223372036854775808)/(-1))")
    assert "(-9223372036854775808)" in out and "9223372036854775808)" != out
    assert "(9223372036854775808)" not in out
    out = rewrite_dql("SELECT ((-9223372036854775808)%(-1))")
    assert "(0)" in out


def test_time_between_matches_cmp_rewrite():
    # BETWEEN bounds and >=/<= comparisons must coerce integer literals
    # identically (µs below the ns-magnitude threshold, floor-div above)
    between = rewrite_dql("SELECT * FROM m WHERE time BETWEEN 2000 AND 5000")
    cmp_ = rewrite_dql("SELECT * FROM m WHERE time >= 2000 AND time <= 5000")
    assert "timestamp_micros(2000)" in between
    assert "timestamp_micros(5000)" in between
    assert "timestamp_micros(2000)" in cmp_
    # ns-magnitude literals floor-divide on BOTH paths (floor, not trunc:
    # catalog.insert decomposes with floor + pmod residue)
    b2 = rewrite_dql(
        "SELECT * FROM m WHERE time BETWEEN -10000000000000001 AND "
        "1700000000000000000"
    )
    assert "timestamp_micros(-10000000000001)" in b2  # floor(-1e16-1 / 1000)
    assert "timestamp_micros(1700000000000000)" in b2
    c2 = rewrite_dql("SELECT * FROM m WHERE time > 1700000000000000000")
    assert "timestamp_micros(1700000000000000)" in c2


def test_rewrite_dql_fuzzer_arith_kwarg():
    sql = "SELECT (t0.time) - (t1.time) AS d FROM m t0, m t1"
    with_arith = rewrite_dql(sql)
    without = rewrite_dql(sql, fuzzer_arith=False)
    assert "try_subtract" in with_arith
    assert "try_subtract" not in without
