"""Round-2 expression VM breadth (sphinxexpr.cpp:3548-3631 function set).

Host-eval unit tests over a row dict, plus device parity spot-checks for
the jittable subset (dates, REMAP, FIBONACCI, ATAN2, LEAST/GREATEST).
"""
import math
import time

import numpy as np
import pytest

from manticoresearch_tpu.query.expr import (ExprError, eval_expr,
                                            eval_expr_host, parse_expr)


def ev(text, row=None, weight=0, docid=0):
    return eval_expr_host(parse_expr(text), row or {}, weight, docid)


class TestHostFuncs:
    def test_crc32(self):
        import zlib
        assert ev("CRC32('hello')") == zlib.crc32(b"hello")

    def test_fibonacci(self):
        assert [ev(f"FIBONACCI({n})") for n in range(8)] == \
            [0, 1, 1, 2, 3, 5, 8, 13]
        # uint32 wraparound (F(50) > 2^32)
        assert ev("FIBONACCI(50)") == 12586269025 % 2**32

    def test_dates(self):
        # 2021-03-04 05:06:07 UTC built via calendar to honor local TZ
        import calendar
        ts = calendar.timegm((2021, 3, 4, 5, 6, 7, 0, 0, 0))
        s = time.localtime(ts)
        assert ev(f"YEAR({ts})") == s.tm_year
        assert ev(f"MONTH({ts})") == s.tm_mon
        assert ev(f"DAY({ts})") == s.tm_mday
        assert ev(f"YEARMONTH({ts})") == s.tm_year * 100 + s.tm_mon
        assert ev(f"YEARMONTHDAY({ts})") == \
            s.tm_year * 10000 + s.tm_mon * 100 + s.tm_mday
        assert ev(f"HOUR({ts})") == s.tm_hour
        assert ev(f"MINUTE({ts})") == s.tm_min
        assert ev(f"SECOND({ts})") == s.tm_sec

    def test_now_timediff(self):
        assert abs(ev("NOW()") - time.time()) < 5
        assert ev("TIMEDIFF(3723, 0)") == "1:02:03"
        assert ev("TIMEDIFF(0, 3723)") == "-1:02:03"

    def test_remap(self):
        assert ev("REMAP(1, 100, (1,2), (10,20))") == 10
        assert ev("REMAP(2, 100, (1,2), (10,20))") == 20
        assert ev("REMAP(9, 100, (1,2), (10,20))") == 100

    def test_strings(self):
        assert ev("CONCAT('a', 'b', 3)") == "ab3"
        assert ev("TO_STRING(42)") == "42"
        assert ev("LENGTH('hello')") == 5
        assert ev("LENGTH(tags)", {"tags": [1, 2, 3]}) == 3
        assert ev("SUBSTRING_INDEX('www.example.com', '.', 2)") == \
            "www.example"
        assert ev("SUBSTRING_INDEX('www.example.com', '.', -1)") == "com"
        assert ev("REGEX(name, '^ab.*d$')", {"name": "abcd"}) == 1
        assert ev("REGEX(name, '^ab.*d$')", {"name": "xyz"}) == 0

    def test_levenshtein(self):
        assert ev("LEVENSHTEIN('kitten', 'sitting')") == 3
        assert ev("LEVENSHTEIN('abc', 'abc')") == 0
        norm = ev("LEVENSHTEIN('kitten', 'sitting', 1)")
        assert abs(norm - (1 - 3 / 7)) < 1e-6

    def test_least_greatest(self):
        assert ev("LEAST(3, 1, 2)") == 1
        assert ev("GREATEST(3, 1, 2)") == 3
        assert ev("LEAST(tags)", {"tags": [5, 2, 9]}) == 2
        assert ev("GREATEST(tags)", {"tags": [5, 2, 9]}) == 9

    def test_exist(self):
        assert ev("EXIST('price', 42)", {"price": 7}) == 7
        assert ev("EXIST('price', 42)", {}) == 42

    def test_atan2_rand(self):
        assert abs(ev("ATAN2(1, 1)") - math.pi / 4) < 1e-6
        r = ev("RAND()")
        assert 0.0 <= r < 1.0

    def test_poly_contains(self):
        # unit square
        assert ev("CONTAINS(POLY2D(0,0, 0,1, 1,1, 1,0), 0.5, 0.5)") == 1
        assert ev("CONTAINS(POLY2D(0,0, 0,1, 1,1, 1,0), 2.0, 0.5)") == 0
        assert ev("CONTAINS(GEOPOLY2D(0,0, 0,1, 1,1, 1,0), 0.5, 0.5)") == 1

    def test_for_iterators(self):
        row = {"j": {"arr": [1, 5, 9]}}
        assert ev("ANY(x > 7 FOR x IN j.arr)", row) == 1
        assert ev("ALL(x > 7 FOR x IN j.arr)", row) == 0
        assert ev("ALL(x > 0 FOR x IN j.arr)", row) == 1
        assert ev("INDEXOF(x = 5 FOR x IN j.arr)", row) == 1
        assert ev("INDEXOF(x = 6 FOR x IN j.arr)", row) == -1

    def test_is_null(self):
        row = {"j": {"a": 1}}
        assert ev("j.missing IS NULL", row) == 1
        assert ev("j.a IS NULL", row) == 0
        assert ev("j.a IS NOT NULL", row) == 1

    def test_session_funcs(self):
        assert ev("CONNECTION_ID()") == 0
        assert isinstance(ev("CURRENT_USER()"), str)
        assert ev("MIN_TOP_WEIGHT()") == 0


class TestDeviceParity:
    """jit the device path on tiny arrays and compare to host."""

    def _dev(self, text, cols):
        import jax
        tree = parse_expr(text)
        attrs = {k: jax.numpy.asarray(np.asarray(v)) for k, v in
                 cols.items()}
        return np.asarray(eval_expr(tree, attrs))

    def test_dates_device(self):
        import calendar
        ts = np.asarray([calendar.timegm((2021, 3, 4, 5, 6, 7, 0, 0, 0)),
                         calendar.timegm((1999, 12, 31, 23, 59, 59, 0, 0, 0)),
                         calendar.timegm((2038, 1, 19, 3, 14, 7, 0, 0, 0))],
                        np.int64)
        got = self._dev("YEARMONTHDAY(t)", {"t": ts})
        want = [eval_expr_host(parse_expr(f"YEARMONTHDAY({v})"), {})
                for v in ts]
        assert list(got) == want
        got_h = self._dev("HOUR(t)", {"t": ts})
        want_h = [eval_expr_host(parse_expr(f"HOUR({v})"), {}) for v in ts]
        assert list(got_h) == want_h

    def test_remap_device(self):
        got = self._dev("REMAP(x, 100, (1,2), (10,20))",
                        {"x": np.asarray([1, 2, 3], np.int32)})
        assert list(got) == [10, 20, 100]

    def test_fib_device(self):
        got = self._dev("FIBONACCI(x)",
                        {"x": np.asarray([0, 1, 7, 50], np.int32)})
        assert list(np.asarray(got, np.uint32)) == \
            [0, 1, 13, 12586269025 % 2**32]

    def test_least_greatest_device(self):
        a = np.asarray([1, 9], np.int32)
        b = np.asarray([5, 3], np.int32)
        assert list(self._dev("LEAST(a, b)", {"a": a, "b": b})) == [1, 3]
        assert list(self._dev("GREATEST(a, b)", {"a": a, "b": b})) == [5, 9]

    def test_host_only_raises(self):
        with pytest.raises(ExprError):
            self._dev("CONCAT('a', 'b')", {})
