"""PHP serialize() reader for the reference's golden models.

The reference test harness records expected query results as PHP-serialized
arrays in test_NNN/model.bin (written by ubertest.php `gen` mode, loaded by
helpers.inc LoadModel, /root/reference/test/helpers.inc:2675-2693).

Supported types: i (int), d (float), b (bool), N (null), s (byte-length
prefixed string), a (array -> dict preserving insertion order).

LoadModel applies a line-ending fixup (re-computing s:N: lengths) because git
checkouts may have converted CRLF; we do the same as a fallback when strict
byte-length parsing fails (helpers.inc:2686).
"""
from __future__ import annotations

import re


class PhpUnserializeError(ValueError):
    pass


def _parse(data: bytes, i: int):
    t = data[i:i + 1]
    if t == b"N":
        if data[i:i + 2] != b"N;":
            raise PhpUnserializeError(f"bad null at {i}")
        return None, i + 2
    if t == b"i":
        j = data.index(b";", i)
        return int(data[i + 2:j]), j + 1
    if t == b"d":
        j = data.index(b";", i)
        return float(data[i + 2:j]), j + 1
    if t == b"b":
        j = data.index(b";", i)
        return data[i + 2:j] == b"1", j + 1
    if t == b"s":
        j = data.index(b":", i + 2)
        n = int(data[i + 2:j])
        start = j + 2  # skip :"
        if data[j + 1:j + 2] != b'"':
            raise PhpUnserializeError(f"bad string at {i}")
        raw = data[start:start + n]
        if data[start + n:start + n + 2] != b'";':
            raise PhpUnserializeError(f"bad string length at {i}")
        return raw.decode("utf-8", errors="replace"), start + n + 2
    if t == b"a":
        j = data.index(b":", i + 2)
        n = int(data[i + 2:j])
        if data[j + 1:j + 2] != b"{":
            raise PhpUnserializeError(f"bad array at {i}")
        i = j + 2
        out = {}
        for _ in range(n):
            k, i = _parse(data, i)
            v, i = _parse(data, i)
            out[k] = v
        if data[i:i + 1] != b"}":
            raise PhpUnserializeError(f"unterminated array at {i}")
        return out, i + 1
    raise PhpUnserializeError(f"unknown type {t!r} at {i}")


def _fix_lengths(data: bytes) -> bytes:
    """Recompute s:N: byte lengths (the LoadModel CRLF fixup)."""
    return re.sub(
        rb's:\d+:"(.*?)";',
        lambda m: b's:%d:"%s";' % (len(m.group(1)), m.group(1)),
        data,
        flags=re.S,
    )


def php_unserialize(data: bytes):
    try:
        obj, end = _parse(data, 0)
    except (PhpUnserializeError, ValueError, IndexError):
        obj, end = _parse(_fix_lengths(data), 0)
    return obj


def load_model(path: str):
    """model.bin -> list of subtests, each a list of per-query result dicts."""
    with open(path, "rb") as f:
        top = php_unserialize(f.read())
    subtests = [top[k] for k in sorted(top, key=lambda x: int(x))]
    out = []
    for st in subtests:
        if isinstance(st, dict):
            out.append([st[k] for k in sorted(st, key=lambda x: int(x))])
        else:
            out.append(st)
    return out
