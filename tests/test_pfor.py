"""Bit-packed posting codec: pack on host, decode on device (Pallas kernel
in interpreter mode on the CPU test mesh; the compiled kernel is exercised
on real TPU hardware by the benchmarks)."""
import numpy as np
import pytest

from manticoresearch_tpu.ops.pfor import (decode_packed, decode_packed_xla,
                                          pack_rowids, packed_size_bytes)


@pytest.mark.parametrize("n,maxgap", [
    (5, 3), (128, 10), (129, 1), (1000, 1), (4096, 50000), (10000, 7),
    (1, 0), (127, 100),
])
def test_roundtrip(n, maxgap):
    rng = np.random.RandomState(n)
    rows = np.cumsum(rng.randint(0, maxgap + 1, n)).astype(np.int64)
    packed = pack_rowids(rows)
    assert (np.asarray(decode_packed_xla(packed)) == rows).all()
    assert (np.asarray(decode_packed(packed)) == rows).all()


def test_compression_ratio_typical():
    # avg gap ~4 (mid-frequency term in a dense corpus) -> 4-bit class -> ~8x
    rng = np.random.RandomState(1)
    rows = np.cumsum(rng.randint(1, 8, 100_000)).astype(np.int64)
    packed = pack_rowids(rows)
    ratio = rows.nbytes // 2 / packed_size_bytes(packed)  # vs int32 raw
    assert ratio > 5.0


def test_empty():
    packed = pack_rowids(np.zeros(0, np.int64))
    assert len(np.asarray(decode_packed_xla(packed))) == 0
