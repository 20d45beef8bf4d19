import os
import random

import pytest

from tpgsr_tpu.data.lmdb import LMDBReader, write_lmdb


def test_roundtrip_small(tmp_path):
    items = [(b"num-samples", b"3"), (b"label-000000001", b"hello"), (b"a", b"x" * 10)]
    write_lmdb(str(tmp_path), items)
    with LMDBReader(str(tmp_path)) as env:
        assert len(env) == 3
        assert env.get(b"num-samples") == b"3"
        assert env.get(b"label-000000001") == b"hello"
        assert env.get(b"a") == b"x" * 10
        assert env.get(b"missing") is None
        assert sorted(k for k, _ in items) == list(env.keys())


def test_roundtrip_large_values_and_many_keys(tmp_path):
    rnd = random.Random(0)
    items = []
    for i in range(2000):
        key = b"image_hr-%09d" % i
        # mix of small values and overflow-page values (> ~2KB)
        size = rnd.choice([10, 100, 3000, 9000])
        items.append((key, bytes(rnd.getrandbits(8) for _ in range(size))))
    items.append((b"num-samples", b"2000"))
    write_lmdb(str(tmp_path), items)
    with LMDBReader(str(tmp_path)) as env:
        assert len(env) == 2001
        d = dict(items)
        for key in [b"image_hr-%09d" % i for i in (0, 1, 999, 1999)] + [b"num-samples"]:
            assert env.get(key) == d[key]
        # full scan returns everything in sorted order
        scanned = list(env.items())
        assert len(scanned) == 2001
        assert [k for k, _ in scanned] == sorted(d.keys())
        assert all(d[k] == v for k, v in scanned)


def test_multilevel_tree(tmp_path):
    # enough keys to force >=3 tree levels with small pages
    items = [(b"k%08d" % i, b"v%d" % i) for i in range(5000)]
    write_lmdb(str(tmp_path), items, psize=512)
    with LMDBReader(str(tmp_path)) as env:
        assert env.depth >= 3
        for i in (0, 1, 2500, 4999):
            assert env.get(b"k%08d" % i) == b"v%d" % i


def test_lmdb_compat_with_liblmdb(tmp_path):
    """If the real lmdb binding exists, verify interop (skipped otherwise)."""
    lmdb = pytest.importorskip("lmdb")
    items = [(b"key-%04d" % i, b"value-%d" % i) for i in range(100)]
    write_lmdb(str(tmp_path), items)
    env = lmdb.open(str(tmp_path), readonly=True, lock=False)
    with env.begin() as txn:
        assert txn.get(b"key-0050") == b"value-50"
