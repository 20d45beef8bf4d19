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


class TestMultiCommit:
    """Multi-commit databases with freelist pages — the layout real
    (liblmdb-written) TextZoom files have and round 1 never produced:
    both metas live with different txnids, FREE_DBI entries in MDB_IDL
    format, copy-on-write page reuse, non-contiguous tree pages."""

    def test_second_commit_updates_and_freelist(self, tmp_path):
        from tpgsr_tpu.data.lmdb import append_lmdb

        items = [(b"key-%04d" % i, b"value-%d" % i) for i in range(200)]
        write_lmdb(str(tmp_path), items, psize=512)
        append_lmdb(str(tmp_path), [(b"key-%04d" % i, b"NEW-%d" % i) for i in (0, 50)]
                    + [(b"zzz-%03d" % i, b"late-%d" % i) for i in range(40)])

        with LMDBReader(str(tmp_path)) as env:
            assert env.txnid == 2
            assert env.get(b"key-0000") == b"NEW-0"
            assert env.get(b"key-0050") == b"NEW-50"
            assert env.get(b"key-0100") == b"value-100"
            assert env.get(b"zzz-039") == b"late-39"
            assert len(env) == 240
            fl = env.freelist()
            assert fl, "second commit must record freed pages"
            assert all(pgs == sorted(pgs, reverse=True) for pgs in fl.values())

    def test_mvcc_old_snapshot_still_readable(self, tmp_path):
        from tpgsr_tpu.data.lmdb import append_lmdb

        write_lmdb(str(tmp_path), [(b"a", b"1"), (b"b", b"2")])
        append_lmdb(str(tmp_path), [(b"b", b"2x"), (b"c", b"3")])

        with LMDBReader(str(tmp_path)) as live:
            assert live.txnid == 2
            assert live.get(b"b") == b"2x" and live.get(b"c") == b"3"
        # the stale meta slot still exposes the previous committed snapshot
        slots = {LMDBReader(str(tmp_path), meta_slot=s).txnid: s for s in (0, 1)}
        old = LMDBReader(str(tmp_path), meta_slot=slots[min(slots)])
        assert old.get(b"b") == b"2" and old.get(b"c") is None
        old.close()

    def test_third_commit_reuses_freed_pages(self, tmp_path):
        from tpgsr_tpu.data.lmdb import append_lmdb

        items = [(b"k%05d" % i, bytes([i % 251]) * 40) for i in range(500)]
        write_lmdb(str(tmp_path), items, psize=512)
        with LMDBReader(str(tmp_path)) as env:
            pages_v1 = set(env.tree_pages())
        append_lmdb(str(tmp_path), [(b"k%05d" % i, b"mid") for i in range(0, 500, 7)])
        append_lmdb(str(tmp_path), [(b"k%05d" % i, b"fin") for i in range(0, 500, 11)])

        with LMDBReader(str(tmp_path)) as env:
            assert env.txnid == 3
            # commit 3 must have recycled pages freed by commit 2 (= commit
            # 1's tree) — the non-contiguous layout real files exhibit
            pages_v3 = set(env.tree_pages())
            assert pages_v3 & pages_v1, "no page reuse happened"
            for i in range(500):
                expect = (b"fin" if i % 11 == 0 else
                          b"mid" if i % 7 == 0 else bytes([i % 251]) * 40)
                assert env.get(b"k%05d" % i) == expect

    def test_multicommit_with_overflow_values(self, tmp_path):
        from tpgsr_tpu.data.lmdb import append_lmdb

        big = lambda i: (b"img-%03d" % i, bytes(range(256)) * 8 + bytes([i]))
        write_lmdb(str(tmp_path), [big(i) for i in range(20)], psize=512)
        append_lmdb(str(tmp_path), [big(i) for i in range(20, 35)]
                    + [(b"img-000", b"small-now")])
        with LMDBReader(str(tmp_path)) as env:
            assert env.get(b"img-000") == b"small-now"
            for i in range(1, 35):
                assert env.get(b"img-%03d" % i) == big(i)[1]

    def test_dataset_reads_multicommit_db(self, tmp_path):
        """The TextZoom dataset path works on a freelist-bearing database."""
        from tests.fixtures import make_textzoom_lmdb
        from tpgsr_tpu.data.datasets import TextZoomDataset
        from tpgsr_tpu.data.lmdb import append_lmdb

        root = str(tmp_path / "tz")
        make_textzoom_lmdb(root, n=6)
        # re-commit a few samples (e.g. a re-run of the dataset build tool)
        with LMDBReader(root) as env:
            hr = env.get(b"image_hr-%09d" % 1)
            lr = env.get(b"image_lr-%09d" % 1)
        append_lmdb(root, [(b"label-%09d" % 1, b"patched"),
                           (b"image_hr-%09d" % 7, hr),
                           (b"image_lr-%09d" % 7, lr),
                           (b"label-%09d" % 7, b"seventh"),
                           (b"num-samples", b"7")])
        ds = TextZoomDataset(root)
        assert len(ds) == 7
        _, _, label = ds[0]
        assert label == "patched"
        _, _, label7 = ds[6]
        assert label7 == "seventh"


class TestRandomizedModel:
    """Seeded fuzz of the full engine against a dict model: random commit
    sequences with key/value sizes spanning inline and overflow pages,
    updates and fresh inserts, verified via point lookups (python AND
    native engines), full ordered scans, and MVCC stale-slot snapshots."""

    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_random_commits_match_dict_model(self, seed, tmp_path):
        from tpgsr_tpu.data.lmdb import append_lmdb

        rnd = random.Random(seed)

        def rand_kv():
            klen = rnd.randint(1, 60)
            key = bytes(rnd.getrandbits(8) for _ in range(klen))
            vlen = rnd.choice([0, rnd.randint(1, 80), rnd.randint(200, 600),
                               rnd.randint(2000, 9000)])
            return key, bytes(rnd.getrandbits(8) for _ in range(vlen))

        model = {}
        first = dict(rand_kv() for _ in range(rnd.randint(50, 300)))
        model.update(first)
        write_lmdb(str(tmp_path), list(first.items()), psize=512)

        prev_model = None
        # enough commits for wrong freelist accounting to cascade into
        # visible corruption: a page listed free while live in commit N's
        # freelist tree gets reused by commit N+1 and double-freed, and the
        # damage surfaces in the MAIN tree only several commits later
        # (observed at ~10 before the append_lmdb pool fix)
        for _commit in range(rnd.randint(10, 16)):
            batch = {}
            # mix of updates to existing keys and fresh inserts
            for k in rnd.sample(sorted(model), k=min(len(model), rnd.randint(5, 40))):
                batch[k] = rand_kv()[1]
            # shrink some big values to tiny ones: freed overflow pages must
            # outnumber the new main tree's needs for the freelist tree to
            # reach the pool at all — the exact precondition of the
            # append_lmdb accounting bug (triggered by commit 2 pre-fix)
            for k in rnd.sample(sorted(model), k=min(len(model), 30)):
                batch[k] = b"s" * rnd.randint(1, 20)
            for _ in range(rnd.randint(5, 120)):
                k, v = rand_kv()
                batch[k] = v
            prev_model = dict(model)
            model.update(batch)
            append_lmdb(str(tmp_path), list(batch.items()))
            with LMDBReader(str(tmp_path)) as env:
                # per-commit invariant: no page is both free and live in
                # EITHER tree (the freelist tree included — its own pages
                # are the ones the pre-fix accounting leaked)
                live = set(env.tree_pages()) | set(env.tree_pages(env.free_root))
                free = {p for pgs in env.freelist().values() for p in pgs}
                assert not (free & live), f"live pages listed free: {free & live}"
                scanned = list(env.items())
                assert [k for k, _ in scanned] == sorted(model)
                assert all(model[k] == v for k, v in scanned)

        with LMDBReader(str(tmp_path)) as env:
            assert len(env) == len(model)
            # ordered full scan == sorted model
            scanned = list(env.items())
            assert [k for k, _ in scanned] == sorted(model)
            assert all(model[k] == v for k, v in scanned)
            # point lookups on both engines, hits and misses
            probe = rnd.sample(sorted(model), k=min(len(model), 100))
            for k in probe:
                assert env._get_py(k) == model[k]
                if env._native is not None:
                    assert env._native.get(k) == model[k]
            for _ in range(20):
                k, _ = rand_kv()
                if k not in model:
                    assert env.get(k) is None
            live_txn = env.txnid
            # freed pages stay within the file and out of the live tree
            live_pages = set(env.tree_pages())
            for pgs in env.freelist().values():
                assert not (set(pgs) & live_pages)

        # the stale meta slot is exactly the previous commit's snapshot
        slots = {LMDBReader(str(tmp_path), meta_slot=s).txnid: s for s in (0, 1)}
        old = LMDBReader(str(tmp_path), meta_slot=slots[live_txn - 1])
        assert len(old) == len(prev_model)
        for k in rnd.sample(sorted(prev_model), k=min(len(prev_model), 50)):
            assert old._get_py(k) == prev_model[k]
        old.close()


class TestNativeReader:
    """C++ point-lookup engine (tpgsr_tpu/native/lmdb_reader.cc) — the
    liblmdb-style native hot path — must agree with the Python walk on
    every layout the reader supports."""

    @pytest.fixture(scope="class")
    def native(self):
        from tpgsr_tpu.native import load_native_lmdb

        lib = load_native_lmdb()
        if lib is None:
            pytest.skip("no C++ toolchain available")
        return lib

    def test_native_matches_python_single_commit(self, native, tmp_path):
        items = [(b"k%06d" % i, (b"v%d-" % i) * (1 + i % 50)) for i in range(3000)]
        write_lmdb(str(tmp_path), items, psize=512)
        with LMDBReader(str(tmp_path)) as env:
            assert env._native is not None
            assert len(env._native) == len(env)
            for k, v in items[::37]:
                assert env.get(k) == v == env._get_py(k)
            assert env.get(b"missing") is None is env._get_py(b"missing")

    def test_native_matches_python_multicommit_overflow(self, native, tmp_path):
        from tpgsr_tpu.data.lmdb import append_lmdb

        big = bytes(range(256)) * 16  # overflow-page value
        write_lmdb(str(tmp_path), [(b"a%03d" % i, b"x" * i) for i in range(100)],
                   psize=512)
        append_lmdb(str(tmp_path), [(b"big", big), (b"a050", b"patched")])
        with LMDBReader(str(tmp_path)) as env:
            assert env._native is not None
            assert env.get(b"big") == big == env._get_py(b"big")
            assert env.get(b"a050") == b"patched" == env._get_py(b"a050")
            for i in (0, 13, 99):
                if i != 50:
                    assert env.get(b"a%03d" % i) == b"x" * i == env._get_py(b"a%03d" % i)

    def test_native_point_lookup_faster_than_python(self, native, tmp_path):
        import time

        items = [(b"key%08d" % i, b"val%d" % i) for i in range(20000)]
        write_lmdb(str(tmp_path), items, psize=4096)
        with LMDBReader(str(tmp_path)) as env:
            keys = [k for k, _ in items[::7]]
            t0 = time.perf_counter()
            for k in keys:
                env._native.get(k)
            t_native = time.perf_counter() - t0
            t0 = time.perf_counter()
            for k in keys:
                env._get_py(k)
            t_py = time.perf_counter() - t0
        # liblmdb-style native walk should win clearly; generous margin to
        # stay robust under CI load
        assert t_native < t_py / 2, (t_native, t_py)


def test_native_bounds_corrupt_overflow_dsize(tmp_path):
    """A corrupt/truncated file whose leaf node advertises a multi-page
    overflow dsize extending past EOF must raise cleanly (rc=-2) from the
    native engine — not SIGSEGV the process when the caller copies the
    value (which, in a DataLoader worker, would surface only as the
    generic 'worker process died')."""
    from tpgsr_tpu.native import NativeLMDB, load_native_lmdb

    if load_native_lmdb() is None:
        pytest.skip("no C++ toolchain available")

    psize = 512
    big = b"B" * 4000  # spans multiple overflow pages
    write_lmdb(str(tmp_path), [(b"big", big), (b"k", b"v")], psize=psize)
    path = str(tmp_path / "data.mdb")
    buf = bytearray(open(path, "rb").read())
    # locate the F_BIGDATA leaf node for key b'big' and blow up its dsize
    patched = False
    for off in range(2 * psize, len(buf), psize):
        flags = int.from_bytes(buf[off + 10:off + 12], "little")
        if not flags & 0x02:  # P_LEAF
            continue
        lower = int.from_bytes(buf[off + 12:off + 14], "little")
        for i in range((lower - 16) // 2):
            noff = off + int.from_bytes(buf[off + 16 + 2 * i:off + 18 + 2 * i], "little")
            nfl = int.from_bytes(buf[noff + 4:noff + 6], "little")
            ks = int.from_bytes(buf[noff + 6:noff + 8], "little")
            if nfl & 0x01 and buf[noff + 8:noff + 8 + ks] == b"big":
                buf[noff:noff + 4] = b"\xff\xff\xff\xff"  # dsize = 0xffffffff
                patched = True
    assert patched
    open(path, "wb").write(bytes(buf))

    eng = NativeLMDB(path)
    with pytest.raises(RuntimeError, match="corrupt"):
        eng.get(b"big")
    assert eng.get(b"k") == b"v"  # intact records still readable
    eng.close()


class TestRobustnessSweep:
    """VERDICT r2 item 10: real liblmdb files come in page sizes this box
    never produces by default (4K is the liblmdb default; 8K/16K appear on
    large-page systems), end exactly at a page boundary, and can carry a
    torn final meta after a crash.  Since real ``data.mdb`` files remain
    unseeable in this environment, sweep those layouts synthetically."""

    @pytest.mark.parametrize("psize", [4096, 8192, 16384])
    def test_page_size_sweep_multicommit_overflow(self, psize, tmp_path):
        from tpgsr_tpu.data.lmdb import append_lmdb

        rnd = random.Random(psize)
        model = {}
        first = {}
        for i in range(120):
            # values straddling the inline/overflow threshold FOR THIS psize
            # (liblmdb: inline iff <= (psize-16)/2-ish via nodemax)
            size = rnd.choice([10, psize // 4, psize // 2, psize, 3 * psize + 7])
            first[b"k%06d" % i] = bytes(rnd.getrandbits(8) for _ in range(size))
        model.update(first)
        write_lmdb(str(tmp_path), list(first.items()), psize=psize)

        for _commit in range(3):
            batch = {}
            for k in rnd.sample(sorted(model), k=30):
                batch[k] = bytes(rnd.getrandbits(8) for _ in range(rnd.choice([5, psize * 2])))
            for i in range(40):
                batch[b"n%06d-%d" % (i, _commit)] = b"v" * rnd.randint(1, psize)
            model.update(batch)
            append_lmdb(str(tmp_path), list(batch.items()))

        with LMDBReader(str(tmp_path)) as env:
            assert env.psize == psize
            scanned = list(env.items())
            assert [k for k, _ in scanned] == sorted(model)
            assert all(model[k] == v for k, v in scanned)
            if env._native is not None:
                for k in rnd.sample(sorted(model), k=50):
                    assert env._native.get(k) == model[k]

    def test_record_ends_exactly_at_file_end(self, tmp_path):
        """An overflow value whose DATA ends flush at the final byte of the
        file — the off-by-one case for the readers' mmap bounds checks.
        Our writer allocates leaf/root pages after overflow chains, so the
        layout is built by relocating pages: [m0 m1 ov ov ov leaf] ->
        [m0 m1 leaf ov ov ov] with the node pointer and meta root patched
        (real liblmdb produces such layouts via freelist reuse)."""
        import struct

        from tpgsr_tpu.data.lmdb import PAGEHDRSZ

        psize = 4096
        exact = 3 * psize - PAGEHDRSZ  # fills its 3 overflow pages exactly
        write_lmdb(str(tmp_path), [(b"a", b"s"), (b"zz", b"E" * exact)],
                   psize=psize)
        path = str(tmp_path / "data.mdb")
        buf = bytearray(open(path, "rb").read())
        assert len(buf) == 6 * psize  # metas, ov x3 (pages 2-4), leaf (5)

        def page(i):
            return buf[i * psize : (i + 1) * psize]

        new = buf[: 2 * psize] + page(5) + page(2) + page(3) + page(4)
        # repage headers: mp_pgno is the first u64 — but ONLY the leaf and
        # the overflow chain HEAD have headers; continuation overflow pages
        # are raw value bytes
        for pgno in (2, 3):
            struct.pack_into("<Q", new, pgno * psize, pgno)
        # leaf (now page 2): point the F_BIGDATA node for b"zz" at page 3
        off = 2 * psize
        lower = struct.unpack_from("<H", new, off + 12)[0]
        patched = False
        for i in range((lower - PAGEHDRSZ) // 2):
            noff = off + struct.unpack_from("<H", new, off + PAGEHDRSZ + 2 * i)[0]
            nfl = struct.unpack_from("<H", new, noff + 4)[0]
            ks = struct.unpack_from("<H", new, noff + 6)[0]
            if nfl & 0x01 and bytes(new[noff + 8 : noff + 8 + ks]) == b"zz":
                struct.pack_into("<Q", new, noff + 8 + ks, 3)
                patched = True
        assert patched
        # both metas: main root 5 -> 2 (md_root is the last u64 of MDB_db)
        for moff in (0, psize):
            # PAGEHDRSZ + meta prefix (24) + FREE_DBI (48) -> MAIN_DBI
            base = moff + PAGEHDRSZ + 24 + 48
            assert struct.unpack_from("<Q", new, base + 40)[0] == 5
            struct.pack_into("<Q", new, base + 40, 2)
        open(path, "wb").write(bytes(new))

        with LMDBReader(str(tmp_path)) as env:
            assert env.get(b"zz") == b"E" * exact  # read ends AT the mmap end
            assert env.get(b"a") == b"s"
            if env._native is not None:
                assert env._native.get(b"zz") == b"E" * exact

    @pytest.mark.parametrize("damage", ["zero_magic", "garbage", "truncate_half"])
    def test_torn_final_meta_falls_back_to_previous_commit(self, damage, tmp_path):
        """Crash-torn final meta: liblmdb recovers by using the OTHER meta
        (highest VALID txnid).  Tear the newest meta three ways; the reader
        must serve the previous commit's consistent snapshot."""
        from tpgsr_tpu.data.lmdb import append_lmdb

        write_lmdb(str(tmp_path), [(b"k1", b"v1"), (b"k2", b"v2")])
        append_lmdb(str(tmp_path), [(b"k2", b"v2b"), (b"k3", b"v3")])
        path = str(tmp_path / "data.mdb")
        with LMDBReader(str(tmp_path)) as env:
            psize = env.psize
            newest_slot = env.txnid % 2  # append wrote the stale slot
            assert env.get(b"k3") == b"v3"

        buf = bytearray(open(path, "rb").read())
        off = newest_slot * psize
        rnd = random.Random(1)
        if damage == "zero_magic":
            buf[off + 16 : off + 16 + 4] = b"\x00" * 4
        elif damage == "garbage":
            buf[off : off + psize] = bytes(rnd.getrandbits(8) for _ in range(psize))
        else:  # torn write: only half the meta page made it to disk
            half = off + psize // 2
            buf[off + 16 : half] = bytes(rnd.getrandbits(8) for _ in range(half - off - 16))
        open(path, "wb").write(bytes(buf))

        with LMDBReader(str(tmp_path)) as env:
            # previous commit's snapshot: k1/k2 original values, no k3
            assert env.get(b"k1") == b"v1"
            assert env.get(b"k2") == b"v2"
            assert env.get(b"k3") is None
