"""Self-contained LMDB (Lightning Memory-Mapped Database) reader/writer.

The reference reads TextZoom from LMDB via the ``lmdb`` C extension
(dataset/dataset.py:104-149) and builds datasets with ``createDataset``
(dataset/create_lmdb.py).  This environment has no ``lmdb`` module and no
liblmdb, so we implement the on-disk format directly:

* ``LMDBReader``: zero-copy mmap reader — parses the freshest meta page,
  walks the main B+tree for point lookups (``get``) and in-order scans
  (``items``); supports values in overflow pages.
* ``write_lmdb``: builds a valid single-commit LMDB file (data.mdb) from
  sorted key/value pairs — bottom-up B+tree packing with overflow pages for
  large values, two meta pages.  Used by the dataset-creation tools and the
  synthetic test fixtures.

Format reference: LMDB's public ``mdb.c``/``lmdb.h`` layout (BSD-licensed):
meta page magic 0xBEEFC0DE, version 1, 16-byte page headers, uint16 node
offset arrays growing up from the header while nodes grow down from the end
of the page.  Page size is recorded in the FREE_DBI's ``md_pad`` field.
"""

from __future__ import annotations

import mmap
import os
import struct
from typing import Dict, Iterable, Iterator, List, Optional, Tuple

MDB_MAGIC = 0xBEEFC0DE
MDB_DATA_VERSION = 1

# page flags
P_BRANCH = 0x01
P_LEAF = 0x02
P_OVERFLOW = 0x04
P_META = 0x08
P_LEAF2 = 0x20

# node flags
F_BIGDATA = 0x01
F_SUBDATA = 0x02
F_DUPDATA = 0x04

PAGEHDRSZ = 16
P_INVALID = 0xFFFFFFFFFFFFFFFF

# MDB_db struct: md_pad(u32) md_flags(u16) md_depth(u16) md_branch_pages(u64)
# md_leaf_pages(u64) md_overflow_pages(u64) md_entries(u64) md_root(u64)
_DB_FMT = "<IHHQQQQQ"
_DB_SIZE = struct.calcsize(_DB_FMT)  # 48

# MDB_meta prefix: mm_magic(u32) mm_version(u32) mm_address(u64) mm_mapsize(u64)
_META_PREFIX_FMT = "<IIQQ"
_META_PREFIX_SIZE = struct.calcsize(_META_PREFIX_FMT)  # 24


class LMDBError(Exception):
    pass


def _data_file(path: str) -> str:
    if os.path.isdir(path):
        return os.path.join(path, "data.mdb")
    return path


class LMDBReader:
    """Read-only LMDB environment over mmap.

    Usage::

        env = LMDBReader("/path/to/textzoom/train1")
        n = int(env.get(b"num-samples"))
        img = env.get(b"image_hr-%09d" % 1)
    """

    def __init__(self, path: str, meta_slot: Optional[int] = None):
        """``meta_slot`` (0/1) forces a specific meta page — reads the older
        MVCC snapshot of a multi-commit database; default picks the freshest
        (highest txnid), like liblmdb."""
        self.path = _data_file(path)
        self._meta_slot = meta_slot
        self._f = open(self.path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        self._parse_meta()
        self._native = self._open_native()

    def _open_native(self):
        """C++ point-lookup engine (tpgsr_tpu/native/lmdb_reader.cc) — the
        liblmdb-style native hot path; None => pure-Python fallback.  Only
        used for the default (freshest-meta) view."""
        if self._meta_slot is not None:
            return None
        try:
            from tpgsr_tpu.native import NativeLMDB

            return NativeLMDB(self.path)
        except Exception:
            return None

    # picklable for multi-process DataLoader workers: ship only the path and
    # reopen the mmap in the child (fork inherits it anyway; this covers
    # spawn and explicit pickling)
    def __getstate__(self):
        return {"path": self.path, "meta_slot": self._meta_slot}

    def __setstate__(self, state):
        self.path = state["path"]
        self._meta_slot = state.get("meta_slot")
        self._f = open(self.path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        self._parse_meta()
        self._native = self._open_native()

    # -- meta --------------------------------------------------------------

    def _read_meta(self, off: int) -> Optional[dict]:
        m = self._mm
        try:
            magic, version, _addr, mapsize = struct.unpack_from(_META_PREFIX_FMT, m, off)
        except struct.error:
            return None
        if magic != MDB_MAGIC or version != MDB_DATA_VERSION:
            return None
        free_db = struct.unpack_from(_DB_FMT, m, off + _META_PREFIX_SIZE)
        main_db = struct.unpack_from(_DB_FMT, m, off + _META_PREFIX_SIZE + _DB_SIZE)
        last_pg, txnid = struct.unpack_from("<QQ", m, off + _META_PREFIX_SIZE + 2 * _DB_SIZE)
        return {
            "mapsize": mapsize,
            "psize": free_db[0],  # page size lives in FREE_DBI md_pad
            "free": free_db,
            "main": main_db,
            "last_pg": last_pg,
            "txnid": txnid,
        }

    def _parse_meta(self):
        # meta 0 at page 0, meta 1 at page 1; page size unknown until meta is
        # read, so probe common page sizes for the second meta.
        meta0 = self._read_meta(PAGEHDRSZ)
        psize = meta0["psize"] if meta0 else 4096
        meta1 = self._read_meta(psize + PAGEHDRSZ)
        metas = [meta0, meta1]
        if self._meta_slot is not None:
            meta = metas[self._meta_slot]
            if meta is None:
                raise LMDBError(f"{self.path}: meta slot {self._meta_slot} invalid")
        else:
            valid = [mt for mt in metas if mt]
            if not valid:
                raise LMDBError(f"{self.path}: no valid LMDB meta page")
            # liblmdb picks the meta with the highest committed txnid
            meta = max(valid, key=lambda mt: mt["txnid"])
        self.psize = meta["psize"]
        self.txnid = meta["txnid"]
        self.last_pg = meta["last_pg"]
        (_pad, _flags, self.depth, _bp, _lp, _op, self.entries, self.root) = meta["main"]
        self.free_root = meta["free"][7]
        self.free_entries = meta["free"][6]

    # -- page / node parsing -----------------------------------------------

    def _page(self, pgno: int) -> Tuple[int, int]:
        """Return (offset, flags) for a page."""
        off = pgno * self.psize
        flags = struct.unpack_from("<H", self._mm, off + 10)[0]
        return off, flags

    def _num_keys(self, off: int) -> int:
        lower = struct.unpack_from("<H", self._mm, off + 12)[0]
        return (lower - PAGEHDRSZ) // 2

    def _node_off(self, page_off: int, i: int) -> int:
        ptr = struct.unpack_from("<H", self._mm, page_off + PAGEHDRSZ + 2 * i)[0]
        return page_off + ptr

    def _branch_key_child(self, page_off: int, i: int) -> Tuple[bytes, int]:
        off = self._node_off(page_off, i)
        lo, hi, fl, ksize = struct.unpack_from("<HHHH", self._mm, off)
        pgno = lo | (hi << 16) | (fl << 32)
        key = bytes(self._mm[off + 8 : off + 8 + ksize])
        return key, pgno

    def _leaf_kv(self, page_off: int, i: int) -> Tuple[bytes, bytes]:
        off = self._node_off(page_off, i)
        lo, hi, fl, ksize = struct.unpack_from("<HHHH", self._mm, off)
        dsize = lo | (hi << 16)
        key = bytes(self._mm[off + 8 : off + 8 + ksize])
        dstart = off + 8 + ksize
        if fl & F_BIGDATA:
            ov_pgno = struct.unpack_from("<Q", self._mm, dstart)[0]
            ov_off, ov_flags = self._page(ov_pgno)
            if not ov_flags & P_OVERFLOW:
                raise LMDBError("expected overflow page")
            data = bytes(self._mm[ov_off + PAGEHDRSZ : ov_off + PAGEHDRSZ + dsize])
        else:
            data = bytes(self._mm[dstart : dstart + dsize])
        return key, data

    # -- public API ----------------------------------------------------------

    def __len__(self) -> int:
        return self.entries

    def get(self, key: bytes) -> Optional[bytes]:
        if self._native is not None:
            return self._native.get(key)
        return self._get_py(key)

    def _get_py(self, key: bytes) -> Optional[bytes]:
        if self.root == P_INVALID:
            return None
        pgno = self.root
        while True:
            off, flags = self._page(pgno)
            n = self._num_keys(off)
            if flags & P_BRANCH:
                # branch: descend to the rightmost child whose key <= target;
                # node 0's key is implicit -inf.
                lo_i, hi_i, pick = 1, n - 1, 0
                while lo_i <= hi_i:
                    mid = (lo_i + hi_i) // 2
                    k, _ = self._branch_key_child(off, mid)
                    if k <= key:
                        pick = mid
                        lo_i = mid + 1
                    else:
                        hi_i = mid - 1
                _, pgno = self._branch_key_child(off, pick)
            elif flags & P_LEAF:
                lo_i, hi_i = 0, n - 1
                while lo_i <= hi_i:
                    mid = (lo_i + hi_i) // 2
                    k, v = self._leaf_kv(off, mid)
                    if k == key:
                        return v
                    if k < key:
                        lo_i = mid + 1
                    else:
                        hi_i = mid - 1
                return None
            else:
                raise LMDBError(f"unexpected page flags {flags:#x}")

    def items(self, root: Optional[int] = None) -> Iterator[Tuple[bytes, bytes]]:
        """In-order scan of all key/value pairs (of the main DB by default)."""
        root = self.root if root is None else root
        if root == P_INVALID:
            return
        stack: List[Tuple[int, int]] = [(root, 0)]
        while stack:
            pgno, idx = stack.pop()
            off, flags = self._page(pgno)
            n = self._num_keys(off)
            if flags & P_LEAF:
                for i in range(n):
                    yield self._leaf_kv(off, i)
            else:
                if idx < n:
                    stack.append((pgno, idx + 1))
                    _, child = self._branch_key_child(off, idx)
                    stack.append((child, 0))

    def keys(self) -> Iterator[bytes]:
        for k, _ in self.items():
            yield k

    def freelist(self) -> Dict[int, List[int]]:
        """FREE_DBI contents: {freeing_txnid: [pgno, ...]}.

        liblmdb keys the freelist by the txnid that freed the pages (native
        little-endian u64, MDB_INTEGERKEY) with MDB_IDL values: a u64 count
        followed by that many pgnos in descending order (mdb.c freelist /
        midl.c layout)."""
        out: Dict[int, List[int]] = {}
        for k, v in self.items(root=self.free_root):
            txn = struct.unpack("<Q", k)[0]
            count = struct.unpack_from("<Q", v, 0)[0]
            out[txn] = list(struct.unpack_from(f"<{count}Q", v, 8))
        return out

    def tree_pages(self, root: Optional[int] = None) -> List[int]:
        """All page numbers reachable from ``root`` (branch/leaf/overflow) —
        the copy-on-write append path frees exactly these."""
        root = self.root if root is None else root
        if root == P_INVALID:
            return []
        pages: List[int] = []
        stack = [root]
        while stack:
            pgno = stack.pop()
            pages.append(pgno)
            off, flags = self._page(pgno)
            n = self._num_keys(off)
            if flags & P_BRANCH:
                for i in range(n):
                    _, child = self._branch_key_child(off, i)
                    stack.append(child)
            elif flags & P_LEAF:
                for i in range(n):
                    node_off = self._node_off(off, i)
                    lo, hi, fl, ksize = struct.unpack_from("<HHHH", self._mm, node_off)
                    if fl & F_BIGDATA:
                        ov_pgno = struct.unpack_from(
                            "<Q", self._mm, node_off + 8 + ksize
                        )[0]
                        ov_off = ov_pgno * self.psize
                        npages = struct.unpack_from("<I", self._mm, ov_off + 12)[0]
                        pages.extend(range(ov_pgno, ov_pgno + npages))
        return pages

    def close(self):
        if self._native is not None:
            self._native.close()
            self._native = None
        self._mm.close()
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def _even(n: int) -> int:
    return n + (n & 1)


class _PageBuilder:
    """Accumulates pages; page 0/1 reserved for metas.

    ``free_pool``: page numbers reclaimable from the freelist (descending,
    like liblmdb's me_pghead).  Single-page allocations consume the pool
    from its END (smallest pgno first, mdb_page_alloc); multi-page overflow
    allocations search it for a consecutive run, else extend the file.
    """

    def __init__(self, psize: int, next_pgno: int = 2, free_pool: Optional[List[int]] = None):
        self.psize = psize
        self.pages: Dict[int, bytes] = {}
        self.next_pgno = next_pgno
        self.free_pool = sorted(free_pool or [], reverse=True)
        self.used_from_pool: List[int] = []
        self.n_branch = 0
        self.n_leaf = 0
        self.n_overflow = 0

    def alloc(self, count: int = 1) -> int:
        if count == 1 and self.free_pool:
            pgno = self.free_pool.pop()
            self.used_from_pool.append(pgno)
            return pgno
        if count > 1 and self.free_pool:
            # search for `count` consecutive pgnos in the (descending) pool
            asc = self.free_pool[::-1]
            for i in range(len(asc) - count + 1):
                if asc[i + count - 1] == asc[i] + count - 1:
                    run = asc[i : i + count]
                    for p in run:
                        self.free_pool.remove(p)
                    self.used_from_pool.extend(run)
                    return run[0]
        pgno = self.next_pgno
        self.next_pgno += count
        return pgno

    def emit(self, pgno: int, flags: int, nodes: List[bytes]) -> None:
        """Write a branch/leaf page from pre-encoded nodes (grow-down layout)."""
        psize = self.psize
        buf = bytearray(psize)
        upper = psize
        ptrs = []
        for node in nodes:
            upper -= _even(len(node))
            buf[upper : upper + len(node)] = node
            ptrs.append(upper)
        lower = PAGEHDRSZ + 2 * len(nodes)
        assert lower <= upper, "page overflow"
        struct.pack_into("<QHHHH", buf, 0, pgno, 0, flags, lower, upper)
        for i, p in enumerate(ptrs):
            struct.pack_into("<H", buf, PAGEHDRSZ + 2 * i, p)
        self.pages[pgno] = bytes(buf)
        if flags & P_BRANCH:
            self.n_branch += 1
        elif flags & P_LEAF:
            self.n_leaf += 1

    def emit_overflow(self, data: bytes) -> int:
        psize = self.psize
        npages = (PAGEHDRSZ + len(data) + psize - 1) // psize
        pgno = self.alloc(npages)
        blob = bytearray(npages * psize)
        struct.pack_into("<QHHI", blob, 0, pgno, 0, P_OVERFLOW, npages)
        blob[PAGEHDRSZ : PAGEHDRSZ + len(data)] = data
        # store as npages consecutive page images
        for i in range(npages):
            self.pages[pgno + i] = bytes(blob[i * psize : (i + 1) * psize])
        self.n_overflow += npages
        return pgno


def _leaf_node(key: bytes, value: bytes, bigdata_pgno: Optional[int]) -> bytes:
    if bigdata_pgno is not None:
        head = struct.pack(
            "<HHHH", len(value) & 0xFFFF, (len(value) >> 16) & 0xFFFF, F_BIGDATA, len(key)
        )
        return head + key + struct.pack("<Q", bigdata_pgno)
    head = struct.pack("<HHHH", len(value) & 0xFFFF, (len(value) >> 16) & 0xFFFF, 0, len(key))
    return head + key + value


def _branch_node(key: bytes, child_pgno: int) -> bytes:
    head = struct.pack(
        "<HHHH",
        child_pgno & 0xFFFF,
        (child_pgno >> 16) & 0xFFFF,
        (child_pgno >> 32) & 0xFFFF,
        len(key),
    )
    return head + key


def _build_tree(
    builder: _PageBuilder, pairs: List[Tuple[bytes, bytes]], presorted: bool = False
) -> Tuple[int, int, Tuple[int, int, int]]:
    """Pack sorted pairs into a B+tree; returns (root, depth, (n_branch,
    n_leaf, n_overflow) counts for THIS tree)."""
    b0, l0, o0 = builder.n_branch, builder.n_leaf, builder.n_overflow
    if not presorted:
        pairs = sorted(pairs, key=lambda kv: kv[0])
    nodemax = ((builder.psize - PAGEHDRSZ) // 2) & ~1  # mdb_env_init me_nodemax
    psize = builder.psize

    # ---- leaves ----
    leaf_entries: List[Tuple[bytes, int]] = []  # (first_key, pgno)
    cur_nodes: List[bytes] = []
    cur_first: Optional[bytes] = None
    cur_size = PAGEHDRSZ

    def flush_leaf():
        nonlocal cur_nodes, cur_first, cur_size
        if cur_nodes:
            pgno = builder.alloc()
            builder.emit(pgno, P_LEAF, cur_nodes)
            leaf_entries.append((cur_first, pgno))
        cur_nodes, cur_first, cur_size = [], None, PAGEHDRSZ

    for key, value in pairs:
        if 8 + len(key) + len(value) > nodemax:
            ov_pgno = builder.emit_overflow(value)
            node = _leaf_node(key, value, ov_pgno)
        else:
            node = _leaf_node(key, value, None)
        need = _even(len(node)) + 2  # node + ptr slot
        if cur_size + need > psize:
            flush_leaf()
        if cur_first is None:
            cur_first = key
        cur_nodes.append(node)
        cur_size += need
    flush_leaf()

    # ---- branches (bottom-up) ----
    level = leaf_entries
    depth = 1
    while len(level) > 1:
        next_level: List[Tuple[bytes, int]] = []
        nodes: List[bytes] = []
        first_key: Optional[bytes] = None
        size = PAGEHDRSZ

        def flush_branch():
            nonlocal nodes, first_key, size
            if nodes:
                pgno = builder.alloc()
                builder.emit(pgno, P_BRANCH, nodes)
                next_level.append((first_key, pgno))
            nodes, first_key, size = [], None, PAGEHDRSZ

        for k, child in level:
            # LMDB stores an empty key for each branch page's first node
            node_key = b"" if not nodes else k
            node = _branch_node(node_key, child)
            need = _even(len(node)) + 2
            if size + need > psize:
                flush_branch()
                node = _branch_node(b"", child)
                need = _even(len(node)) + 2
            if first_key is None:
                first_key = k
            nodes.append(node)
            size += need
        flush_branch()
        level = next_level
        depth += 1

    root = level[0][1] if level else P_INVALID
    if not pairs:
        depth = 0
    return root, depth, (
        builder.n_branch - b0, builder.n_leaf - l0, builder.n_overflow - o0
    )


def _meta_page_bytes(
    psize: int,
    pgno: int,
    txnid: int,
    mapsize: int,
    last_pg: int,
    main: Tuple[int, int, Tuple[int, int, int], int],  # root, depth, counts, entries
    free: Tuple[int, int, Tuple[int, int, int], int] = (P_INVALID, 0, (0, 0, 0), 0),
) -> bytes:
    buf = bytearray(psize)
    struct.pack_into("<QHHHH", buf, 0, pgno, 0, P_META, 0, 0)
    off = PAGEHDRSZ
    struct.pack_into(_META_PREFIX_FMT, buf, off, MDB_MAGIC, MDB_DATA_VERSION, 0, mapsize)
    off += _META_PREFIX_SIZE
    f_root, f_depth, (f_b, f_l, f_o), f_entries = free
    # FREE_DBI: md_pad carries the page size
    struct.pack_into(_DB_FMT, buf, off, psize, 0, f_depth, f_b, f_l, f_o, f_entries, f_root)
    off += _DB_SIZE
    m_root, m_depth, (m_b, m_l, m_o), m_entries = main
    struct.pack_into(_DB_FMT, buf, off, 0, 0, m_depth, m_b, m_l, m_o, m_entries, m_root)
    off += _DB_SIZE
    struct.pack_into("<QQ", buf, off, last_pg, txnid)
    return bytes(buf)


def write_lmdb(
    path: str,
    items: Iterable[Tuple[bytes, bytes]],
    psize: int = 4096,
    map_extra: int = 0,
) -> str:
    """Write ``items`` into ``<path>/data.mdb`` as a valid LMDB database.

    Keys are sorted bytewise (LMDB's default memcmp order).  Returns the data
    file path.  Single commit: both metas describe the same tree (txnid 0/1),
    empty freelist — the layout liblmdb produces for a freshly created env.
    Use :func:`append_lmdb` for further commits.
    """
    pairs = sorted(items, key=lambda kv: kv[0])
    for k, _ in pairs:
        if not (0 < len(k) <= 511):
            raise LMDBError(f"invalid key length {len(k)}")

    builder = _PageBuilder(psize)
    root, depth, counts = _build_tree(builder, pairs, presorted=True)

    last_pg = builder.next_pgno - 1
    mapsize = max(builder.next_pgno * psize + map_extra, 1 << 20)
    main = (root, depth, counts, len(pairs))

    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, "data.mdb")
    with open(out, "wb") as f:
        f.write(_meta_page_bytes(psize, 0, 0, mapsize, last_pg, main))
        f.write(_meta_page_bytes(psize, 1, 1, mapsize, last_pg, main))
        for pgno in range(2, builder.next_pgno):
            f.write(builder.pages[pgno])
    return out


def append_lmdb(path: str, items: Iterable[Tuple[bytes, bytes]]) -> str:
    """Commit ``items`` into an existing database copy-on-write, like a
    liblmdb write transaction:

    * new/updated tree pages are allocated from the previous freelist first
      (smallest pgno first, consecutive-run search for overflow pages), then
      by extending the file;
    * every page of the old main tree and old freelist tree is recorded in
      the new FREE_DBI under the committing txnid (MDB_IDL format: u64 count
      + descending pgnos, little-endian u64 txnid keys);
    * the new meta overwrites the STALE meta slot (lower txnid) and the old
      snapshot stays readable via ``LMDBReader(path, meta_slot=...)`` — the
      MVCC double-buffering real multi-commit files exhibit.

    This reproduces the structural features of real liblmdb databases
    (dataset/dataset.py:104-149 reads TextZoom ones): both metas live with
    different txnids, a non-empty freelist tree, reused non-contiguous data
    pages.  (True byte-for-byte liblmdb output can't be generated here:
    neither the lmdb module nor liblmdb exists in this environment.)
    """
    data_file = _data_file(path)
    with LMDBReader(path) as env:
        psize = env.psize
        txnid = env.txnid
        merged = dict(env.items())
        old_main_pages = env.tree_pages()
        old_free_pages = env.tree_pages(env.free_root)
        old_freelist = env.freelist()
        next_pgno = env.last_pg + 1
        m0 = env._read_meta(PAGEHDRSZ)
        m1 = env._read_meta(psize + PAGEHDRSZ)
        t0 = m0["txnid"] if m0 else -1
        t1 = m1["txnid"] if m1 else -1
        stale_slot = 0 if t0 <= t1 else 1  # overwrite the older meta
        mapsize_old = (m0 or m1)["mapsize"]

    merged.update(items)
    pairs = sorted(merged.items(), key=lambda kv: kv[0])
    for k, _ in pairs:
        if not (0 < len(k) <= 511):
            raise LMDBError(f"invalid key length {len(k)}")

    # reclaimable: pages freed by transactions older than the live one
    pool = sorted({p for pgs in old_freelist.values() for p in pgs})
    builder = _PageBuilder(psize, next_pgno=next_pgno, free_pool=pool)
    root, depth, counts = _build_tree(builder, pairs, presorted=True)

    # freelist for the new txn: unconsumed older entries + what this commit
    # frees (the whole previous main tree + previous freelist tree, since
    # both were rewritten copy-on-write)
    consumed = set(builder.used_from_pool)
    # The freelist TREE below must not allocate from the pool: `consumed`
    # is already baked into its contents, so any pool page it took would be
    # live in the committed freelist tree yet still listed as free — a later
    # commit would then reuse a live page (observed as main-tree/stale-
    # snapshot corruption after ~10 randomized commits).  Allocating the
    # freelist tree by file extension side-steps the fixed-point problem
    # liblmdb solves with me_pghead accounting; its pages are freed into the
    # NEXT commit's freelist like any other old-tree page, so nothing leaks.
    builder.free_pool = []
    new_freelist: Dict[int, List[int]] = {
        t: kept
        for t, pgs in old_freelist.items()
        if (kept := [p for p in pgs if p not in consumed])
    }
    freed_now = sorted(set(old_main_pages) | set(old_free_pages), reverse=True)
    if freed_now:
        new_freelist[txnid + 1] = freed_now
    free_pairs = [
        (struct.pack("<Q", t), struct.pack(f"<{len(pgs) + 1}Q", len(pgs), *sorted(pgs, reverse=True)))
        for t, pgs in sorted(new_freelist.items())
    ]
    f_root, f_depth, f_counts = _build_tree(builder, free_pairs, presorted=True)

    last_pg = builder.next_pgno - 1
    mapsize = max(mapsize_old, builder.next_pgno * psize)
    meta = _meta_page_bytes(
        psize, stale_slot, txnid + 1, mapsize, last_pg,
        (root, depth, counts, len(pairs)),
        (f_root, f_depth, f_counts, len(free_pairs)),
    )

    with open(data_file, "r+b") as f:
        f.seek(0, os.SEEK_END)
        size = f.tell()
        if builder.next_pgno * psize > size:
            f.truncate(builder.next_pgno * psize)
        for pgno, page in builder.pages.items():
            f.seek(pgno * psize)
            f.write(page)
        f.seek(stale_slot * psize)
        f.write(meta)
    return data_file
