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

    def __init__(self, path: str):
        self.path = _data_file(path)
        self._f = open(self.path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        self._parse_meta()

    # picklable for multi-process DataLoader workers: ship only the path and
    # reopen the mmap in the child (fork inherits it anyway; this covers
    # spawn and explicit pickling)
    def __getstate__(self):
        return {"path": self.path}

    def __setstate__(self, state):
        self.path = state["path"]
        self._f = open(self.path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        self._parse_meta()

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
        metas = [mt for mt in (meta0, meta1) if mt]
        if not metas:
            raise LMDBError(f"{self.path}: no valid LMDB meta page")
        meta = max(metas, key=lambda mt: mt["txnid"])
        self.psize = meta["psize"]
        (_pad, _flags, self.depth, _bp, _lp, _op, self.entries, self.root) = meta["main"]

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

    def items(self) -> Iterator[Tuple[bytes, bytes]]:
        """In-order scan of all key/value pairs."""
        if self.root == P_INVALID:
            return
        stack: List[Tuple[int, int]] = [(self.root, 0)]
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

    def close(self):
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
    """Accumulates pages; page 0/1 reserved for metas."""

    def __init__(self, psize: int):
        self.psize = psize
        self.pages: Dict[int, bytes] = {}
        self.next_pgno = 2
        self.n_branch = 0
        self.n_leaf = 0
        self.n_overflow = 0

    def alloc(self, count: int = 1) -> int:
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


def write_lmdb(
    path: str,
    items: Iterable[Tuple[bytes, bytes]],
    psize: int = 4096,
    map_extra: int = 0,
) -> str:
    """Write ``items`` into ``<path>/data.mdb`` as a valid LMDB database.

    Keys are sorted bytewise (LMDB's default memcmp order).  Returns the data
    file path.
    """
    pairs = sorted(items, key=lambda kv: kv[0])
    for k, _ in pairs:
        if not (0 < len(k) <= 511):
            raise LMDBError(f"invalid key length {len(k)}")

    builder = _PageBuilder(psize)
    nodemax = ((psize - PAGEHDRSZ) // 2) & ~1  # mirror mdb_env_init me_nodemax

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

        for i, (k, child) in enumerate(level):
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

    # ---- metas ----
    last_pg = builder.next_pgno - 1
    file_pages = builder.next_pgno
    mapsize = max(file_pages * psize + map_extra, 1 << 20)

    def meta_page(pgno: int, txnid: int) -> bytes:
        buf = bytearray(psize)
        struct.pack_into("<QHHHH", buf, 0, pgno, 0, P_META, 0, 0)
        off = PAGEHDRSZ
        struct.pack_into(_META_PREFIX_FMT, buf, off, MDB_MAGIC, MDB_DATA_VERSION, 0, mapsize)
        off += _META_PREFIX_SIZE
        # FREE_DBI: md_pad carries page size; empty tree
        struct.pack_into(_DB_FMT, buf, off, psize, 0, 0, 0, 0, 0, 0, P_INVALID)
        off += _DB_SIZE
        # MAIN_DBI
        struct.pack_into(
            _DB_FMT,
            buf,
            off,
            0,
            0,
            depth,
            builder.n_branch,
            builder.n_leaf,
            builder.n_overflow,
            len(pairs),
            root,
        )
        off += _DB_SIZE
        struct.pack_into("<QQ", buf, off, last_pg, txnid)
        return bytes(buf)

    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, "data.mdb")
    with open(out, "wb") as f:
        f.write(meta_page(0, 0))
        f.write(meta_page(1, 1))
        for pgno in range(2, builder.next_pgno):
            f.write(builder.pages[pgno])
    return out
