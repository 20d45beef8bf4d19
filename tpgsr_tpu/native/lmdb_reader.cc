// Native LMDB point-lookup engine (read-only, zero-copy).
//
// The reference reads TextZoom through liblmdb's C B+tree walk
// (dataset/dataset.py:104-149 via the lmdb extension); our Python reader
// (tpgsr_tpu/data/lmdb.py) re-implements the on-disk format but pays
// Python-interpreter cost per page hop.  This file is the C++ equivalent
// of liblmdb's mdb_get() hot path for the layouts our reader supports:
// meta-pair txnid selection, branch/leaf memcmp binary search, F_BIGDATA
// overflow pages.  Exposed via a minimal C ABI consumed with ctypes
// (tpgsr_tpu/native/__init__.py) — no pybind11 in this environment.
//
// Values are returned as pointers INTO the mmap (zero copy); callers copy
// before the handle is closed.  Thread-safe for concurrent gets (the mmap
// is immutable; no shared mutable state after open).
//
// Build: g++ -O2 -shared -fPIC -o liblmdb_native.so lmdb_reader.cc
// (tpgsr_tpu.native builds it on demand and caches the .so).

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0xBEEFC0DE;
constexpr uint32_t kVersion = 1;
constexpr uint16_t kPBranch = 0x01;
constexpr uint16_t kPLeaf = 0x02;
constexpr uint16_t kPOverflow = 0x04;
constexpr uint16_t kFBigData = 0x01;
constexpr size_t kPageHdr = 16;
constexpr uint64_t kPInvalid = ~0ull;

template <typename T>
T ld(const uint8_t* p) {
  T v;
  std::memcpy(&v, p, sizeof(T));  // unaligned-safe little-endian load
  return v;
}

struct Env {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t size = 0;
  uint64_t psize = 0;
  uint64_t root = kPInvalid;
  uint64_t entries = 0;
};

struct Meta {
  bool ok = false;
  uint64_t psize = 0, root = kPInvalid, entries = 0, txnid = 0;
};

Meta read_meta(const uint8_t* base, size_t size, uint64_t off) {
  Meta m;
  if (off + kPageHdr + 24 + 2 * 48 + 16 > size) return m;
  const uint8_t* p = base + off + kPageHdr;
  if (ld<uint32_t>(p) != kMagic || ld<uint32_t>(p + 4) != kVersion) return m;
  const uint8_t* free_db = p + 24;
  const uint8_t* main_db = free_db + 48;
  m.psize = ld<uint32_t>(free_db);            // md_pad of FREE_DBI
  m.entries = ld<uint64_t>(main_db + 32);
  m.root = ld<uint64_t>(main_db + 40);
  m.txnid = ld<uint64_t>(main_db + 48 + 8);   // after both DBs: last_pg, txnid
  m.ok = true;
  return m;
}

}  // namespace

extern "C" {

void* lmdb_native_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < (long)kPageHdr) {
    ::close(fd);
    return nullptr;
  }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (map == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  const uint8_t* base = static_cast<const uint8_t*>(map);
  Meta m0 = read_meta(base, st.st_size, 0);
  uint64_t psize = m0.ok ? m0.psize : 4096;
  Meta m1 = read_meta(base, st.st_size, psize);
  Meta best;
  if (m0.ok && (!m1.ok || m0.txnid >= m1.txnid)) best = m0;
  else if (m1.ok) best = m1;
  if (!best.ok) {
    munmap(map, st.st_size);
    ::close(fd);
    return nullptr;
  }
  Env* env = new Env;
  env->fd = fd;
  env->map = base;
  env->size = st.st_size;
  env->psize = best.psize;
  env->root = best.root;
  env->entries = best.entries;
  return env;
}

unsigned long long lmdb_native_entries(void* h) {
  return static_cast<Env*>(h)->entries;
}

// Returns the value length, writing its mmap address to *val_out;
// -1: not found; -2: corrupt page structure.
long long lmdb_native_get(void* h, const uint8_t* key, size_t klen,
                          const uint8_t** val_out) {
  const Env* env = static_cast<const Env*>(h);
  if (env->root == kPInvalid) return -1;
  uint64_t pgno = env->root;
  for (;;) {
    if ((pgno + 1) * env->psize > env->size) return -2;
    const uint8_t* page = env->map + pgno * env->psize;
    uint16_t flags = ld<uint16_t>(page + 10);
    int n = (ld<uint16_t>(page + 12) - (int)kPageHdr) / 2;
    if (flags & kPBranch) {
      // descend to the rightmost child with key <= target (node 0 = -inf)
      int lo = 1, hi = n - 1, pick = 0;
      while (lo <= hi) {
        int mid = (lo + hi) / 2;
        const uint8_t* node = page + ld<uint16_t>(page + kPageHdr + 2 * mid);
        uint16_t ksize = ld<uint16_t>(node + 6);
        int c = std::memcmp(node + 8, key, ksize < klen ? ksize : klen);
        if (c == 0) c = (ksize < klen) ? -1 : (ksize > klen ? 1 : 0);
        if (c <= 0) {
          pick = mid;
          lo = mid + 1;
        } else {
          hi = mid - 1;
        }
      }
      const uint8_t* node = page + ld<uint16_t>(page + kPageHdr + 2 * pick);
      pgno = (uint64_t)ld<uint16_t>(node) | ((uint64_t)ld<uint16_t>(node + 2) << 16) |
             ((uint64_t)ld<uint16_t>(node + 4) << 32);
    } else if (flags & kPLeaf) {
      int lo = 0, hi = n - 1;
      while (lo <= hi) {
        int mid = (lo + hi) / 2;
        const uint8_t* node = page + ld<uint16_t>(page + kPageHdr + 2 * mid);
        uint16_t ksize = ld<uint16_t>(node + 6);
        int c = std::memcmp(node + 8, key, ksize < klen ? ksize : klen);
        if (c == 0) c = (ksize < klen) ? -1 : (ksize > klen ? 1 : 0);
        if (c == 0) {
          uint64_t dsize =
              (uint64_t)ld<uint16_t>(node) | ((uint64_t)ld<uint16_t>(node + 2) << 16);
          uint16_t nflags = ld<uint16_t>(node + 4);
          if (nflags & kFBigData) {
            uint64_t ov = ld<uint64_t>(node + 8 + ksize);
            if ((ov + 1) * env->psize > env->size) return -2;
            const uint8_t* opage = env->map + ov * env->psize;
            if (!(ld<uint16_t>(opage + 10) & kPOverflow)) return -2;
            // dsize may span MULTIPLE overflow pages: bound the whole value
            // (not just the first page) or a truncated/corrupt file makes
            // the caller's copy read past the mmap and SIGSEGV the worker
            if (ov * env->psize + kPageHdr + dsize > env->size) return -2;
            *val_out = opage + kPageHdr;
          } else {
            // inline values must stay within their leaf page
            if (node + 8 + ksize + dsize > page + env->psize) return -2;
            *val_out = node + 8 + ksize;
          }
          return (long long)dsize;
        }
        if (c < 0) lo = mid + 1;
        else hi = mid - 1;
      }
      return -1;
    } else {
      return -2;
    }
  }
}

void lmdb_native_close(void* h) {
  Env* env = static_cast<Env*>(h);
  munmap(const_cast<uint8_t*>(env->map), env->size);
  ::close(env->fd);
  delete env;
}

}  // extern "C"
