// Parallel NPZ episode reader for the replay plane.
//
// The reference's data plane decodes episodes with numpy's single-threaded
// zlib path inside the training process (tools/replay.py:252-260). This
// native reader parses the ZIP container directly and inflates all .npy
// members with a worker-thread pool, releasing the Python GIL for the whole
// load. Used by genrl_tpu/data/native.py (ctypes) to accelerate episode
// ingest (DeviceReplay uploads, streaming refills, dataset scans).
//
// Robustness contract: every offset/length read from the (untrusted,
// possibly torn) file is validated against the file size before it is
// dereferenced; a corrupt episode returns an error (which replay.py turns
// into the numpy fallback / per-file skip) instead of crashing the trainer.
//
// Build: see native/build.sh  ->  libnpz_reader.so
//
// C ABI:
//   void* npz_open(const char* path)              -> handle (NULL on error)
//   int   npz_num_entries(void* h)
//   const char* npz_entry_name(void* h, int i)
//   const char* npz_entry_descr(void* h, int i)   -> npy dtype descr, e.g. "<f4"
//   int   npz_entry_ndim(void* h, int i)
//   long  npz_entry_dim(void* h, int i, int d)
//   long  npz_entry_nbytes(void* h, int i)
//   int   npz_read_all(void* h, char** out_ptrs, int n_threads)  -> 0 ok
//   void  npz_close(void* h)
//   const char* npz_last_error()

#include <zlib.h>

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// error string shared across the inflate worker threads
std::mutex g_error_mu;
std::string g_error;

void set_error(const std::string& msg) {
  std::lock_guard<std::mutex> lock(g_error_mu);
  g_error = msg;
}

struct Entry {
  std::string name;        // without .npy suffix
  std::string descr;       // npy dtype descr
  std::vector<long> shape;
  bool fortran = false;
  uint16_t method = 0;     // 0 = stored, 8 = deflate
  uint64_t comp_size = 0;
  uint64_t data_offset = 0;  // offset of the compressed payload in the file
  uint64_t raw_size = 0;     // decompressed .npy member size
  uint64_t header_len = 0;   // npy header bytes to skip
  uint64_t nbytes = 0;       // array payload bytes
};

struct Archive {
  std::string path;
  std::vector<Entry> entries;
  std::vector<char> file;  // whole archive in memory
};

// off/len window entirely inside the file?
bool in_file(const Archive& a, uint64_t off, uint64_t len) {
  uint64_t size = a.file.size();
  return off <= size && len <= size - off;
}

uint16_t rd16(const unsigned char* p) { return p[0] | (p[1] << 8); }
uint32_t rd32(const unsigned char* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | ((uint32_t)p[3] << 24);
}
uint64_t rd64(const unsigned char* p) {
  uint64_t v = 0;
  for (int i = 7; i >= 0; --i) v = (v << 8) | p[i];
  return v;
}

// Parse the npy header of a decompressed member prefix (`size` bytes
// available): returns payload offset and fills descr/shape/fortran. All
// lengths checked against the prefix size.
bool parse_npy_header(const char* buf, uint64_t size, Entry* e) {
  if (size < 12 || memcmp(buf, "\x93NUMPY", 6) != 0) {
    set_error("bad npy magic");
    return false;
  }
  unsigned major = (unsigned char)buf[6];
  uint64_t hlen, hstart;
  if (major == 1) {
    hlen = rd16((const unsigned char*)buf + 8);
    hstart = 10;
  } else {
    hlen = rd32((const unsigned char*)buf + 8);
    hstart = 12;
  }
  if (hstart + hlen > size) {
    set_error("npy header exceeds inflated prefix");
    return false;
  }
  std::string header(buf + hstart, buf + hstart + hlen);
  e->header_len = hstart + hlen;
  if (e->raw_size < e->header_len) {
    set_error("npy member smaller than its header");
    return false;
  }
  auto find_val = [&](const std::string& key) -> std::string {
    size_t k = header.find("'" + key + "'");
    if (k == std::string::npos) return "";
    size_t c = header.find(':', k);
    if (c == std::string::npos) return "";
    return header.substr(c + 1);
  };
  std::string d = find_val("descr");
  size_t q1 = d.find('\'');
  size_t q2 = q1 == std::string::npos ? std::string::npos : d.find('\'', q1 + 1);
  if (q2 == std::string::npos) {
    set_error("npy header missing descr");
    return false;
  }
  e->descr = d.substr(q1 + 1, q2 - q1 - 1);
  e->fortran = find_val("fortran_order").find("True") != std::string::npos;
  std::string s = find_val("shape");
  size_t p1 = s.find('(');
  size_t p2 = s.find(')');
  if (p1 == std::string::npos || p2 == std::string::npos || p2 < p1) {
    set_error("npy header missing shape");
    return false;
  }
  std::string dims = s.substr(p1 + 1, p2 - p1 - 1);
  e->shape.clear();
  long cur = -1;
  for (char ch : dims) {
    if (ch >= '0' && ch <= '9') {
      cur = (cur < 0 ? 0 : cur) * 10 + (ch - '0');
    } else if (cur >= 0) {
      e->shape.push_back(cur);
      cur = -1;
    }
  }
  if (cur >= 0) e->shape.push_back(cur);
  e->nbytes = e->raw_size - e->header_len;
  return true;
}

// Inflate up to out_cap bytes of a deflate member into *out, feeding input
// and output in uInt-safe chunks (members >4 GB inflate correctly).
bool inflate_prefix(const Archive& a, const Entry& e, char* out,
                    uint64_t out_cap, bool require_end) {
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, -MAX_WBITS) != Z_OK) {
    set_error("inflateInit failed");
    return false;
  }
  const uint64_t CHUNK = 1ull << 30;  // < UINT32_MAX
  const Bytef* in = (const Bytef*)(a.file.data() + e.data_offset);
  uint64_t in_left = e.comp_size;
  Bytef* outp = (Bytef*)out;
  uint64_t out_left = out_cap;
  int rc = Z_OK;
  while (rc != Z_STREAM_END) {
    if (zs.avail_in == 0 && in_left) {
      uInt take = (uInt)std::min<uint64_t>(in_left, CHUNK);
      zs.next_in = (Bytef*)in;
      zs.avail_in = take;
      in += take;
      in_left -= take;
    }
    if (zs.avail_out == 0 && out_left) {
      uInt take = (uInt)std::min<uint64_t>(out_left, CHUNK);
      zs.next_out = outp;
      zs.avail_out = take;
      outp += take;
      out_left -= take;
    }
    if (!require_end && zs.avail_out == 0 && out_left == 0) break;  // prefix done
    rc = inflate(&zs, Z_NO_FLUSH);
    if (rc == Z_OK || rc == Z_STREAM_END) continue;
    if (rc == Z_BUF_ERROR && (in_left || out_left)) continue;  // refill
    set_error("inflate failed rc=" + std::to_string(rc) +
              (in_left == 0 ? " (truncated or oversized member)" : ""));
    inflateEnd(&zs);
    return false;
  }
  inflateEnd(&zs);
  return true;
}

bool inflate_member(const Archive& a, const Entry& e, std::vector<char>* out) {
  uint64_t payload = e.method == 0 ? e.raw_size : e.comp_size;
  if (!in_file(a, e.data_offset, payload)) {
    set_error("member payload out of file bounds");
    return false;
  }
  out->resize(e.raw_size);
  if (e.method == 0) {
    memcpy(out->data(), a.file.data() + e.data_offset, e.raw_size);
    return true;
  }
  if (e.method != 8) {
    set_error("unsupported compression method " + std::to_string(e.method));
    return false;
  }
  return inflate_prefix(a, e, out->data(), e.raw_size, /*require_end=*/true);
}

}  // namespace

extern "C" {

const char* npz_last_error() {
  thread_local std::string copy;
  std::lock_guard<std::mutex> lock(g_error_mu);
  copy = g_error;
  return copy.c_str();
}

void* npz_open(const char* path) {
  auto a = new Archive();
  a->path = path;
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) {
    set_error(std::string("cannot open ") + path);
    delete a;
    return nullptr;
  }
  std::streamsize size = f.tellg();
  f.seekg(0);
  a->file.resize(size);
  if (size > 0 && !f.read(a->file.data(), size)) {
    set_error("read failed");
    delete a;
    return nullptr;
  }
  const unsigned char* buf = (const unsigned char*)a->file.data();

  // find end-of-central-directory
  long eocd = -1;
  for (long i = (long)size - 22; i >= 0 && i > (long)size - 22 - 65536; --i) {
    if (rd32(buf + i) == 0x06054b50) {
      eocd = i;
      break;
    }
  }
  if (eocd < 0) {
    set_error("no EOCD");
    delete a;
    return nullptr;
  }
  uint64_t n_entries = rd16(buf + eocd + 10);
  uint64_t cd_off = rd32(buf + eocd + 16);
  if (cd_off == 0xFFFFFFFFu) {  // zip64
    long loc = eocd - 20;
    if (loc >= 0 && rd32(buf + loc) == 0x07064b50) {
      uint64_t z64 = rd64(buf + loc + 8);
      if (in_file(*a, z64, 56) && rd32(buf + z64) == 0x06064b50) {
        n_entries = rd64(buf + z64 + 32);
        cd_off = rd64(buf + z64 + 48);
      } else {
        set_error("bad zip64 EOCD locator");
        delete a;
        return nullptr;
      }
    }
  }

  uint64_t p = cd_off;
  for (uint64_t i = 0; i < n_entries; ++i) {
    if (!in_file(*a, p, 46) || rd32(buf + p) != 0x02014b50) {
      set_error("bad central header");
      delete a;
      return nullptr;
    }
    Entry e;
    e.method = rd16(buf + p + 10);
    e.comp_size = rd32(buf + p + 20);
    e.raw_size = rd32(buf + p + 24);
    uint16_t name_len = rd16(buf + p + 28);
    uint16_t extra_len = rd16(buf + p + 30);
    uint16_t comment_len = rd16(buf + p + 32);
    uint64_t lho = rd32(buf + p + 42);
    if (!in_file(*a, p + 46,
                 (uint64_t)name_len + extra_len + comment_len)) {
      set_error("central record fields out of bounds");
      delete a;
      return nullptr;
    }
    std::string name((const char*)buf + p + 46, name_len);
    // zip64 extra on the central record
    uint64_t xp = p + 46 + name_len;
    uint64_t xend = xp + extra_len;
    while (xp + 4 <= xend) {
      uint16_t tag = rd16(buf + xp);
      uint16_t len = rd16(buf + xp + 2);
      if (xp + 4 + len > xend) {
        set_error("zip64 extra field overruns extra block");
        delete a;
        return nullptr;
      }
      if (tag == 0x0001) {
        uint64_t q = xp + 4;
        uint64_t qend = xp + 4 + len;
        auto take64 = [&](uint64_t* dst) -> bool {
          if (q + 8 > qend) return false;
          *dst = rd64(buf + q);
          q += 8;
          return true;
        };
        bool ok = true;
        if (e.raw_size == 0xFFFFFFFFu) ok = ok && take64(&e.raw_size);
        if (e.comp_size == 0xFFFFFFFFu) ok = ok && take64(&e.comp_size);
        if (lho == 0xFFFFFFFFu) ok = ok && take64(&lho);
        if (!ok) {
          set_error("truncated zip64 extra field");
          delete a;
          return nullptr;
        }
      }
      xp += 4 + len;
    }
    // local header -> payload offset
    if (!in_file(*a, lho, 30) || rd32(buf + lho) != 0x04034b50) {
      set_error("bad local header");
      delete a;
      return nullptr;
    }
    uint16_t lname = rd16(buf + lho + 26);
    uint16_t lextra = rd16(buf + lho + 28);
    e.data_offset = lho + 30 + lname + lextra;
    uint64_t payload = e.method == 0 ? e.raw_size : e.comp_size;
    if (!in_file(*a, e.data_offset, payload)) {
      set_error("member payload out of file bounds");
      delete a;
      return nullptr;
    }
    if (name.size() > 4 && name.substr(name.size() - 4) == ".npy") {
      e.name = name.substr(0, name.size() - 4);
    } else {
      e.name = name;
    }
    // parse the npy header from a small decompressed prefix
    {
      uint64_t want = std::min<uint64_t>(e.raw_size, 4096);
      std::vector<char> head(want);
      if (e.method == 0) {
        memcpy(head.data(), a->file.data() + e.data_offset, want);
      } else if (e.method == 8) {
        if (!inflate_prefix(*a, e, head.data(), want, /*require_end=*/false)) {
          delete a;
          return nullptr;
        }
      } else {
        set_error("unsupported compression method " + std::to_string(e.method));
        delete a;
        return nullptr;
      }
      if (!parse_npy_header(head.data(), head.size(), &e)) {
        delete a;
        return nullptr;
      }
    }
    a->entries.push_back(std::move(e));
    p += 46 + name_len + extra_len + comment_len;
  }
  return a;
}

int npz_num_entries(void* h) { return (int)((Archive*)h)->entries.size(); }

const char* npz_entry_name(void* h, int i) {
  return ((Archive*)h)->entries[i].name.c_str();
}

const char* npz_entry_descr(void* h, int i) {
  return ((Archive*)h)->entries[i].descr.c_str();
}

int npz_entry_ndim(void* h, int i) {
  return (int)((Archive*)h)->entries[i].shape.size();
}

long npz_entry_dim(void* h, int i, int d) {
  return ((Archive*)h)->entries[i].shape[d];
}

long npz_entry_nbytes(void* h, int i) {
  return (long)((Archive*)h)->entries[i].nbytes;
}

// Inflate all members concurrently into caller-provided buffers
// (out_ptrs[i] must hold npz_entry_nbytes(i) bytes).
int npz_read_all(void* h, char** out_ptrs, int n_threads) {
  Archive* a = (Archive*)h;
  int n = (int)a->entries.size();
  std::atomic<int> next(0);
  std::atomic<int> failed(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load()) return;
      const Entry& e = a->entries[i];
      std::vector<char> raw;
      if (!inflate_member(*a, e, &raw)) {
        failed.store(1);
        return;
      }
      memcpy(out_ptrs[i], raw.data() + e.header_len, e.nbytes);
    }
  };
  int workers = n_threads > 0 ? n_threads : (int)std::thread::hardware_concurrency();
  workers = std::min(std::max(workers, 1), std::max(n, 1));
  std::vector<std::thread> pool;
  for (int t = 1; t < workers; ++t) pool.emplace_back(worker);
  worker();
  for (auto& t : pool) t.join();
  return failed.load() ? -1 : 0;
}

void npz_close(void* h) { delete (Archive*)h; }

}  // extern "C"
