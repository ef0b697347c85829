// Native data-loading runtime for tpu-stgcn.
//
// The reference feeds training through torch DataLoader worker subprocesses
// doing np.load per item (src/data/datasets.py:144, the hot I/O path in
// SURVEY.md §3.1).  This library replaces that host-side path with a C++
// thread pool that parses .npy files, strips the OpenPose confidence channel
// and wrap-pads sequences straight into the caller-provided pinned batch
// buffer — one pass, zero Python-object overhead.  Exposed as a plain C API
// consumed via ctypes (stgcn_tpu/data/native_loader.py).
//
// Supports .npy format versions 1.0/2.0, dtypes <f4 and <f8, C-order arrays.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr char kMagic[] = "\x93NUMPY";

struct NpyInfo {
  std::vector<int64_t> shape;
  size_t header_bytes = 0;   // offset of data start
  size_t elem_size = 0;      // 4 or 8
  bool is_f8 = false;
  bool ok = false;
  std::string error;
};

// Minimal parser for the .npy dict header, e.g.
// {'descr': '<f4', 'fortran_order': False, 'shape': (120, 25, 3), }
NpyInfo ParseHeader(FILE* f) {
  NpyInfo info;
  char magic[6];
  if (fread(magic, 1, 6, f) != 6 || memcmp(magic, kMagic, 6) != 0) {
    info.error = "bad magic";
    return info;
  }
  unsigned char ver[2];
  if (fread(ver, 1, 2, f) != 2) {
    info.error = "truncated version";
    return info;
  }
  size_t header_len = 0;
  size_t pre = 0;
  if (ver[0] == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) { info.error = "truncated hlen"; return info; }
    header_len = b[0] | (b[1] << 8);
    pre = 10;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) { info.error = "truncated hlen"; return info; }
    header_len = b[0] | (b[1] << 8) | (size_t(b[2]) << 16) | (size_t(b[3]) << 24);
    pre = 12;
  }
  std::string header(header_len, '\0');
  if (fread(header.data(), 1, header_len, f) != header_len) {
    info.error = "truncated header";
    return info;
  }
  info.header_bytes = pre + header_len;

  if (header.find("'fortran_order': True") != std::string::npos) {
    info.error = "fortran order unsupported";
    return info;
  }
  if (header.find("'<f4'") != std::string::npos) {
    info.elem_size = 4;
  } else if (header.find("'<f8'") != std::string::npos) {
    info.elem_size = 8;
    info.is_f8 = true;
  } else {
    info.error = "dtype must be <f4 or <f8";
    return info;
  }
  size_t sp = header.find("'shape':");
  if (sp == std::string::npos) { info.error = "no shape"; return info; }
  size_t open = header.find('(', sp);
  size_t close = header.find(')', open);
  if (open == std::string::npos || close == std::string::npos) {
    info.error = "bad shape";
    return info;
  }
  std::string dims = header.substr(open + 1, close - open - 1);
  int64_t cur = -1;
  for (char c : dims) {
    if (c >= '0' && c <= '9') {
      cur = (cur < 0 ? 0 : cur) * 10 + (c - '0');
    } else if (c == ',') {
      if (cur >= 0) info.shape.push_back(cur);
      cur = -1;
    }
  }
  if (cur >= 0) info.shape.push_back(cur);
  info.ok = true;
  return info;
}

// Read one (T, V, src_c) sequence, keep the first keep_c channels, and
// wrap-pad/crop the time axis to target_t frames into out (target_t, V, keep_c).
bool LoadWrapPad(const char* path, int64_t target_t, int64_t v, int64_t keep_c,
                 float* out, std::string* err) {
  FILE* f = fopen(path, "rb");
  if (!f) { *err = std::string("open failed: ") + path; return false; }
  NpyInfo info = ParseHeader(f);
  if (!info.ok) { *err = info.error + " in " + path; fclose(f); return false; }
  if (info.shape.size() != 3 || info.shape[1] != v || info.shape[2] < keep_c) {
    *err = std::string("unexpected shape in ") + path;
    fclose(f);
    return false;
  }
  const int64_t t = info.shape[0];
  const int64_t src_c = info.shape[2];
  if (t == 0) {
    memset(out, 0, sizeof(float) * target_t * v * keep_c);
    fclose(f);
    return true;
  }
  const int64_t read_t = t < target_t ? t : target_t;
  std::vector<char> raw(read_t * v * src_c * info.elem_size);
  if (fread(raw.data(), 1, raw.size(), f) != raw.size()) {
    *err = std::string("truncated data in ") + path;
    fclose(f);
    return false;
  }
  fclose(f);

  // copy the first read_t frames, stripping channels
  for (int64_t ti = 0; ti < read_t; ++ti) {
    for (int64_t vi = 0; vi < v; ++vi) {
      float* dst = out + (ti * v + vi) * keep_c;
      const char* src = raw.data() + ((ti * v + vi) * src_c) * info.elem_size;
      if (info.is_f8) {
        const double* s = reinterpret_cast<const double*>(src);
        for (int64_t c = 0; c < keep_c; ++c) dst[c] = static_cast<float>(s[c]);
      } else {
        memcpy(dst, src, keep_c * sizeof(float));
      }
    }
  }
  // wrap-pad the remainder by tiling from the start (reference semantics:
  // np.pad(mode='wrap'), src/data/util.py:12-30)
  const int64_t frame_elems = v * keep_c;
  for (int64_t ti = read_t; ti < target_t; ++ti) {
    memcpy(out + ti * frame_elems, out + (ti % t) * frame_elems,
           frame_elems * sizeof(float));
  }
  return true;
}

thread_local std::string g_error;

}  // namespace

extern "C" {

// Returns the frame count (first dim) of a .npy file, or -1 on error.
int64_t stgcn_npy_frames(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  NpyInfo info = ParseHeader(f);
  fclose(f);
  if (!info.ok || info.shape.empty()) return -1;
  return info.shape[0];
}

// Load a batch: n_paths .npy files of shape (T_i, v, >=keep_c); each is
// channel-stripped + wrap-padded to target_t and written into
// out[n, target_t, v, keep_c] (caller-allocated, float32, C-order).
// n_threads <= 0 means hardware concurrency.  Returns 0 on success, -1 on
// any failure (see stgcn_last_error()).
int stgcn_collate_batch(const char** paths, int64_t n_paths, int64_t target_t,
                        int64_t v, int64_t keep_c, float* out,
                        int n_threads) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 4;
  }
  if (n_threads > n_paths) n_threads = static_cast<int>(n_paths);

  std::atomic<int64_t> next(0);
  std::atomic<bool> failed(false);
  std::vector<std::string> errors(n_threads);
  std::vector<std::thread> workers;
  const int64_t seq_elems = target_t * v * keep_c;

  for (int w = 0; w < n_threads; ++w) {
    workers.emplace_back([&, w]() {
      for (;;) {
        const int64_t i = next.fetch_add(1);
        if (i >= n_paths || failed.load(std::memory_order_relaxed)) return;
        std::string err;
        if (!LoadWrapPad(paths[i], target_t, v, keep_c, out + i * seq_elems,
                         &err)) {
          errors[w] = err;
          failed.store(true, std::memory_order_relaxed);
          return;
        }
      }
    });
  }
  for (auto& t : workers) t.join();
  if (failed.load()) {
    for (auto& e : errors) {
      if (!e.empty()) { g_error = e; break; }
    }
    return -1;
  }
  return 0;
}

const char* stgcn_last_error() { return g_error.c_str(); }

}  // extern "C"
