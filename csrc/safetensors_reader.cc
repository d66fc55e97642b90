// Native safetensors reader: mmap the file, parse the JSON header, hand out
// zero-copy tensor views.  Replaces the Python-side read of multi-GB
// checkpoints on the load path (the reference loads a 4 GB torch pickle
// through Python, /root/reference/sd/model_converter.py:5).
//
// Format: [u64 little-endian header_len][header JSON][raw tensor data].
// Header: {"tensor_name": {"dtype":"F32","shape":[..],"data_offsets":[b,e]},
//          ..., "__metadata__": {...}}  (offsets relative to data start).
//
// Exposed as a C ABI for ctypes (no pybind11 in this toolchain).

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

struct Tensor {
  std::string name;
  std::string dtype;
  std::vector<int64_t> shape;
  uint64_t begin = 0, end = 0;
};

struct File {
  int fd = -1;
  const uint8_t* base = nullptr;  // mmap base
  size_t size = 0;
  const uint8_t* data = nullptr;  // start of tensor data section
  std::vector<Tensor> tensors;
  std::string error;
};

// ----------------------------------------------------------- mini JSON
// Just enough JSON for safetensors headers: objects, arrays, strings,
// integers.  No floats/bools/null needed (ignored if present).
struct Parser {
  const char* p;
  const char* end;
  bool ok = true;

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) p++;
  }
  bool consume(char c) {
    skip_ws();
    if (p < end && *p == c) { p++; return true; }
    return false;
  }
  std::string parse_string() {
    skip_ws();
    std::string out;
    if (p >= end || *p != '"') { ok = false; return out; }
    p++;
    while (p < end && *p != '"') {
      if (*p == '\\' && p + 1 < end) {
        p++;
        switch (*p) {
          case 'n': out += '\n'; break;
          case 't': out += '\t'; break;
          case 'u': {  // \uXXXX -> keep raw (names are ASCII in practice)
            out += '?';
            p += 4 < end - p ? 4 : end - p - 1;
            break;
          }
          default: out += *p;
        }
      } else {
        out += *p;
      }
      p++;
    }
    if (p < end) p++;  // closing quote
    else ok = false;
    return out;
  }
  int64_t parse_int() {
    skip_ws();
    bool neg = false;
    if (p < end && *p == '-') { neg = true; p++; }
    int64_t v = 0;
    bool any = false;
    while (p < end && *p >= '0' && *p <= '9') { v = v * 10 + (*p - '0'); p++; any = true; }
    if (!any) ok = false;
    return neg ? -v : v;
  }
  void skip_value() {  // for __metadata__ payloads
    skip_ws();
    if (p >= end) { ok = false; return; }
    if (*p == '"') { parse_string(); return; }
    if (*p == '{') {
      p++;
      skip_ws();
      if (consume('}')) return;
      do { parse_string(); if (!consume(':')) { ok = false; return; } skip_value(); }
      while (ok && consume(','));
      if (!consume('}')) ok = false;
      return;
    }
    if (*p == '[') {
      p++;
      skip_ws();
      if (consume(']')) return;
      do skip_value(); while (ok && consume(','));
      if (!consume(']')) ok = false;
      return;
    }
    // number / true / false / null
    while (p < end && *p != ',' && *p != '}' && *p != ']') p++;
  }
};

bool parse_header(File* f, const char* hdr, size_t len) {
  Parser ps{hdr, hdr + len};
  if (!ps.consume('{')) { f->error = "header: expected '{'"; return false; }
  if (ps.consume('}')) return true;
  do {
    std::string name = ps.parse_string();
    if (!ps.ok || !ps.consume(':')) { f->error = "header: bad key"; return false; }
    if (name == "__metadata__") {
      ps.skip_value();
      if (!ps.ok) { f->error = "header: bad metadata"; return false; }
      continue;
    }
    Tensor t;
    t.name = name;
    if (!ps.consume('{')) { f->error = "header: expected tensor obj"; return false; }
    do {
      std::string k = ps.parse_string();
      if (!ps.ok || !ps.consume(':')) { f->error = "header: bad tensor key"; return false; }
      if (k == "dtype") {
        t.dtype = ps.parse_string();
      } else if (k == "shape") {
        if (!ps.consume('[')) { f->error = "header: bad shape"; return false; }
        ps.skip_ws();
        if (!ps.consume(']')) {
          do t.shape.push_back(ps.parse_int()); while (ps.ok && ps.consume(','));
          if (!ps.consume(']')) { f->error = "header: bad shape end"; return false; }
        }
      } else if (k == "data_offsets") {
        if (!ps.consume('[')) { f->error = "header: bad offsets"; return false; }
        t.begin = static_cast<uint64_t>(ps.parse_int());
        if (!ps.consume(',')) { f->error = "header: bad offsets sep"; return false; }
        t.end = static_cast<uint64_t>(ps.parse_int());
        if (!ps.consume(']')) { f->error = "header: bad offsets end"; return false; }
      } else {
        ps.skip_value();
      }
      if (!ps.ok) { f->error = "header: parse error"; return false; }
    } while (ps.consume(','));
    if (!ps.consume('}')) { f->error = "header: tensor obj end"; return false; }
    // bounds check against the data section
    size_t data_len = f->size - (f->data - f->base);
    if (t.end < t.begin || t.end > data_len) {
      f->error = "tensor '" + t.name + "': offsets out of bounds";
      return false;
    }
    f->tensors.push_back(std::move(t));
  } while (ps.consume(','));
  if (!ps.consume('}')) { f->error = "header: expected '}'"; return false; }
  return true;
}

}  // namespace

extern "C" {

void* st_open(const char* path) {
  File* f = new File();
  f->fd = ::open(path, O_RDONLY);
  if (f->fd < 0) { f->error = "cannot open file"; return f; }
  struct stat st;
  if (fstat(f->fd, &st) != 0 || st.st_size < 8) {
    f->error = "stat failed or file too small";
    return f;
  }
  f->size = static_cast<size_t>(st.st_size);
  void* m = mmap(nullptr, f->size, PROT_READ, MAP_PRIVATE, f->fd, 0);
  if (m == MAP_FAILED) { f->error = "mmap failed"; return f; }
  f->base = static_cast<const uint8_t*>(m);

  uint64_t hlen;
  std::memcpy(&hlen, f->base, 8);  // little-endian host assumed (x86/arm LE)
  if (hlen > f->size - 8) { f->error = "header length out of bounds"; return f; }
  f->data = f->base + 8 + hlen;
  if (!parse_header(f, reinterpret_cast<const char*>(f->base + 8),
                    static_cast<size_t>(hlen))) {
    f->tensors.clear();
  }
  return f;
}

const char* st_error(void* h) {
  File* f = static_cast<File*>(h);
  return f->error.empty() ? nullptr : f->error.c_str();
}

int64_t st_num_tensors(void* h) {
  return static_cast<int64_t>(static_cast<File*>(h)->tensors.size());
}

const char* st_name(void* h, int64_t i) {
  return static_cast<File*>(h)->tensors[i].name.c_str();
}

const char* st_dtype(void* h, int64_t i) {
  return static_cast<File*>(h)->tensors[i].dtype.c_str();
}

int64_t st_ndim(void* h, int64_t i) {
  return static_cast<int64_t>(static_cast<File*>(h)->tensors[i].shape.size());
}

void st_shape(void* h, int64_t i, int64_t* out) {
  const auto& s = static_cast<File*>(h)->tensors[i].shape;
  std::memcpy(out, s.data(), s.size() * sizeof(int64_t));
}

const void* st_data(void* h, int64_t i, uint64_t* nbytes) {
  File* f = static_cast<File*>(h);
  const Tensor& t = f->tensors[i];
  *nbytes = t.end - t.begin;
  return f->data + t.begin;
}

void st_close(void* h) {
  File* f = static_cast<File*>(h);
  if (f->base) munmap(const_cast<uint8_t*>(f->base), f->size);
  if (f->fd >= 0) ::close(f->fd);
  delete f;
}

}  // extern "C"
