// Native checkpoint loader + repack kernels + crash tracer.
//
// TPU-native counterpart of the runtime pieces the CUDA reference implements
// in C++ (SURVEY.md §2.1): where its weight path is hundreds of synchronous
// pybind->cudaMemcpy calls (src/entry.cu:532-534, cpmcu/llm.py:118-137) and
// its converter runs torch on host, this library gives the JAX engine
//   * a zero-copy mmap safetensors reader (header parse + tensor views),
//   * multi-threaded GPTQ->TPU int4 repacking (the nibble shuffle of
//     ops/quant.py pack_rows, 8x faster than the numpy passes),
//   * multi-threaded layer stacking (gather per-layer tensors into the
//     stacked (L, ...) pytree leaves without numpy temporaries),
//   * a POSIX crash tracer printing demangled backtraces
//     (src/signal_handler.cu:7-59 analog).
//
// Exposed as a plain C ABI consumed via ctypes (cpmcu_tpu/io/native.py);
// no pybind11 in this image.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <thread>
#include <atomic>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <signal.h>
#include <execinfo.h>
#include <cxxabi.h>

namespace {

struct TensorInfo {
  std::string name;
  std::string dtype;
  std::vector<int64_t> shape;
  uint64_t begin = 0, end = 0;  // offsets into the data section
};

struct StFile {
  int fd = -1;
  size_t size = 0;
  const uint8_t* base = nullptr;   // mmap base
  const uint8_t* data = nullptr;   // start of the tensor data section
  std::vector<TensorInfo> tensors;
};

// --- minimal JSON scanner for the safetensors header --------------------
// The header is a single flat object: {"name": {"dtype":"F32","shape":[..],
// "data_offsets":[a,b]}, ..., "__metadata__": {...}} — no nested arrays of
// objects, so a hand-rolled scanner is safe and dependency-free.

struct Scanner {
  const char* p;
  const char* end;
  bool fail = false;

  void ws() { while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) ++p; }
  bool eat(char c) { ws(); if (p < end && *p == c) { ++p; return true; } fail = true; return false; }
  bool peek(char c) { ws(); return p < end && *p == c; }

  std::string str() {
    ws();
    std::string out;
    if (p >= end || *p != '"') { fail = true; return out; }
    ++p;
    while (p < end && *p != '"') {
      if (*p == '\\' && p + 1 < end) { ++p; }
      out.push_back(*p++);
    }
    if (p < end) ++p;
    return out;
  }

  int64_t integer() {
    ws();
    char* next = nullptr;
    long long v = strtoll(p, &next, 10);
    if (next == p) { fail = true; return 0; }
    p = next;
    return (int64_t)v;
  }

  // skip any JSON value (used for __metadata__)
  void skip_value() {
    ws();
    if (p >= end) { fail = true; return; }
    if (*p == '"') { str(); return; }
    if (*p == '{') {
      ++p;
      ws();
      if (peek('}')) { eat('}'); return; }
      while (!fail) {
        str(); eat(':'); skip_value();
        ws();
        if (peek(',')) { eat(','); continue; }
        eat('}');
        break;
      }
      return;
    }
    if (*p == '[') {
      ++p;
      ws();
      if (peek(']')) { eat(']'); return; }
      while (!fail) {
        skip_value();
        ws();
        if (peek(',')) { eat(','); continue; }
        eat(']');
        break;
      }
      return;
    }
    // number / true / false / null
    while (p < end && *p != ',' && *p != '}' && *p != ']') ++p;
  }
};

bool parse_header(const char* hdr, size_t len, std::vector<TensorInfo>* out) {
  Scanner s{hdr, hdr + len};
  if (!s.eat('{')) return false;
  if (s.peek('}')) { s.eat('}'); return true; }
  while (!s.fail) {
    std::string name = s.str();
    s.eat(':');
    if (name == "__metadata__") {
      s.skip_value();
    } else {
      TensorInfo t;
      t.name = name;
      s.eat('{');
      while (!s.fail) {
        std::string k = s.str();
        s.eat(':');
        if (k == "dtype") {
          t.dtype = s.str();
        } else if (k == "shape") {
          s.eat('[');
          if (!s.peek(']')) {
            while (!s.fail) {
              t.shape.push_back(s.integer());
              if (s.peek(',')) { s.eat(','); continue; }
              break;
            }
          }
          s.eat(']');
        } else if (k == "data_offsets") {
          s.eat('[');
          t.begin = (uint64_t)s.integer();
          s.eat(',');
          t.end = (uint64_t)s.integer();
          s.eat(']');
        } else {
          s.skip_value();
        }
        if (s.peek(',')) { s.eat(','); continue; }
        s.eat('}');
        break;
      }
      out->push_back(std::move(t));
    }
    if (s.peek(',')) { s.eat(','); continue; }
    s.eat('}');
    break;
  }
  return !s.fail;
}

int nthreads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? (int)n : 4;
}

template <typename F>
void parallel_for(int64_t n, F f) {
  int t = nthreads();
  if (n < 2 || t < 2) { for (int64_t i = 0; i < n; ++i) f(i); return; }
  std::atomic<int64_t> next{0};
  std::vector<std::thread> pool;
  for (int i = 0; i < t; ++i) {
    pool.emplace_back([&] {
      for (;;) {
        int64_t j = next.fetch_add(1);
        if (j >= n) return;
        f(j);
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// safetensors mmap reader
// ---------------------------------------------------------------------------

void* st_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 8) { close(fd); return nullptr; }
  void* base = mmap(nullptr, (size_t)st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) { close(fd); return nullptr; }
  madvise(base, (size_t)st.st_size, MADV_SEQUENTIAL);

  auto* f = new StFile();
  f->fd = fd;
  f->size = (size_t)st.st_size;
  f->base = (const uint8_t*)base;

  uint64_t hlen;
  memcpy(&hlen, f->base, 8);
  // hlen is untrusted: guard the addition against overflow before use
  if (hlen > f->size - 8 ||
      !parse_header((const char*)f->base + 8, hlen, &f->tensors)) {
    munmap((void*)f->base, f->size);
    close(fd);
    delete f;
    return nullptr;
  }
  // validate every tensor's data_offsets against the mapped data section:
  // a truncated/corrupt header would otherwise hand out-of-bounds views to
  // st_data/st_read (SIGBUS on access; ADVICE.md round-1)
  const uint64_t data_size = f->size - 8 - hlen;
  for (const auto& t : f->tensors) {
    if (t.begin > t.end || t.end > data_size) {
      munmap((void*)f->base, f->size);
      close(fd);
      delete f;
      return nullptr;
    }
  }
  f->data = f->base + 8 + hlen;
  return f;
}

void st_close(void* h) {
  auto* f = (StFile*)h;
  if (!f) return;
  munmap((void*)f->base, f->size);
  close(f->fd);
  delete f;
}

int64_t st_num_tensors(void* h) { return (int64_t)((StFile*)h)->tensors.size(); }

const char* st_name(void* h, int64_t i) { return ((StFile*)h)->tensors[i].name.c_str(); }

const char* st_dtype(void* h, int64_t i) { return ((StFile*)h)->tensors[i].dtype.c_str(); }

int64_t st_ndim(void* h, int64_t i) { return (int64_t)((StFile*)h)->tensors[i].shape.size(); }

void st_shape(void* h, int64_t i, int64_t* out) {
  auto& s = ((StFile*)h)->tensors[i].shape;
  for (size_t d = 0; d < s.size(); ++d) out[d] = s[d];
}

int64_t st_nbytes(void* h, int64_t i) {
  auto& t = ((StFile*)h)->tensors[i];
  return (int64_t)(t.end - t.begin);
}

// zero-copy pointer into the mapping (valid until st_close)
const void* st_data(void* h, int64_t i) {
  auto* f = (StFile*)h;
  return f->data + f->tensors[i].begin;
}

void st_read(void* h, int64_t i, void* dst) {
  auto* f = (StFile*)h;
  auto& t = f->tensors[i];
  memcpy(dst, f->data + t.begin, t.end - t.begin);
}

// ---------------------------------------------------------------------------
// repack kernels (host-side weight preprocessing)
// ---------------------------------------------------------------------------

// GPTQ int32 words (nibble j of word k8 = unpacked row k8*8+j) -> the TPU
// kernel pack (ops/quant.py: within each 1024-row chunk, nibble j of packed
// word (kq, n) = row chunk*1024 + j*128 + kq). Both sides (K/8, N) int32.
void repack_gptq_to_tpu(const int32_t* src, int32_t* dst,
                        int64_t k8, int64_t n) {
  const int64_t kchunk_words = 128;           // packed words per chunk
  const int64_t nchunks = k8 / kchunk_words;  // K/1024 (K % 1024 == 0)
  parallel_for(nchunks, [&](int64_t c) {
    for (int64_t kq = 0; kq < kchunk_words; ++kq) {
      int32_t* drow = dst + (c * kchunk_words + kq) * n;
      for (int64_t col = 0; col < n; ++col) {
        uint32_t word = 0;
        for (int j = 0; j < 4; ++j) {
          // v2 bf16-pair layout (ops/quant.py pack_rows): bits [4j,4j+4) =
          // unpacked row c*1024 + j*256 + 2*kq, bits [4j+16,4j+20) = the
          // row after it. GPTQ stores row r at word r/8, nibble r%8.
          int64_t r0 = c * 1024 + (int64_t)j * 256 + 2 * kq;
          uint32_t g0 = (uint32_t)src[(r0 / 8) * n + col];
          uint32_t g1 = (uint32_t)src[((r0 + 1) / 8) * n + col];
          word |= ((g0 >> (4 * (r0 % 8))) & 0xF) << (4 * j);
          word |= ((g1 >> (4 * ((r0 + 1) % 8))) & 0xF) << (4 * j + 16);
        }
        drow[col] = (int32_t)word;
      }
    }
  });
}

// stack L per-layer contiguous blocks into one (L, ...) buffer
void stack_layers(const void** srcs, void* dst, int64_t num, int64_t nbytes) {
  parallel_for(num, [&](int64_t i) {
    memcpy((uint8_t*)dst + i * nbytes, srcs[i], (size_t)nbytes);
  });
}

// fp16 -> fp32 widening (torch .bin fallback path)
void f16_to_f32(const uint16_t* src, float* dst, int64_t n) {
  parallel_for((n + (1 << 20) - 1) >> 20, [&](int64_t blk) {
    int64_t lo = blk << 20, hi = std::min(n, lo + (int64_t)(1 << 20));
    for (int64_t i = lo; i < hi; ++i) {
      uint16_t hbits = src[i];
      uint32_t sign = (uint32_t)(hbits & 0x8000) << 16;
      uint32_t exp = (hbits >> 10) & 0x1F;
      uint32_t man = hbits & 0x3FF;
      uint32_t f;
      if (exp == 0) {
        if (man == 0) {
          f = sign;
        } else {  // subnormal
          int e = -1;
          do { man <<= 1; ++e; } while (!(man & 0x400));
          f = sign | ((uint32_t)(127 - 15 - e) << 23) | ((man & 0x3FF) << 13);
        }
      } else if (exp == 31) {
        f = sign | 0x7F800000u | (man << 13);
      } else {
        f = sign | ((exp + 112) << 23) | (man << 13);
      }
      memcpy(&dst[i], &f, 4);
    }
  });
}

// ---------------------------------------------------------------------------
// crash tracer (src/signal_handler.cu analog)
// ---------------------------------------------------------------------------

static void crash_handler(int sig) {
  void* frames[64];
  int n = backtrace(frames, 64);
  char** syms = backtrace_symbols(frames, n);
  fprintf(stderr, "\n=== cpmcu_tpu native crash tracer: signal %d ===\n", sig);
  for (int i = 0; i < n; ++i) {
    const char* line = syms ? syms[i] : "?";
    // demangle the function name between '(' and '+'
    std::string pretty = line;
    const char* lp = strchr(line, '(');
    const char* plus = lp ? strchr(lp, '+') : nullptr;
    if (lp && plus && plus > lp + 1) {
      std::string mangled(lp + 1, plus);
      int status = 0;
      char* dem = abi::__cxa_demangle(mangled.c_str(), nullptr, nullptr, &status);
      if (status == 0 && dem) {
        pretty = std::string(line, lp + 1) + dem + plus;
        free(dem);
      }
    }
    fprintf(stderr, "  #%d %s\n", i, pretty.c_str());
  }
  free(syms);
  fflush(stderr);
  signal(sig, SIG_DFL);
  raise(sig);
}

void install_crash_tracer() {
  for (int sig : {SIGSEGV, SIGABRT, SIGFPE, SIGILL, SIGBUS}) {
    signal(sig, crash_handler);
  }
}

}  // extern "C"
