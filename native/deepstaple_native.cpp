// deepstaple_native: first-party C++ runtime pieces.
//
// Two capabilities the reference consumed through third-party native code are
// provided first-party here:
//   1. STAPLE EM consensus (the reference used SimpleITK/ITK's C++
//      STAPLEImageFilter, consensus.ipynb cell 5:13-26). This CPU
//      implementation has identical semantics to the JAX/TPU one in
//      deep_staple_tpu/consensus/staple.py and serves as its cross-check.
//   2. NIfTI-1 volume loading (the reference used nibabel). Supports .nii and
//      .nii.gz (zlib), common datatypes, scl slope/inter scaling.
//
// Exposed with a C ABI for ctypes binding (no pybind11 in this image).
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC, links zlib).

#include <algorithm>
#include <cmath>
#include <atomic>
#include <cstdint>
#include <thread>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

bool read_file(const char* path, std::vector<unsigned char>& out) {
  size_t len = std::strlen(path);
  bool is_gz = len > 3 && std::strcmp(path + len - 3, ".gz") == 0;
  if (is_gz) {
    gzFile f = gzopen(path, "rb");
    if (!f) return false;
    unsigned char buf[1 << 16];
    int n;
    while ((n = gzread(f, buf, sizeof(buf))) > 0) out.insert(out.end(), buf, buf + n);
    gzclose(f);
    return n == 0;
  }
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out.resize(sz);
  size_t rd = std::fread(out.data(), 1, sz, f);
  std::fclose(f);
  return rd == (size_t)sz;
}

template <typename T>
void convert(const unsigned char* src, long long n, float* dst, bool swap) {
  for (long long i = 0; i < n; ++i) {
    T v;
    std::memcpy(&v, src + i * sizeof(T), sizeof(T));
    if (swap) {
      unsigned char* b = reinterpret_cast<unsigned char*>(&v);
      std::reverse(b, b + sizeof(T));
    }
    dst[i] = (float)v;
  }
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// STAPLE EM
// ---------------------------------------------------------------------------

// decisions: R x V row-major {0,1} floats. Outputs: w (V posterior), p, q (R).
// Returns the number of EM iterations executed.
int ds_staple_em(const float* decisions, long long R, long long V,
                 double confidence_weight, int max_iterations, double epsilon,
                 float* out_w, float* out_p, float* out_q) {
  if (R <= 0 || V <= 0) return -1;
  std::vector<double> p(R, 0.99999), q(R, 0.99999);
  std::vector<double> d_sum(R, 0.0);
  double total = 0.0;
  for (long long r = 0; r < R; ++r) {
    const float* row = decisions + r * V;
    double s = 0.0;
    for (long long v = 0; v < V; ++v) s += row[v];
    d_sum[r] = s;
    total += s;
  }
  double g = confidence_weight * total / (double)(R * V);
  g = std::min(std::max(g, 1e-7), 1.0 - 1e-7);

  std::vector<double> w(V, 0.0);
  std::vector<double> a_coef(R), b_coef(R);
  auto e_step = [&](std::vector<double>& w_out) {
    double base_a = std::log(g);
    double base_b = std::log1p(-g);
    for (long long r = 0; r < R; ++r) {
      double pr = std::min(std::max(p[r], 1e-12), 1.0 - 1e-12);
      double qr = std::min(std::max(q[r], 1e-12), 1.0 - 1e-12);
      a_coef[r] = std::log(pr) - std::log1p(-pr);
      b_coef[r] = std::log1p(-qr) - std::log(qr);
      base_a += std::log1p(-pr);
      base_b += std::log(qr);
    }
    for (long long v = 0; v < V; ++v) w_out[v] = base_a - base_b;
    for (long long r = 0; r < R; ++r) {
      const float* row = decisions + r * V;
      const double coef = a_coef[r] - b_coef[r];
      for (long long v = 0; v < V; ++v)
        if (row[v] > 0.5f) w_out[v] += coef;
    }
    double w_sum = 0.0;
    for (long long v = 0; v < V; ++v) {
      w_out[v] = 1.0 / (1.0 + std::exp(-w_out[v]));  // sigmoid(log a - log b)
      w_sum += w_out[v];
    }
    return w_sum;
  };

  int it = 0;
  double delta = 1e30;
  for (; it < max_iterations && delta > epsilon; ++it) {
    std::vector<double> w_new(V, 0.0);
    double w_sum = e_step(w_new);
    // M-step
    delta = 0.0;
    for (long long r = 0; r < R; ++r) {
      const float* row = decisions + r * V;
      double wd = 0.0;
      for (long long v = 0; v < V; ++v)
        if (row[v] > 0.5f) wd += w_new[v];
      double new_p = wd / std::max(w_sum, 1e-12);
      double new_q = ((V - w_sum) - (d_sum[r] - wd)) / std::max((double)V - w_sum, 1e-12);
      delta += std::fabs(new_p - p[r]) + std::fabs(new_q - q[r]);
      p[r] = new_p;
      q[r] = new_q;
    }
    w.swap(w_new);
  }
  // posterior from the FINAL (p, q) — same contract as the JAX versions
  e_step(w);

  for (long long v = 0; v < V; ++v) out_w[v] = (float)w[v];
  for (long long r = 0; r < R; ++r) {
    out_p[r] = (float)p[r];
    out_q[r] = (float)q[r];
  }
  return it;
}

// ---------------------------------------------------------------------------
// NIfTI-1 loader
// ---------------------------------------------------------------------------

// Loads a 3D NIfTI volume as float32 in Fortran voxel order (first axis
// fastest), matching the Python reader. Caller frees with ds_free.
int ds_load_nifti_f32(const char* path, long long* out_dims, float** out_data) {
  std::vector<unsigned char> raw;
  if (!read_file(path, raw) || raw.size() < 352) return -1;

  int32_t sizeof_hdr;
  std::memcpy(&sizeof_hdr, raw.data(), 4);
  bool swap = false;
  if (sizeof_hdr != 348) {
    unsigned char b[4] = {raw[3], raw[2], raw[1], raw[0]};
    std::memcpy(&sizeof_hdr, b, 4);
    if (sizeof_hdr != 348) return -2;
    swap = true;
  }
  auto rd16 = [&](size_t off) {
    int16_t v;
    std::memcpy(&v, raw.data() + off, 2);
    if (swap) {
      unsigned char* b = reinterpret_cast<unsigned char*>(&v);
      std::swap(b[0], b[1]);
    }
    return v;
  };
  auto rd32f = [&](size_t off) {
    float v;
    std::memcpy(&v, raw.data() + off, 4);
    if (swap) {
      unsigned char* b = reinterpret_cast<unsigned char*>(&v);
      std::reverse(b, b + 4);
    }
    return v;
  };

  int16_t ndim = rd16(40);
  if (ndim < 3) return -3;
  long long d0 = rd16(42), d1 = rd16(44), d2 = rd16(46);
  long long n = d0 * d1 * d2;
  // trailing dims must be singleton for a 3D volume
  for (int k = 3; k < ndim; ++k)
    if (rd16(42 + 2 * k) > 1) return -4;
  int16_t datatype = rd16(70);
  float vox_offset = rd32f(108);
  float scl_slope = rd32f(112), scl_inter = rd32f(116);

  size_t off = (size_t)vox_offset;
  // Validate the payload BEFORE converting: a truncated download or corrupt
  // header (huge dims/vox_offset) must fail cleanly, not read off the heap.
  size_t elem = 0;
  switch (datatype) {
    case 2: case 256: elem = 1; break;
    case 4: case 512: elem = 2; break;
    case 8: case 16: case 768: elem = 4; break;
    case 64: elem = 8; break;
    default: return -6;
  }
  if (n <= 0 || off < 348 || off > raw.size() ||
      (size_t)n > (raw.size() - off) / elem)
    return -7;
  float* data = (float*)std::malloc(sizeof(float) * n);
  if (!data) return -5;
  const unsigned char* src = raw.data() + off;

  switch (datatype) {
    case 2: convert<uint8_t>(src, n, data, false); break;
    case 4: convert<int16_t>(src, n, data, swap); break;
    case 8: convert<int32_t>(src, n, data, swap); break;
    case 16: convert<float>(src, n, data, swap); break;
    case 64: convert<double>(src, n, data, swap); break;
    case 256: convert<int8_t>(src, n, data, false); break;
    case 512: convert<uint16_t>(src, n, data, swap); break;
    case 768: convert<uint32_t>(src, n, data, swap); break;
    default: std::free(data); return -6;
  }
  if (scl_slope != 0.0f && (scl_slope != 1.0f || scl_inter != 0.0f)) {
    for (long long i = 0; i < n; ++i) data[i] = data[i] * scl_slope + scl_inter;
  }
  out_dims[0] = d0;
  out_dims[1] = d1;
  out_dims[2] = d2;
  *out_data = data;
  return 0;
}

void ds_free(float* ptr) { std::free(ptr); }

// ---------------------------------------------------------------------------
// Threaded batch loader: N volumes decoded in parallel (the dataset ingest
// reads hundreds of .nii.gz serially otherwise — SURVEY.md marks it HOT).
// out_dims: 3*n longs; out_data: n buffers (caller frees each with ds_free);
// out_rcs: per-file status (same codes as ds_load_nifti_f32). Returns the
// number of failures.
// ---------------------------------------------------------------------------
int ds_load_nifti_batch(const char** paths, int n, int n_threads,
                        long long* out_dims, float** out_data, int* out_rcs) {
  if (n <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      out_rcs[i] = ds_load_nifti_f32(paths[i], out_dims + 3 * i, out_data + i);
      if (out_rcs[i] != 0) out_data[i] = nullptr;
    }
  };
  std::vector<std::thread> threads;
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(worker);
  worker();
  for (auto& th : threads) th.join();
  int failures = 0;
  for (int i = 0; i < n; ++i)
    if (out_rcs[i] != 0) ++failures;
  return failures;
}

}  // extern "C"
