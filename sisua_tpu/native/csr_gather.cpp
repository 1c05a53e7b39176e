// Native host-side kernels for the sisua_tpu data pipeline.
//
// The reference streams batches through tf.data from dense/mmap arrays
// (/root/reference/sisua/data/_single_cell_base.py:539-602). The TPU-native
// pipeline instead keeps the count matrix in CSR on host and gathers shuffled
// row batches into dense, pinned-style float32 buffers that are fed straight
// to device transfer — this is the "CSR count matrices into dense HBM
// batches" path of the north star. scipy's fancy-indexing equivalent
// allocates per batch and walks Python/NumPy dispatch; this is a single tight
// memcpy/scatter loop.
//
// Build: g++ -O3 -march=native -shared -fPIC csr_gather.cpp -o _native.so

#include <cstdint>
#include <cstring>
#include <cmath>

extern "C" {

// Gather CSR rows[0..n_rows) into a dense row-major out[n_rows, n_cols].
// indices/indptr are int64 (converted once at feeder init).
void csr_gather_f32(const float* __restrict data,
                    const int64_t* __restrict indices,
                    const int64_t* __restrict indptr,
                    const int64_t* __restrict rows,
                    int64_t n_rows,
                    int64_t n_cols,
                    float* __restrict out) {
  for (int64_t r = 0; r < n_rows; ++r) {
    float* dst = out + r * n_cols;
    std::memset(dst, 0, sizeof(float) * n_cols);
    const int64_t row = rows[r];
    const int64_t lo = indptr[row], hi = indptr[row + 1];
    for (int64_t k = lo; k < hi; ++k) {
      dst[indices[k]] = data[k];
    }
  }
}

// Same, fused with log1p (for pipelines that pre-normalize on host).
void csr_gather_log1p_f32(const float* __restrict data,
                          const int64_t* __restrict indices,
                          const int64_t* __restrict indptr,
                          const int64_t* __restrict rows,
                          int64_t n_rows,
                          int64_t n_cols,
                          float* __restrict out) {
  for (int64_t r = 0; r < n_rows; ++r) {
    float* dst = out + r * n_cols;
    std::memset(dst, 0, sizeof(float) * n_cols);
    const int64_t row = rows[r];
    const int64_t lo = indptr[row], hi = indptr[row + 1];
    for (int64_t k = lo; k < hi; ++k) {
      dst[indices[k]] = std::log1p(data[k]);
    }
  }
}

// Dense row gather (float32): out[r] = src[rows[r]] — avoids numpy fancy
// indexing overhead for the dense-matrix case.
void dense_gather_f32(const float* __restrict src,
                      const int64_t* __restrict rows,
                      int64_t n_rows,
                      int64_t n_cols,
                      float* __restrict out) {
  for (int64_t r = 0; r < n_rows; ++r) {
    std::memcpy(out + r * n_cols, src + rows[r] * n_cols,
                sizeof(float) * n_cols);
  }
}

}  // extern "C"
