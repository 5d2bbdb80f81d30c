// patchio: native host-side kernels for the denoiser-training data pipeline.
//
// C++ replacement for the hot loops of the reference's patch preparation
// (reference DeepDenoisers/training/utilities/dataset.py:15-111 Im2Patch +
// utils.py:46-75 data_augmentation) and the per-step batch assembly with AWGN
// (reference train_full_realsn.py:96-103). The Python/numpy fallback in
// pnp_svrg_tpu/training/data.py implements identical semantics; this library
// removes the interpreter from the per-epoch path (patch extraction,
// augmentation, gather + noise) so the TPU never waits on the host.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 on this image).

#include <cstdint>
#include <cstring>
#include <cmath>

extern "C" {

// Number of patches a (h, w) image yields on a stride grid.
int64_t patch_count(int64_t h, int64_t w, int64_t patch, int64_t stride) {
  if (h < patch || w < patch) return 0;
  int64_t ny = (h - patch) / stride + 1;
  int64_t nx = (w - patch) / stride + 1;
  return ny * nx;
}

// Extract stride-grid patches: img (h, w) row-major -> out (n, patch, patch).
void extract_patches(const float* img, int64_t h, int64_t w, int64_t patch,
                     int64_t stride, float* out) {
  int64_t k = 0;
  for (int64_t y = 0; y + patch <= h; y += stride) {
    for (int64_t x = 0; x + patch <= w; x += stride) {
      float* dst = out + (k++) * patch * patch;
      for (int64_t r = 0; r < patch; ++r) {
        std::memcpy(dst + r * patch, img + (y + r) * w + x,
                    sizeof(float) * patch);
      }
    }
  }
}

// The reference's 8-mode flip/rotation augmentation applied per patch.
// modes[i] in [0, 8): 0 identity, 1 flipud, 2 rot90, 3 flipud(rot90),
// 4 rot180, 5 flipud(rot180), 6 rot270, 7 flipud(rot270).
void augment_patches(const float* in, float* out, int64_t n, int64_t p,
                     const uint8_t* modes) {
  for (int64_t i = 0; i < n; ++i) {
    const float* a = in + i * p * p;
    float* b = out + i * p * p;
    const int m = modes[i];
    for (int64_t r = 0; r < p; ++r) {
      for (int64_t c = 0; c < p; ++c) {
        int64_t sr, sc;  // source coords producing out[r][c]
        switch (m) {
          case 0: sr = r;          sc = c;          break;
          case 1: sr = p - 1 - r;  sc = c;          break;  // flipud
          // rot90 (numpy ccw): out[r][c] = in[c][p-1-r]
          case 2: sr = c;          sc = p - 1 - r;  break;
          case 3: sr = c;          sc = r;          break;  // flipud(rot90)
          case 4: sr = p - 1 - r;  sc = p - 1 - c;  break;  // rot180
          case 5: sr = r;          sc = p - 1 - c;  break;  // flipud(rot180)
          case 6: sr = p - 1 - c;  sc = r;          break;  // rot270
          case 7: sr = p - 1 - c;  sc = p - 1 - r;  break;  // flipud(rot270)
          default: sr = r; sc = c; break;
        }
        b[r * p + c] = a[sr * p + sc];
      }
    }
  }
}

// splitmix64 for seeding, xoshiro-style core for speed.
static inline uint64_t splitmix64(uint64_t* s) {
  uint64_t z = (*s += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

static inline float uniform01(uint64_t* s) {
  return (float)((splitmix64(s) >> 11) * (1.0 / 9007199254740992.0));
}

// Gather selected clean patches, add AWGN, emit (noisy, noise) NHWC pairs.
// sigma_lo == sigma_hi: fixed sigma (mode S); otherwise per-sample uniform
// sigma in [lo, hi] (blind mode B, reference train_full_realsn.py:96-103).
void assemble_noisy_batch(const float* patches, int64_t p,
                          const int64_t* indices, int64_t bsz,
                          float sigma_lo, float sigma_hi, uint64_t seed,
                          float* noisy, float* noise) {
  const int64_t pp = p * p;
  for (int64_t i = 0; i < bsz; ++i) {
    uint64_t st = seed + 0x632be59bd9b4e019ULL * (uint64_t)(i + 1);
    float sigma = sigma_lo;
    if (sigma_hi > sigma_lo) {
      sigma = sigma_lo + (sigma_hi - sigma_lo) * uniform01(&st);
    }
    const float* src = patches + indices[i] * pp;
    float* nz = noise + i * pp;
    float* ny = noisy + i * pp;
    // Box-Muller pairs.
    for (int64_t j = 0; j < pp; j += 2) {
      float u1 = uniform01(&st);
      float u2 = uniform01(&st);
      if (u1 < 1e-12f) u1 = 1e-12f;
      float r = std::sqrt(-2.0f * std::log(u1));
      float g0 = r * std::cos(6.283185307179586f * u2);
      float g1 = r * std::sin(6.283185307179586f * u2);
      nz[j] = sigma * g0;
      if (j + 1 < pp) nz[j + 1] = sigma * g1;
    }
    for (int64_t j = 0; j < pp; ++j) {
      ny[j] = src[j] + nz[j];
    }
  }
}

}  // extern "C"
