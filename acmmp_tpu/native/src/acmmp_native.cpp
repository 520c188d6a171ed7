// Native host runtime: the I/O + image-resampling layer that the reference
// implements in C++ (DMB container I/O, src/ACMMP.cpp:264-380; binary PLY
// writer, src/ACMMP.cpp:382-435; image/camera rescale, src/ACMMP.cpp:181-202).
// The TPU compute path stays in JAX/Pallas; this library serves the host side
// of the pipeline (stage checkpoints, fusion output, multi-scale loader) with
// OpenMP where it pays. Exposed as a plain C ABI for ctypes.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC -o libacmmp_native.so
//        acmmp_native.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// DMB container: int32 {type=1, h, w, nb} + float32 data
// ---------------------------------------------------------------------------

// Returns 0 on success. First call with data=nullptr to get the header
// {type, h, w, nb}; then call again with a buffer of h*w*nb floats.
int an_read_dmb(const char* path, int32_t header[4], float* data) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int32_t hdr[4];
  if (fread(hdr, sizeof(int32_t), 4, f) != 4) { fclose(f); return -2; }
  if (hdr[0] != 1) { fclose(f); return -3; }
  memcpy(header, hdr, sizeof(hdr));
  if (data != nullptr) {
    size_t n = (size_t)hdr[1] * hdr[2] * hdr[3];
    if (fread(data, sizeof(float), n, f) != n) { fclose(f); return -4; }
  }
  fclose(f);
  return 0;
}

int an_write_dmb(const char* path, int32_t h, int32_t w, int32_t nb,
                 const float* data) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  int32_t hdr[4] = {1, h, w, nb};
  if (fwrite(hdr, sizeof(int32_t), 4, f) != 4) { fclose(f); return -2; }
  size_t n = (size_t)h * w * nb;
  if (fwrite(data, sizeof(float), n, f) != n) { fclose(f); return -3; }
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// Binary little-endian PLY writer (x y z nx ny nz f32, rgb u8), deterministic
// ordering (the reference's OpenMP critical-section loop is order-random).
// ---------------------------------------------------------------------------

int an_write_ply(const char* path, int64_t n, const float* pts,
                 const float* normals, const uint8_t* colors) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  fprintf(f,
          "ply\nformat binary_little_endian 1.0\nelement vertex %lld\n"
          "property float x\nproperty float y\nproperty float z\n"
          "property float nx\nproperty float ny\nproperty float nz\n"
          "property uchar red\nproperty uchar green\nproperty uchar blue\n"
          "end_header\n",
          (long long)n);
  const size_t stride = 3 * 4 + 3 * 4 + 3;        // 27 bytes per vertex
  const int64_t chunk = 1 << 16;
  char* buf = new char[(size_t)chunk * stride];
  for (int64_t start = 0; start < n; start += chunk) {
    int64_t m = (n - start) < chunk ? (n - start) : chunk;
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < m; ++i) {
      char* p = buf + (size_t)i * stride;
      float xyz[3] = {pts[(start + i) * 3], pts[(start + i) * 3 + 1],
                      pts[(start + i) * 3 + 2]};
      // non-finite coordinates are zeroed like the reference
      // (ACMMP.cpp:415-419)
      if (!std::isfinite(xyz[0]) || !std::isfinite(xyz[1]) ||
          !std::isfinite(xyz[2])) {
        xyz[0] = xyz[1] = xyz[2] = 0.0f;
      }
      memcpy(p, xyz, 12);
      memcpy(p + 12, normals + (start + i) * 3, 12);
      memcpy(p + 24, colors + (start + i) * 3, 3);
    }
    if (fwrite(buf, stride, (size_t)m, f) != (size_t)m) {
      delete[] buf;
      fclose(f);
      return -2;
    }
  }
  delete[] buf;
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// Bilinear resampling (the multi-scale loader's hot host op; the reference
// calls cv::resize, src/ACMMP.cpp:187-190). Area-style coordinate mapping
// matches the half-pixel convention of OpenCV bilinear.
// ---------------------------------------------------------------------------

void an_resize_bilinear_f32(const float* src, int32_t sh, int32_t sw,
                            float* dst, int32_t dh, int32_t dw,
                            int32_t channels) {
  const double sy = (double)sh / dh;
  const double sx = (double)sw / dw;
#pragma omp parallel for schedule(static)
  for (int32_t r = 0; r < dh; ++r) {
    double fy = (r + 0.5) * sy - 0.5;
    if (fy < 0) fy = 0;
    if (fy > sh - 1) fy = sh - 1;
    int32_t y0 = (int32_t)fy;
    int32_t y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float wy = (float)(fy - y0);
    for (int32_t c = 0; c < dw; ++c) {
      double fx = (c + 0.5) * sx - 0.5;
      if (fx < 0) fx = 0;
      if (fx > sw - 1) fx = sw - 1;
      int32_t x0 = (int32_t)fx;
      int32_t x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      float wx = (float)(fx - x0);
      for (int32_t ch = 0; ch < channels; ++ch) {
        const float v00 = src[((size_t)y0 * sw + x0) * channels + ch];
        const float v01 = src[((size_t)y0 * sw + x1) * channels + ch];
        const float v10 = src[((size_t)y1 * sw + x0) * channels + ch];
        const float v11 = src[((size_t)y1 * sw + x1) * channels + ch];
        dst[((size_t)r * dw + c) * channels + ch] =
            v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy) +
            v10 * (1 - wx) * wy + v11 * wx * wy;
      }
    }
  }
}

void an_resize_bilinear_u8(const uint8_t* src, int32_t sh, int32_t sw,
                           uint8_t* dst, int32_t dh, int32_t dw,
                           int32_t channels) {
  const double sy = (double)sh / dh;
  const double sx = (double)sw / dw;
#pragma omp parallel for schedule(static)
  for (int32_t r = 0; r < dh; ++r) {
    double fy = (r + 0.5) * sy - 0.5;
    if (fy < 0) fy = 0;
    if (fy > sh - 1) fy = sh - 1;
    int32_t y0 = (int32_t)fy;
    int32_t y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float wy = (float)(fy - y0);
    for (int32_t c = 0; c < dw; ++c) {
      double fx = (c + 0.5) * sx - 0.5;
      if (fx < 0) fx = 0;
      if (fx > sw - 1) fx = sw - 1;
      int32_t x0 = (int32_t)fx;
      int32_t x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      float wx = (float)(fx - x0);
      for (int32_t ch = 0; ch < channels; ++ch) {
        const float v00 = src[((size_t)y0 * sw + x0) * channels + ch];
        const float v01 = src[((size_t)y0 * sw + x1) * channels + ch];
        const float v10 = src[((size_t)y1 * sw + x0) * channels + ch];
        const float v11 = src[((size_t)y1 * sw + x1) * channels + ch];
        float v = v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy) +
                  v10 * (1 - wx) * wy + v11 * wx * wy;
        dst[((size_t)r * dw + c) * channels + ch] = (uint8_t)(v + 0.5f);
      }
    }
  }
}

int an_version() { return 1; }

}  // extern "C"
