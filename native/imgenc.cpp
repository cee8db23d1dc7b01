// YUV 4:2:0 camera-image encoder for the host->device upload path
// (ops/imgcodec.py). Bit-identical to the integer-fixed-point numpy
// reference encode_yuv420_np — same 8.8 coefficients, rounding biases and
// shifts — asserted by tests/test_imgcodec.py.
//
// Why native: the encode runs on the upload worker thread of a SINGLE-core
// host (remote-TPU tunnel box), where the float-numpy version measured
// ~18 ms per 376x1408 frame and ~70 ms per 6x448x800 oracle stack —
// real contention with the dispatch and decode threads. This loop is
// integer-only, touches each pixel once, and the ctypes call releases the
// GIL for its whole duration.
//
// Layout contract (caller: ops/imgcodec.encode_yuv420):
//   rgb: (n, h, w, 3) uint8 C-contiguous, h and w even
//   y:   (n, h, w) uint8 out
//   uv:  (n, h/2, w/2, 2) uint8 out
// Returns 0 on success, -1 on bad dims.

#include <cstdint>
#include <cstddef>

// yuv420h: 2x2 integer Haar luma (LL u8 + three 4-bit quantized details,
// nibble-packed along width) + 4x4 box-mean chroma — 0.75 B/pixel.
// Bit-identical to ops/imgcodec.encode_yuv420h_np (same fixed-point
// coefficients, rounding biases, floor shifts; >> on int32_t is
// arithmetic on gcc, matching numpy's floor semantics on negatives).
//
// Layout contract (caller: ops/imgcodec.encode_yuv420h):
//   rgb: (n, h, w, 3) uint8 C-contiguous, h and w multiples of 4
//   ll:  (n, h/2, w/2) uint8 out
//   det: (n, 3, h/2, w/4) uint8 out  [even-col nibble << 4 | odd-col]
//   uv:  (n, h/4, w/4, 2) uint8 out
extern "C" int imgenc_yuv420h(const void* rgb_p, long n, int h, int w,
                              void* ll_p, void* det_p, void* uv_p) {
  if (n < 0 || h <= 0 || w <= 0 || (h & 3) || (w & 3)) return -1;
  const uint8_t* rgb = static_cast<const uint8_t*>(rgb_p);
  uint8_t* ll = static_cast<uint8_t*>(ll_p);
  uint8_t* det = static_cast<uint8_t*>(det_p);
  uint8_t* uv = static_cast<uint8_t*>(uv_p);
  const long h2 = h / 2, w2 = w / 2, w4 = w / 4;
  const long det_plane = h2 * w4;
  for (long img = 0; img < n; ++img) {
    const uint8_t* src = rgb + img * (long)h * w * 3;
    uint8_t* llo = ll + img * h2 * w2;
    uint8_t* deto = det + img * 3 * det_plane;
    uint8_t* uvo = uv + img * (long)(h / 4) * w4 * 2;
    for (int i = 0; i < h; i += 2) {
      const uint8_t* r0 = src + (long)i * w * 3;
      const uint8_t* r1 = r0 + (long)w * 3;
      uint8_t* llr = llo + (long)(i / 2) * w2;
      uint8_t* dr[3] = {deto + (long)(i / 2) * w4,
                        deto + det_plane + (long)(i / 2) * w4,
                        deto + 2 * det_plane + (long)(i / 2) * w4};
      for (int j = 0; j < w; j += 2) {
        int32_t yb[4];
        const uint8_t* px[4] = {r0 + (long)j * 3, r0 + (long)(j + 1) * 3,
                                r1 + (long)j * 3, r1 + (long)(j + 1) * 3};
        for (int k = 0; k < 4; ++k) {
          const int32_t r = px[k][0], g = px[k][1], b = px[k][2];
          yb[k] = (77 * r + 150 * g + 29 * b + 128) >> 8;
        }
        llr[j / 2] = (uint8_t)((yb[0] + yb[1] + yb[2] + yb[3] + 2) >> 2);
        const int32_t d3[3] = {yb[0] + yb[2] - yb[1] - yb[3],
                               yb[0] + yb[1] - yb[2] - yb[3],
                               yb[0] - yb[1] - yb[2] + yb[3]};
        for (int c = 0; c < 3; ++c) {
          int32_t q = (d3[c] + 8) >> 4;   // step 16, floor(+half) rounding
          if (q < -8) q = -8; else if (q > 7) q = 7;
          const uint8_t nib = (uint8_t)(q + 8);
          uint8_t& cell = dr[c][j / 4];
          if ((j / 2) & 1) cell = (uint8_t)(cell | nib);   // odd col: low
          else cell = (uint8_t)(nib << 4);                  // even: high
        }
      }
    }
    // Chroma: 4x4 box mean of the 8.8 fixed-point planes.
    for (int i = 0; i < h; i += 4) {
      uint8_t* uvr = uvo + (long)(i / 4) * w4 * 2;
      for (int j = 0; j < w; j += 4) {
        int32_t us = 0, vs = 0;
        for (int di = 0; di < 4; ++di) {
          const uint8_t* row = src + (long)(i + di) * w * 3 + (long)j * 3;
          for (int dj = 0; dj < 4; ++dj) {
            const int32_t r = row[dj * 3], g = row[dj * 3 + 1],
                          b = row[dj * 3 + 2];
            us += -43 * r - 85 * g + 128 * b + (128 << 8);
            vs += 128 * r - 107 * g - 21 * b + (128 << 8);
          }
        }
        int32_t u8v = (us + 2048) >> 12;
        int32_t v8v = (vs + 2048) >> 12;
        if (u8v < 0) u8v = 0; else if (u8v > 255) u8v = 255;
        if (v8v < 0) v8v = 0; else if (v8v > 255) v8v = 255;
        uvr[(long)(j / 4) * 2] = (uint8_t)u8v;
        uvr[(long)(j / 4) * 2 + 1] = (uint8_t)v8v;
      }
    }
  }
  return 0;
}

extern "C" int imgenc_yuv420(const void* rgb_p, long n, int h, int w,
                             void* y_p, void* uv_p) {
  if (n < 0 || h <= 0 || w <= 0 || (h & 1) || (w & 1)) return -1;
  const uint8_t* rgb = static_cast<const uint8_t*>(rgb_p);
  uint8_t* y = static_cast<uint8_t*>(y_p);
  uint8_t* uv = static_cast<uint8_t*>(uv_p);
  const long w2 = w / 2;
  for (long img = 0; img < n; ++img) {
    const uint8_t* src = rgb + img * (long)h * w * 3;
    uint8_t* yo = y + img * (long)h * w;
    uint8_t* uvo = uv + img * (long)(h / 2) * w2 * 2;
    for (int i = 0; i < h; i += 2) {
      const uint8_t* r0 = src + (long)i * w * 3;
      const uint8_t* r1 = r0 + (long)w * 3;
      uint8_t* y0 = yo + (long)i * w;
      uint8_t* y1 = y0 + w;
      uint8_t* uvr = uvo + (long)(i / 2) * w2 * 2;
      for (int j = 0; j < w; j += 2) {
        int32_t us = 0, vs = 0;
        // 2x2 block: four pixels' Y, plus fixed-point chroma sums.
        const uint8_t* px[4] = {r0 + (long)j * 3, r0 + (long)(j + 1) * 3,
                                r1 + (long)j * 3, r1 + (long)(j + 1) * 3};
        uint8_t* yd[4] = {y0 + j, y0 + j + 1, y1 + j, y1 + j + 1};
        for (int k = 0; k < 4; ++k) {
          const int32_t r = px[k][0], g = px[k][1], b = px[k][2];
          const int32_t y16 = 77 * r + 150 * g + 29 * b;
          *yd[k] = (uint8_t)((y16 + 128) >> 8);
          us += -43 * r - 85 * g + 128 * b + (128 << 8);
          vs += 128 * r - 107 * g - 21 * b + (128 << 8);
        }
        int32_t u8v = (us + 512) >> 10;
        int32_t v8v = (vs + 512) >> 10;
        if (u8v < 0) u8v = 0; else if (u8v > 255) u8v = 255;
        if (v8v < 0) v8v = 0; else if (v8v > 255) v8v = 255;
        uvr[(long)(j / 2) * 2] = (uint8_t)u8v;
        uvr[(long)(j / 2) * 2 + 1] = (uint8_t)v8v;
      }
    }
  }
  return 0;
}
