// Run-length-encoded binary mask codec, C API for ctypes.
//
// TPU-native framework's replacement for the reference's vendored Cython
// wrapper of the pycocotools C maskApi (`Detection/evaluator/_mask.pyx`):
// a from-scratch implementation of the same public contract — column-major
// (Fortran-order) RLE over h*w binary masks, alternating zero/one run
// counts starting with zeros, COCO-compatible compressed string form
// (6-bit chunks, +48 ASCII offset, delta coding from the count two back),
// encode/decode/merge/IoU/area/bbox.
//
// Built as a shared library (see native/Makefile); mot3d_tpu/evaluator/rle.py
// loads it via ctypes with a NumPy fallback.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// Encode a column-major binary mask (h*w bytes) into run counts.
// Returns the number of counts written (<= h*w + 1).
int64_t rle_encode(const uint8_t* mask, int64_t h, int64_t w,
                   uint32_t* counts_out) {
  const int64_t n = h * w;
  int64_t m = 0;
  uint8_t prev = 0;  // runs start with zeros
  uint32_t run = 0;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t v = mask[i] ? 1 : 0;
    if (v != prev) {
      counts_out[m++] = run;
      run = 0;
      prev = v;
    }
    ++run;
  }
  counts_out[m++] = run;
  return m;
}

// Decode run counts into a column-major binary mask (h*w bytes).
void rle_decode(const uint32_t* counts, int64_t m, int64_t h, int64_t w,
                uint8_t* mask_out) {
  int64_t pos = 0;
  const int64_t n = h * w;
  uint8_t v = 0;
  for (int64_t i = 0; i < m && pos < n; ++i) {
    const int64_t run = std::min<int64_t>(counts[i], n - pos);
    std::memset(mask_out + pos, v, run);
    pos += run;
    v = 1 - v;
  }
  if (pos < n) std::memset(mask_out + pos, 0, n - pos);
}

int64_t rle_area(const uint32_t* counts, int64_t m) {
  int64_t a = 0;
  for (int64_t i = 1; i < m; i += 2) a += counts[i];
  return a;
}

// Merge two RLEs (union if intersect == 0, intersection otherwise).
// Returns number of counts written.
int64_t rle_merge(const uint32_t* a, int64_t ma, const uint32_t* b,
                  int64_t mb, int intersect, uint32_t* out) {
  int64_t ia = 0, ib = 0, m = 0;
  uint64_t ca = ia < ma ? a[ia] : 0, cb = ib < mb ? b[ib] : 0;
  uint8_t va = 0, vb = 0, vprev = 0;
  uint64_t run = 0;
  // Sweep both run lists simultaneously.
  while (ia < ma || ib < mb) {
    while (ca == 0 && ia + 1 < ma) { ++ia; ca = a[ia]; va = ia & 1; }
    while (cb == 0 && ib + 1 < mb) { ++ib; cb = b[ib]; vb = ib & 1; }
    if (ca == 0 && cb == 0) break;
    uint64_t step;
    if (ca == 0) step = cb;
    else if (cb == 0) step = ca;
    else step = std::min(ca, cb);
    const uint8_t v = intersect ? (va & vb) : (va | vb);
    if (v != vprev) {
      out[m++] = static_cast<uint32_t>(run);
      run = 0;
      vprev = v;
    }
    run += step;
    if (ca >= step) ca -= step; else ca = 0;
    if (cb >= step) cb -= step; else cb = 0;
  }
  out[m++] = static_cast<uint32_t>(run);
  return m;
}

// Intersection area of two RLEs (for IoU) without materialising masks.
int64_t rle_intersection(const uint32_t* a, int64_t ma, const uint32_t* b,
                         int64_t mb) {
  int64_t ia = 0, ib = 0;
  uint64_t ca = ia < ma ? a[ia] : 0, cb = ib < mb ? b[ib] : 0;
  uint8_t va = 0, vb = 0;
  int64_t inter = 0;
  while (ia < ma || ib < mb) {
    while (ca == 0 && ia + 1 < ma) { ++ia; ca = a[ia]; va = ia & 1; }
    while (cb == 0 && ib + 1 < mb) { ++ib; cb = b[ib]; vb = ib & 1; }
    if (ca == 0 && cb == 0) break;
    uint64_t step;
    if (ca == 0) step = cb;
    else if (cb == 0) step = ca;
    else step = std::min(ca, cb);
    if (va && vb) inter += step;
    if (ca >= step) ca -= step; else ca = 0;
    if (cb >= step) cb -= step; else cb = 0;
  }
  return inter;
}

// Pairwise IoU matrix between D detection RLEs and G ground-truth RLEs.
// Flattened (counts, offsets) layout; iscrowd[g] uses the COCO convention
// iou = intersection / area(dt).
void rle_iou_matrix(const uint32_t* d_counts, const int64_t* d_off,
                    int64_t nd, const uint32_t* g_counts,
                    const int64_t* g_off, int64_t ng,
                    const uint8_t* iscrowd, double* iou_out) {
  for (int64_t i = 0; i < nd; ++i) {
    const uint32_t* dc = d_counts + d_off[i];
    const int64_t dm = d_off[i + 1] - d_off[i];
    const int64_t da = rle_area(dc, dm);
    for (int64_t j = 0; j < ng; ++j) {
      const uint32_t* gc = g_counts + g_off[j];
      const int64_t gm = g_off[j + 1] - g_off[j];
      const int64_t ga = rle_area(gc, gm);
      const int64_t inter = rle_intersection(dc, dm, gc, gm);
      double denom = iscrowd && iscrowd[j]
                         ? static_cast<double>(da)
                         : static_cast<double>(da + ga - inter);
      iou_out[i * ng + j] = denom > 0 ? inter / denom : 0.0;
    }
  }
}

// COCO compressed string form: 6-bit chunks + 48, continuation bit 0x20,
// counts[i>=2] delta-coded against counts[i-2].  Returns string length.
int64_t rle_to_string(const uint32_t* counts, int64_t m, char* out) {
  int64_t p = 0;
  for (int64_t i = 0; i < m; ++i) {
    int64_t x = static_cast<int64_t>(counts[i]);
    if (i > 2) x -= static_cast<int64_t>(counts[i - 2]);
    bool more = true;
    while (more) {
      int64_t c = x & 0x1f;
      x >>= 5;
      more = (c & 0x10) ? x != -1 : x != 0;
      if (more) c |= 0x20;
      out[p++] = static_cast<char>(c + 48);
    }
  }
  out[p] = 0;
  return p;
}

// Decode a compressed string; returns number of counts.
int64_t rle_from_string(const char* s, int64_t len, uint32_t* counts_out) {
  int64_t m = 0, p = 0;
  while (p < len) {
    int64_t x = 0;
    int k = 0;
    bool more = true;
    while (more) {
      const int64_t c = s[p] - 48;
      x |= (c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      ++p;
      ++k;
      if (!more && (c & 0x10)) x |= -1L << (5 * k);
    }
    if (m > 2) x += static_cast<int64_t>(counts_out[m - 2]);
    counts_out[m++] = static_cast<uint32_t>(x);
  }
  return m;
}

// Tight bbox [x, y, w, h] of an RLE.
void rle_bbox(const uint32_t* counts, int64_t m, int64_t h, int64_t w,
              double* bbox_out) {
  int64_t xmin = w, xmax = -1, ymin = h, ymax = -1;
  int64_t pos = 0;
  for (int64_t i = 0; i < m; ++i) {
    if (i & 1) {  // run of ones
      const int64_t start = pos, end = pos + counts[i] - 1;
      const int64_t x0 = start / h, x1 = end / h;
      xmin = std::min(xmin, x0);
      xmax = std::max(xmax, x1);
      if (x0 == x1) {
        ymin = std::min(ymin, start % h);
        ymax = std::max(ymax, end % h);
      } else {  // spans full columns in between
        ymin = 0;
        ymax = h - 1;
      }
    }
    pos += counts[i];
  }
  if (xmax < 0) {
    bbox_out[0] = bbox_out[1] = bbox_out[2] = bbox_out[3] = 0;
  } else {
    bbox_out[0] = xmin;
    bbox_out[1] = ymin;
    bbox_out[2] = xmax - xmin + 1;
    bbox_out[3] = ymax - ymin + 1;
  }
}

}  // extern "C"
