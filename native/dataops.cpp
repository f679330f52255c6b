// Native host-side data ops for the spatialrgpt_tpu input pipeline.
//
// The reference's data path leans on pycocotools (C), cv2 (C++), and
// python loops in the collators (llava/data/dataset.py:1795-2154).  This
// library provides the hot host-side primitives as vectorized C++ with a
// C ABI consumed via ctypes (native/__init__.py):
//
//   rle_decode        COCO compressed-RLE -> binary mask
//   resize_nearest    nearest-neighbor mask resize (process_masks path)
//   resize_bilinear   bilinear mask resize (region pooling prep)
//   pack_greedy       length-descending first-fit packing (the collator's
//                     greedy packer over expanded sample lengths)
//   expand_counts     sequence expansion bookkeeping (image-token fanout)
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// Decode LEB128-ish COCO compressed counts into a column-major mask.
// counts: ascii bytes; mask_out: row-major uint8 (h*w), pre-zeroed by caller.
// Returns 0 on success.
int rle_decode(const char* counts, int64_t counts_len, int64_t h, int64_t w,
               uint8_t* mask_out) {
    std::vector<int64_t> runs;
    runs.reserve(256);
    int64_t i = 0;
    while (i < counts_len) {
        int64_t x = 0;
        int k = 0;
        bool more = true;
        while (more) {
            if (i >= counts_len) return 1;
            int64_t c = counts[i] - 48;
            x |= (c & 0x1f) << (5 * k);
            more = (c & 0x20) != 0;
            i++;
            k++;
            if (!more && (c & 0x10)) x |= ~((int64_t)0) << (5 * k);
        }
        if (runs.size() > 2) x += runs[runs.size() - 2];
        runs.push_back(x);
    }
    // column-major fill
    int64_t pos = 0;
    uint8_t val = 0;
    const int64_t total = h * w;
    for (int64_t r : runs) {
        if (val) {
            int64_t end = std::min(pos + r, total);
            for (int64_t p = pos; p < end; ++p) {
                mask_out[(p % h) * w + (p / h)] = 1;
            }
        }
        pos += r;
        val = 1 - val;
    }
    return pos == total ? 0 : 2;
}

// Decode a counts LIST (uncompressed RLE) given as int64 array.
int rle_decode_counts(const int64_t* runs, int64_t n_runs, int64_t h, int64_t w,
                      uint8_t* mask_out) {
    int64_t pos = 0;
    uint8_t val = 0;
    const int64_t total = h * w;
    for (int64_t ri = 0; ri < n_runs; ++ri) {
        int64_t r = runs[ri];
        if (val) {
            int64_t end = std::min(pos + r, total);
            for (int64_t p = pos; p < end; ++p) {
                mask_out[(p % h) * w + (p / h)] = 1;
            }
        }
        pos += r;
        val = 1 - val;
    }
    return pos == total ? 0 : 2;
}

// Nearest-neighbor resize, uint8, matching cv2.INTER_NEAREST's
// floor(dst * src/dst) sampling.
void resize_nearest(const uint8_t* src, int64_t sh, int64_t sw,
                    uint8_t* dst, int64_t dh, int64_t dw) {
    const double fy = (double)sh / dh;
    const double fx = (double)sw / dw;
    for (int64_t y = 0; y < dh; ++y) {
        int64_t sy = std::min((int64_t)(y * fy), sh - 1);
        const uint8_t* srow = src + sy * sw;
        uint8_t* drow = dst + y * dw;
        for (int64_t x = 0; x < dw; ++x) {
            int64_t sx = std::min((int64_t)(x * fx), sw - 1);
            drow[x] = srow[sx];
        }
    }
}

// Bilinear (half-pixel, no antialias) resize, float32 — torch
// F.interpolate(align_corners=False) semantics.
void resize_bilinear(const float* src, int64_t sh, int64_t sw,
                     float* dst, int64_t dh, int64_t dw) {
    const double fy = (double)sh / dh;
    const double fx = (double)sw / dw;
    for (int64_t y = 0; y < dh; ++y) {
        double cy = (y + 0.5) * fy - 0.5;
        if (cy < 0) cy = 0;
        int64_t y0 = (int64_t)cy;
        int64_t y1 = std::min(y0 + 1, sh - 1);
        double wy = cy - y0;
        for (int64_t x = 0; x < dw; ++x) {
            double cx = (x + 0.5) * fx - 0.5;
            if (cx < 0) cx = 0;
            int64_t x0 = (int64_t)cx;
            int64_t x1 = std::min(x0 + 1, sw - 1);
            double wx = cx - x0;
            double v = src[y0 * sw + x0] * (1 - wy) * (1 - wx) +
                       src[y0 * sw + x1] * (1 - wy) * wx +
                       src[y1 * sw + x0] * wy * (1 - wx) +
                       src[y1 * sw + x1] * wy * wx;
            dst[y * dw + x] = (float)v;
        }
    }
}

// Greedy length-descending first-fit packing.
// lengths: per-sample expanded lengths; bin_of[i] = assigned row;
// returns the number of bins used.  Mirrors data/splice.py pack_rows.
int64_t pack_greedy(const int64_t* lengths, int64_t n, int64_t max_len,
                    int64_t* bin_of) {
    std::vector<int64_t> order(n);
    for (int64_t i = 0; i < n; ++i) order[i] = i;
    std::stable_sort(order.begin(), order.end(),
                     [&](int64_t a, int64_t b) { return lengths[a] > lengths[b]; });
    std::vector<int64_t> fill;
    for (int64_t oi = 0; oi < n; ++oi) {
        int64_t i = order[oi];
        int64_t placed = -1;
        for (size_t b = 0; b < fill.size(); ++b) {
            if (fill[b] + lengths[i] <= max_len) {
                placed = (int64_t)b;
                break;
            }
        }
        if (placed < 0) {
            placed = (int64_t)fill.size();
            fill.push_back(0);
        }
        fill[placed] += lengths[i];
        bin_of[i] = placed;
    }
    return (int64_t)fill.size();
}

}  // extern "C"
