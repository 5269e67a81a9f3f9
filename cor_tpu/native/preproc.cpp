// cor_tpu native data-plane: Pillow-parity bilinear resample + normalize.
//
// The reference's data path leans on torch DataLoader workers and PIL's C
// resample loops (reference: utils/dataloader.py:94-125, 220-241). cor_tpu's
// loader threads call into this translation unit instead: one C call per
// sample does resize (bit-exact Pillow BILINEAR reproduction, fixed-point
// 8bpc pipeline) and the /255 + ImageNet mean/std normalize, releasing the
// GIL for real thread scaling.
//
// Algorithm parity notes (Pillow src/libImaging/Resample.c semantics):
// - separable two-pass resample, HORIZONTAL first, with the intermediate
//   quantized to uint8 (this quantization is part of PIL's observable
//   output, so it is reproduced, not "improved");
// - triangle filter, support 1.0, widened by the scale factor on downscale;
// - per-window coefficients computed in double, normalized, then converted
//   to int fixed point with PRECISION_BITS = 32 - 8 - 2 and round-half-away;
// - accumulation starts at 1 << (PRECISION_BITS - 1) and clips via shift.
//
// Build: g++ -O3 -shared -fPIC (cor_tpu/native/build.py). C ABI only.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

constexpr int PRECISION_BITS = 32 - 8 - 2;

// int32 accumulators, exactly like Pillow's own `int ss0` in
// ImagingResampleHorizontal_8bpc: worst case 255 * sum(kk) + rounding
// ≈ 255 * 2^22 * (1+eps) < 2^31, and half the SIMD width of int64.
inline uint8_t clip8(int32_t in) {
    if (in >= (1 << PRECISION_BITS << 8)) return 255;
    if (in <= 0) return 0;
    return static_cast<uint8_t>(in >> PRECISION_BITS);
}

inline double triangle_filter(double x) {
    if (x < 0.0) x = -x;
    return x < 1.0 ? 1.0 - x : 0.0;
}

// Pillow precompute_coeffs + normalize_coeffs_8bpc for one axis.
struct Coeffs {
    int ksize = 0;
    std::vector<int> bounds;  // [out, 2] = (xmin, xmax-count)
    std::vector<int> kk;      // [out, ksize] fixed-point
};

Coeffs precompute(int in_size, int out_size) {
    Coeffs c;
    double scale = static_cast<double>(in_size) / out_size;
    double filterscale = scale < 1.0 ? 1.0 : scale;
    double support = 1.0 * filterscale;  // triangle support = 1.0
    c.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
    c.bounds.resize(out_size * 2);
    c.kk.resize(static_cast<size_t>(out_size) * c.ksize);
    std::vector<double> k(c.ksize);
    double ss = 1.0 / filterscale;
    for (int xx = 0; xx < out_size; ++xx) {
        double center = (xx + 0.5) * scale;
        int xmin = static_cast<int>(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int xmax = static_cast<int>(center + support + 0.5);
        if (xmax > in_size) xmax = in_size;
        xmax -= xmin;
        double ww = 0.0;
        for (int x = 0; x < xmax; ++x) {
            double w = triangle_filter((x + xmin - center + 0.5) * ss);
            k[x] = w;
            ww += w;
        }
        for (int x = 0; x < xmax; ++x)
            if (ww != 0.0) k[x] /= ww;
        for (int x = 0; x < xmax; ++x) {
            double v = k[x] * (1 << PRECISION_BITS);
            c.kk[static_cast<size_t>(xx) * c.ksize + x] =
                static_cast<int>(v < 0 ? v - 0.5 : v + 0.5);
        }
        for (int x = xmax; x < c.ksize; ++x)
            c.kk[static_cast<size_t>(xx) * c.ksize + x] = 0;
        c.bounds[xx * 2 + 0] = xmin;
        c.bounds[xx * 2 + 1] = xmax;
    }
    return c;
}

// horizontal pass: [h, w, ch] u8 -> [h, ow, ch] u8
void resample_h(const uint8_t* src, int h, int w, int ch, uint8_t* dst, int ow,
                const Coeffs& c) {
    for (int yy = 0; yy < h; ++yy) {
        const uint8_t* row = src + static_cast<size_t>(yy) * w * ch;
        uint8_t* orow = dst + static_cast<size_t>(yy) * ow * ch;
        for (int xx = 0; xx < ow; ++xx) {
            int xmin = c.bounds[xx * 2], xmax = c.bounds[xx * 2 + 1];
            const int* k = &c.kk[static_cast<size_t>(xx) * c.ksize];
            if (ch == 3) {  // RGB fast path: 3 accumulators per tap read
                int32_t s0 = 1 << (PRECISION_BITS - 1), s1 = s0, s2 = s0;
                const uint8_t* p = row + static_cast<size_t>(xmin) * 3;
                for (int x = 0; x < xmax; ++x, p += 3) {
                    s0 += p[0] * k[x];
                    s1 += p[1] * k[x];
                    s2 += p[2] * k[x];
                }
                orow[xx * 3 + 0] = clip8(s0);
                orow[xx * 3 + 1] = clip8(s1);
                orow[xx * 3 + 2] = clip8(s2);
            } else {
                for (int b = 0; b < ch; ++b) {
                    int32_t ss0 = 1 << (PRECISION_BITS - 1);
                    for (int x = 0; x < xmax; ++x)
                        ss0 += row[(xmin + x) * ch + b] * k[x];
                    orow[xx * ch + b] = clip8(ss0);
                }
            }
        }
    }
}

// vertical pass: [h, w, ch] u8 -> [oh, w, ch] u8, written as per-tap AXPY
// over a contiguous int32 row accumulator so -O3 vectorizes the inner loop
void resample_v(const uint8_t* src, int h, int w, int ch, uint8_t* dst, int oh,
                const Coeffs& c) {
    const int row_elems = w * ch;
    std::vector<int32_t> acc(row_elems);
    for (int yy = 0; yy < oh; ++yy) {
        int ymin = c.bounds[yy * 2], ymax = c.bounds[yy * 2 + 1];
        const int* k = &c.kk[static_cast<size_t>(yy) * c.ksize];
        for (int xx = 0; xx < row_elems; ++xx)
            acc[xx] = 1 << (PRECISION_BITS - 1);
        for (int y = 0; y < ymax; ++y) {
            const uint8_t* srow = src + static_cast<size_t>(ymin + y) * row_elems;
            const int32_t ky = k[y];
            for (int xx = 0; xx < row_elems; ++xx)
                acc[xx] += srow[xx] * ky;
        }
        uint8_t* orow = dst + static_cast<size_t>(yy) * row_elems;
        for (int xx = 0; xx < row_elems; ++xx)
            orow[xx] = clip8(acc[xx]);
    }
}

// ---------------------------------------------------------------------------
// ImageEnhance-parity color jitter (reference: utils/dataloader.py:38-47).
//
// Pillow semantics, verified bit-exact against Pillow 12 (see
// tests/test_native_preproc.py):
// - every enhancer is Image.blend(degenerate, image, factor) with FLOAT32
//   arithmetic `out = in1 + f*(in2-in1)`, truncated to uint8; the clip to
//   [0,255] exists ONLY on the extrapolation branch (factor outside [0,1]);
// - Brightness degenerate = black; Contrast = solid gray at
//   int(mean(L) + 0.5); Color = L replicated to RGB; Sharpness = the SMOOTH
//   3x3 filter (kernel [1,1,1,1,5,1,1,1,1]/13, +0.5 then truncate, border
//   pixels copied);
// - L = (r*19595 + g*38470 + b*7471 + 0x8000) >> 16 (rounded).
// ---------------------------------------------------------------------------

inline uint8_t blend1(uint8_t in1, uint8_t in2, float f, bool extrapolate) {
    float v = static_cast<float>(in1) +
              f * (static_cast<float>(in2) - static_cast<float>(in1));
    if (extrapolate) {
        if (v <= 0.0f) return 0;
        if (v >= 255.0f) return 255;
    }
    return static_cast<uint8_t>(v);
}

inline uint8_t lum(const uint8_t* px) {
    return static_cast<uint8_t>(
        (px[0] * 19595u + px[1] * 38470u + px[2] * 7471u + 0x8000u) >> 16);
}

void smooth3x3(const uint8_t* src, int h, int w, uint8_t* dst) {
    // Pillow ImageFilter.SMOOTH: border rows/cols copied verbatim
    std::memcpy(dst, src, static_cast<size_t>(h) * w * 3);
    if (h < 3 || w < 3) return;
    const float k[9] = {1.f / 13, 1.f / 13, 1.f / 13, 1.f / 13, 5.f / 13,
                        1.f / 13, 1.f / 13, 1.f / 13, 1.f / 13};
    for (int y = 1; y < h - 1; ++y) {
        for (int x = 1; x < w - 1; ++x) {
            for (int b = 0; b < 3; ++b) {
                float ss = 0.0f;
                int ki = 0;
                for (int dy = -1; dy <= 1; ++dy)
                    for (int dx = -1; dx <= 1; ++dx)
                        ss += k[ki++] *
                              src[(static_cast<size_t>(y + dy) * w + (x + dx)) * 3 + b];
                ss += 0.5f;
                uint8_t v;
                if (ss <= 0.0f) v = 0;
                else if (ss >= 255.0f) v = 255;
                else v = static_cast<uint8_t>(ss);
                dst[(static_cast<size_t>(y) * w + x) * 3 + b] = v;
            }
        }
    }
}

}  // namespace

extern "C" {

// Full reference color-jitter chain on an RGB u8 image, Pillow-bit-exact:
// brightness -> contrast -> color -> sharpness, each Image.blend semantics.
// src/dst are [h, w, 3]; dst may NOT alias src.
void cor_color_enhance_u8(const uint8_t* src, int h, int w, float f_bright,
                          float f_contrast, float f_color, float f_sharp,
                          uint8_t* dst) {
    const size_t n = static_cast<size_t>(h) * w;
    std::vector<uint8_t> tmp(n * 3);
    uint8_t* t = tmp.data();

    // 1) brightness: blend(black, img, f)
    {
        const bool ex = f_bright < 0.0f || f_bright > 1.0f;
        for (size_t i = 0; i < n * 3; ++i) t[i] = blend1(0, src[i], f_bright, ex);
    }
    // 2) contrast: blend(solid gray mean(L), img, f)
    {
        uint64_t sum = 0;
        for (size_t i = 0; i < n; ++i) sum += lum(t + i * 3);
        const uint8_t mean = static_cast<uint8_t>(
            static_cast<int>(static_cast<double>(sum) / static_cast<double>(n) + 0.5));
        const bool ex = f_contrast < 0.0f || f_contrast > 1.0f;
        for (size_t i = 0; i < n * 3; ++i)
            t[i] = blend1(mean, t[i], f_contrast, ex);
    }
    // 3) color: blend(L replicated, img, f)
    {
        const bool ex = f_color < 0.0f || f_color > 1.0f;
        for (size_t i = 0; i < n; ++i) {
            const uint8_t g = lum(t + i * 3);
            for (int b = 0; b < 3; ++b)
                t[i * 3 + b] = blend1(g, t[i * 3 + b], f_color, ex);
        }
    }
    // 4) sharpness: blend(SMOOTH(img), img, f) — dst holds the smoothed
    //    degenerate, then is overwritten with the blend
    {
        smooth3x3(t, h, w, dst);
        const bool ex = f_sharp < 0.0f || f_sharp > 1.0f;
        for (size_t i = 0; i < n * 3; ++i)
            dst[i] = blend1(dst[i], t[i], f_sharp, ex);
    }
}

// Pillow-BILINEAR-parity resize of an interleaved u8 image.
void cor_resize_bilinear_u8(const uint8_t* src, int h, int w, int ch,
                            uint8_t* dst, int oh, int ow) {
    if (h == oh && w == ow) {
        std::memcpy(dst, src, static_cast<size_t>(h) * w * ch);
        return;
    }
    Coeffs ch_coef = precompute(w, ow);
    Coeffs cv_coef = precompute(h, oh);
    if (w != ow && h != oh) {
        std::vector<uint8_t> tmp(static_cast<size_t>(h) * ow * ch);
        resample_h(src, h, w, ch, tmp.data(), ow, ch_coef);
        resample_v(tmp.data(), h, ow, ch, dst, oh, cv_coef);
    } else if (w != ow) {
        resample_h(src, h, w, ch, dst, ow, ch_coef);
    } else {
        resample_v(src, h, w, ch, dst, oh, cv_coef);
    }
}

// resize + (x/255 - mean)/std into float32 HWC (mean/std length = ch; pass
// zeros/ones for plain [0,1] masks).
void cor_resize_normalize_f32(const uint8_t* src, int h, int w, int ch,
                              float* dst, int oh, int ow, const float* mean,
                              const float* stdv) {
    std::vector<uint8_t> resized(static_cast<size_t>(oh) * ow * ch);
    cor_resize_bilinear_u8(src, h, w, ch, resized.data(), oh, ow);
    const float inv255 = 1.0f / 255.0f;
    std::vector<float> scale(ch), shift(ch);
    for (int b = 0; b < ch; ++b) {
        scale[b] = inv255 / stdv[b];
        shift[b] = mean[b] / stdv[b];
    }
    size_t n = static_cast<size_t>(oh) * ow;
    for (size_t i = 0; i < n; ++i)
        for (int b = 0; b < ch; ++b)
            dst[i * ch + b] = resized[i * ch + b] * scale[b] - shift[b];
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Minimal 8-bit-grayscale PNG encoder (zlib). Serving writes one PNG per
// retrieved candidate mask (retrieval/serve.py::_save_masks) — measured the
// dominant per-request HOST cost at k=10 (Pillow's default zlib level 6
// spends ~19 ms per 256x256 mask; this encoder at level 1 is ~10x cheaper
// on the near-binary masks serving emits, and releases the GIL so writer
// threads overlap encodes with the next device dispatch). Standard PNG:
// IHDR (color type 0) + one IDAT holding the zlib stream of
// filter-byte-0-prefixed scanlines + IEND; readable by any decoder.
// ---------------------------------------------------------------------------

namespace {

inline void put_be32(uint8_t* p, uint32_t v) {
    p[0] = static_cast<uint8_t>(v >> 24);
    p[1] = static_cast<uint8_t>(v >> 16);
    p[2] = static_cast<uint8_t>(v >> 8);
    p[3] = static_cast<uint8_t>(v);
}

// chunk = len | type | data | crc32(type+data); returns bytes written
size_t put_chunk(uint8_t* out, const char* type, const uint8_t* data,
                 size_t n) {
    put_be32(out, static_cast<uint32_t>(n));
    std::memcpy(out + 4, type, 4);
    if (n) std::memcpy(out + 8, data, n);
    uLong crc = crc32(0L, Z_NULL, 0);
    crc = crc32(crc, out + 4, static_cast<uInt>(4 + n));
    put_be32(out + 8 + n, static_cast<uint32_t>(crc));
    return 12 + n;
}

}  // namespace

extern "C" {

// Encode an 8-bit grayscale [h, w] image as a complete PNG file into `out`
// (capacity out_cap). Returns the byte count, or -1 if out_cap is too
// small (call with out_cap >= cor_png_gray_bound(h, w)). `level` is the
// zlib level (1 = fast, serving's choice; 6 = Pillow's default).
long long cor_png_gray_bound(int h, int w) {
    const size_t raw = static_cast<size_t>(h) * (w + 1);
    return static_cast<long long>(compressBound(static_cast<uLong>(raw))) +
           8 + 25 + 12 + 12 + 64;  // sig + IHDR + IDAT/IEND framing + slack
}

long long cor_png_encode_gray(const uint8_t* src, int h, int w, int level,
                              uint8_t* out, long long out_cap) {
    static const uint8_t SIG[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n'};
    // filter byte 0 before every scanline (no filtering: masks are
    // near-binary, zlib eats runs directly)
    const size_t raw_n = static_cast<size_t>(h) * (w + 1);
    std::vector<uint8_t> raw(raw_n);
    for (int y = 0; y < h; ++y) {
        raw[static_cast<size_t>(y) * (w + 1)] = 0;
        std::memcpy(raw.data() + static_cast<size_t>(y) * (w + 1) + 1,
                    src + static_cast<size_t>(y) * w, w);
    }
    uLongf zcap = compressBound(static_cast<uLong>(raw_n));
    std::vector<uint8_t> z(zcap);
    if (compress2(z.data(), &zcap, raw.data(), static_cast<uLong>(raw_n),
                  level) != Z_OK)
        return -1;

    uint8_t ihdr[13];
    put_be32(ihdr, static_cast<uint32_t>(w));
    put_be32(ihdr + 4, static_cast<uint32_t>(h));
    ihdr[8] = 8;   // bit depth
    ihdr[9] = 0;   // color type: grayscale
    ihdr[10] = 0;  // compression
    ihdr[11] = 0;  // filter method
    ihdr[12] = 0;  // interlace

    const long long need =
        8 + 12 + 13 + 12 + static_cast<long long>(zcap) + 12;
    if (out_cap < need) return -1;
    uint8_t* p = out;
    std::memcpy(p, SIG, 8);
    p += 8;
    p += put_chunk(p, "IHDR", ihdr, 13);
    p += put_chunk(p, "IDAT", z.data(), zcap);
    p += put_chunk(p, "IEND", nullptr, 0);
    return static_cast<long long>(p - out);
}

}  // extern "C"
