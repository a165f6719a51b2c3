// discodata — native host-side image preprocessing for the TPU input
// pipeline.
//
// The reference delegates these ops to OpenCV (cv2.dilate / cv2.resize at
// dataset.py:52-66); this library provides the same numerics as a single
// fused pass with no OpenCV dependency:
//
//   * edge thickening: the reference computes 255 - dilate3x3(255 - x),
//     which is exactly a 3x3 erosion (min filter) of x; cv2.dilate's
//     default constant border (-inf for dilate) makes it a min over the
//     valid neighbors.
//   * bilinear resize with half-pixel centers (cv2 float path).
//   * /255 normalization into float32 HWC.
//
// Built at import time by data/native.py (g++ -O3 -shared), bound via
// ctypes.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// 3x3 min filter (== the reference's invert-dilate-invert edge op) on a
// float HWC image. Border: min over valid neighbors only.
void erode3x3_f32(const float* in, float* out, int h, int w, int c) {
    for (int y = 0; y < h; ++y) {
        const int y0 = std::max(y - 1, 0), y1 = std::min(y + 1, h - 1);
        for (int x = 0; x < w; ++x) {
            const int x0 = std::max(x - 1, 0), x1 = std::min(x + 1, w - 1);
            for (int ch = 0; ch < c; ++ch) {
                float m = in[(y * w + x) * c + ch];
                for (int yy = y0; yy <= y1; ++yy)
                    for (int xx = x0; xx <= x1; ++xx)
                        m = std::min(m, in[(yy * w + xx) * c + ch]);
                out[(y * w + x) * c + ch] = m;
            }
        }
    }
}

// 3x3 max filter (plain dilation), same border convention.
void dilate3x3_f32(const float* in, float* out, int h, int w, int c) {
    for (int y = 0; y < h; ++y) {
        const int y0 = std::max(y - 1, 0), y1 = std::min(y + 1, h - 1);
        for (int x = 0; x < w; ++x) {
            const int x0 = std::max(x - 1, 0), x1 = std::min(x + 1, w - 1);
            for (int ch = 0; ch < c; ++ch) {
                float m = in[(y * w + x) * c + ch];
                for (int yy = y0; yy <= y1; ++yy)
                    for (int xx = x0; xx <= x1; ++xx)
                        m = std::max(m, in[(yy * w + xx) * c + ch]);
                out[(y * w + x) * c + ch] = m;
            }
        }
    }
}

// Bilinear resize, half-pixel centers (cv2 INTER_LINEAR float convention),
// float HWC in/out.
void resize_bilinear_f32(const float* in, float* out, int ih, int iw,
                         int oh, int ow, int c) {
    const double sy = static_cast<double>(ih) / oh;
    const double sx = static_cast<double>(iw) / ow;
    for (int y = 0; y < oh; ++y) {
        double fy = (y + 0.5) * sy - 0.5;
        int y0 = static_cast<int>(std::floor(fy));
        double wy = fy - y0;
        if (y0 < 0) { y0 = 0; wy = 0.0; }
        int y1 = std::min(y0 + 1, ih - 1);
        if (y0 > ih - 1) { y0 = ih - 1; wy = 0.0; }
        for (int x = 0; x < ow; ++x) {
            double fx = (x + 0.5) * sx - 0.5;
            int x0 = static_cast<int>(std::floor(fx));
            double wx = fx - x0;
            if (x0 < 0) { x0 = 0; wx = 0.0; }
            int x1 = std::min(x0 + 1, iw - 1);
            if (x0 > iw - 1) { x0 = iw - 1; wx = 0.0; }
            for (int ch = 0; ch < c; ++ch) {
                const double p00 = in[(y0 * iw + x0) * c + ch];
                const double p01 = in[(y0 * iw + x1) * c + ch];
                const double p10 = in[(y1 * iw + x0) * c + ch];
                const double p11 = in[(y1 * iw + x1) * c + ch];
                const double top = p00 * (1 - wx) + p01 * wx;
                const double bot = p10 * (1 - wx) + p11 * wx;
                out[(y * ow + x) * c + ch] =
                    static_cast<float>(top * (1 - wy) + bot * wy);
            }
        }
    }
}

// Fused reference preprocessing for one decoded RGB image:
//   uint8 HWC -> [optional left/right 256px crop] -> [optional edge
//   thickening (erosion)] -> bilinear resize to size x size -> /255
//   float32 HWC.
// domain: 0 = none, 1 = 'A' (left crop + edge), 2 = 'B' (right crop).
void preprocess_u8(const uint8_t* in, int h, int w, int c, int domain,
                   int size, float* out) {
    int x_off = 0, cw = w;
    if (domain == 1) { cw = std::min(256, w); }
    if (domain == 2) { x_off = std::min(256, w); cw = w - x_off; }

    std::vector<float> buf(static_cast<size_t>(h) * cw * c);
    for (int y = 0; y < h; ++y)
        for (int x = 0; x < cw; ++x)
            for (int ch = 0; ch < c; ++ch)
                buf[(y * cw + x) * c + ch] =
                    static_cast<float>(in[(y * w + (x + x_off)) * c + ch]);

    std::vector<float> eroded;
    const float* src = buf.data();
    if (domain == 1) {
        eroded.resize(buf.size());
        erode3x3_f32(buf.data(), eroded.data(), h, cw, c);
        src = eroded.data();
    }

    std::vector<float> resized(static_cast<size_t>(size) * size * c);
    resize_bilinear_f32(src, resized.data(), h, cw, size, size, c);
    const float inv = 1.0f / 255.0f;
    for (size_t i = 0; i < resized.size(); ++i) out[i] = resized[i] * inv;
}

}  // extern "C"
