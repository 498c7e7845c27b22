// Native event-to-tensor builders (host data path).
//
// TPU-native counterpart of the reference's C++/CUDA data plumbing: the
// per-voxel accumulation (utils/transformers.py:128-161 count-binned stack,
// :21-125 bilinear voxel grid) is the host-side hot loop — numpy's
// ufunc.at on 100k-500k events per chunk costs tens of ms; these plain
// C++ loops run in ~1ms. Exposed via ctypes (see ../native.py).

#include <cstdint>
#include <cstring>
#include <cmath>

extern "C" {

// Count-binned polarity stack: event k of n -> bin floor(bins * k / n).
// Accumulates float then casts like numpy's astype(int8).
void event_stack(int8_t* out, const uint16_t* x, const uint16_t* y,
                 const int8_t* p, int64_t n, int64_t bins, int64_t H,
                 int64_t W) {
    const int64_t plane = H * W;
    float* acc = new float[bins * plane]();
    for (int64_t k = 0; k < n; ++k) {
        const int64_t b = (int64_t)(bins * (float)k / (float)n);
        const int64_t xi = x[k], yi = y[k];
        if (xi < W && yi < H && b < bins) {
            acc[b * plane + yi * W + xi] += (float)p[k];
        }
    }
    for (int64_t i = 0; i < bins * plane; ++i) {
        out[i] = (int8_t)acc[i];
    }
    delete[] acc;
}

// Bilinear-in-time voxel grid (no normalization; caller normalizes).
void voxel_grid(float* out, const uint16_t* x, const uint16_t* y,
                const int64_t* t, const int8_t* p, int64_t n, int64_t bins,
                int64_t H, int64_t W) {
    const int64_t plane = H * W;
    std::memset(out, 0, sizeof(float) * bins * plane);
    if (n == 0) return;
    double t0 = (double)t[0];
    double dT = (double)t[n - 1] - t0;
    if (dT == 0.0) dT = 1.0;
    for (int64_t k = 0; k < n; ++k) {
        const double ts = (bins - 1) * ((double)t[k] - t0) / dT;
        const int64_t ti = (int64_t)std::floor(ts);
        const float dt = (float)(ts - (double)ti);
        const float pol = (float)p[k];
        const int64_t xi = x[k], yi = y[k];
        if (xi >= W || yi >= H) continue;
        const int64_t px = yi * W + xi;
        if (ti >= 0 && ti < bins) out[ti * plane + px] += pol * (1.0f - dt);
        if (ti >= 0 && ti + 1 < bins) out[(ti + 1) * plane + px] += pol * dt;
    }
}

}  // extern "C"
