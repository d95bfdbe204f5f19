// Native host-side data-path kernels for the input pipeline.
//
// The reference leans on C++/CUDA for its data hot loops (cv2 decode,
// torch-scatter voxelization — SURVEY.md §2.10). On the TPU host the input
// pipeline is CPU-bound Python/numpy; these C implementations of the
// per-sample transforms (LiDAR histogram splat, 24-bit depth decode,
// semantic LUT, BEV bit-unpack, uint8->float normalize) keep the feed
// ahead of the accelerator. Exposed via a plain C ABI for ctypes.
//
// Build: make -C transfuser_tpu/native   (produces libfastloader.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// LiDAR (N, 4) xyzi -> (256, 256, 2) two-slice histogram, NHWC float32.
// Matches data/lidar_np.py::lidar_to_histogram (reference data.py:446-470):
// grid 8 px/m over x[-16,16) y[-32,0), clip 5 hits/cell, rot90(k=-1).
void lidar_histogram(const float* points, int64_t n_points, float* out) {
    constexpr int GRID = 256;
    constexpr float PPM = 8.0f;
    constexpr float X_MAX = 16.0f;
    constexpr float Y_MAX = 32.0f;
    constexpr float Z_SPLIT = -2.3f;
    constexpr float HIST_MAX = 5.0f;

    // counts[slice][xbin][ybin]
    static thread_local uint16_t counts[2][GRID][GRID];
    std::memset(counts, 0, sizeof(uint16_t) * 2 * GRID * GRID);

    for (int64_t i = 0; i < n_points; ++i) {
        const float x = points[i * 4 + 0];
        const float y = points[i * 4 + 1];
        const float z = points[i * 4 + 2];
        if (x < -X_MAX || x >= X_MAX || y < -Y_MAX || y >= 0.0f) continue;
        int xb = static_cast<int>((x + X_MAX) * PPM);
        int yb = static_cast<int>((y + Y_MAX) * PPM);
        // np.histogramdd includes the right edge of the last bin
        if (xb >= GRID) xb = GRID - 1;
        if (yb >= GRID) yb = GRID - 1;
        const int slice = (z <= Z_SPLIT) ? 1 : 0;  // 0 above, 1 below
        ++counts[slice][xb][yb];
    }

    // rot90(k=-1) on (X, Y): out[r][c] = grid[GRID-1-c][r]; channel-last.
    for (int r = 0; r < GRID; ++r) {
        for (int c = 0; c < GRID; ++c) {
            const int src_x = GRID - 1 - c;
            const int src_y = r;
            float above = std::min<float>(counts[0][src_x][src_y], HIST_MAX);
            float below = std::min<float>(counts[1][src_x][src_y], HIST_MAX);
            out[(r * GRID + c) * 2 + 0] = above / HIST_MAX;
            out[(r * GRID + c) * 2 + 1] = below / HIST_MAX;
        }
    }
}

// 24-bit RGB depth -> normalized [0,1] clipped at 50 m (data.py:358-372).
void decode_depth(const uint8_t* rgb, int64_t n_pixels, float* out) {
    constexpr double DENOM = 256.0 * 256.0 * 256.0 - 1.0;
    for (int64_t i = 0; i < n_pixels; ++i) {
        const double code = rgb[i * 3 + 0] * 65536.0 +
                            rgb[i * 3 + 1] * 256.0 + rgb[i * 3 + 2];
        double d = code / DENOM;
        if (d > 0.05) d = 0.05;
        out[i] = static_cast<float>(d * 20.0);
    }
}

// Semantic-id LUT conversion (config.py:88-117).
void semantic_convert(const uint8_t* in, int64_t n, const uint8_t* lut,
                      int lut_size, uint8_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t v = in[i];
        out[i] = (v < lut_size) ? lut[v] : 0;
    }
}

// Bit-packed topdown png (H, W, 3) -> road/lane planes (2, H, W) float32
// (data.py:844-856: planes 10,11 live in png channel 2 bits 7,6).
void decode_bev_roadlane(const uint8_t* packed, int64_t h, int64_t w,
                         float* out) {
    const int64_t n = h * w;
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t c2 = packed[i * 3 + 2];
        out[i] = static_cast<float>((c2 >> 7) & 1);       // channel 10
        out[n + i] = static_cast<float>((c2 >> 6) & 1);   // channel 11
    }
}

// uint8 HWC image -> float32 with optional crop + x-shift (data.py:545-560).
void crop_to_float(const uint8_t* img, int64_t h, int64_t w, int64_t c,
                   int64_t crop_h, int64_t crop_w, int64_t shift_x,
                   float* out) {
    const int64_t start_y = h / 2 - crop_h / 2;
    const int64_t start_x = w / 2 - crop_w / 2 + shift_x;
    for (int64_t y = 0; y < crop_h; ++y) {
        const uint8_t* row = img + ((start_y + y) * w + start_x) * c;
        float* orow = out + y * crop_w * c;
        const int64_t len = crop_w * c;
        for (int64_t i = 0; i < len; ++i) orow[i] = row[i];
    }
}

}  // extern "C"
