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
#include <cstdio>
#include <cstring>

#include <png.h>

extern "C" {

// ---------------------------------------------------------------- PNG IO
// cv2.imread was the largest remaining host-decode cost (~4.5 ms/sample,
// PERF_NOTES "Host data path"); these wrap libpng directly with zero
// Python/cv2 overhead and decode straight into the caller's buffer in
// the requested channel count/order.

// Image dimensions without decoding. Returns 0 on success.
int png_info_file(const char* path, int64_t* w, int64_t* h, int64_t* c) {
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return 1;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (!png || !info || setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        std::fclose(fp);
        return 2;
    }
    png_init_io(png, fp);
    png_read_info(png, info);
    *w = png_get_image_width(png, info);
    *h = png_get_image_height(png, info);
    const int color = png_get_color_type(png, info);
    *c = (color == PNG_COLOR_TYPE_GRAY) ? 1
         : (color == PNG_COLOR_TYPE_GRAY_ALPHA) ? 2
         : (color == PNG_COLOR_TYPE_RGBA) ? 4 : 3;
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 0;
}

// Decode an 8/16-bit PNG into `out` as uint8 HWC with `channels` (1, 3 or
// 4; 3 = RGB). Caller allocates h*w*channels bytes (from png_info_file).
// Returns 0 on success, nonzero on IO/format mismatch.
int png_decode_file(const char* path, uint8_t* out, int64_t h, int64_t w,
                    int64_t channels) {
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return 1;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    png_bytep* rows = nullptr;
    if (!png || !info || setjmp(png_jmpbuf(png))) {
        delete[] rows;
        png_destroy_read_struct(&png, &info, nullptr);
        std::fclose(fp);
        return 2;
    }
    png_init_io(png, fp);
    png_read_info(png, info);
    if (png_get_image_width(png, info) != w ||
        png_get_image_height(png, info) != h) {
        png_destroy_read_struct(&png, &info, nullptr);
        std::fclose(fp);
        return 3;
    }
    png_set_strip_16(png);
    png_set_packing(png);
    const int color = png_get_color_type(png, info);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (channels >= 3 &&
        (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA))
        png_set_gray_to_rgb(png);
    if (channels <= 2 && (color & PNG_COLOR_MASK_COLOR))
        png_set_rgb_to_gray_fixed(png, 1, -1, -1);
    if (channels == 1 || channels == 3)
        png_set_strip_alpha(png);
    if ((channels == 4 && !(color & PNG_COLOR_MASK_ALPHA)) ||
        (channels == 2 && !(color & PNG_COLOR_MASK_ALPHA)))
        png_set_filler(png, 0xFF, PNG_FILLER_AFTER);
    png_read_update_info(png, info);
    if (png_get_rowbytes(png, info) !=
        static_cast<png_size_t>(w * channels)) {
        png_destroy_read_struct(&png, &info, nullptr);
        std::fclose(fp);
        return 4;
    }
    rows = new png_bytep[h];
    for (int64_t r = 0; r < h; ++r) rows[r] = out + r * w * channels;
    png_read_image(png, rows);
    delete[] rows;
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 0;
}

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
