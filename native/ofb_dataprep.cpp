// ofb_dataprep — native host-side image staging for the input pipeline.
//
// The reference feeds its GPU loop from torchvision ImageFolder + PIL on
// CPU workers (reference datasets.py:90-163, search.py:462-476). Here the
// host's only job is: JPEG decode -> shorter-side resize -> center crop to
// the fixed staging square (uint8 HWC); every randomized augmentation runs
// on-device (ofb_tpu/ops/augment.py). This library implements that staging
// step natively:
//
//   * libjpeg decode with DCT scaling (scale_num/8) so most of the
//     downscale is free inside the decoder;
//   * box-filter (area-average) resize for the remaining factor, then
//     bilinear for upscales;
//   * a std::thread batch API so one Python call stages a whole batch.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
// Build: make -C native   (g++ -O3 -shared -fPIC -ljpeg)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(err->jump, 1);
}

// Decode a JPEG into RGB8. Picks the largest libjpeg DCT scale (M/8) whose
// output still covers `min_side` on the shorter side, so the decoder does
// the bulk of the downscale. Returns false on corrupt input.
bool decode_jpeg(const uint8_t* data, size_t len, int min_side,
                 std::vector<uint8_t>& out, int& w, int& h) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_error_exit;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
                 static_cast<unsigned long>(len));
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;

    const int full_short = std::min<int>(cinfo.image_width,
                                         cinfo.image_height);
    int scale = 8;  // numerator over 8
    if (min_side > 0) {
        while (scale > 1 && (full_short * (scale - 1)) / 8 >= min_side)
            --scale;
    }
    cinfo.scale_num = scale;
    cinfo.scale_denom = 8;

    jpeg_start_decompress(&cinfo);
    w = cinfo.output_width;
    h = cinfo.output_height;
    const int comps = cinfo.output_components;  // 3 for RGB
    out.resize(static_cast<size_t>(w) * h * 3);
    std::vector<uint8_t> row(static_cast<size_t>(w) * comps);
    for (int y = 0; y < h; ++y) {
        uint8_t* rp = row.data();
        jpeg_read_scanlines(&cinfo, &rp, 1);
        uint8_t* dst = out.data() + static_cast<size_t>(y) * w * 3;
        if (comps == 3) {
            std::memcpy(dst, row.data(), static_cast<size_t>(w) * 3);
        } else {  // grayscale -> RGB
            for (int x = 0; x < w; ++x) {
                dst[3 * x] = dst[3 * x + 1] = dst[3 * x + 2] = row[x];
            }
        }
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return true;
}

// Area-average (box) resize RGB8; good quality for downscale, degrades to
// bilinear-ish for upscale.
void resize_rgb(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw,
                int dh) {
    const float xr = static_cast<float>(sw) / dw;
    const float yr = static_cast<float>(sh) / dh;
    for (int dy = 0; dy < dh; ++dy) {
        float y0 = dy * yr, y1 = (dy + 1) * yr;
        int iy0 = static_cast<int>(y0);
        int iy1 = std::min(sh, std::max(iy0 + 1, static_cast<int>(
            std::ceil(y1))));
        for (int dx = 0; dx < dw; ++dx) {
            float x0 = dx * xr, x1 = (dx + 1) * xr;
            int ix0 = static_cast<int>(x0);
            int ix1 = std::min(sw, std::max(ix0 + 1, static_cast<int>(
                std::ceil(x1))));
            float acc[3] = {0.f, 0.f, 0.f};
            float wsum = 0.f;
            for (int sy = iy0; sy < iy1; ++sy) {
                float wy = std::min<float>(y1, sy + 1) -
                           std::max<float>(y0, sy);
                if (wy <= 0) continue;
                const uint8_t* rowp =
                    src + (static_cast<size_t>(sy) * sw) * 3;
                for (int sx = ix0; sx < ix1; ++sx) {
                    float wx = std::min<float>(x1, sx + 1) -
                               std::max<float>(x0, sx);
                    if (wx <= 0) continue;
                    float wgt = wx * wy;
                    const uint8_t* p = rowp + sx * 3;
                    acc[0] += wgt * p[0];
                    acc[1] += wgt * p[1];
                    acc[2] += wgt * p[2];
                    wsum += wgt;
                }
            }
            uint8_t* d = dst + (static_cast<size_t>(dy) * dw + dx) * 3;
            for (int c = 0; c < 3; ++c) {
                d[c] = static_cast<uint8_t>(
                    std::min(255.f, std::max(0.f, acc[c] / wsum + 0.5f)));
            }
        }
    }
}

// shorter-side resize to `staging` + center crop staging x staging
bool stage_image(const uint8_t* data, size_t len, int staging,
                 uint8_t* out) {
    std::vector<uint8_t> rgb;
    int w = 0, h = 0;
    if (!decode_jpeg(data, len, staging, rgb, w, h)) return false;
    int nw, nh;
    if (w < h) {
        nw = staging;
        nh = std::max(staging,
                      static_cast<int>(std::lround(
                          static_cast<double>(h) * staging / w)));
    } else {
        nh = staging;
        nw = std::max(staging,
                      static_cast<int>(std::lround(
                          static_cast<double>(w) * staging / h)));
    }
    std::vector<uint8_t> resized(static_cast<size_t>(nw) * nh * 3);
    resize_rgb(rgb.data(), w, h, resized.data(), nw, nh);
    const int x0 = (nw - staging) / 2;
    const int y0 = (nh - staging) / 2;
    for (int y = 0; y < staging; ++y) {
        std::memcpy(out + static_cast<size_t>(y) * staging * 3,
                    resized.data() +
                        ((static_cast<size_t>(y0 + y) * nw) + x0) * 3,
                    static_cast<size_t>(staging) * 3);
    }
    return true;
}

}  // namespace

extern "C" {

// Stage one JPEG buffer to out[staging*staging*3]. Returns 0 on success.
int ofb_stage_jpeg(const uint8_t* data, size_t len, int staging,
                   uint8_t* out) {
    return stage_image(data, len, staging, out) ? 0 : 1;
}

// Stage a batch of JPEG buffers with a thread pool. datas/lens: n entries;
// out: n * staging * staging * 3 bytes. Returns number of failures
// (failed slots are zero-filled).
int ofb_stage_jpeg_batch(const uint8_t** datas, const size_t* lens, int n,
                         int staging, uint8_t* out, int nthreads) {
    if (nthreads < 1) nthreads = 1;
    std::atomic<int> next(0), failures(0);
    const size_t stride = static_cast<size_t>(staging) * staging * 3;
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) break;
            uint8_t* dst = out + stride * i;
            if (!stage_image(datas[i], lens[i], staging, dst)) {
                std::memset(dst, 0, stride);
                failures.fetch_add(1);
            }
        }
    };
    std::vector<std::thread> pool;
    const int nt = std::min(nthreads, n);
    pool.reserve(nt);
    for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
    return failures.load();
}

// Standalone box resize for pre-decoded RGB8 (testing / non-JPEG inputs).
void ofb_resize_rgb(const uint8_t* src, int sw, int sh, uint8_t* dst,
                    int dw, int dh) {
    resize_rgb(src, sw, sh, dst, dw, dh);
}

}  // extern "C"
