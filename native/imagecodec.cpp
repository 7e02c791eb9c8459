// Multi-threaded image decoding — native data-loader component.
//
// The reference loads every view with Python imageio inside the Dataset
// (reference: src/data/SRNDataset.py:75-97, orgSRNDataset.py:150-176,
// DVRDataset.py:128-155); with dozens of views per object the per-batch
// host decode becomes the input-pipeline bottleneck once the device step
// is fast. This module decodes a batch of PNG/JPEG files to RGBA8 with a
// std::thread pool, called from Python via ctypes
// (pixelnerf_tpu/native/imagecodec.py), with imageio as fallback.
//
// C ABI:
//   int img_decode(const char* path, unsigned char** out,
//                  int* w, int* h, int* src_channels);
//       Decodes one file. *out is malloc'd RGBA8 (h*w*4); *src_channels is
//       the channel count of the SOURCE (1/2/3/4) so callers can tell
//       whether an alpha channel was real. Returns 0 on success.
//   int img_decode_batch(const char** paths, int n, int threads,
//                        unsigned char** outs, int* ws, int* hs, int* chs);
//       Decodes n files concurrently; outs[i] are malloc'd RGBA8 buffers.
//       Returns number of failures (0 = all good; failed slots are NULL).
//   void img_free(void* p);

#include <png.h>

#include <atomic>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

extern "C" {
#include <jpeglib.h>
}

namespace {

// ---------------------------------------------------------------- PNG ----

int decode_png(FILE* fp, unsigned char** out, int* w, int* h, int* src_ch) {
    png_structp png =
        png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    if (!png) return 1;
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        return 1;
    }
    // volatile: assigned after setjmp, must survive the longjmp error path
    // (a corrupt file mid-read would otherwise leak the pixel buffer)
    unsigned char* volatile buf_guard = nullptr;
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        std::free(buf_guard);
        return 1;
    }
    png_init_io(png, fp);
    png_read_info(png, info);

    const int width = png_get_image_width(png, info);
    const int height = png_get_image_height(png, info);
    const png_byte color = png_get_color_type(png, info);
    const png_byte depth = png_get_bit_depth(png, info);

    switch (color) {
        case PNG_COLOR_TYPE_GRAY: *src_ch = 1; break;
        case PNG_COLOR_TYPE_GRAY_ALPHA: *src_ch = 2; break;
        case PNG_COLOR_TYPE_RGB: *src_ch = 3; break;
        case PNG_COLOR_TYPE_RGB_ALPHA: *src_ch = 4; break;
        case PNG_COLOR_TYPE_PALETTE:
            *src_ch = png_get_valid(png, info, PNG_INFO_tRNS) ? 4 : 3;
            break;
        default: *src_ch = 3;
    }

    // normalize everything to 8-bit RGBA
    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_GRAY ||
        color == PNG_COLOR_TYPE_PALETTE)
        png_set_filler(png, 0xFF, PNG_FILLER_AFTER);
    png_read_update_info(png, info);

    unsigned char* buf =
        static_cast<unsigned char*>(std::malloc((size_t)width * height * 4));
    if (!buf) {
        png_destroy_read_struct(&png, &info, nullptr);
        return 1;
    }
    buf_guard = buf;
    std::vector<png_bytep> rows(height);
    for (int y = 0; y < height; ++y) rows[y] = buf + (size_t)y * width * 4;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);

    *out = buf;
    *w = width;
    *h = height;
    return 0;
}

// --------------------------------------------------------------- JPEG ----

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(e->jb, 1);
}

int decode_jpeg(FILE* fp, unsigned char** out, int* w, int* h, int* src_ch) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    unsigned char* volatile buf_guard = nullptr;  // see decode_png
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        std::free(buf_guard);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, fp);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);

    const int width = cinfo.output_width;
    const int height = cinfo.output_height;
    *src_ch = 3;

    unsigned char* buf =
        static_cast<unsigned char*>(std::malloc((size_t)width * height * 4));
    if (!buf) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    buf_guard = buf;
    std::vector<unsigned char> row((size_t)width * 3);
    unsigned char* rp = row.data();
    for (int y = 0; y < height; ++y) {
        jpeg_read_scanlines(&cinfo, &rp, 1);
        unsigned char* dst = buf + (size_t)y * width * 4;
        for (int x = 0; x < width; ++x) {
            dst[4 * x + 0] = row[3 * x + 0];
            dst[4 * x + 1] = row[3 * x + 1];
            dst[4 * x + 2] = row[3 * x + 2];
            dst[4 * x + 3] = 0xFF;
        }
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);

    *out = buf;
    *w = width;
    *h = height;
    return 0;
}

}  // namespace

extern "C" {

int img_decode(const char* path, unsigned char** out, int* w, int* h,
               int* src_channels) {
    *out = nullptr;
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return 1;
    unsigned char magic[4] = {0, 0, 0, 0};
    if (std::fread(magic, 1, 4, fp) != 4) {
        std::fclose(fp);
        return 1;
    }
    std::rewind(fp);
    int rc;
    if (magic[0] == 0x89 && magic[1] == 'P') {
        rc = decode_png(fp, out, w, h, src_channels);
    } else if (magic[0] == 0xFF && magic[1] == 0xD8) {
        rc = decode_jpeg(fp, out, w, h, src_channels);
    } else {
        rc = 2;  // unsupported format — caller falls back
    }
    std::fclose(fp);
    return rc;
}

int img_decode_batch(const char** paths, int n, int threads,
                     unsigned char** outs, int* ws, int* hs, int* chs) {
    std::atomic<int> next(0), failures(0);
    auto work = [&]() {
        for (;;) {
            const int i = next.fetch_add(1);
            if (i >= n) return;
            if (img_decode(paths[i], &outs[i], &ws[i], &hs[i], &chs[i]) != 0) {
                outs[i] = nullptr;
                failures.fetch_add(1);
            }
        }
    };
    int nt = threads > 0 ? threads : (int)std::thread::hardware_concurrency();
    if (nt > n) nt = n;
    if (nt <= 1) {
        work();
    } else {
        std::vector<std::thread> pool;
        pool.reserve(nt);
        for (int t = 0; t < nt; ++t) pool.emplace_back(work);
        for (auto& th : pool) th.join();
    }
    return failures.load();
}

void img_free(void* p) { std::free(p); }

}  // extern "C"
