// Native EXR IO: read/write RGB float images via the system OpenEXR 3.1.
//
// The reference relies on Mitsuba's C++ EXR loader for the environment map
// (rendering/matpreview/envmap.exr, referenced by scene_measured.xml:36-42)
// and writes its renders with mi.Bitmap (brdf_measured_disk.py:158-162).
// No Python package in this image decodes PIZ-compressed EXR, so this
// little C++ shim is the framework's native IO layer: plain C ABI, loaded
// from Python with ctypes (no pybind11 dependency).
//
// Build (cached by exr.py):
//   g++ -O2 -shared -fPIC exr_io.cpp -o libexr_io.so \
//       -I/usr/include/OpenEXR -I/usr/include/Imath \
//       -lOpenEXR-3_1 -lIlmThread-3_1 -lIex-3_1 -lImath-3_1

#include <ImfRgbaFile.h>
#include <ImfArray.h>
#include <cstring>
#include <cstdlib>
#include <string>

using namespace Imf;
using namespace Imath;

extern "C" {

// Reads an EXR into a malloc'd float32 RGB buffer (row-major, top-down).
// Returns 0 on success; on failure returns -1 and fills err (if given).
int exr_read_rgb(const char *path, float **out, int *width, int *height,
                 char *err, int err_len) {
    try {
        RgbaInputFile file(path);
        Box2i dw = file.dataWindow();
        int w = dw.max.x - dw.min.x + 1;
        int h = dw.max.y - dw.min.y + 1;
        Array2D<Rgba> pixels(h, w);
        file.setFrameBuffer(&pixels[0][0] - dw.min.x - dw.min.y * w, 1, w);
        file.readPixels(dw.min.y, dw.max.y);
        float *buf = (float *)malloc(sizeof(float) * 3 * (size_t)w * h);
        if (!buf) throw std::bad_alloc();
        for (int y = 0; y < h; ++y) {
            for (int x = 0; x < w; ++x) {
                const Rgba &p = pixels[y][x];
                float *dst = buf + 3 * ((size_t)y * w + x);
                dst[0] = p.r;
                dst[1] = p.g;
                dst[2] = p.b;
            }
        }
        *out = buf;
        *width = w;
        *height = h;
        return 0;
    } catch (const std::exception &e) {
        if (err && err_len > 0) {
            std::strncpy(err, e.what(), err_len - 1);
            err[err_len - 1] = '\0';
        }
        return -1;
    }
}

void exr_free(float *buf) { free(buf); }

// Writes a row-major top-down float32 RGB buffer as a half-float EXR
// (ZIP compression).
int exr_write_rgb(const char *path, const float *rgb, int width, int height,
                  char *err, int err_len) {
    try {
        Array2D<Rgba> pixels(height, width);
        for (int y = 0; y < height; ++y) {
            for (int x = 0; x < width; ++x) {
                const float *src = rgb + 3 * ((size_t)y * width + x);
                pixels[y][x] = Rgba(src[0], src[1], src[2], 1.0f);
            }
        }
        RgbaOutputFile file(path, width, height, WRITE_RGB);
        file.setFrameBuffer(&pixels[0][0], 1, width);
        file.writePixels(height);
        return 0;
    } catch (const std::exception &e) {
        if (err && err_len > 0) {
            std::strncpy(err, e.what(), err_len - 1);
            err[err_len - 1] = '\0';
        }
        return -1;
    }
}

}  // extern "C"
