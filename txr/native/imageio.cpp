// TXR native image IO: the TPU-framework counterpart of the reference's
// vendored stb_image layer (/root/reference/external_sources/stb_image,
// decode; GLWrapper::load_texture upload).  A renderer that streams frames
// (animation, optimisation-progress dumps) needs encode bandwidth that
// Python-side encoders can't sustain; this module provides:
//
//   * PNG encode (RGB8/RGBA8, zlib-compressed, filter 0)  — txr_png_encode
//   * PNG decode (8-bit RGB/RGBA/gray, non-interlaced)    — txr_png_decode
//   * f32 [0,1] -> u8 conversion with clamping            — txr_f32_to_u8
//
// Exposed as a C ABI consumed from Python via ctypes (txr/native/__init__.py).
// Build: make -C txr/native   (links against system zlib).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <vector>
#include <zlib.h>

namespace {

struct Bytes {
    std::vector<uint8_t> v;
    void u8(uint8_t x) { v.push_back(x); }
    void u32be(uint32_t x) {
        v.push_back(x >> 24); v.push_back(x >> 16); v.push_back(x >> 8); v.push_back(x);
    }
    void raw(const void* p, size_t n) {
        const uint8_t* b = static_cast<const uint8_t*>(p);
        v.insert(v.end(), b, b + n);
    }
};

void png_chunk(Bytes& out, const char type[4], const uint8_t* data, size_t n) {
    out.u32be(static_cast<uint32_t>(n));
    size_t start = out.v.size();
    out.raw(type, 4);
    if (n) out.raw(data, n);
    uint32_t crc = crc32(0L, out.v.data() + start, static_cast<uInt>(n + 4));
    out.u32be(crc);
}

}  // namespace

extern "C" {

// Encode H*W*C (C=3|4) 8-bit pixels into a PNG byte stream.
// Returns malloc'd buffer in *out (caller frees with txr_free), length as
// return value; 0 on failure.
size_t txr_png_encode(const uint8_t* pixels, int height, int width, int channels,
                      int compress_level, uint8_t** out) {
    if (!pixels || !out || width <= 0 || height <= 0 ||
        (channels != 3 && channels != 4))
        return 0;

    const size_t stride = static_cast<size_t>(width) * channels;
    // raw scanlines with filter byte 0
    std::vector<uint8_t> raw((stride + 1) * height);
    for (int y = 0; y < height; ++y) {
        raw[y * (stride + 1)] = 0;
        std::memcpy(&raw[y * (stride + 1) + 1], pixels + y * stride, stride);
    }

    uLongf zcap = compressBound(static_cast<uLong>(raw.size()));
    std::vector<uint8_t> z(zcap);
    if (compress2(z.data(), &zcap, raw.data(), static_cast<uLong>(raw.size()),
                  compress_level < 0 ? 6 : compress_level) != Z_OK)
        return 0;

    Bytes png;
    static const uint8_t sig[8] = {137, 'P', 'N', 'G', '\r', '\n', 26, '\n'};
    png.raw(sig, 8);

    uint8_t ihdr[13];
    ihdr[0] = width >> 24; ihdr[1] = width >> 16; ihdr[2] = width >> 8; ihdr[3] = width;
    ihdr[4] = height >> 24; ihdr[5] = height >> 16; ihdr[6] = height >> 8; ihdr[7] = height;
    ihdr[8] = 8;                                   // bit depth
    ihdr[9] = channels == 3 ? 2 : 6;               // color type: RGB / RGBA
    ihdr[10] = ihdr[11] = ihdr[12] = 0;            // deflate, filter 0, no interlace
    png_chunk(png, "IHDR", ihdr, 13);
    png_chunk(png, "IDAT", z.data(), zcap);
    png_chunk(png, "IEND", nullptr, 0);

    uint8_t* buf = static_cast<uint8_t*>(std::malloc(png.v.size()));
    if (!buf) return 0;
    std::memcpy(buf, png.v.data(), png.v.size());
    *out = buf;
    return png.v.size();
}

// Decode an 8-bit non-interlaced RGB/RGBA/gray(+alpha) PNG.
// On success fills *height/*width/*channels and returns a malloc'd pixel
// buffer (row-major, tightly packed); nullptr on failure.
uint8_t* txr_png_decode(const uint8_t* data, size_t n,
                        int* height, int* width, int* channels) {
    if (!data || n < 45) return nullptr;
    static const uint8_t sig[8] = {137, 'P', 'N', 'G', '\r', '\n', 26, '\n'};
    if (std::memcmp(data, sig, 8) != 0) return nullptr;

    size_t p = 8;
    int w = 0, h = 0, depth = 0, ctype = 0, interlace = 0;
    std::vector<uint8_t> idat;
    while (p + 8 <= n) {
        uint32_t len = (data[p] << 24) | (data[p + 1] << 16) | (data[p + 2] << 8) | data[p + 3];
        const uint8_t* type = data + p + 4;
        const uint8_t* body = data + p + 8;
        if (p + 12 + len > n) return nullptr;
        if (!std::memcmp(type, "IHDR", 4)) {
            if (len < 13) return nullptr;
            w = (body[0] << 24) | (body[1] << 16) | (body[2] << 8) | body[3];
            h = (body[4] << 24) | (body[5] << 16) | (body[6] << 8) | body[7];
            depth = body[8]; ctype = body[9]; interlace = body[12];
        } else if (!std::memcmp(type, "IDAT", 4)) {
            idat.insert(idat.end(), body, body + len);
        } else if (!std::memcmp(type, "IEND", 4)) {
            break;
        }
        p += 12 + len;
    }
    if (w <= 0 || h <= 0 || depth != 8 || interlace != 0) return nullptr;
    int ch;
    switch (ctype) {       // palette unsupported
        case 0: ch = 1; break;
        case 2: ch = 3; break;
        case 4: ch = 2; break;
        case 6: ch = 4; break;
        default: return nullptr;
    }

    const size_t stride = static_cast<size_t>(w) * ch;
    std::vector<uint8_t> raw((stride + 1) * h);
    uLongf rawn = static_cast<uLongf>(raw.size());
    if (uncompress(raw.data(), &rawn, idat.data(), static_cast<uLong>(idat.size())) != Z_OK ||
        rawn != raw.size())
        return nullptr;

    uint8_t* out = static_cast<uint8_t*>(std::malloc(stride * h));
    if (!out) return nullptr;

    // undo per-scanline filters (types 0-4)
    auto paeth = [](int a, int b, int c) {
        int pv = a + b - c, pa = std::abs(pv - a), pb = std::abs(pv - b), pc = std::abs(pv - c);
        return (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
    };
    for (int y = 0; y < h; ++y) {
        uint8_t f = raw[y * (stride + 1)];
        const uint8_t* src = &raw[y * (stride + 1) + 1];
        uint8_t* dst = out + y * stride;
        const uint8_t* up = y ? out + (y - 1) * stride : nullptr;
        for (size_t x = 0; x < stride; ++x) {
            int a = x >= static_cast<size_t>(ch) ? dst[x - ch] : 0;
            int b = up ? up[x] : 0;
            int c = (up && x >= static_cast<size_t>(ch)) ? up[x - ch] : 0;
            int v = src[x];
            switch (f) {
                case 0: break;
                case 1: v += a; break;
                case 2: v += b; break;
                case 3: v += (a + b) / 2; break;
                case 4: v += paeth(a, b, c); break;
                default: std::free(out); return nullptr;
            }
            dst[x] = static_cast<uint8_t>(v);
        }
    }
    *height = h; *width = w; *channels = ch;
    return out;
}

// Clamp-and-quantise float32 [0,1] pixels to u8 (the tonemap hot path).
void txr_f32_to_u8(const float* src, uint8_t* dst, size_t n) {
    for (size_t i = 0; i < n; ++i) {
        float v = src[i];
        v = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
        dst[i] = static_cast<uint8_t>(v * 255.f + 0.5f);
    }
}

void txr_free(void* p) { std::free(p); }

}  // extern "C"
