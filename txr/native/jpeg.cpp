// Baseline JPEG decoder — the native half of the texture loader that the
// reference gets from vendored stb_image (/root/reference/external_sources/
// stb_image/stb_image.h, used by GLWrapper.cpp:284-354 to load the shipped
// JPEG planet/cubemap assets).  Not a copy: a from-scratch ITU T.81 baseline
// sequential implementation (DQT/DHT/SOF0/SOS/DRI markers, Huffman entropy
// decode, dequant + separable float IDCT, chroma upsampling, JFIF
// YCbCr->RGB).  Progressive (SOF2), arithmetic coding, and 12-bit precision
// are rejected with NULL so the Python caller can fall back to PIL.
//
// Exposed as  txr_jpeg_decode(data, n, &h, &w, &c)  -> malloc'd u8 buffer
// (c = 1 grayscale or 3 RGB), freed with txr_free.

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

struct Huff {
    // canonical code table: for each length 1..16, first code and index
    uint16_t mincode[17];
    int32_t maxcode[18];   // -1 when no codes of that length
    int32_t valptr[17];
    uint8_t values[256];
    bool ok = false;
};

struct Component {
    int id = 0, h = 1, v = 1, tq = 0;
    int td = 0, ta = 0;
    int dc_pred = 0;
    int bx = 0, by = 0;          // size in blocks for the whole image
    uint8_t* plane = nullptr;    // bx*8 x by*8 samples
};

struct Decoder {
    const uint8_t* p;
    const uint8_t* end;
    uint16_t qt[4][64];
    Huff hdc[4], hac[4];
    Component comp[3];
    int ncomp = 0, width = 0, height = 0;
    int hmax = 1, vmax = 1, mcux = 0, mcuy = 0;
    int restart_interval = 0;
    // bit reader
    uint32_t bitbuf = 0;
    int bitcnt = 0;
    bool marker_hit = false;

    ~Decoder() {
        for (auto& c : comp) std::free(c.plane);
    }

    bool byte(uint8_t& b) {
        if (p >= end) return false;
        b = *p++;
        return true;
    }

    int read_bit() {
        if (bitcnt == 0) {
            if (p >= end) { marker_hit = true; return 0; }
            uint8_t b = *p++;
            if (b == 0xFF) {
                uint8_t b2 = (p < end) ? *p : 0xD9;
                if (b2 == 0x00) {
                    ++p;               // byte stuffing
                } else {
                    --p;               // marker: stop producing real bits
                    marker_hit = true;
                    return 0;
                }
            }
            bitbuf = b;
            bitcnt = 8;
        }
        --bitcnt;
        return (bitbuf >> bitcnt) & 1;
    }

    int read_bits(int n) {
        int v = 0;
        for (int i = 0; i < n; ++i) v = (v << 1) | read_bit();
        return v;
    }

    int huff_decode(const Huff& h) {
        int code = 0;
        for (int len = 1; len <= 16; ++len) {
            code = (code << 1) | read_bit();
            if (h.maxcode[len] >= 0 && code <= h.maxcode[len])
                return h.values[h.valptr[len] + code - h.mincode[len]];
        }
        return -1;
    }
};

const uint8_t kZigzag[64] = {
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

// receive-and-extend (T.81 F.2.2.1)
inline int extend(int v, int t) {
    return (t && v < (1 << (t - 1))) ? v - (1 << t) + 1 : v;
}

void build_huff(Huff& h, const uint8_t counts[16], const uint8_t* vals, int nvals) {
    int code = 0, k = 0;
    for (int len = 1; len <= 16; ++len) {
        h.valptr[len] = k;
        h.mincode[len] = (uint16_t)code;
        int n = counts[len - 1];
        code += n;
        h.maxcode[len] = n ? code - 1 : -1;
        code <<= 1;
        k += n;
    }
    h.maxcode[17] = 0x7fffffff;
    std::memcpy(h.values, vals, nvals);
    h.ok = true;
}

// separable float IDCT, 1-D on rows then columns (exact to f32 rounding;
// speed is irrelevant here — textures are decoded once at load)
void idct8(float* x, int stride) {
    static float c[8][8];
    static bool init = false;
    if (!init) {
        for (int u = 0; u < 8; ++u)
            for (int n = 0; n < 8; ++n)
                c[u][n] = (u ? 1.0f : 0.70710678f) *
                          std::cos((2 * n + 1) * u * 3.14159265358979f / 16.0f);
        init = true;
    }
    float tmp[8];
    for (int n = 0; n < 8; ++n) {
        float s = 0;
        for (int u = 0; u < 8; ++u) s += c[u][n] * x[u * stride];
        tmp[n] = 0.5f * s;
    }
    for (int n = 0; n < 8; ++n) x[n * stride] = tmp[n];
}

void idct_block(const int* coef, const uint16_t* q, uint8_t* out, int out_stride) {
    float b[64];
    for (int i = 0; i < 64; ++i) b[kZigzag[i]] = (float)(coef[i] * (int)q[i]);
    for (int r = 0; r < 8; ++r) idct8(b + 8 * r, 1);
    for (int cidx = 0; cidx < 8; ++cidx) idct8(b + cidx, 8);
    for (int r = 0; r < 8; ++r)
        for (int cidx = 0; cidx < 8; ++cidx) {
            float v = b[8 * r + cidx] + 128.0f;
            int iv = (int)(v + 0.5f);
            out[r * out_stride + cidx] =
                (uint8_t)(iv < 0 ? 0 : (iv > 255 ? 255 : iv));
        }
}

inline uint8_t clamp_u8(int v) { return (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v)); }

// Triangle-filter ("fancy", libjpeg-compatible) 2x upsampling in one
// dimension: out[2i] = (3*in[i] + in[i-1] + 2)/4, out[2i+1] =
// (3*in[i] + in[i+1] + 2)/4, edges clamped.  Factor 1 copies; factors > 2
// fall back to nearest (not produced by real encoders).
uint8_t* upsample_dim(const uint8_t* src, int h, int w, int stride,
                      int factor, bool horizontal, int& oh, int& ow) {
    oh = horizontal ? h : h * factor;
    ow = horizontal ? w * factor : w;
    uint8_t* out = (uint8_t*)std::malloc((size_t)oh * ow);
    if (!out) return nullptr;
    if (factor == 1) {
        for (int r = 0; r < h; ++r) std::memcpy(out + (size_t)r * ow, src + (size_t)r * stride, w);
        return out;
    }
    if (factor == 2) {
        if (horizontal) {
            for (int r = 0; r < h; ++r) {
                const uint8_t* s = src + (size_t)r * stride;
                uint8_t* d = out + (size_t)r * ow;
                for (int i = 0; i < w; ++i) {
                    int prev = s[i > 0 ? i - 1 : 0], next = s[i < w - 1 ? i + 1 : w - 1];
                    d[2 * i] = (uint8_t)((3 * s[i] + prev + 2) >> 2);
                    d[2 * i + 1] = (uint8_t)((3 * s[i] + next + 2) >> 2);
                }
            }
        } else {
            for (int r = 0; r < oh; ++r) {
                int i = r >> 1;
                int adj = (r & 1) ? (i < h - 1 ? i + 1 : h - 1) : (i > 0 ? i - 1 : 0);
                const uint8_t* s0 = src + (size_t)i * stride;
                const uint8_t* s1 = src + (size_t)adj * stride;
                uint8_t* d = out + (size_t)r * ow;
                for (int x = 0; x < w; ++x)
                    d[x] = (uint8_t)((3 * s0[x] + s1[x] + 2) >> 2);
            }
        }
        return out;
    }
    for (int r = 0; r < oh; ++r) {
        const uint8_t* s = src + (size_t)(horizontal ? r : r / factor) * stride;
        uint8_t* d = out + (size_t)r * ow;
        for (int x = 0; x < ow; ++x) d[x] = s[horizontal ? x / factor : x];
    }
    return out;
}

// full-resolution (W x H) version of a component plane
uint8_t* full_res_plane(const Component& c, int hmax, int vmax, int W, int H) {
    int cw = (W * c.h + hmax - 1) / hmax;
    int ch = (H * c.v + vmax - 1) / vmax;
    int fx = hmax / c.h, fy = vmax / c.v;
    int oh = ch, ow = cw;
    uint8_t* cur = upsample_dim(c.plane, ch, cw, c.bx * 8, fy, false, oh, ow);
    if (!cur) return nullptr;
    int oh2, ow2;
    uint8_t* cur2 = upsample_dim(cur, oh, ow, ow, fx, true, oh2, ow2);
    std::free(cur);
    if (!cur2) return nullptr;
    // pad/crop to exactly W x H (upsampled size is >= W,H by construction
    // only when factors divide; clamp-replicate the last sample otherwise)
    uint8_t* out = (uint8_t*)std::malloc((size_t)W * H);
    if (!out) { std::free(cur2); return nullptr; }
    for (int r = 0; r < H; ++r) {
        int sr = r < oh2 ? r : oh2 - 1;
        const uint8_t* s = cur2 + (size_t)sr * ow2;
        uint8_t* d = out + (size_t)r * W;
        int n = W < ow2 ? W : ow2;
        std::memcpy(d, s, n);
        for (int x = n; x < W; ++x) d[x] = s[ow2 - 1];
    }
    std::free(cur2);
    return out;
}

bool decode_scan(Decoder& d) {
    int coef[64];
    int mcus = d.mcux * d.mcuy;
    int rst = d.restart_interval;
    int until_restart = rst ? rst : 0x7fffffff;
    for (int m = 0; m < mcus; ++m) {
        int my = m / d.mcux, mx = m % d.mcux;
        for (int ci = 0; ci < d.ncomp; ++ci) {
            Component& c = d.comp[ci];
            const uint16_t* q = d.qt[c.tq];
            for (int by = 0; by < c.v; ++by)
                for (int bx = 0; bx < c.h; ++bx) {
                    std::memset(coef, 0, sizeof(coef));
                    int t = d.huff_decode(d.hdc[c.td]);
                    if (t < 0 || t > 15) return false;
                    int diff = t ? extend(d.read_bits(t), t) : 0;
                    c.dc_pred += diff;
                    coef[0] = c.dc_pred;
                    for (int k = 1; k < 64;) {
                        int rs = d.huff_decode(d.hac[c.ta]);
                        if (rs < 0) return false;
                        int r = rs >> 4, s = rs & 15;
                        if (s == 0) {
                            if (r == 15) { k += 16; continue; }  // ZRL
                            break;                                // EOB
                        }
                        k += r;
                        if (k > 63) return false;
                        coef[k] = extend(d.read_bits(s), s);
                        ++k;
                    }
                    int px = (mx * c.h + bx) * 8;
                    int py = (my * c.v + by) * 8;
                    uint8_t* dst = c.plane + (size_t)py * (c.bx * 8) + px;
                    idct_block(coef, q, dst, c.bx * 8);
                }
        }
        if (rst && --until_restart == 0 && m + 1 < mcus) {
            // byte-align, expect RSTn
            d.bitcnt = 0;
            d.marker_hit = false;
            if (d.p + 1 < d.end && d.p[0] == 0xFF && d.p[1] >= 0xD0 && d.p[1] <= 0xD7) {
                d.p += 2;
            }
            for (auto& c : d.comp) c.dc_pred = 0;
            until_restart = rst;
        }
    }
    return true;
}

}  // namespace

extern "C" {

void txr_free(void* p);  // defined in imageio.cpp

uint8_t* txr_jpeg_decode(const uint8_t* data, size_t n,
                         int* out_h, int* out_w, int* out_c) {
    Decoder d;
    d.p = data;
    d.end = data + n;
    if (n < 4 || data[0] != 0xFF || data[1] != 0xD8) return nullptr;  // SOI
    d.p += 2;
    bool got_sof = false;

    while (d.p + 4 <= d.end) {
        if (d.p[0] != 0xFF) return nullptr;
        uint8_t marker = d.p[1];
        d.p += 2;
        if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) continue;
        if (marker == 0xD9) return nullptr;  // EOI before SOS
        int len = (d.p[0] << 8) | d.p[1];
        if (len < 2 || d.p + len > d.end) return nullptr;
        const uint8_t* seg = d.p + 2;
        const uint8_t* segend = d.p + len;
        d.p += len;

        switch (marker) {
            case 0xDB:  // DQT
                while (seg < segend) {
                    int pq = seg[0] >> 4, tq = seg[0] & 15;
                    if (tq > 3) return nullptr;
                    // table payload must fit in the segment (truncated DQT
                    // would read past segend / the input buffer)
                    if (segend - seg < 1 + (pq ? 128 : 64)) return nullptr;
                    ++seg;
                    for (int i = 0; i < 64; ++i) {
                        if (pq) { d.qt[tq][i] = (seg[0] << 8) | seg[1]; seg += 2; }
                        else { d.qt[tq][i] = *seg++; }
                    }
                }
                break;
            case 0xC4:  // DHT
                while (seg + 17 <= segend) {
                    int tc = seg[0] >> 4, th = seg[0] & 15;
                    if (th > 3) return nullptr;
                    const uint8_t* counts = seg + 1;
                    int nv = 0;
                    for (int i = 0; i < 16; ++i) nv += counts[i];
                    if (seg + 17 + nv > segend || nv > 256) return nullptr;
                    build_huff(tc ? d.hac[th] : d.hdc[th], counts, seg + 17, nv);
                    seg += 17 + nv;
                }
                break;
            case 0xC0:   // SOF0 baseline
            case 0xC1: { // SOF1 extended sequential (same entropy coding)
                if (segend - seg < 6) return nullptr;
                if (seg[0] != 8) return nullptr;  // precision
                d.height = (seg[1] << 8) | seg[2];
                d.width = (seg[3] << 8) | seg[4];
                d.ncomp = seg[5];
                if (d.ncomp != 1 && d.ncomp != 3) return nullptr;
                seg += 6;
                if (segend - seg < 3 * d.ncomp) return nullptr;
                for (int i = 0; i < d.ncomp; ++i) {
                    d.comp[i].id = seg[0];
                    d.comp[i].h = seg[1] >> 4;
                    d.comp[i].v = seg[1] & 15;
                    d.comp[i].tq = seg[2];
                    if (!d.comp[i].h || !d.comp[i].v || d.comp[i].tq > 3)
                        return nullptr;
                    seg += 3;
                }
                got_sof = true;
                break;
            }
            case 0xC2: case 0xC3: case 0xC5: case 0xC6: case 0xC7:
            case 0xC9: case 0xCA: case 0xCB: case 0xCD: case 0xCE: case 0xCF:
                return nullptr;  // progressive / arithmetic / lossless
            case 0xDD:  // DRI
                if (segend - seg < 2) return nullptr;
                d.restart_interval = (seg[0] << 8) | seg[1];
                break;
            case 0xDA: {  // SOS
                if (!got_sof || d.width <= 0 || d.height <= 0) return nullptr;
                if (segend - seg < 1) return nullptr;
                int ns = seg[0];
                if (ns != d.ncomp) return nullptr;
                ++seg;
                if (segend - seg < 2 * ns) return nullptr;
                for (int i = 0; i < ns; ++i) {
                    int cs = seg[0], tables = seg[1];
                    seg += 2;
                    // baseline allows Huffman table ids 0-3 only; larger
                    // values would index past hdc[4]/hac[4]
                    if ((tables >> 4) > 3 || (tables & 15) > 3) return nullptr;
                    for (int c = 0; c < d.ncomp; ++c)
                        if (d.comp[c].id == cs) {
                            d.comp[c].td = tables >> 4;
                            d.comp[c].ta = tables & 15;
                        }
                }
                // allocate planes
                d.hmax = d.vmax = 1;
                for (int i = 0; i < d.ncomp; ++i) {
                    if (d.comp[i].h > d.hmax) d.hmax = d.comp[i].h;
                    if (d.comp[i].v > d.vmax) d.vmax = d.comp[i].v;
                }
                d.mcux = (d.width + 8 * d.hmax - 1) / (8 * d.hmax);
                d.mcuy = (d.height + 8 * d.vmax - 1) / (8 * d.vmax);
                for (int i = 0; i < d.ncomp; ++i) {
                    Component& c = d.comp[i];
                    c.bx = d.mcux * c.h;
                    c.by = d.mcuy * c.v;
                    c.plane = (uint8_t*)std::calloc((size_t)c.bx * c.by, 64);
                    if (!c.plane) return nullptr;
                    if (!d.hdc[c.td].ok || !d.hac[c.ta].ok) return nullptr;
                }
                if (!decode_scan(d)) return nullptr;

                // color convert + chroma upsample (nearest) to packed output
                int W = d.width, H = d.height, C = d.ncomp == 1 ? 1 : 3;
                uint8_t* out = (uint8_t*)std::malloc((size_t)W * H * C);
                if (!out) return nullptr;
                if (C == 1) {
                    Component& y = d.comp[0];
                    for (int r = 0; r < H; ++r)
                        std::memcpy(out + (size_t)r * W,
                                    y.plane + (size_t)r * (y.bx * 8), W);
                } else {
                    uint8_t* yp = full_res_plane(d.comp[0], d.hmax, d.vmax, W, H);
                    uint8_t* cbp = full_res_plane(d.comp[1], d.hmax, d.vmax, W, H);
                    uint8_t* crp = full_res_plane(d.comp[2], d.hmax, d.vmax, W, H);
                    if (!yp || !cbp || !crp) {
                        std::free(yp); std::free(cbp); std::free(crp);
                        std::free(out);
                        return nullptr;
                    }
                    for (size_t i = 0; i < (size_t)W * H; ++i) {
                        int Y = yp[i], Cb = cbp[i] - 128, Cr = crp[i] - 128;
                        out[3 * i + 0] = clamp_u8((int)std::lround(Y + 1.402 * Cr));
                        out[3 * i + 1] = clamp_u8((int)std::lround(
                            Y - 0.344136 * Cb - 0.714136 * Cr));
                        out[3 * i + 2] = clamp_u8((int)std::lround(Y + 1.772 * Cb));
                    }
                    std::free(yp); std::free(cbp); std::free(crp);
                }
                *out_h = H;
                *out_w = W;
                *out_c = C;
                return out;
            }
            default:
                break;  // APPn, COM, etc: skip
        }
    }
    return nullptr;
}

}  // extern "C"
