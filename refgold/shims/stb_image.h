// Minimal stb_image-API-compatible PNG loader (zlib-backed), written from
// scratch so the MobileRT reference engine builds offline.  Supports
// non-interlaced PNG color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+A),
// 6 (RGBA) at bit depths 1/2/4/8, all five scanline filters.  Palette
// images are expanded to RGB like stb_image does.  Only the entry points
// Texture.cpp uses are provided: stbi_info / stbi_load (+ _from_memory),
// stbi_image_free, stbi_failure_reason.
#ifndef SHIM_STB_IMAGE_H
#define SHIM_STB_IMAGE_H

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

static const char *stbi__failure = "unknown error";

inline const char *stbi_failure_reason() { return stbi__failure; }

inline void stbi_image_free(void *p) { std::free(p); }

namespace stbi_shim {

inline std::uint32_t be32(const unsigned char *p) {
    return (std::uint32_t(p[0]) << 24) | (std::uint32_t(p[1]) << 16) |
           (std::uint32_t(p[2]) << 8) | std::uint32_t(p[3]);
}

struct PngInfo {
    int width {}, height {}, bitdepth {}, colortype {};
    int channels {};  // channels of the *decoded* output (palette -> 3/4)
    std::vector<unsigned char> palette;      // RGB triples
    std::vector<unsigned char> idat;         // concatenated compressed data
    bool has_trns {};
};

inline bool parse(const unsigned char *data, long size, PngInfo *info,
                  bool want_data) {
    static const unsigned char sig[8] = {0x89, 'P', 'N', 'G', 0x0D, 0x0A,
                                         0x1A, 0x0A};
    if (size < 8 || std::memcmp(data, sig, 8) != 0) {
        stbi__failure = "not a PNG";
        return false;
    }
    long pos = 8;
    bool saw_ihdr = false;
    while (pos + 8 <= size) {
        const std::uint32_t len = be32(data + pos);
        const char *type = reinterpret_cast<const char *>(data + pos + 4);
        const unsigned char *body = data + pos + 8;
        if (pos + 12 + (long)len > size) break;
        if (std::strncmp(type, "IHDR", 4) == 0) {
            info->width = (int)be32(body);
            info->height = (int)be32(body + 4);
            info->bitdepth = body[8];
            info->colortype = body[9];
            if (body[12] != 0) {
                stbi__failure = "interlaced PNG not supported";
                return false;
            }
            saw_ihdr = true;
        } else if (std::strncmp(type, "PLTE", 4) == 0) {
            info->palette.assign(body, body + len);
        } else if (std::strncmp(type, "tRNS", 4) == 0) {
            info->has_trns = true;
        } else if (std::strncmp(type, "IDAT", 4) == 0 && want_data) {
            info->idat.insert(info->idat.end(), body, body + len);
        } else if (std::strncmp(type, "IEND", 4) == 0) {
            break;
        }
        pos += 12 + (long)len;
    }
    if (!saw_ihdr) {
        stbi__failure = "missing IHDR";
        return false;
    }
    switch (info->colortype) {
        case 0: info->channels = 1; break;
        case 2: info->channels = 3; break;
        case 3: info->channels = info->has_trns ? 4 : 3; break;
        case 4: info->channels = 2; break;
        case 6: info->channels = 4; break;
        default: stbi__failure = "bad color type"; return false;
    }
    return true;
}

inline int raw_channels(int colortype) {
    switch (colortype) {
        case 0: case 3: return 1;
        case 2: return 3;
        case 4: return 2;
        default: return 4;
    }
}

inline int paeth(int a, int b, int c) {
    const int p = a + b - c;
    const int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

inline unsigned char *decode(const unsigned char *data, long size, int *w,
                             int *h, int *channels) {
    PngInfo info;
    if (!parse(data, size, &info, true)) return nullptr;
    const int rc = raw_channels(info.colortype);
    const long bits_per_px = (long)rc * info.bitdepth;
    const long stride = (bits_per_px * info.width + 7) / 8;
    const long raw_size = (stride + 1) * info.height;

    std::vector<unsigned char> raw(raw_size);
    uLongf dst_len = (uLongf)raw_size;
    if (uncompress(raw.data(), &dst_len, info.idat.data(),
                   (uLong)info.idat.size()) != Z_OK || dst_len != (uLongf)raw_size) {
        stbi__failure = "zlib inflate failed";
        return nullptr;
    }

    // Undo per-scanline filters in place (bytes-per-pixel for filtering is
    // max(1, bits_per_px/8) per the PNG spec).
    const int bpp = bits_per_px >= 8 ? (int)(bits_per_px / 8) : 1;
    std::vector<unsigned char> img((size_t)stride * info.height);
    for (int y = 0; y < info.height; ++y) {
        const unsigned char f = raw[(size_t)y * (stride + 1)];
        const unsigned char *src = &raw[(size_t)y * (stride + 1) + 1];
        unsigned char *dst = &img[(size_t)y * stride];
        const unsigned char *up = y > 0 ? &img[(size_t)(y - 1) * stride] : nullptr;
        for (long x = 0; x < stride; ++x) {
            const int a = x >= bpp ? dst[x - bpp] : 0;
            const int b = up ? up[x] : 0;
            const int c = (up && x >= bpp) ? up[x - bpp] : 0;
            int v = src[x];
            switch (f) {
                case 1: v += a; break;
                case 2: v += b; break;
                case 3: v += (a + b) / 2; break;
                case 4: v += paeth(a, b, c); break;
                default: break;
            }
            dst[x] = (unsigned char)(v & 0xFF);
        }
    }

    // Expand to 8-bit samples.
    const int out_ch = info.channels;
    unsigned char *out = (unsigned char *)std::malloc(
        (size_t)info.width * info.height * out_ch);
    if (out == nullptr) {
        stbi__failure = "out of memory";
        return nullptr;
    }
    const int bd = info.bitdepth;
    for (int y = 0; y < info.height; ++y) {
        const unsigned char *row = &img[(size_t)y * stride];
        for (int x = 0; x < info.width; ++x) {
            unsigned samples[4] = {0, 0, 0, 0};
            for (int ci = 0; ci < rc; ++ci) {
                const long bit = ((long)x * rc + ci) * bd;
                unsigned v;
                if (bd == 8) {
                    v = row[bit / 8];
                } else {
                    const unsigned byte = row[bit / 8];
                    const int shift = 8 - bd - (int)(bit % 8);
                    v = (byte >> shift) & ((1u << bd) - 1);
                    // scale up to 8-bit (except palette indices)
                    if (info.colortype != 3) {
                        v = (unsigned)(v * 255 / ((1u << bd) - 1));
                    }
                }
                samples[ci] = v;
            }
            unsigned char *px = out + ((size_t)y * info.width + x) * out_ch;
            if (info.colortype == 3) {
                const unsigned idx = samples[0];
                if (3 * idx + 2 < info.palette.size()) {
                    px[0] = info.palette[3 * idx];
                    px[1] = info.palette[3 * idx + 1];
                    px[2] = info.palette[3 * idx + 2];
                } else {
                    px[0] = px[1] = px[2] = 0;
                }
                if (out_ch == 4) px[3] = 255;
            } else {
                for (int ci = 0; ci < out_ch; ++ci)
                    px[ci] = (unsigned char)samples[ci];
            }
        }
    }
    *w = info.width;
    *h = info.height;
    *channels = out_ch;
    return out;
}

inline bool read_file(const char *path, std::vector<unsigned char> *buf) {
    std::FILE *f = std::fopen(path, "rb");
    if (f == nullptr) {
        stbi__failure = "cannot open file";
        return false;
    }
    std::fseek(f, 0, SEEK_END);
    const long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    buf->resize((size_t)n);
    const bool ok = n == 0 || std::fread(buf->data(), 1, (size_t)n, f) == (size_t)n;
    std::fclose(f);
    if (!ok) stbi__failure = "short read";
    return ok;
}

} // namespace stbi_shim

inline int stbi_info_from_memory(const unsigned char *data, int size, int *w,
                                 int *h, int *channels) {
    stbi_shim::PngInfo info;
    if (!stbi_shim::parse(data, size, &info, false)) return 0;
    *w = info.width;
    *h = info.height;
    *channels = info.channels;
    return 1;
}

inline unsigned char *stbi_load_from_memory(const unsigned char *data,
                                            int size, int *w, int *h,
                                            int *channels, int req) {
    (void)req;  // Texture.cpp always passes 0 (natural channels)
    return stbi_shim::decode(data, size, w, h, channels);
}

inline int stbi_info(const char *path, int *w, int *h, int *channels) {
    std::vector<unsigned char> buf;
    if (!stbi_shim::read_file(path, &buf)) return 0;
    return stbi_info_from_memory(buf.data(), (int)buf.size(), w, h, channels);
}

inline unsigned char *stbi_load(const char *path, int *w, int *h,
                                int *channels, int req) {
    std::vector<unsigned char> buf;
    if (!stbi_shim::read_file(path, &buf)) return nullptr;
    return stbi_load_from_memory(buf.data(), (int)buf.size(), w, h, channels,
                                 req);
}

#endif // SHIM_STB_IMAGE_H
