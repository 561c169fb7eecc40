// Fast Wavefront OBJ parser — the native-runtime analogue of the
// reference's tinyobjloader-based scene loading (reference
// app/Components/Loaders/OBJLoader.cpp uses tinyobj on a worker pool).
// Exposed to Python through a minimal C ABI (ctypes); geometry lands in
// caller-allocated numpy buffers so there is exactly one copy.
//
// Scope: v / vn / vt / f / usemtl / mtllib (everything the reference
// consumes).  Faces are fan-triangulated like tinyobj; negative indices
// are resolved; missing vt/vn slots become -1.
#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct ObjData {
    std::vector<float> v;     // xyz triples
    std::vector<float> vn;    // xyz triples
    std::vector<float> vt;    // uv pairs
    // Per triangle: v0,vt0,vn0, v1,vt1,vn1, v2,vt2,vn2 (0-based, -1 = none)
    std::vector<int32_t> tri;
    std::vector<int32_t> tri_mat;   // per-triangle material slot (-1 = none)
    std::vector<std::string> mat_names;  // usemtl names in first-use order
    std::vector<std::string> mtllibs;    // mtllib file names
    std::string mtllib_joined;
};

inline const char* skip_ws(const char* p, const char* end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    return p;
}

inline const char* next_line(const char* p, const char* end) {
    while (p < end && *p != '\n') ++p;
    return p < end ? p + 1 : end;
}

inline float parse_float(const char*& p, const char* end) {
    char* out = nullptr;
    float f = std::strtof(p, &out);
    if (out && out <= end) p = out;
    return f;
}

inline long parse_int(const char*& p, const char* end) {
    char* out = nullptr;
    long i = std::strtol(p, &out, 10);
    if (out && out <= end) p = out;
    return i;
}

// Parses one face vertex "v", "v/vt", "v//vn", "v/vt/vn".
inline bool parse_face_vertex(const char*& p, const char* end,
                              long nv, long nvt, long nvn,
                              int32_t* out) {
    p = skip_ws(p, end);
    if (p >= end || (!isdigit(static_cast<unsigned char>(*p)) && *p != '-')) {
        return false;
    }
    long vi = parse_int(p, end);
    long ti = 0, ni = 0;
    bool has_t = false, has_n = false;
    if (p < end && *p == '/') {
        ++p;
        if (p < end && *p != '/') { ti = parse_int(p, end); has_t = true; }
        if (p < end && *p == '/') { ++p; ni = parse_int(p, end); has_n = true; }
    }
    // OBJ indices are 1-based; negative counts from the end.
    out[0] = static_cast<int32_t>(vi > 0 ? vi - 1 : nv + vi);
    out[1] = has_t ? static_cast<int32_t>(ti > 0 ? ti - 1 : nvt + ti) : -1;
    out[2] = has_n ? static_cast<int32_t>(ni > 0 ? ni - 1 : nvn + ni) : -1;
    return true;
}

}  // namespace

extern "C" {

void* objp_parse(const char* text, long len) {
    ObjData* d = new ObjData();
    const char* p = text;
    const char* end = text + len;
    std::unordered_map<std::string, int32_t> mat_index;
    int32_t current_mat = -1;
    int32_t corners[64][3];

    while (p < end) {
        p = skip_ws(p, end);
        if (p >= end) break;
        const char c0 = *p;
        if (c0 == 'v' && p + 1 < end) {
            const char c1 = p[1];
            if (c1 == ' ' || c1 == '\t') {
                p += 2;
                float x = parse_float(p, end);
                float y = parse_float(p, end);
                float z = parse_float(p, end);
                d->v.push_back(x); d->v.push_back(y); d->v.push_back(z);
            } else if (c1 == 'n') {
                p += 2;
                float x = parse_float(p, end);
                float y = parse_float(p, end);
                float z = parse_float(p, end);
                d->vn.push_back(x); d->vn.push_back(y); d->vn.push_back(z);
            } else if (c1 == 't') {
                p += 2;
                float u = parse_float(p, end);
                float v = parse_float(p, end);
                d->vt.push_back(u); d->vt.push_back(v);
            }
        } else if (c0 == 'f' && p + 1 < end
                   && (p[1] == ' ' || p[1] == '\t')) {
            p += 2;
            const long nv = static_cast<long>(d->v.size() / 3);
            const long nvt = static_cast<long>(d->vt.size() / 2);
            const long nvn = static_cast<long>(d->vn.size() / 3);
            int n = 0;
            while (n < 64 && parse_face_vertex(p, end, nv, nvt, nvn,
                                               corners[n])) {
                ++n;
            }
            // Fan triangulation (tinyobj's default triangulate=true).
            for (int i = 2; i < n; ++i) {
                for (int k = 0; k < 3; ++k) d->tri.push_back(corners[0][k]);
                for (int k = 0; k < 3; ++k) d->tri.push_back(corners[i - 1][k]);
                for (int k = 0; k < 3; ++k) d->tri.push_back(corners[i][k]);
                d->tri_mat.push_back(current_mat);
            }
        } else if (c0 == 'u' && end - p > 7
                   && std::strncmp(p, "usemtl", 6) == 0) {
            p += 6;
            p = skip_ws(p, end);
            const char* q = p;
            while (q < end && *q != '\n' && *q != '\r' && *q != '#') ++q;
            std::string name(p, q);
            while (!name.empty()
                   && (name.back() == ' ' || name.back() == '\t')) {
                name.pop_back();
            }
            auto it = mat_index.find(name);
            if (it == mat_index.end()) {
                current_mat = static_cast<int32_t>(d->mat_names.size());
                mat_index.emplace(name, current_mat);
                d->mat_names.push_back(std::move(name));
            } else {
                current_mat = it->second;
            }
        } else if (c0 == 'm' && end - p > 7
                   && std::strncmp(p, "mtllib", 6) == 0) {
            p += 6;
            p = skip_ws(p, end);
            const char* q = p;
            while (q < end && *q != '\n' && *q != '\r' && *q != '#') ++q;
            std::string name(p, q);
            while (!name.empty()
                   && (name.back() == ' ' || name.back() == '\t')) {
                name.pop_back();
            }
            if (!name.empty()) d->mtllibs.push_back(std::move(name));
        }
        p = next_line(p, end);
    }
    return d;
}

void objp_counts(void* h, long* nv, long* nvn, long* nvt, long* ntri,
                 long* nmat) {
    ObjData* d = static_cast<ObjData*>(h);
    *nv = static_cast<long>(d->v.size() / 3);
    *nvn = static_cast<long>(d->vn.size() / 3);
    *nvt = static_cast<long>(d->vt.size() / 2);
    *ntri = static_cast<long>(d->tri_mat.size());
    *nmat = static_cast<long>(d->mat_names.size());
}

void objp_fill(void* h, float* v, float* vn, float* vt, int32_t* tri,
               int32_t* tri_mat) {
    ObjData* d = static_cast<ObjData*>(h);
    if (v && !d->v.empty())
        std::memcpy(v, d->v.data(), d->v.size() * sizeof(float));
    if (vn && !d->vn.empty())
        std::memcpy(vn, d->vn.data(), d->vn.size() * sizeof(float));
    if (vt && !d->vt.empty())
        std::memcpy(vt, d->vt.data(), d->vt.size() * sizeof(float));
    if (tri && !d->tri.empty())
        std::memcpy(tri, d->tri.data(), d->tri.size() * sizeof(int32_t));
    if (tri_mat && !d->tri_mat.empty())
        std::memcpy(tri_mat, d->tri_mat.data(),
                    d->tri_mat.size() * sizeof(int32_t));
}

const char* objp_mat_name(void* h, long i) {
    ObjData* d = static_cast<ObjData*>(h);
    if (i < 0 || i >= static_cast<long>(d->mat_names.size())) return "";
    return d->mat_names[static_cast<size_t>(i)].c_str();
}

const char* objp_mtllibs(void* h) {
    // Newline-joined mtllib names.
    ObjData* d = static_cast<ObjData*>(h);
    d->mtllib_joined.clear();
    for (size_t i = 0; i < d->mtllibs.size(); ++i) {
        if (i) d->mtllib_joined += '\n';
        d->mtllib_joined += d->mtllibs[i];
    }
    return d->mtllib_joined.c_str();
}

void objp_free(void* h) {
    delete static_cast<ObjData*>(h);
}

}  // extern "C"
