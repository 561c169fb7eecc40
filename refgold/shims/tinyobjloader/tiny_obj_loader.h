// Minimal tinyobjloader-API-compatible OBJ/MTL parser, written from scratch
// so the MobileRT reference engine builds offline (the real tinyobjloader
// submodule is not vendored and there is no network).  Implements only the
// surface app/Components/Loaders/OBJLoader.cpp uses: LoadObj from streams,
// attrib_t/shape_t/material_t/index_t, MaterialStreamReader, with
// tinyobjloader v1.x semantics (1-based indices, negative = relative,
// fan triangulation from vertex 0, shapes split on o/g tags, material
// defaults dissolve=1 shininess=1 ior=1).
#ifndef SHIM_TINY_OBJ_LOADER_H
#define SHIM_TINY_OBJ_LOADER_H

#include <cstdlib>
#include <cstring>
#include <istream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

namespace tinyobj {

typedef float real_t;

struct index_t {
    int vertex_index;
    int normal_index;
    int texcoord_index;
};

struct attrib_t {
    std::vector<real_t> vertices;
    std::vector<real_t> normals;
    std::vector<real_t> texcoords;
    std::vector<real_t> colors;
};

struct mesh_t {
    std::vector<index_t> indices;
    std::vector<unsigned char> num_face_vertices;
    std::vector<int> material_ids;
};

struct shape_t {
    std::string name;
    mesh_t mesh;
};

struct material_t {
    std::string name;
    real_t ambient[3];
    real_t diffuse[3];
    real_t specular[3];
    real_t transmittance[3];
    real_t emission[3];
    real_t shininess;
    real_t ior;
    real_t dissolve;
    int illum;
    std::string ambient_texname;
    std::string diffuse_texname;
    std::string specular_texname;
    std::string bump_texname;
    std::string alpha_texname;
};

inline void InitMaterial(material_t *m) {
    m->name.clear();
    for (int i = 0; i < 3; i++) {
        m->ambient[i] = 0; m->diffuse[i] = 0; m->specular[i] = 0;
        m->transmittance[i] = 0; m->emission[i] = 0;
    }
    m->shininess = 1; m->ior = 1; m->dissolve = 1; m->illum = 0;
    m->ambient_texname.clear(); m->diffuse_texname.clear();
    m->specular_texname.clear(); m->bump_texname.clear();
    m->alpha_texname.clear();
}

inline void LoadMtl(std::map<std::string, int> *matMap,
                    std::vector<material_t> *materials,
                    std::istream *inStream) {
    // OBJLoader.cpp enables failbit exceptions on these streams; the real
    // tinyobjloader never throws (getline at EOF sets failbit), so neither
    // do we.
    inStream->exceptions(std::ios::goodbit);
    material_t mat;
    InitMaterial(&mat);
    bool has = false;
    std::string line;
    while (std::getline(*inStream, line)) {
        // strip trailing CR and leading blanks
        while (!line.empty() && (line.back() == '\r' || line.back() == '\n'))
            line.pop_back();
        size_t p = line.find_first_not_of(" \t");
        if (p == std::string::npos) continue;
        std::istringstream ls(line.substr(p));
        std::string tag;
        ls >> tag;
        if (tag.empty() || tag[0] == '#') continue;
        if (tag == "newmtl") {
            if (has) {
                matMap->insert({mat.name, (int)materials->size()});
                materials->push_back(mat);
            }
            InitMaterial(&mat);
            ls >> mat.name;
            has = true;
        } else if (tag == "Ka") {
            ls >> mat.ambient[0] >> mat.ambient[1] >> mat.ambient[2];
        } else if (tag == "Kd") {
            ls >> mat.diffuse[0] >> mat.diffuse[1] >> mat.diffuse[2];
        } else if (tag == "Ks") {
            ls >> mat.specular[0] >> mat.specular[1] >> mat.specular[2];
        } else if (tag == "Kt" || tag == "Tf") {
            ls >> mat.transmittance[0] >> mat.transmittance[1]
               >> mat.transmittance[2];
        } else if (tag == "Ke") {
            ls >> mat.emission[0] >> mat.emission[1] >> mat.emission[2];
        } else if (tag == "Ns") {
            ls >> mat.shininess;
        } else if (tag == "Ni") {
            ls >> mat.ior;
        } else if (tag == "d") {
            ls >> mat.dissolve;
        } else if (tag == "Tr") {
            real_t tr {0};
            ls >> tr;
            mat.dissolve = 1 - tr;
        } else if (tag == "illum") {
            ls >> mat.illum;
        } else if (tag == "map_Kd") {
            ls >> mat.diffuse_texname;
        } else if (tag == "map_Ka") {
            ls >> mat.ambient_texname;
        } else if (tag == "map_Ks") {
            ls >> mat.specular_texname;
        }
    }
    if (has) {
        matMap->insert({mat.name, (int)materials->size()});
        materials->push_back(mat);
    }
}

class MaterialReader {
public:
    virtual ~MaterialReader() {}
    virtual bool operator()(const std::string &matId,
                            std::vector<material_t> *materials,
                            std::map<std::string, int> *matMap,
                            std::string *warn, std::string *err) = 0;
};

class MaterialStreamReader : public MaterialReader {
public:
    explicit MaterialStreamReader(std::istream &inStream)
        : inStream_(inStream) {}
    bool operator()(const std::string &, std::vector<material_t> *materials,
                    std::map<std::string, int> *matMap, std::string *,
                    std::string *) override {
        LoadMtl(matMap, materials, &inStream_);
        return true;
    }

private:
    std::istream &inStream_;
};

// Parses one face corner "v", "v/vt", "v//vn" or "v/vt/vn" (1-based;
// negative = relative to current count).
inline index_t parseTriple(const char *&t, size_t nv, size_t nn, size_t nt) {
    index_t idx {0, -1, -1};
    char *end;
    long v = std::strtol(t, &end, 10);
    t = end;
    idx.vertex_index = v > 0 ? (int)(v - 1) : (v < 0 ? (int)(nv + v) : -1);
    if (*t == '/') {
        ++t;
        if (*t == '/') {
            ++t;
            long n = std::strtol(t, &end, 10);
            t = end;
            idx.normal_index = n > 0 ? (int)(n - 1) : (n < 0 ? (int)(nn + n) : -1);
        } else {
            long tc = std::strtol(t, &end, 10);
            t = end;
            idx.texcoord_index =
                tc > 0 ? (int)(tc - 1) : (tc < 0 ? (int)(nt + tc) : -1);
            if (*t == '/') {
                ++t;
                long n = std::strtol(t, &end, 10);
                t = end;
                idx.normal_index =
                    n > 0 ? (int)(n - 1) : (n < 0 ? (int)(nn + n) : -1);
            }
        }
    }
    return idx;
}

inline bool LoadObj(attrib_t *attrib, std::vector<shape_t> *shapes,
                    std::vector<material_t> *materials, std::string *warn,
                    std::string *err, std::istream *inStream,
                    MaterialReader *readMatFn = nullptr,
                    bool triangulate = true,
                    bool default_vcols_fallback = true) {
    (void)default_vcols_fallback;
    inStream->exceptions(std::ios::goodbit);  // see LoadMtl note
    attrib->vertices.clear();
    attrib->normals.clear();
    attrib->texcoords.clear();
    attrib->colors.clear();
    shapes->clear();

    std::map<std::string, int> matMap;
    int currentMat = -1;
    bool mtlLoaded = false;

    shape_t current;
    auto flush = [&](const std::string &nextName) {
        if (!current.mesh.indices.empty()) {
            shapes->push_back(current);
        }
        current = shape_t {};
        current.name = nextName;
    };

    std::string line;
    while (std::getline(*inStream, line)) {
        while (!line.empty() && (line.back() == '\r' || line.back() == '\n'))
            line.pop_back();
        size_t p = line.find_first_not_of(" \t");
        if (p == std::string::npos) continue;
        const char *t = line.c_str() + p;
        if (*t == '#') continue;

        if (t[0] == 'v' && (t[1] == ' ' || t[1] == '\t')) {
            std::istringstream ls(t + 2);
            real_t x, y, z;
            ls >> x >> y >> z;
            attrib->vertices.push_back(x);
            attrib->vertices.push_back(y);
            attrib->vertices.push_back(z);
            attrib->colors.push_back(1);
            attrib->colors.push_back(1);
            attrib->colors.push_back(1);
        } else if (t[0] == 'v' && t[1] == 'n' && (t[2] == ' ' || t[2] == '\t')) {
            std::istringstream ls(t + 3);
            real_t x, y, z;
            ls >> x >> y >> z;
            attrib->normals.push_back(x);
            attrib->normals.push_back(y);
            attrib->normals.push_back(z);
        } else if (t[0] == 'v' && t[1] == 't' && (t[2] == ' ' || t[2] == '\t')) {
            std::istringstream ls(t + 3);
            real_t u {0}, v {0};
            ls >> u >> v;
            attrib->texcoords.push_back(u);
            attrib->texcoords.push_back(v);
        } else if (t[0] == 'f' && (t[1] == ' ' || t[1] == '\t')) {
            const char *s = t + 2;
            std::vector<index_t> face;
            while (*s) {
                while (*s == ' ' || *s == '\t') ++s;
                if (!*s) break;
                face.push_back(parseTriple(s, attrib->vertices.size() / 3,
                                           attrib->normals.size() / 3,
                                           attrib->texcoords.size() / 2));
            }
            if (face.size() < 3) continue;
            if (triangulate) {
                // tinyobjloader v1.x fan triangulation from vertex 0.
                for (size_t k = 2; k < face.size(); ++k) {
                    current.mesh.indices.push_back(face[0]);
                    current.mesh.indices.push_back(face[k - 1]);
                    current.mesh.indices.push_back(face[k]);
                    current.mesh.num_face_vertices.push_back(3);
                    current.mesh.material_ids.push_back(currentMat);
                }
            } else {
                for (const index_t &ix : face) current.mesh.indices.push_back(ix);
                current.mesh.num_face_vertices.push_back(
                    (unsigned char)face.size());
                current.mesh.material_ids.push_back(currentMat);
            }
        } else if (std::strncmp(t, "usemtl", 6) == 0) {
            std::istringstream ls(t + 6);
            std::string name;
            ls >> name;
            auto it = matMap.find(name);
            if (it != matMap.end()) {
                currentMat = it->second;
            } else {
                currentMat = -1;
                if (warn) *warn += "material [" + name + "] not found\n";
            }
        } else if (std::strncmp(t, "mtllib", 6) == 0) {
            if (readMatFn != nullptr && !mtlLoaded) {
                std::istringstream ls(t + 6);
                std::string name;
                ls >> name;
                (*readMatFn)(name, materials, &matMap, warn, err);
                mtlLoaded = true;
            }
        } else if ((t[0] == 'o' || t[0] == 'g') &&
                   (t[1] == ' ' || t[1] == '\t' || t[1] == '\0')) {
            std::istringstream ls(t + 1);
            std::string name;
            ls >> name;
            flush(name);
        }
        // s (smoothing), l (lines), p (points) ignored.
    }
    flush("");
    // If the OBJ referenced no mtllib but a reader was supplied, tinyobj
    // does NOT call it; materials stay empty.
    return true;
}

} // namespace tinyobj

#endif // SHIM_TINY_OBJ_LOADER_H
