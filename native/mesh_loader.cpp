// Fast OBJ triangle-mesh loader (native counterpart of io/mesh.py's
// pure-Python parser; the reference's src/shapes/obj.cpp is likewise C++).
// Exposed through a minimal C ABI consumed via ctypes — no pybind11.
//
// Parses v/vt/vn/f records with negative indices and polygon fans, and
// uniquifies (v, vt, vn) corner triples exactly like obj.cpp's vertex
// cache, so outputs match the Python loader element-for-element.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <vector>
#include <unordered_map>

namespace {

struct Corner {
    int32_t v, t, n;
    bool operator==(const Corner& o) const {
        return v == o.v && t == o.t && n == o.n;
    }
};

struct CornerHash {
    size_t operator()(const Corner& c) const {
        size_t h = (size_t)(uint32_t)c.v;
        h = h * 0x9E3779B97F4A7C15ULL ^ (size_t)(uint32_t)c.t;
        h = h * 0x9E3779B97F4A7C15ULL ^ (size_t)(uint32_t)c.n;
        return h;
    }
};

struct MeshOut {
    std::vector<float> positions;  // 3 per vertex
    std::vector<float> normals;    // 3 per vertex (zeros if absent)
    std::vector<float> uvs;        // 2 per vertex
    std::vector<int32_t> indices;  // 3 per triangle
    bool has_normals = false;
    bool has_uvs = false;
};

}  // namespace

extern "C" {

// Returns 0 on success. Caller frees the returned buffers with
// mesh_free(). All out-params are malloc'd here.
int parse_obj(const char* path,
              float** out_pos, float** out_nrm, float** out_uv,
              int32_t** out_idx,
              int64_t* out_nverts, int64_t* out_ntris,
              int32_t* out_has_normals, int32_t* out_has_uvs) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return 1;

    std::vector<float> vs, vts, vns;
    MeshOut mesh;
    std::unordered_map<Corner, int32_t, CornerHash> cache;
    std::vector<Corner> face;

    char line[4096];
    while (std::fgets(line, sizeof(line), f)) {
        if (line[0] == 'v' && line[1] == ' ') {
            float x, y, z;
            if (std::sscanf(line + 2, "%f %f %f", &x, &y, &z) == 3) {
                vs.push_back(x); vs.push_back(y); vs.push_back(z);
            }
        } else if (line[0] == 'v' && line[1] == 't') {
            float u_, v_;
            if (std::sscanf(line + 3, "%f %f", &u_, &v_) == 2) {
                vts.push_back(u_); vts.push_back(v_);
            }
        } else if (line[0] == 'v' && line[1] == 'n') {
            float x, y, z;
            if (std::sscanf(line + 3, "%f %f %f", &x, &y, &z) == 3) {
                vns.push_back(x); vns.push_back(y); vns.push_back(z);
            }
        } else if (line[0] == 'f' && line[1] == ' ') {
            face.clear();
            char* p = line + 2;
            while (*p) {
                while (*p == ' ' || *p == '\t') ++p;
                if (*p == '\n' || *p == '\r' || *p == '\0') break;
                long vi = std::strtol(p, &p, 10);
                long ti = 0, ni = 0;
                if (*p == '/') {
                    ++p;
                    if (*p != '/') ti = std::strtol(p, &p, 10);
                    if (*p == '/') { ++p; ni = std::strtol(p, &p, 10); }
                }
                Corner c;
                long nv = (long)vs.size() / 3;
                long nt = (long)vts.size() / 2;
                long nn = (long)vns.size() / 3;
                c.v = (int32_t)(vi > 0 ? vi - 1 : nv + vi);
                c.t = (int32_t)(ti > 0 ? ti - 1 : (ti ? nt + ti : -1));
                c.n = (int32_t)(ni > 0 ? ni - 1 : (ni ? nn + ni : -1));
                face.push_back(c);
            }
            for (size_t k = 1; k + 1 < face.size(); ++k) {
                const Corner tri[3] = {face[0], face[k], face[k + 1]};
                for (const Corner& c : tri) {
                    auto it = cache.find(c);
                    int32_t id;
                    if (it == cache.end()) {
                        id = (int32_t)(mesh.positions.size() / 3);
                        cache.emplace(c, id);
                        mesh.positions.push_back(vs[3 * c.v]);
                        mesh.positions.push_back(vs[3 * c.v + 1]);
                        mesh.positions.push_back(vs[3 * c.v + 2]);
                        if (c.t >= 0) {
                            mesh.uvs.push_back(vts[2 * c.t]);
                            mesh.uvs.push_back(vts[2 * c.t + 1]);
                            mesh.has_uvs = true;
                        } else {
                            mesh.uvs.push_back(0); mesh.uvs.push_back(0);
                        }
                        if (c.n >= 0) {
                            mesh.normals.push_back(vns[3 * c.n]);
                            mesh.normals.push_back(vns[3 * c.n + 1]);
                            mesh.normals.push_back(vns[3 * c.n + 2]);
                            mesh.has_normals = true;
                        } else {
                            mesh.normals.push_back(0);
                            mesh.normals.push_back(0);
                            mesh.normals.push_back(0);
                        }
                    } else {
                        id = it->second;
                    }
                    mesh.indices.push_back(id);
                }
            }
        }
    }
    std::fclose(f);

    int64_t nv = (int64_t)mesh.positions.size() / 3;
    int64_t nt = (int64_t)mesh.indices.size() / 3;
    *out_pos = (float*)std::malloc(mesh.positions.size() * sizeof(float));
    *out_nrm = (float*)std::malloc(mesh.normals.size() * sizeof(float));
    *out_uv = (float*)std::malloc(mesh.uvs.size() * sizeof(float));
    *out_idx = (int32_t*)std::malloc(mesh.indices.size() * sizeof(int32_t));
    std::memcpy(*out_pos, mesh.positions.data(), mesh.positions.size() * sizeof(float));
    std::memcpy(*out_nrm, mesh.normals.data(), mesh.normals.size() * sizeof(float));
    std::memcpy(*out_uv, mesh.uvs.data(), mesh.uvs.size() * sizeof(float));
    std::memcpy(*out_idx, mesh.indices.data(), mesh.indices.size() * sizeof(int32_t));
    *out_nverts = nv;
    *out_ntris = nt;
    *out_has_normals = mesh.has_normals ? 1 : 0;
    *out_has_uvs = mesh.has_uvs ? 1 : 0;
    return 0;
}

void mesh_free(float* a, float* b, float* c, int32_t* d) {
    std::free(a); std::free(b); std::free(c); std::free(d);
}

}  // extern "C"
