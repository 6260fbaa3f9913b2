// Native OBJ parser (the data-loader role the reference fills with C++
// mesh loaders, src/shapes/obj.cpp): two-pass parse into caller-provided
// buffers, loaded from Python via ctypes (io/mesh_loaders.py). Handles
// v/vn/vt/f records with v, v/t, v//n and v/t/n face tokens and fan
// triangulation of n-gons; negative/1-based index normalization stays in
// the (vectorized) numpy caller. ~20x the pure-Python line loop.
//
// Build: g++ -O2 -shared -fPIC -std=c++17 obj_shim.cpp -o libobj_shim.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Counts {
    int64_t verts = 0, norms = 0, uvs = 0, tris = 0;
};

inline const char* skip_ws(const char* p, const char* end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    return p;
}

inline const char* next_tok(const char* p, const char* end) {
    while (p < end && *p != ' ' && *p != '\t' && *p != '\r' && *p != '\n')
        ++p;
    return p;
}

// fast float parse (strtof handles all OBJ float spellings)
inline float parse_f(const char*& p) {
    char* q;
    float v = strtof(p, &q);
    p = q;
    return v;
}

bool read_file(const char* path, std::vector<char>& buf) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    buf.resize((size_t)n + 1);
    size_t got = fread(buf.data(), 1, (size_t)n, f);
    fclose(f);
    if ((long)got != n) return false;
    buf[(size_t)n] = '\n';
    return true;
}

int face_vertex_count(const char* p, const char* end) {
    int c = 0;
    while (p < end && *p != '\n') {
        p = skip_ws(p, end);
        if (p >= end || *p == '\n') break;
        ++c;
        p = next_tok(p, end);
    }
    return c;
}

// parse one face token "v", "v/t", "v//n", "v/t/n"
inline void parse_face_tok(const char*& p, int64_t& vi, int64_t& ti,
                           int64_t& ni) {
    char* q;
    vi = strtoll(p, &q, 10);
    p = q;
    ti = 0;
    ni = 0;
    if (*p == '/') {
        ++p;
        if (*p != '/') {
            ti = strtoll(p, &q, 10);
            p = q;
        }
        if (*p == '/') {
            ++p;
            ni = strtoll(p, &q, 10);
            p = q;
        }
    }
}

}  // namespace

extern "C" {

// pass 1: count records so Python can allocate exact buffers
int obj_count(const char* path, int64_t* out) {
    std::vector<char> buf;
    if (!read_file(path, buf)) return 1;
    const char* p = buf.data();
    const char* end = p + buf.size();
    Counts c;
    while (p < end) {
        p = skip_ws(p, end);
        if (p + 1 < end && p[0] == 'v') {
            if (p[1] == ' ' || p[1] == '\t') ++c.verts;
            else if (p[1] == 'n') ++c.norms;
            else if (p[1] == 't') ++c.uvs;
        } else if (p < end && p[0] == 'f' &&
                   (p[1] == ' ' || p[1] == '\t')) {
            int nv = face_vertex_count(p + 1, end);
            if (nv >= 3) c.tris += nv - 2;
        }
        while (p < end && *p != '\n') ++p;
        ++p;
    }
    out[0] = c.verts;
    out[1] = c.norms;
    out[2] = c.uvs;
    out[3] = c.tris;
    return 0;
}

// pass 2: fill caller buffers (sizes from obj_count). Indices are the raw
// OBJ values (1-based, possibly negative, 0 = absent).
int obj_parse(const char* path, float* verts, float* norms, float* uvs,
              int64_t* fv, int64_t* ft, int64_t* fn) {
    std::vector<char> buf;
    if (!read_file(path, buf)) return 1;
    const char* p = buf.data();
    const char* end = p + buf.size();
    int64_t iv = 0, in_ = 0, it = 0, itri = 0;
    int64_t poly_v[512], poly_t[512], poly_n[512];
    while (p < end) {
        p = skip_ws(p, end);
        if (p + 1 < end && p[0] == 'v' &&
            (p[1] == ' ' || p[1] == '\t')) {
            p += 2;
            verts[3 * iv] = parse_f(p);
            verts[3 * iv + 1] = parse_f(p);
            verts[3 * iv + 2] = parse_f(p);
            ++iv;
        } else if (p + 2 < end && p[0] == 'v' && p[1] == 'n') {
            p += 3;
            norms[3 * in_] = parse_f(p);
            norms[3 * in_ + 1] = parse_f(p);
            norms[3 * in_ + 2] = parse_f(p);
            ++in_;
        } else if (p + 2 < end && p[0] == 'v' && p[1] == 't') {
            p += 3;
            uvs[2 * it] = parse_f(p);
            uvs[2 * it + 1] = parse_f(p);
            ++it;
        } else if (p < end && p[0] == 'f' &&
                   (p[1] == ' ' || p[1] == '\t')) {
            p += 2;
            int nv = 0;
            while (p < end && *p != '\n' && nv < 512) {
                p = skip_ws(p, end);
                if (p >= end || *p == '\n') break;
                parse_face_tok(p, poly_v[nv], poly_t[nv], poly_n[nv]);
                ++nv;
            }
            for (int k = 1; k + 1 < nv; ++k) {
                fv[3 * itri] = poly_v[0];
                fv[3 * itri + 1] = poly_v[k];
                fv[3 * itri + 2] = poly_v[k + 1];
                ft[3 * itri] = poly_t[0];
                ft[3 * itri + 1] = poly_t[k];
                ft[3 * itri + 2] = poly_t[k + 1];
                fn[3 * itri] = poly_n[0];
                fn[3 * itri + 1] = poly_n[k];
                fn[3 * itri + 2] = poly_n[k + 1];
                ++itri;
            }
        }
        while (p < end && *p != '\n') ++p;
        ++p;
    }
    return 0;
}

}  // extern "C"
