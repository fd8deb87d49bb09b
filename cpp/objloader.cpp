// Fast Wavefront OBJ parser (C-ABI, ctypes-loaded) — the native scene
// loader tier (SURVEY.md R7: the reference's C++ mesh loading). Parses
// v / f (v, v/vt, v//vn, v/vt/vn; negative indices; fan triangulation)
// and usemtl / mtllib bookkeeping; material RESOLUTION (.mtl parsing)
// stays on the Python side, which receives the per-triangle material
// index, the material-name table, and the mtllib file list.
//
// Protocol (see tracer/scene/cpp_loader.py):
//   h  = obj_parse(path)                    -> handle >= 0, or -1
//   obj_counts(h, &nv, &nt, &names_len, &libs_len)
//   obj_copy(h, verts[nv*3], tris[nt*3], mat[nt], names[names_len],
//            libs[libs_len])                 (names/libs are '\n'-joined)
//   obj_free(h)
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <string>
#include <vector>

namespace {

struct ObjData {
  std::vector<float> verts;       // xyz triples
  std::vector<int32_t> tris;      // vertex-index triples
  std::vector<int32_t> mat_of_tri;
  std::string names;              // '\n'-joined material names (idx order)
  std::string libs;               // '\n'-joined mtllib arguments
};

std::map<int64_t, ObjData*> g_objs;
int64_t g_next = 1;

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

inline const char* next_line(const char* p, const char* end) {
  while (p < end && *p != '\n') ++p;
  return p < end ? p + 1 : end;
}

// Parse one face vertex token ("i", "i/j", "i//k", "i/j/k"); returns the
// 0-based vertex index resolved against the current vertex count.
inline bool face_index(const char*& p, const char* end, int64_t nverts,
                       int32_t* out) {
  char* q;
  long i = strtol(p, &q, 10);
  if (q == p) return false;
  p = q;
  // skip the /vt/vn part of the token
  while (p < end && *p != ' ' && *p != '\t' && *p != '\n' && *p != '\r') ++p;
  *out = i > 0 ? (int32_t)(i - 1) : (int32_t)(nverts + i);
  return true;
}

}  // namespace

extern "C" int64_t obj_parse(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf(size, '\0');
  if (size > 0 && fread(&buf[0], 1, size, f) != (size_t)size) {
    fclose(f);
    return -1;
  }
  fclose(f);

  ObjData* d = new ObjData();
  std::map<std::string, int32_t> mat_index;
  auto intern = [&](const std::string& name) {
    auto it = mat_index.find(name);
    if (it != mat_index.end()) return it->second;
    int32_t idx = (int32_t)mat_index.size();
    mat_index[name] = idx;
    if (!d->names.empty()) d->names += '\n';
    d->names += name;
    return idx;
  };
  int32_t cur_mat = intern("default");

  const char* p = buf.data();
  const char* end = p + buf.size();
  std::vector<int32_t> poly;
  while (p < end) {
    p = skip_ws(p, end);
    if (p >= end) break;
    if (p[0] == 'v' && p + 1 < end
        && (p[1] == ' ' || p[1] == '\t')) {
      char* q;
      float x = strtof(p + 1, &q);
      float y = strtof(q, &q);
      float z = strtof(q, &q);
      d->verts.push_back(x);
      d->verts.push_back(y);
      d->verts.push_back(z);
    } else if (p[0] == 'f' && p + 1 < end
               && (p[1] == ' ' || p[1] == '\t')) {
      poly.clear();
      const char* q = p + 1;
      int64_t nv = (int64_t)(d->verts.size() / 3);
      while (true) {
        q = skip_ws(q, end);
        if (q >= end || *q == '\n') break;
        int32_t idx;
        if (!face_index(q, end, nv, &idx)) break;
        poly.push_back(idx);
      }
      for (size_t k = 1; k + 1 < poly.size(); ++k) {  // fan triangulation
        d->tris.push_back(poly[0]);
        d->tris.push_back(poly[k]);
        d->tris.push_back(poly[k + 1]);
        d->mat_of_tri.push_back(cur_mat);
      }
    } else if (!strncmp(p, "usemtl", 6)) {
      const char* q = skip_ws(p + 6, end);
      const char* e = q;
      while (e < end && *e != '\n' && *e != '\r' && *e != ' ' && *e != '\t')
        ++e;
      cur_mat = intern(std::string(q, e - q));
    } else if (!strncmp(p, "mtllib", 6)) {
      // OBJ allows several library files per mtllib line: split on
      // whitespace, one entry each (kept in parity with the Python
      // parser, which iterates the same tokens).
      const char* q = p + 6;
      while (true) {
        q = skip_ws(q, end);
        if (q >= end || *q == '\n' || *q == '\r') break;
        const char* e = q;
        while (e < end && *e != '\n' && *e != '\r' && *e != ' '
               && *e != '\t')
          ++e;
        if (!d->libs.empty()) d->libs += '\n';
        d->libs.append(q, e - q);
        q = e;
      }
    }
    p = next_line(p, end);
  }
  int64_t h = g_next++;
  g_objs[h] = d;
  return h;
}

extern "C" void obj_counts(int64_t h, int64_t* nv, int64_t* nt,
                           int64_t* names_len, int64_t* libs_len) {
  ObjData* d = g_objs.at(h);
  *nv = (int64_t)(d->verts.size() / 3);
  *nt = (int64_t)(d->tris.size() / 3);
  *names_len = (int64_t)d->names.size();
  *libs_len = (int64_t)d->libs.size();
}

extern "C" void obj_copy(int64_t h, float* verts, int32_t* tris,
                         int32_t* mat_of_tri, char* names, char* libs) {
  ObjData* d = g_objs.at(h);
  if (!d->verts.empty())
    memcpy(verts, d->verts.data(), d->verts.size() * sizeof(float));
  if (!d->tris.empty()) {
    memcpy(tris, d->tris.data(), d->tris.size() * sizeof(int32_t));
    memcpy(mat_of_tri, d->mat_of_tri.data(),
           d->mat_of_tri.size() * sizeof(int32_t));
  }
  if (!d->names.empty()) memcpy(names, d->names.data(), d->names.size());
  if (!d->libs.empty()) memcpy(libs, d->libs.data(), d->libs.size());
}

extern "C" void obj_free(int64_t h) {
  auto it = g_objs.find(h);
  if (it != g_objs.end()) {
    delete it->second;
    g_objs.erase(it);
  }
}
