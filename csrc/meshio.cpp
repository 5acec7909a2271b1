// meshio.cpp — native mesh data-loader tier.
//
// Fast Wavefront OBJ parsing for large assets (the Python fallback in
// pathtrace_tpu/meshes.py is fine for small files but ~50x slower on
// 100k-triangle meshes). Two-pass: count records, then fill caller-allocated
// buffers. Faces are fan-triangulated; negative indices resolved.

#include <cctype>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Counts {
  long vertices;
  long triangles;
};

bool parse(const char *path, Counts *counts, double *verts, long long *faces) {
  FILE *f = std::fopen(path, "rb");
  if (!f) return false;
  char line[1024];
  long nv = 0, nf = 0;
  while (std::fgets(line, sizeof line, f)) {
    if (line[0] == 'v' && line[1] == ' ') {
      if (verts) {
        double x, y, z;
        if (std::sscanf(line + 2, "%lf %lf %lf", &x, &y, &z) == 3) {
          verts[3 * nv] = x;
          verts[3 * nv + 1] = y;
          verts[3 * nv + 2] = z;
        }
      }
      nv++;
    } else if (line[0] == 'f' && line[1] == ' ') {
      // tokenize face indices (v, v/t, v/t/n, v//n forms)
      long idx[64];
      int k = 0;
      const char *p = line + 2;
      while (*p && k < 64) {
        while (*p == ' ' || *p == '\t') p++;
        if (!*p || *p == '\n' || *p == '\r') break;
        long v = std::strtol(p, const_cast<char **>(&p), 10);
        if (v < 0) v = nv + v + 1;  // negative: relative to current count
        idx[k++] = v - 1;
        while (*p && *p != ' ' && *p != '\t' && *p != '\n') p++;  // skip /t/n
      }
      for (int i = 1; i + 1 < k; i++) {
        if (faces) {
          faces[3 * nf] = idx[0];
          faces[3 * nf + 1] = idx[i];
          faces[3 * nf + 2] = idx[i + 1];
        }
        nf++;
      }
    }
  }
  std::fclose(f);
  counts->vertices = nv;
  counts->triangles = nf;
  return true;
}

}  // namespace

extern "C" {

// Pass 1: sizes. Returns 0 on success.
int obj_count(const char *path, long *num_vertices, long *num_triangles) {
  Counts c{};
  if (!parse(path, &c, nullptr, nullptr)) return 1;
  *num_vertices = c.vertices;
  *num_triangles = c.triangles;
  return 0;
}

// Pass 2: fill verts (V*3 doubles) and faces (F*3 int64). Returns 0 on success.
int obj_load(const char *path, double *verts, long long *faces) {
  Counts c{};
  return parse(path, &c, verts, faces) ? 0 : 1;
}

}  // extern "C"
