// oracle.cpp — clean-room CPU oracle for statistical parity testing.
//
// Re-implements the reference estimator's *specification* (documented in
// SURVEY.md §3: /root/reference/src/rendering.rs, world.rs, shape.rs,
// material.rs, mirror.rs) as scalar, recursive, double-precision C++ so the
// TPU wavefront renderer can be validated against an independent
// implementation of the same math. This is the framework's native parity
// tier — fast enough to run hundreds of thousands of samples in CI, unlike a
// Python oracle.
//
// Estimator-defining conventions (per SURVEY §3.2):
//   * epsilons: t_min 1e-3, shadow t_max dist-1e-3, 1e-8 Möller–Trumbore and
//     grazing-pdf floors
//   * depth-0-only emissive visibility in MIS; any-depth in BRDF-only
//   * RR: p=1 (d<4), p=min(lum,1) (4<=d<50), p=lum*0.5^(d-4) (d>=50);
//     termination discards the NEE direct light at the current vertex
//   * bsdf-side MIS pdf is NOT divided by the light count; the NEE side is
//   * two-sided triangle emitters; cone sphere-light sampling
//   * eta carried on the ray: NEE at a vertex evaluates with the previous
//     vertex's eta, sampling with the current one
//
// RNG is xoshiro256++ seeded per pixel from (y<<32|x) — parity with the
// reference (ChaCha12) and the TPU renderer (threefry) is statistical.

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr double PI = 3.14159265358979323846;
constexpr int MIN_DEPTH = 4;
constexpr int MAX_DEPTH = 50;

struct V3 {
  double x = 0, y = 0, z = 0;
};
static inline V3 v3(double x, double y, double z) { return {x, y, z}; }
static inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 operator-(V3 a) { return {-a.x, -a.y, -a.z}; }
static inline V3 operator*(V3 a, double s) { return {a.x * s, a.y * s, a.z * s}; }
static inline V3 operator*(double s, V3 a) { return a * s; }
static inline V3 operator*(V3 a, V3 b) { return {a.x * b.x, a.y * b.y, a.z * b.z}; }
static inline V3 operator/(V3 a, double s) { return {a.x / s, a.y / s, a.z / s}; }
static inline double dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline double len(V3 a) { return std::sqrt(dot(a, a)); }
static inline V3 norm(V3 a) {
  double l = len(a);
  return l > 0 ? a / l : a;
}
static inline double luminance(V3 c) { return 0.2126 * c.x + 0.7152 * c.y + 0.0722 * c.z; }
static inline bool finite3(V3 c) {
  return std::isfinite(c.x) && std::isfinite(c.y) && std::isfinite(c.z);
}

// --- RNG: xoshiro256++ with splitmix64 seeding ---
struct Rng {
  uint64_t s[4];
  explicit Rng(uint64_t seed) {
    uint64_t x = seed;
    for (auto &w : s) {
      x += 0x9E3779B97F4A7C15ull;
      uint64_t z = x;
      z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
      z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
      w = z ^ (z >> 31);
    }
  }
  static inline uint64_t rotl(uint64_t v, int k) { return (v << k) | (v >> (64 - k)); }
  uint64_t next() {
    uint64_t r = rotl(s[0] + s[3], 23) + s[0];
    uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return r;
  }
  double uniform() { return (next() >> 11) * 0x1.0p-53; }
};

// --- Scene ---
enum Kind { LAMBERT = 0, EMISSIVE = 1, MIRROR = 2, OREN_NAYAR = 3 };

struct Scene {
  const double *tv0, *te1, *te2;
  const int *tmat;
  int ntri;
  const double *sc, *sr;
  const int *smat;
  int nsph;
  const int *mkind;
  const double *mcolor, *memit, *mrough, *mmetal, *mior;
  const int *lights;
  int nlights;

  V3 tri_v0(int i) const { return {tv0[3 * i], tv0[3 * i + 1], tv0[3 * i + 2]}; }
  V3 tri_e1(int i) const { return {te1[3 * i], te1[3 * i + 1], te1[3 * i + 2]}; }
  V3 tri_e2(int i) const { return {te2[3 * i], te2[3 * i + 1], te2[3 * i + 2]}; }
  V3 sph_c(int i) const { return {sc[3 * i], sc[3 * i + 1], sc[3 * i + 2]}; }
  int prim_mat(int p) const { return p < ntri ? tmat[p] : smat[p - ntri]; }
  V3 color(int m) const { return {mcolor[3 * m], mcolor[3 * m + 1], mcolor[3 * m + 2]}; }
  V3 emission(int m) const { return {memit[3 * m], memit[3 * m + 1], memit[3 * m + 2]}; }
  bool emissive(int m) const { return mkind[m] == EMISSIVE && len(emission(m)) > 0; }
};

struct Ray {
  V3 o, d;
  double eta = 1.0;
};

struct HitRec {
  double t;
  V3 p, n;
  bool front;
  int prim, mat;
};

// --- Intersection (closed [tmin,tmax] ranges, 1e-8 parallel reject) ---
static bool hit_tri(const Scene &s, int i, const Ray &r, double tmin, double tmax, HitRec *h) {
  V3 e1 = s.tri_e1(i), e2 = s.tri_e2(i);
  V3 pv = cross(r.d, e2);
  double a = dot(e1, pv);
  if (std::fabs(a) < 1e-8) return false;
  double f = 1.0 / a;
  V3 sv = r.o - s.tri_v0(i);
  double u = f * dot(sv, pv);
  if (u < 0.0 || u > 1.0) return false;
  V3 qv = cross(sv, e1);
  double v = f * dot(r.d, qv);
  if (v < 0.0 || u + v > 1.0) return false;
  double t = f * dot(e2, qv);
  if (t < tmin || t > tmax) return false;
  h->t = t;
  h->p = r.o + r.d * t;
  V3 outward = norm(cross(e1, e2));
  h->front = dot(r.d, outward) < 0;
  h->n = h->front ? outward : -outward;
  h->prim = i;
  h->mat = s.tmat[i];
  return true;
}

static bool hit_sph(const Scene &s, int i, const Ray &r, double tmin, double tmax, HitRec *h) {
  double rad = s.sr[i];
  if (rad <= 0) return false;
  V3 oc = r.o - s.sph_c(i);
  double a = dot(r.d, r.d);
  double hb = dot(oc, r.d);
  double c = dot(oc, oc) - rad * rad;
  double disc = hb * hb - a * c;
  if (disc < 0) return false;
  double sq = std::sqrt(disc);
  double root = (-hb - sq) / a;
  if (root < tmin || root > tmax) {
    root = (-hb + sq) / a;
    if (root < tmin || root > tmax) return false;
  }
  h->t = root;
  h->p = r.o + r.d * root;
  V3 outward = (h->p - s.sph_c(i)) / rad;
  h->front = dot(r.d, outward) < 0;
  h->n = h->front ? outward : -outward;
  h->prim = s.ntri + i;
  h->mat = s.smat[i];
  return true;
}

static bool hit_scene(const Scene &s, const Ray &r, double tmin, double tmax, HitRec *best) {
  bool found = false;
  double closest = tmax;
  HitRec h;
  for (int i = 0; i < s.ntri; i++)
    if (hit_tri(s, i, r, tmin, closest, &h)) {
      closest = h.t;
      *best = h;
      found = true;
    }
  for (int i = 0; i < s.nsph; i++)
    if (hit_sph(s, i, r, tmin, closest, &h)) {
      closest = h.t;
      *best = h;
      found = true;
    }
  return found;
}

// --- Light sampling ---
struct LightSample {
  V3 point, normal;
  double pdf;  // solid-angle measure
};

// Surface sample / pdf query for primitive `prim`. When `target` is non-null
// the pdf toward that point is returned instead of drawing a sample.
static LightSample sample_shape(const Scene &s, int prim, V3 from, const HitRec *target, Rng &rng) {
  LightSample out;
  if (prim < s.ntri) {
    V3 v0 = s.tri_v0(prim), e1 = s.tri_e1(prim), e2 = s.tri_e2(prim);
    V3 point;
    if (target) {
      point = target->p;
    } else {
      double sq = std::sqrt(rng.uniform());
      double u = 1.0 - sq, v = rng.uniform() * sq;
      point = v0 + e1 * u + e2 * v;
    }
    V3 cr = cross(e1, e2);
    V3 normal = norm(cr);
    double area = len(cr) * 0.5;
    V3 tl = point - from;
    double d = len(tl);
    V3 ldir = tl / d;
    double cosl = std::fabs(dot(normal, -ldir));  // two-sided emitter
    double pdf = cosl > 1e-8 ? (1.0 / area) * d * d / cosl : 1e-8;
    out = {point, normal, pdf};
  } else {
    int i = prim - s.ntri;
    V3 c = s.sph_c(i);
    double rad = s.sr[i];
    V3 tc = c - from;
    double d2 = dot(tc, tc);
    double sin2max = rad * rad / d2;
    double cosmax = std::sqrt(std::fmax(1.0 - sin2max, 0.0));
    double pdf = 1.0 / (2.0 * PI * (1.0 - cosmax));
    V3 point;
    if (target) {
      point = target->p;
    } else {
      double r1 = rng.uniform(), r2 = rng.uniform();
      double ct = 1.0 - r1 + r1 * cosmax;
      double st = std::sqrt(std::fmax(1.0 - ct * ct, 0.0));
      double phi = 2.0 * PI * r2;
      V3 w = norm(tc);
      V3 up = std::fabs(w.y) > 0.999 ? v3(1, 0, 0) : v3(0, 1, 0);
      V3 u = norm(cross(up, w));
      V3 v = cross(w, u);
      V3 dir = u * (st * std::cos(phi)) + v * (st * std::sin(phi)) + w * ct;
      dir = norm(dir);
      V3 oc = from - c;
      double a = dot(dir, dir), hb = dot(oc, dir), cc = dot(oc, oc) - rad * rad;
      double disc = hb * hb - a * cc;
      double t = (-hb - std::sqrt(std::fmax(disc, 0.0))) / a;
      point = from + dir * t;
    }
    out = {point, norm(point - c), pdf};
  }
  return out;
}

// --- BSDF lanes ---
static V3 fresnel_f(const Scene &s, int m, double cos_theta) {
  double ior = s.mior[m], metal = s.mmetal[m];
  double f0d = ((1.0 - ior) / (1.0 + ior)) * ((1.0 - ior) / (1.0 + ior));
  V3 f0 = v3(f0d, f0d, f0d) * (1.0 - metal) + s.color(m) * metal;
  double p = std::pow(1.0 - cos_theta, 5.0);
  return f0 + (v3(1, 1, 1) - f0) * p;
}

static double ggx_d(double alpha2, double nh) {
  double den = nh * nh * (alpha2 - 1.0) + 1.0;
  return alpha2 / (PI * den * den);
}

static double smith_g1(double alpha2, double c) {
  if (c <= 0) return 0;
  return 2.0 * c / (c + std::sqrt(alpha2 + (1.0 - alpha2) * c * c));
}

static double smith_g2(double alpha2, double ci, double co) {
  if (ci <= 0 || co <= 0) return 0;
  auto lam = [&](double c) {
    return (std::sqrt(alpha2 + (1.0 - alpha2) * c * c) - c) / (2.0 * c);
  };
  return 1.0 / (1.0 + lam(ci) + lam(co));
}

static V3 tangent_for(V3 n) {
  V3 up = std::fabs(n.y) > 0.999 ? v3(1, 0, 0) : v3(0, 1, 0);
  return norm(cross(up, n));
}

static V3 cosine_sample(V3 n, Rng &rng) {
  double r1 = rng.uniform(), r2 = rng.uniform();
  double phi = 2.0 * PI * r1;
  double ct = std::sqrt(r2), st = std::sqrt(1.0 - ct * ct);
  V3 t = tangent_for(n), b = cross(n, t);
  return norm(t * (st * std::cos(phi)) + b * (st * std::sin(phi)) + n * ct);
}

static void oren_nayar_eval(const Scene &s, int m, V3 i, V3 o, V3 n, V3 *bsdf, double *pdf) {
  double sigma = s.mrough[m], sigma2 = sigma * sigma;
  double A = 1.0 - 0.5 * sigma2 / (sigma2 + 0.33);
  double B = 0.45 * sigma2 / (sigma2 + 0.09);
  double ci = std::fmax(dot(i, n), 0.0), co = std::fmax(dot(o, n), 0.0);
  double si = std::sqrt(std::fmax(1.0 - ci * ci, 0.0)), so = std::sqrt(std::fmax(1.0 - co * co, 0.0));
  V3 t = tangent_for(n), b = cross(n, t);
  double phi_i = std::atan2(dot(i, b), dot(i, t));
  double phi_o = std::atan2(dot(o, b), dot(o, t));
  double cpd = std::fmax(std::cos(phi_i - phi_o), 0.0);
  double sin_alpha, tan_beta;
  if (ci > co) {
    tan_beta = ci > 1e-6 ? si / ci : 0.0;
    sin_alpha = so;
  } else {
    tan_beta = co > 1e-6 ? so / co : 0.0;
    sin_alpha = si;
  }
  double term = A + B * cpd * sin_alpha * tan_beta;
  *bsdf = s.color(m) * (term / PI);
  *pdf = co / PI;
}

// Material::bsdf_pdf — evaluate toward a known direction.
static void eval_bsdf(const Scene &s, int m, const Ray &ray, V3 o, V3 n, V3 *bsdf, double *pdf) {
  V3 i = -ray.d;
  switch (s.mkind[m]) {
    case LAMBERT: {
      *bsdf = s.color(m) / PI;
      *pdf = std::fmax(dot(o, n), 0.0) / PI;
      return;
    }
    case OREN_NAYAR:
      oren_nayar_eval(s, m, i, o, n, bsdf, pdf);
      return;
    case EMISSIVE: {
      *bsdf = v3(0, 0, 0);
      *pdf = 1.0;
      return;
    }
    case MIRROR: {
      double rough = s.mrough[m], alpha = rough * rough, alpha2 = alpha * alpha;
      double in_ = dot(i, n), on_ = dot(o, n);
      bool refl = in_ * on_ > 0;
      if (s.mmetal[m] > 0.99 && !refl) {
        *bsdf = v3(0, 0, 0);
        *pdf = 1.0;
        return;
      }
      if (refl) {
        V3 h = norm(i + o);
        double d = ggx_d(alpha2, dot(n, h));
        double ci = std::fmax(in_, 0.0), co = std::fmax(on_, 0.0);
        double g = smith_g2(alpha2, ci, co);
        V3 f = fresnel_f(s, m, std::fmax(dot(i, h), 0.0));
        *bsdf = f * (d * g / (4.0 * ci * co));
        *pdf = d * std::fabs(dot(n, h)) / (4.0 * std::fabs(dot(i, h)));
      } else {
        double eta = ray.eta;
        V3 h = -norm(i * eta + o);
        double nh = dot(n, h);
        double d = ggx_d(alpha2, nh);
        double ci = std::fabs(in_), co = std::fabs(on_);
        double g = smith_g2(alpha2, ci, co);
        double ih = dot(i, h), oh = dot(o, h);
        double den = eta * ih + oh;
        V3 f = fresnel_f(s, m, std::fabs(ih));
        *bsdf = (v3(1, 1, 1) - f) * (d * g * std::fabs(ih) * std::fabs(oh) / (ci * co * den * den));
        double jac = std::fabs(oh) / (den * den);
        *pdf = d * std::fabs(nh) * jac;
      }
      return;
    }
  }
}

static V3 sample_vndf(const Scene &s, int m, V3 view, V3 n, Rng &rng) {
  double alpha = s.mrough[m] * s.mrough[m];
  V3 t = tangent_for(n), b = cross(n, t);
  V3 vl = v3(dot(view, t), dot(view, b), dot(view, n));
  V3 vh = norm(v3(alpha * vl.x, alpha * vl.y, vl.z));
  double lensq = vh.x * vh.x + vh.y * vh.y;
  V3 t1 = lensq > 0 ? v3(-vh.y, vh.x, 0) * (1.0 / std::sqrt(lensq)) : v3(1, 0, 0);
  V3 t2 = cross(vh, t1);
  double r = std::sqrt(rng.uniform());
  double phi = 2.0 * PI * rng.uniform();
  double c1 = r * std::cos(phi);
  double c2 = r * std::sin(phi);
  double sf = 0.5 * (1.0 + vh.z);
  c2 = (1.0 - sf) * std::sqrt(std::fmax(1.0 - c1 * c1, 0.0)) + sf * c2;
  V3 nh = t1 * c1 + t2 * c2 + vh * std::sqrt(std::fmax(1.0 - c1 * c1 - c2 * c2, 0.0));
  V3 ne = norm(v3(alpha * nh.x, alpha * nh.y, std::fmax(nh.z, 0.0)));
  return norm(t * ne.x + b * ne.y + n * ne.z);
}

// Material::bsdf_pdf_sample — returns (dir, bsdf, pdf, cos).
static void sample_bsdf(const Scene &s, int m, const Ray &ray, V3 n, Rng &rng, V3 *dir, V3 *bsdf,
                        double *pdf, double *cos_theta) {
  switch (s.mkind[m]) {
    case LAMBERT:
    case OREN_NAYAR: {
      V3 o = cosine_sample(n, rng);
      eval_bsdf(s, m, ray, o, n, bsdf, pdf);
      *dir = o;
      *cos_theta = std::fmax(dot(o, n), 0.0);
      return;
    }
    case EMISSIVE: {
      *dir = n;
      *bsdf = v3(0, 0, 0);
      *pdf = 1.0;
      *cos_theta = 0.0;
      return;
    }
    case MIRROR: {
      V3 i = -ray.d;
      double in_ = dot(i, n);
      double eta = ray.eta;
      V3 h = sample_vndf(s, m, i, n, rng);
      double ih = dot(i, h);
      auto fail = [&] {
        *dir = n;
        *bsdf = v3(0, 0, 0);
        *pdf = 1.0;
        *cos_theta = 0.0;
      };
      if (ih <= 0) return fail();
      V3 F = fresnel_f(s, m, ih);
      double sin2 = 1.0 - ih * ih;
      double cos2t = 1.0 - eta * eta * sin2;
      bool tir = cos2t < 0;
      double rr_f = F.x;
      if (tir || s.mmetal[m] > 0.99) {
        rr_f = 1.0;
        F = v3(1, 1, 1);
      }
      bool is_reflect = rng.uniform() < rr_f;
      double rough = s.mrough[m], alpha = rough * rough, alpha2 = alpha * alpha;
      double nh = dot(n, h);
      double d = ggx_d(alpha2, nh);
      if (is_reflect) {
        V3 o = norm(2.0 * ih * h - i);
        double co = std::fmax(dot(n, o), 0.0), ci = std::fmax(in_, 0.0);
        double g = smith_g2(alpha2, ci, co);
        V3 f = F * (d * g / (4.0 * ci * co * rr_f));
        double pv = smith_g1(alpha2, ci) * d * std::fmax(ih, 0.0) / ci;
        double p = pv / (4.0 * std::fabs(ih));
        if (!finite3(f) || !std::isfinite(p) || p <= 0) return fail();
        *dir = o;
        *bsdf = f;
        *pdf = p;
        *cos_theta = co;
      } else {
        double cost = std::sqrt(cos2t);
        V3 o = norm(h * (eta * ih - cost) - i * eta);
        double oh = dot(o, h);
        double co = std::fabs(dot(n, o)), ci = std::fabs(in_);
        double den = eta * ih + oh;
        double g = smith_g2(alpha2, ci, co);
        V3 f = (v3(1, 1, 1) - F) *
               (d * g * std::fabs(ih) * std::fabs(oh) / (ci * co * den * den * (1.0 - rr_f)));
        double jac = std::fabs(oh) / (den * den);
        double pv = smith_g1(alpha2, ci) * d * std::fmax(ih, 0.0) / ci;
        double p = pv * jac;
        if (!finite3(f) || !std::isfinite(p) || p <= 0) return fail();
        *dir = o;
        *bsdf = f;
        *pdf = p;
        *cos_theta = co;
      }
      return;
    }
  }
}

static double eta_for(const Scene &s, int m, bool front) {
  double ior = s.mior[m];
  return front ? 1.0 / ior : ior;
}

// --- Integrators ---
enum Integrator { BRDF_ONLY = 0, NEE = 1, MIS = 2 };

static V3 ray_color(const Scene &s, Ray &ray, int depth, Rng &rng, V3 throughput, int integrator) {
  HitRec hit;
  if (!hit_scene(s, ray, 1e-3, 1e30, &hit)) return v3(0, 0, 0);

  if (s.emissive(hit.mat)) {
    V3 e = s.emission(hit.mat);
    if (integrator == BRDF_ONLY) return e;           // any depth
    return depth == 0 ? e : v3(0, 0, 0);             // camera-only
  }

  V3 total = v3(0, 0, 0);

  if (integrator != BRDF_ONLY && s.nlights > 0) {
    // NEE with one light sample.
    int li = (int)(rng.uniform() * s.nlights);
    if (li >= s.nlights) li = s.nlights - 1;
    int lprim = s.lights[li];
    LightSample lsamp = sample_shape(s, lprim, hit.p, nullptr, rng);
    double pdf_l = lsamp.pdf / s.nlights;
    V3 tl = lsamp.point - hit.p;
    double dist = len(tl);
    V3 ldir = tl / dist;
    Ray shadow{hit.p, ldir, 1.0};
    HitRec sh;
    bool visible = !hit_scene(s, shadow, 1e-3, dist - 1e-3, &sh);
    if (visible) {
      double cosl = std::fabs(dot(hit.n, ldir));
      V3 bl;
      double pbl;
      eval_bsdf(s, hit.mat, ray, ldir, hit.n, &bl, &pbl);
      double w = integrator == MIS ? pdf_l / (pdf_l + pbl) : 1.0;
      V3 e = s.emission(s.prim_mat(lprim));
      total = total + w * bl * e * (cosl / pdf_l);
    }
  }

  ray.eta = eta_for(s, hit.mat, hit.front);
  V3 dir, bsdf;
  double pdf, cos_theta;
  sample_bsdf(s, hit.mat, ray, hit.n, rng, &dir, &bsdf, &pdf, &cos_theta);
  Ray scattered{hit.p, dir, eta_for(s, hit.mat, hit.front)};

  V3 next_tp = throughput * bsdf * (cos_theta / pdf);
  double rr;
  if (depth < MIN_DEPTH)
    rr = 1.0;
  else if (depth >= MAX_DEPTH)
    rr = std::fmin(luminance(next_tp), 1.0) * std::pow(0.5, depth - MIN_DEPTH);
  else
    rr = std::fmin(luminance(next_tp), 1.0);

  if (rng.uniform() > rr) return v3(0, 0, 0);  // discards this vertex's NEE term

  if (integrator == BRDF_ONLY) {
    V3 inc = ray_color(s, scattered, depth + 1, rng, next_tp / rr, integrator);
    return bsdf * inc * (cos_theta / (pdf * rr));
  }

  HitRec peek;
  if (hit_scene(s, scattered, 1e-3, 1e30, &peek)) {
    if (s.emissive(peek.mat)) {
      if (integrator == MIS) {
        LightSample q = sample_shape(s, peek.prim, hit.p, &peek, rng);
        double w = pdf / (pdf + q.pdf);  // q.pdf NOT divided by nlights (quirk)
        V3 e = s.emission(peek.mat);
        total = total + w * bsdf * e * (cos_theta / (pdf * rr));
      }
      // NEE mode: transport to lights flows only through the NEE term.
    } else {
      V3 inc = ray_color(s, scattered, depth + 1, rng, next_tp / rr, integrator);
      total = total + bsdf * inc * (cos_theta / (pdf * rr));
    }
  }
  return total;
}

}  // namespace

extern "C" {

void pt_render(const double *tri_v0, const double *tri_e1, const double *tri_e2,
               const int *tri_mat, int num_tris, const double *sph_c, const double *sph_r,
               const int *sph_mat, int num_sphs, const int *mat_kind, const double *mat_color,
               const double *mat_emission, const double *mat_rough, const double *mat_metal,
               const double *mat_ior, int num_mats, const int *light_prims, int num_lights,
               const double *cam, /* origin3, llc3, horizontal3, vertical3 */
               int width, int height, int spp, int integrator, unsigned long long seed,
               double *out_image /* H*W*3, mean pre-gamma radiance */) {
  (void)num_mats;
  Scene s{tri_v0, tri_e1,  tri_e2,  tri_mat,  num_tris,  sph_c,       sph_r,
          sph_mat, num_sphs, mat_kind, mat_color, mat_emission, mat_rough,
          mat_metal, mat_ior, light_prims, num_lights};
  V3 origin = {cam[0], cam[1], cam[2]};
  V3 llc = {cam[3], cam[4], cam[5]};
  V3 horiz = {cam[6], cam[7], cam[8]};
  V3 vert = {cam[9], cam[10], cam[11]};

#pragma omp parallel for schedule(dynamic, 1)
  for (int y = 0; y < height; y++) {
    for (int x = 0; x < width; x++) {
      Rng rng(seed ^ (((uint64_t)y << 32) | (uint64_t)x));
      V3 acc = v3(0, 0, 0);
      int yf = height - 1 - y;  // y-flip at raygen
      for (int samp = 0; samp < spp; samp++) {
        double u = (x + rng.uniform()) / (double)(width - 1);
        double v = (yf + rng.uniform()) / (double)(height - 1);
        V3 dir = llc + horiz * u + vert * v - origin;
        Ray ray{origin, norm(dir), 1.0};
        V3 c = ray_color(s, ray, 0, rng, v3(1, 1, 1), integrator);
        acc = acc + c;
      }
      acc = acc / (double)spp;
      int idx = (y * width + x) * 3;
      out_image[idx] = acc.x;
      out_image[idx + 1] = acc.y;
      out_image[idx + 2] = acc.z;
    }
  }
}

// Windowed render: the [x0, x0+win_w) x [y0, y0+win_h) sub-rectangle of a
// full_w x full_h frame, with per-pixel seeding and the u/v mapping taken
// from the GLOBAL pixel coordinates — a window render is bitwise equal to
// the same region of the full-frame render. Used by the single-pixel
// ground-truth anchors (tests/test_parity.py), which would otherwise need a
// full 400x400 oracle pass per assertion.
void pt_render_window(const double *tri_v0, const double *tri_e1, const double *tri_e2,
                      const int *tri_mat, int num_tris, const double *sph_c,
                      const double *sph_r, const int *sph_mat, int num_sphs,
                      const int *mat_kind, const double *mat_color,
                      const double *mat_emission, const double *mat_rough,
                      const double *mat_metal, const double *mat_ior, int num_mats,
                      const int *light_prims, int num_lights, const double *cam,
                      int full_w, int full_h, int x0, int y0, int win_w, int win_h,
                      int spp, int integrator, unsigned long long seed,
                      double *out_image /* win_h*win_w*3 */) {
  (void)num_mats;
  Scene s{tri_v0, tri_e1,  tri_e2,  tri_mat,  num_tris,  sph_c,       sph_r,
          sph_mat, num_sphs, mat_kind, mat_color, mat_emission, mat_rough,
          mat_metal, mat_ior, light_prims, num_lights};
  V3 origin = {cam[0], cam[1], cam[2]};
  V3 llc = {cam[3], cam[4], cam[5]};
  V3 horiz = {cam[6], cam[7], cam[8]};
  V3 vert = {cam[9], cam[10], cam[11]};

#pragma omp parallel for schedule(dynamic, 1)
  for (int wy = 0; wy < win_h; wy++) {
    for (int wx = 0; wx < win_w; wx++) {
      int x = x0 + wx;
      int y = y0 + wy;
      Rng rng(seed ^ (((uint64_t)y << 32) | (uint64_t)x));
      V3 acc = v3(0, 0, 0);
      int yf = full_h - 1 - y;
      for (int samp = 0; samp < spp; samp++) {
        double u = (x + rng.uniform()) / (double)(full_w - 1);
        double v = (yf + rng.uniform()) / (double)(full_h - 1);
        V3 dir = llc + horiz * u + vert * v - origin;
        Ray ray{origin, norm(dir), 1.0};
        V3 c = ray_color(s, ray, 0, rng, v3(1, 1, 1), integrator);
        acc = acc + c;
      }
      acc = acc / (double)spp;
      int idx = (wy * win_w + wx) * 3;
      out_image[idx] = acc.x;
      out_image[idx + 1] = acc.y;
      out_image[idx + 2] = acc.z;
    }
  }
}

}  // extern "C"
