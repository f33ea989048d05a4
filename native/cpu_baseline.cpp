// CPU baseline microbenchmark for the PMVS refinement hot loop.
//
// Measures how many patch-refinement objective evaluations per second a
// host CPU core sustains, where one evaluation is the work profile of the
// reference's my_f (reference source/pmvs/optim.cpp:507-578): decode the
// 3-DOF parameters, rebuild the tangent frame, and for each of 6 views
// project the patch (3 projections: center, +x axis, +y axis), select a
// pyramid level from the footprint, bilinearly sample a wsize x wsize x 3
// window from byte-valued images (optim.cpp:815-863 grabTex,
// include/image/image.hpp:434-499 getColor), normalize it to zero mean /
// unit variance (optim.cpp:1031-1067) and accumulate the robust INCC
// against the reference window (optim.cpp:1069-1088, robustincc
// optim.hpp:86-88).
//
// This is a fresh implementation of that work profile, written for this
// benchmark; it is deliberately generous to the CPU: contiguous images,
// incremental position stepping, no BOBYQA bookkeeping, no locks, no patch
// organizer updates, and every window always inside bounds (no wasted
// grabs). Reported patches/s assume 32 objective evaluations per patch
// (the equal-work count of our 8-iteration x 4-probe LM kernel); the
// reference's BOBYQA typically needs ~60-150 evaluations (maxeval=1000,
// optim.cpp:621-638), so equal-work favors the CPU.
//
// Build: g++ -O3 -march=native -funroll-loops -std=c++17 -pthread
// Output: one JSON line with evals/s and derived patches/s.

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace {

constexpr int kViews = 6;
constexpr int kWsize = 7;
constexpr int kSamples = kWsize * kWsize;
constexpr int kTexLen = 3 * kSamples;
constexpr int kLevels = 3;
constexpr int kEvalsPerPatchEqualWork = 32;  // 8 LM iters x 4 fan probes

struct Pyramid {
  // byte images per level, tightly packed RGB
  std::vector<uint8_t> data[kLevels];
  int w[kLevels], h[kLevels];

  void init(int w0, int h0, uint32_t seed) {
    std::mt19937 rng(seed);
    for (int l = 0; l < kLevels; ++l) {
      w[l] = w0 >> l;
      h[l] = h0 >> l;
      data[l].resize(size_t(3) * w[l] * h[l]);
      for (auto& v : data[l]) v = uint8_t(rng() & 0xff);
    }
  }
};

struct Camera {
  float P[3][4];     // projection (level 0)
  float center[3];   // optical center
};

struct Scene {
  Pyramid pyr[kViews];
  Camera cam[kViews];
};

inline void project(const Camera& c, const float* x4, float out[3]) {
  for (int r = 0; r < 3; ++r) {
    out[r] = c.P[r][0] * x4[0] + c.P[r][1] * x4[1] + c.P[r][2] * x4[2] +
             c.P[r][3];
  }
  float z = out[2] > 1e-6f ? out[2] : 1e-6f;
  out[0] /= z;
  out[1] /= z;
}

// Bilinear fetch of RGB at (x, y) from a byte image (the reference's
// getColor fast path: 4 texel loads, 12 multiply-adds).
inline void sample(const uint8_t* img, int w, float x, float y,
                   float rgb[3]) {
  const int lx = int(x), ly = int(y);
  const float dx1 = x - lx, dx0 = 1.0f - dx1;
  const float dy1 = y - ly, dy0 = 1.0f - dy1;
  const float f00 = dx0 * dy0, f10 = dx1 * dy0;
  const float f01 = dx0 * dy1, f11 = dx1 * dy1;
  const uint8_t* p0 = img + size_t(3) * (ly * w + lx);
  const uint8_t* p1 = p0 + size_t(3) * w;
  rgb[0] = p0[0] * f00 + p0[3] * f10 + p1[0] * f01 + p1[3] * f11;
  rgb[1] = p0[1] * f00 + p0[4] * f10 + p1[1] * f01 + p1[4] * f11;
  rgb[2] = p0[2] * f00 + p0[5] * f10 + p1[2] * f01 + p1[5] * f11;
}

// Grab a wsize x wsize window along (dx, dy) steps, zero-mean /
// unit-variance normalized (grabTex + normalize).
inline bool grab_normalized(const Pyramid& pyr, int level, float cx,
                            float cy, float dxx, float dxy, float dyx,
                            float dyy, float* tex) {
  const int w = pyr.w[level], h = pyr.h[level];
  const uint8_t* img = pyr.data[level].data();
  const int margin = kWsize / 2;
  // bounds: every sample plus its +1 bilinear halo must be inside
  const float span_x = (std::fabs(dxx) + std::fabs(dyx)) * margin + 2.0f;
  const float span_y = (std::fabs(dxy) + std::fabs(dyy)) * margin + 2.0f;
  if (cx - span_x < 0.f || cx + span_x >= float(w) || cy - span_y < 0.f ||
      cy + span_y >= float(h))
    return false;

  float rowx = cx - margin * (dxx + dyx);
  float rowy = cy - margin * (dxy + dyy);
  float* t = tex;
  for (int y = 0; y < kWsize; ++y) {
    float px = rowx, py = rowy;
    for (int x = 0; x < kWsize; ++x) {
      sample(img, w, px, py, t);
      t += 3;
      px += dxx;
      py += dxy;
    }
    rowx += dyx;
    rowy += dyy;
  }
  // normalize: zero mean per channel, unit variance over the vector
  float mean[3] = {0.f, 0.f, 0.f};
  for (int i = 0; i < kSamples; ++i)
    for (int c = 0; c < 3; ++c) mean[c] += tex[3 * i + c];
  for (int c = 0; c < 3; ++c) mean[c] /= kSamples;
  float var = 0.f;
  for (int i = 0; i < kSamples; ++i)
    for (int c = 0; c < 3; ++c) {
      tex[3 * i + c] -= mean[c];
      var += tex[3 * i + c] * tex[3 * i + c];
    }
  var = std::sqrt(var / kTexLen);
  if (var < 1e-6f) return false;
  const float inv = 1.0f / var;
  for (int i = 0; i < kTexLen; ++i) tex[i] *= inv;
  return true;
}

inline float robustincc(float x) { return x / (1.0f + 3.0f * x); }

// One objective evaluation: the full my_f chain for one candidate
// (depth, alpha, beta). Returns the mean robust INCC over views.
float evaluate(const Scene& s, const float* ray, const float* center0,
               float depth, float alpha, float beta, float dscale,
               float ascale, float* scratch) {
  // decode (optim.cpp:660-707): offset along the ray + Euler normal
  float coord[4];
  for (int k = 0; k < 3; ++k) coord[k] = center0[k] + depth * dscale * ray[k];
  coord[3] = 1.0f;
  const float ca = std::cos(alpha * ascale), sa = std::sin(alpha * ascale);
  const float cb = std::cos(beta * ascale), sb = std::sin(beta * ascale);
  // base direction faces the cameras (-z side of the plane)
  float normal[3] = {sa * cb, sb, -ca * cb};

  // tangent frame scaled to ~1 px in the reference view (getPAxes)
  float ax[3], ay[3];
  {
    const float nx = std::fabs(normal[0]);
    if (nx > 0.5f) {
      ax[0] = normal[1];
      ax[1] = -normal[0];
      ax[2] = 0.f;
    } else {
      ax[0] = 0.f;
      ax[1] = normal[2];
      ax[2] = -normal[1];
    }
    float n = std::sqrt(ax[0] * ax[0] + ax[1] * ax[1] + ax[2] * ax[2]);
    for (int k = 0; k < 3; ++k) ax[k] /= n;
    ay[0] = normal[1] * ax[2] - normal[2] * ax[1];
    ay[1] = normal[2] * ax[0] - normal[0] * ax[2];
    ay[2] = normal[0] * ax[1] - normal[1] * ax[0];
    const float scale = dscale;  // ~1 px step
    for (int k = 0; k < 3; ++k) {
      ax[k] *= scale;
      ay[k] *= scale;
    }
  }

  float* ref_tex = scratch;               // [kTexLen]
  float* tex = scratch + kTexLen;         // [kTexLen]
  float score = 0.f;
  int denom = 0;
  bool have_ref = false;

  for (int v = 0; v < kViews; ++v) {
    const Camera& cam = s.cam[v];
    // facing check (grabTex weight gate)
    float rv[3] = {cam.center[0] - coord[0], cam.center[1] - coord[1],
                   cam.center[2] - coord[2]};
    float rn = std::sqrt(rv[0] * rv[0] + rv[1] * rv[1] + rv[2] * rv[2]);
    float wgt =
        (rv[0] * normal[0] + rv[1] * normal[1] + rv[2] * normal[2]) / rn;
    if (wgt < 0.08716f) continue;  // cos(85 deg) ~ angleThreshold1

    // 3 projections: center, +x, +y
    float pc[3], px4[4], py4[4], pxp[3], pyp[3];
    project(cam, coord, pc);
    for (int k = 0; k < 3; ++k) {
      px4[k] = coord[k] + ax[k];
      py4[k] = coord[k] + ay[k];
    }
    px4[3] = py4[3] = 1.0f;
    project(cam, px4, pxp);
    project(cam, py4, pyp);
    float dxx = pxp[0] - pc[0], dxy = pxp[1] - pc[1];
    float dyx = pyp[0] - pc[0], dyy = pyp[1] - pc[1];

    // footprint level selection (optim.cpp:827-843)
    float ratio = 0.5f * (std::sqrt(dxx * dxx + dxy * dxy) +
                          std::sqrt(dyx * dyx + dyy * dyy));
    int leveldif = int(std::floor(std::log2(ratio > 0.f ? ratio : 1.f) +
                                  0.5f));
    leveldif = leveldif < 0 ? 0 : (leveldif > kLevels - 1 ? kLevels - 1
                                                          : leveldif);
    const float inv = 1.0f / float(1 << leveldif);
    float* out = have_ref ? tex : ref_tex;
    if (!grab_normalized(s.pyr[v], leveldif, pc[0] * inv, pc[1] * inv,
                         dxx * inv, dxy * inv, dyx * inv, dyy * inv, out))
      continue;
    if (!have_ref) {
      have_ref = true;
      continue;
    }
    // NCC dot (optim.cpp:1069-1088) + robust transform
    float dot = 0.f;
    for (int i = 0; i < kTexLen; ++i) dot += ref_tex[i] * tex[i];
    score += robustincc(1.0f - dot / kSamples);
    ++denom;
  }
  return denom ? score / denom : 2.0f;
}

Scene* build_scene() {
  auto* s = new Scene;
  for (int v = 0; v < kViews; ++v) {
    s->pyr[v].init(640, 480, 1234u + v);
    Camera& c = s->cam[v];
    // cameras on an arc looking at the origin, focal 800
    const float ang = (v - 2.5f) * 0.12f;
    const float cx = std::sin(ang) * 10.f, cz = -std::cos(ang) * 10.f;
    c.center[0] = cx;
    c.center[1] = 0.f;
    c.center[2] = cz;
    // P = K [R | -R C] with R looking from center at origin (y up)
    float fz[3] = {-cx / 10.f, 0.f, -cz / 10.f};
    float fx[3] = {-fz[2], 0.f, fz[0]};
    float fy[3] = {0.f, 1.f, 0.f};
    const float f = 800.f, u0 = 320.f, v0 = 240.f;
    for (int k = 0; k < 3; ++k) {
      c.P[0][k] = f * fx[k] + u0 * fz[k];
      c.P[1][k] = f * fy[k] + v0 * fz[k];
      c.P[2][k] = fz[k];
    }
    for (int r = 0; r < 3; ++r) {
      c.P[r][3] = -(c.P[r][0] * c.center[0] + c.P[r][1] * c.center[1] +
                    c.P[r][2] * c.center[2]);
    }
  }
  return s;
}

}  // namespace

int main(int argc, char** argv) {
  const int threads = argc > 1 ? std::atoi(argv[1]) : 1;
  const double seconds = argc > 2 ? std::atof(argv[2]) : 5.0;
  Scene* scene = build_scene();

  // patches on the z=0 plane near the origin, visible in all views
  const int kPatches = 4096;
  std::vector<float> centers(kPatches * 3), rays(kPatches * 3);
  std::mt19937 rng(7);
  std::uniform_real_distribution<float> ud(-1.5f, 1.5f);
  for (int i = 0; i < kPatches; ++i) {
    float x = ud(rng), y = ud(rng) * 0.7f;
    centers[3 * i + 0] = x;
    centers[3 * i + 1] = y;
    centers[3 * i + 2] = 0.f;
    float rv[3] = {scene->cam[0].center[0] - x, scene->cam[0].center[1] - y,
                   scene->cam[0].center[2]};
    float rn = std::sqrt(rv[0] * rv[0] + rv[1] * rv[1] + rv[2] * rv[2]);
    for (int k = 0; k < 3; ++k) rays[3 * i + k] = rv[k] / rn;
  }
  const float dscale = 10.f / 800.f;  // ~1 px of depth motion
  const float ascale = float(M_PI) / 48.f;

  std::atomic<int64_t> total_evals{0};
  auto worker = [&](int tid) {
    std::vector<float> scratch(2 * kTexLen);
    std::mt19937 prng(100 + tid);
    std::uniform_real_distribution<float> pd(-2.f, 2.f);
    float sink = 0.f;
    int64_t evals = 0;
    const auto t_end = std::chrono::steady_clock::now() +
                       std::chrono::duration<double>(seconds);
    while (std::chrono::steady_clock::now() < t_end) {
      // one "patch refinement": kEvalsPerPatchEqualWork evaluations with
      // drifting parameters (as an optimizer would probe)
      const int pi = int(prng() % kPatches);
      float depth = pd(prng), alpha = pd(prng) * 0.1f,
            beta = pd(prng) * 0.1f;
      for (int e = 0; e < kEvalsPerPatchEqualWork; ++e) {
        sink += evaluate(*scene, &rays[3 * pi], &centers[3 * pi], depth,
                         alpha, beta, dscale, ascale, scratch.data());
        depth += 0.05f;
        alpha += 0.003f;
        beta -= 0.002f;
      }
      evals += kEvalsPerPatchEqualWork;
    }
    total_evals += evals;
    if (sink == 12345.678f) std::fprintf(stderr, "x");  // keep `sink` live
  };

  const auto t0 = std::chrono::steady_clock::now();
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker, t);
  for (auto& t : pool) t.join();
  const double dt =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
          .count();

  const double eps = double(total_evals) / dt;
  std::printf(
      "{\"threads\": %d, \"seconds\": %.2f, \"evals_per_sec\": %.1f, "
      "\"patches_per_sec_equal_work\": %.1f, "
      "\"patches_per_sec_bobyqa100\": %.1f, \"evals_per_patch\": %d}\n",
      threads, dt, eps, eps / kEvalsPerPatchEqualWork, eps / 100.0,
      kEvalsPerPatchEqualWork);
  delete scene;
  return 0;
}
