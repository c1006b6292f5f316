// glic_runtime: native host runtime for the TPU Gaussian-LIC rebuild.
//
// The reference keeps its hot host paths in C++ (ROS stream aligner,
// mapping.cpp:31-122; tinyply PLY export, gaussian.cpp:306-397). This library is
// their standalone native equivalent, exposed through a plain C ABI consumed via
// ctypes (gaussian_lic_tpu.native):
//
//   * StreamAligner — three timestamped queues + the ±tol alignment/drop policy,
//     thread-safe (producer callbacks push from IO threads while the mapping
//     thread pops), payloads are opaque u64 handles owned by the caller.
//   * PLY writer/reader — 3DGS-standard binary-little-endian vertex records
//     (x,y,z, f_dc_0-2, f_rest_*, opacity, scale_0-2, rot_0-3), single-pass
//     interleave from column-major arrays, no intermediate (n, stride) copy.
//
// Build: g++ -O3 -shared -fPIC (see gaussian_lic_tpu/native/__init__.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Stream aligner
// ---------------------------------------------------------------------------

struct Stamped {
  double stamp;
  uint64_t handle;
};

struct GlicAligner {
  double tol;
  std::mutex mu;
  std::deque<Stamped> points, poses, images;
  double last_point_walltime = 0.0;
  uint64_t dropped = 0;
};

void* glic_aligner_new(double tol) { return new GlicAligner{tol}; }

void glic_aligner_free(void* p) { delete static_cast<GlicAligner*>(p); }

void glic_aligner_push_points(void* p, double stamp, uint64_t h, double wall) {
  auto* a = static_cast<GlicAligner*>(p);
  std::lock_guard<std::mutex> g(a->mu);
  a->points.push_back({stamp, h});
  a->last_point_walltime = wall;
}

void glic_aligner_push_pose(void* p, double stamp, uint64_t h) {
  auto* a = static_cast<GlicAligner*>(p);
  std::lock_guard<std::mutex> g(a->mu);
  a->poses.push_back({stamp, h});
}

void glic_aligner_push_image(void* p, double stamp, uint64_t h) {
  auto* a = static_cast<GlicAligner*>(p);
  std::lock_guard<std::mutex> g(a->mu);
  a->images.push_back({stamp, h});
}

double glic_aligner_last_point_walltime(void* p) {
  auto* a = static_cast<GlicAligner*>(p);
  std::lock_guard<std::mutex> g(a->mu);
  return a->last_point_walltime;
}

uint64_t glic_aligner_dropped(void* p) {
  auto* a = static_cast<GlicAligner*>(p);
  std::lock_guard<std::mutex> g(a->mu);
  return a->dropped;
}

// Returns 1 and fills outputs when an aligned triple is available; 0 otherwise.
// Dropped handles (stale poses/images, unmatched point clouds) are reported
// through out_dropped/out_dropped_n so the caller can release them — capacity
// for up to 64 handles per call (more than any realistic backlog step).
int glic_aligner_pop(void* p, double* out_stamp, uint64_t* out_points,
                     uint64_t* out_pose, uint64_t* out_image,
                     uint64_t* out_dropped, int* out_dropped_n) {
  auto* a = static_cast<GlicAligner*>(p);
  std::lock_guard<std::mutex> g(a->mu);
  *out_dropped_n = 0;
  auto drop = [&](uint64_t h) {
    if (*out_dropped_n < 64) out_dropped[(*out_dropped_n)++] = h;
    a->dropped++;
  };
  if (a->points.empty() || a->poses.empty() || a->images.empty()) return 0;
  const double t = a->points.front().stamp;

  while (!a->poses.empty() && a->poses.front().stamp < t - a->tol)
    { drop(a->poses.front().handle); a->poses.pop_front(); }
  if (a->poses.empty()) return 0;
  if (a->poses.front().stamp > t + a->tol) {
    drop(a->points.front().handle);
    a->points.pop_front();
    return 0;
  }

  while (!a->images.empty() && a->images.front().stamp < t - a->tol)
    { drop(a->images.front().handle); a->images.pop_front(); }
  if (a->images.empty()) return 0;
  if (a->images.front().stamp > t + a->tol) {
    drop(a->points.front().handle);
    a->points.pop_front();
    return 0;
  }

  *out_stamp = t;
  *out_points = a->points.front().handle; a->points.pop_front();
  *out_pose = a->poses.front().handle; a->poses.pop_front();
  *out_image = a->images.front().handle; a->images.pop_front();
  return 1;
}

// ---------------------------------------------------------------------------
// PLY writer / reader (3DGS vertex schema)
// ---------------------------------------------------------------------------

// Returns 0 on success, negative errno-style codes on failure.
int glic_ply_write(const char* path, int64_t n, int sh_rest_dim,
                   const float* xyz,       // (n,3)
                   const float* dc,        // (n,3)
                   const float* sh_rest,   // (n,S,3) coeff-major in memory
                   const float* opa_logit, // (n,)
                   const float* log_scale, // (n,3)
                   const float* quat) {    // (n,4)
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  const int S = sh_rest_dim;
  const int stride = 3 + 3 + 3 * S + 1 + 3 + 4;

  std::string head;
  head.reserve(4096);
  head += "ply\nformat binary_little_endian 1.0\n";
  head += "element vertex " + std::to_string(n) + "\n";
  const char* fixed3[] = {"x", "y", "z"};
  for (auto* s : fixed3) head += std::string("property float ") + s + "\n";
  for (int i = 0; i < 3; i++)
    head += "property float f_dc_" + std::to_string(i) + "\n";
  for (int i = 0; i < 3 * S; i++)
    head += "property float f_rest_" + std::to_string(i) + "\n";
  head += "property float opacity\n";
  for (int i = 0; i < 3; i++)
    head += "property float scale_" + std::to_string(i) + "\n";
  for (int i = 0; i < 4; i++)
    head += "property float rot_" + std::to_string(i) + "\n";
  head += "end_header\n";
  if (std::fwrite(head.data(), 1, head.size(), f) != head.size()) {
    std::fclose(f);
    return -2;
  }

  // stream records through a batched buffer (single pass, no (n,stride) temp)
  const int64_t BATCH = 8192;
  std::vector<float> buf(static_cast<size_t>(BATCH) * stride);
  for (int64_t b = 0; b < n; b += BATCH) {
    const int64_t m = (n - b < BATCH) ? (n - b) : BATCH;
    for (int64_t i = 0; i < m; i++) {
      const int64_t r = b + i;
      float* o = buf.data() + i * stride;
      std::memcpy(o, xyz + 3 * r, 3 * sizeof(float)); o += 3;
      std::memcpy(o, dc + 3 * r, 3 * sizeof(float)); o += 3;
      // channel-major rest: index = channel*S + coeff (gaussian.cpp:313 layout)
      const float* sr = sh_rest + static_cast<int64_t>(3) * S * r;
      for (int c = 0; c < 3; c++)
        for (int k = 0; k < S; k++) *o++ = sr[k * 3 + c];
      *o++ = opa_logit[r];
      std::memcpy(o, log_scale + 3 * r, 3 * sizeof(float)); o += 3;
      std::memcpy(o, quat + 4 * r, 4 * sizeof(float));
    }
    const size_t want = static_cast<size_t>(m) * stride;
    if (std::fwrite(buf.data(), sizeof(float), want, f) != want) {
      std::fclose(f);
      return -3;
    }
  }
  std::fclose(f);
  return 0;
}

// Parses the header: fills n and S. Returns 0 on success.
int glic_ply_read_header(const char* path, int64_t* out_n, int* out_sh_rest_dim,
                         int64_t* out_header_bytes) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char line[512];
  int64_t n = -1, offset = 0;
  int n_rest = 0;
  bool binary_le = false;
  while (std::fgets(line, sizeof(line), f)) {
    offset += static_cast<int64_t>(std::strlen(line));
    if (std::strncmp(line, "format binary_little_endian", 27) == 0)
      binary_le = true;
    else if (std::sscanf(line, "element vertex %ld", &n) == 1) {
    } else if (std::strncmp(line, "property float f_rest_", 22) == 0)
      n_rest++;
    else if (std::strncmp(line, "end_header", 10) == 0)
      break;
  }
  std::fclose(f);
  if (n < 0 || !binary_le) return -2;
  *out_n = n;
  *out_sh_rest_dim = n_rest / 3;
  *out_header_bytes = offset;
  return 0;
}

// Reads records into caller-allocated de-interleaved arrays. Returns 0 on success.
int glic_ply_read(const char* path, int64_t n, int sh_rest_dim,
                  int64_t header_bytes, float* xyz, float* dc, float* sh_rest,
                  float* opa_logit, float* log_scale, float* quat) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  if (std::fseek(f, static_cast<long>(header_bytes), SEEK_SET) != 0) {
    std::fclose(f);
    return -2;
  }
  const int S = sh_rest_dim;
  const int stride = 3 + 3 + 3 * S + 1 + 3 + 4;
  const int64_t BATCH = 8192;
  std::vector<float> buf(static_cast<size_t>(BATCH) * stride);
  for (int64_t b = 0; b < n; b += BATCH) {
    const int64_t m = (n - b < BATCH) ? (n - b) : BATCH;
    const size_t want = static_cast<size_t>(m) * stride;
    if (std::fread(buf.data(), sizeof(float), want, f) != want) {
      std::fclose(f);
      return -3;
    }
    for (int64_t i = 0; i < m; i++) {
      const int64_t r = b + i;
      const float* o = buf.data() + i * stride;
      std::memcpy(xyz + 3 * r, o, 3 * sizeof(float)); o += 3;
      std::memcpy(dc + 3 * r, o, 3 * sizeof(float)); o += 3;
      float* sr = sh_rest + static_cast<int64_t>(3) * S * r;
      for (int c = 0; c < 3; c++)
        for (int k = 0; k < S; k++) sr[k * 3 + c] = *o++;
      opa_logit[r] = *o++;
      std::memcpy(log_scale + 3 * r, o, 3 * sizeof(float)); o += 3;
      std::memcpy(quat + 4 * r, o, 4 * sizeof(float));
    }
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
