// Native host-side runtime for tpu-nbody: workload model builders.
//
// The reference builds its models serially on the host in C++
// (src/models.h, driven from main.cpp:45-57); the Python fallback in
// nbody_tpu/models/builders.py is bit-exact but slow for large N (the
// Plummer rejection loop is inherently sequential). This library
// reimplements the builders in C++ with the exact same RNG stream:
// MT19937 seeded with init_genrand(42) and libstdc++'s
// generate_canonical<double, 53> combination (g1 + g2*2^32) / 2^64 --
// implemented explicitly so the output is identical across C++ standard
// libraries.
//
// All math is double precision in the same operation order as the Python
// builders (which themselves mirror models.h); callers cast to the run
// precision, so Python and native paths agree bit-for-bit.
//
// Build: python native/build.py   (g++ -O3 -shared -fPIC)
// Python bridge: nbody_tpu/native.py (ctypes).

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr double kPi = 3.14159265358979323846;

// --- MT19937 (init_genrand seeding, identical to std::mt19937{seed}) -----
class MT19937 {
 public:
  explicit MT19937(uint32_t seed) {
    mt_[0] = seed;
    for (int i = 1; i < 624; ++i) {
      mt_[i] = 1812433253u * (mt_[i - 1] ^ (mt_[i - 1] >> 30)) + i;
    }
    idx_ = 624;
  }

  uint32_t next() {
    if (idx_ >= 624) twist();
    uint32_t y = mt_[idx_++];
    y ^= y >> 11;
    y ^= (y << 7) & 0x9D2C5680u;
    y ^= (y << 15) & 0xEFC60000u;
    y ^= y >> 18;
    return y;
  }

  // libstdc++ generate_canonical<double, 53> over a 32-bit engine:
  // two draws, low word first.
  double canonical() {
    double g1 = next();
    double g2 = next();
    return (g1 + g2 * 4294967296.0) / 18446744073709551616.0;
  }

  double uniform(double a, double b) { return canonical() * (b - a) + a; }
  double unit() { return uniform(0.0, 1.0); }
  double sym() { return uniform(-1.0, 1.0); }
  double angle() { return uniform(0.0, 2.0 * kPi); }

 private:
  void twist() {
    for (int i = 0; i < 624; ++i) {
      uint32_t y = (mt_[i] & 0x80000000u) | (mt_[(i + 1) % 624] & 0x7FFFFFFFu);
      mt_[i] = mt_[(i + 397) % 624] ^ (y >> 1) ^ ((y & 1u) ? 0x9908B0DFu : 0u);
    }
    idx_ = 0;
  }

  uint32_t mt_[624];
  int idx_;
};

}  // namespace

extern "C" {

// Uniform box model (models.h:12-28): per body, interleaved
// pos[d] <- sym, vel[d] <- sym for each dimension.
void build_uniform(uint32_t n, uint32_t dim, double* m, double* x, double* v) {
  MT19937 gen(42);
  double const mass = 1.0 / static_cast<double>(n);
  for (uint32_t i = 0; i < n; ++i) {
    m[i] = mass;
    for (uint32_t d = 0; d < dim; ++d) {
      x[i * dim + d] = gen.sym();
      v[i * dim + d] = gen.sym();
    }
  }
}

// Plummer sphere, 3-D (models.h:30-66): radius/p_theta/p_phi, rejection
// loop for the velocity magnitude, v_theta/v_phi.
void build_plummer(uint32_t n, double* m, double* x, double* v) {
  MT19937 gen(42);
  double const mass = 1.0 / static_cast<double>(n);
  for (uint32_t i = 0; i < n; ++i) {
    m[i] = mass;
    double const radius = 1.0 / std::sqrt(std::pow(gen.unit(), -2.0 / 3.0) - 1.0);
    double const p_theta = std::acos(gen.sym());
    double const p_phi = gen.angle();
    x[i * 3 + 0] = radius * (std::sin(p_theta) * std::cos(p_phi));
    x[i * 3 + 1] = radius * (std::sin(p_theta) * std::sin(p_phi));
    x[i * 3 + 2] = radius * std::cos(p_theta);

    double q = 0.0, g = 0.1;
    while (g > q * q * std::pow(1.0 - q * q, 3.5)) {
      q = gen.unit();
      g = 0.1 * gen.unit();
    }
    double const vnorm = q * std::sqrt(2.0) * std::pow(radius * radius + 1.0, -0.25);
    double const v_theta = std::acos(gen.sym());
    double const v_phi = gen.angle();
    v[i * 3 + 0] = vnorm * (std::sin(v_theta) * std::cos(v_phi));
    v[i * 3 + 1] = vnorm * (std::sin(v_theta) * std::sin(v_phi));
    v[i * 3 + 2] = vnorm * std::cos(v_theta);
  }
}

// Two colliding galaxies (models.h:73-136). `filled` returns the number
// of bodies written (odd n leaves the last body zero-initialized).
void build_galaxy(uint32_t n, uint32_t dim, double G, double eps,
                  double* m, double* x, double* v, uint32_t* filled) {
  MT19937 gen(42);
  double const rot[3][3] = {{0.0, -1.0, 0.0}, {0.9, 0.0, 0.5}, {0.5, 0.0, 0.9}};
  double const gal_n = n / 2.0;
  uint32_t const size = static_cast<uint32_t>(2.0 * gal_n);
  std::memset(m, 0, sizeof(double) * size);
  std::memset(x, 0, sizeof(double) * size * dim);
  std::memset(v, 0, sizeof(double) * size * dim);

  uint32_t w = 0;
  double centre_mass = 1e4;
  for (int galaxy = 0; galaxy < 2; ++galaxy) {
    double const sign = galaxy == 0 ? 1.0 : -1.0;
    double centre[3] = {100.0 * sign * -1.0, 100.0 * sign * 0.5, 0.0};
    // central body
    m[w] = centre_mass;
    for (uint32_t d = 0; d < dim; ++d) x[w * dim + d] = centre[d];
    ++w;
    // orbiters
    uint32_t const count = static_cast<uint32_t>(gal_n - 1.0);
    double const total_mass = centre_mass + 1.0;
    for (uint32_t k = 0; k < count; ++k) {
      double const radius = 30.0 + 20.0 * gen.unit();
      double const ang = gen.angle();
      double pos[3] = {radius * std::sin(ang), radius * std::cos(ang), 0.0};
      double const vnorm = std::sqrt(G * total_mass / (radius + eps));
      double const pnorm =
          std::sqrt(pos[0] * pos[0] + pos[1] * pos[1] + pos[2] * pos[2]) + eps;
      double vel[3] = {vnorm / pnorm * -pos[1], vnorm / pnorm * pos[0], 0.0};
      if (dim == 3) {
        pos[2] = 10.0 * gen.sym();
        vel[2] = 1e-5 * gen.sym();
        double rp[3], rv[3];
        for (int r = 0; r < 3; ++r) {
          rp[r] = rot[r][0] * pos[0] + rot[r][1] * pos[1] + rot[r][2] * pos[2];
          rv[r] = rot[r][0] * vel[0] + rot[r][1] * vel[1] + rot[r][2] * vel[2];
        }
        std::memcpy(pos, rp, sizeof rp);
        std::memcpy(vel, rv, sizeof rv);
      }
      m[w] = 1.0 / static_cast<double>(count);
      for (uint32_t d = 0; d < dim; ++d) {
        x[w * dim + d] = pos[d] + centre[d];
        v[w * dim + d] = vel[d];
      }
      ++w;
    }
    centre_mass /= 10.0;
  }
  *filled = w;
}

// Raw stream probe (used by tests to cross-check the Python MT19937).
void mt19937_raw(uint32_t seed, uint32_t count, uint32_t* out) {
  MT19937 gen(seed);
  for (uint32_t i = 0; i < count; ++i) out[i] = gen.next();
}

void mt19937_canonical(uint32_t seed, uint32_t count, double* out) {
  MT19937 gen(seed);
  for (uint32_t i = 0; i < count; ++i) out[i] = gen.canonical();
}

}  // extern "C"
