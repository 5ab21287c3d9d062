// Native shapes rasterizer for the synthetic dataset's fast path.
//
// Renders the five shape classes (circle / square / triangle / star / cross)
// of the synthetic dataset (see data/synthetic.py for the parity-critical PIL
// path and the geometry definitions) directly into uint8 HWC buffers, with a
// full C++ port of numpy's legacy MT19937 RandomState so the per-sample
// parameter draws (background, fill color, size, position) consume the RNG
// stream bit-identically to the numpy implementation. Only the polygon fill
// rules differ slightly from PIL's rasterizer, so this path is exposed as an
// opt-in throughput backend while PIL remains the reference.
//
// Built as a shared library (make -C vision_spectra_tpu/native) and loaded
// via ctypes (native/__init__.py). Thread-safe: each call owns its RNG.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// numpy-compatible MT19937 (legacy RandomState semantics)
// ---------------------------------------------------------------------------

class Mt19937 {
 public:
  explicit Mt19937(uint32_t seed) { init_genrand(seed); }

  uint32_t next_u32() {
    if (pos_ >= 624) generate_block();
    uint32_t y = state_[pos_++];
    y ^= (y >> 11);
    y ^= (y << 7) & 0x9d2c5680u;
    y ^= (y << 15) & 0xefc60000u;
    y ^= (y >> 18);
    return y;
  }

  // numpy legacy bounded draw: rk_random masked rejection over [0, rng].
  uint64_t randint(uint64_t low, uint64_t high_exclusive) {
    uint64_t rng = high_exclusive - 1 - low;  // inclusive range width
    if (rng == 0) return low;
    if (rng <= 0xffffffffull) {
      uint32_t mask = static_cast<uint32_t>(rng);
      mask |= mask >> 1; mask |= mask >> 2; mask |= mask >> 4;
      mask |= mask >> 8; mask |= mask >> 16;
      uint32_t value;
      do { value = next_u32() & mask; } while (value > rng);
      return low + value;
    }
    // 64-bit path (not needed for image params but kept for completeness).
    uint64_t mask = rng;
    mask |= mask >> 1; mask |= mask >> 2; mask |= mask >> 4;
    mask |= mask >> 8; mask |= mask >> 16; mask |= mask >> 32;
    uint64_t value;
    do {
      value = (static_cast<uint64_t>(next_u32()) << 32) | next_u32();
      value &= mask;
    } while (value > rng);
    return low + value;
  }

 private:
  void init_genrand(uint32_t s) {
    state_[0] = s;
    for (int i = 1; i < 624; ++i) {
      state_[i] = 1812433253u * (state_[i - 1] ^ (state_[i - 1] >> 30)) + i;
    }
    pos_ = 624;
  }

  void generate_block() {
    constexpr uint32_t kMatrixA = 0x9908b0dfu;
    constexpr uint32_t kUpperMask = 0x80000000u;
    constexpr uint32_t kLowerMask = 0x7fffffffu;
    for (int i = 0; i < 624; ++i) {
      uint32_t y = (state_[i] & kUpperMask) | (state_[(i + 1) % 624] & kLowerMask);
      state_[i] = state_[(i + 397) % 624] ^ (y >> 1);
      if (y & 1) state_[i] ^= kMatrixA;
    }
    pos_ = 0;
  }

  uint32_t state_[624];
  int pos_ = 624;
};

// ---------------------------------------------------------------------------
// Rasterization primitives (uint8 HWC buffer)
// ---------------------------------------------------------------------------

struct Canvas {
  uint8_t* data;
  int size;       // square image
  int channels;

  void fill(const uint8_t* color) {
    for (int i = 0; i < size * size; ++i)
      std::memcpy(data + i * channels, color, channels);
  }

  void set(int x, int y, const uint8_t* color) {
    if (x < 0 || y < 0 || x >= size || y >= size) return;
    std::memcpy(data + (y * size + x) * channels, color, channels);
  }

  // Inclusive-corner rectangle (PIL draw.rectangle semantics).
  void rect(int x0, int y0, int x1, int y1, const uint8_t* color) {
    for (int y = y0; y <= y1; ++y)
      for (int x = x0; x <= x1; ++x) set(x, y, color);
  }

  // Filled ellipse in bounding box [x0, y0, x1, y1], inclusive.
  void ellipse(int x0, int y0, int x1, int y1, const uint8_t* color) {
    double cx = 0.5 * (x0 + x1), cy = 0.5 * (y0 + y1);
    double rx = 0.5 * (x1 - x0), ry = 0.5 * (y1 - y0);
    if (rx <= 0 || ry <= 0) return;
    for (int y = y0; y <= y1; ++y) {
      double dy = (y - cy) / ry;
      double span = 1.0 - dy * dy;
      if (span < 0) continue;
      double dx = rx * std::sqrt(span);
      int xa = static_cast<int>(std::ceil(cx - dx));
      int xb = static_cast<int>(std::floor(cx + dx));
      for (int x = xa; x <= xb; ++x) set(x, y, color);
    }
  }

  // Even-odd scanline polygon fill (vertices in order, closed implicitly).
  void polygon(const double* xs, const double* ys, int n, const uint8_t* color) {
    double ymin = ys[0], ymax = ys[0];
    for (int i = 1; i < n; ++i) {
      ymin = std::min(ymin, ys[i]);
      ymax = std::max(ymax, ys[i]);
    }
    int y0 = std::max(0, static_cast<int>(std::floor(ymin)));
    int y1 = std::min(size - 1, static_cast<int>(std::ceil(ymax)));
    std::vector<double> xcross;
    for (int y = y0; y <= y1; ++y) {
      double fy = y + 0.5;  // pixel-center sampling
      xcross.clear();
      for (int i = 0; i < n; ++i) {
        int j = (i + 1) % n;
        double ya = ys[i], yb = ys[j];
        if ((ya <= fy && yb > fy) || (yb <= fy && ya > fy)) {
          double t = (fy - ya) / (yb - ya);
          xcross.push_back(xs[i] + t * (xs[j] - xs[i]));
        }
      }
      std::sort(xcross.begin(), xcross.end());
      for (size_t k = 0; k + 1 < xcross.size(); k += 2) {
        int xa = static_cast<int>(std::ceil(xcross[k] - 0.5));
        int xb = static_cast<int>(std::floor(xcross[k + 1] - 0.5));
        for (int x = xa; x <= xb; ++x) set(x, y, color);
      }
    }
  }
};

void draw_sample(uint8_t* out, int label, uint32_t seed, int image_size,
                 int channels) {
  Mt19937 rng(seed);
  Canvas canvas{out, image_size, channels};

  uint8_t bg[3], fill[3];
  if (channels == 1) {
    bg[0] = static_cast<uint8_t>(rng.randint(20, 60));
  } else {
    for (int c = 0; c < 3; ++c) bg[c] = static_cast<uint8_t>(rng.randint(20, 60));
  }
  canvas.fill(bg);
  if (channels == 1) {
    fill[0] = static_cast<uint8_t>(rng.randint(180, 255));
  } else {
    for (int c = 0; c < 3; ++c) fill[c] = static_cast<uint8_t>(rng.randint(150, 255));
  }

  int margin = image_size / 6;
  int size = static_cast<int>(
      rng.randint(image_size / 3, image_size - 2 * margin));
  int x = static_cast<int>(rng.randint(margin, image_size - size - margin));
  int y = static_cast<int>(rng.randint(margin, image_size - size - margin));

  switch (label) {
    case 0:  // circle
      canvas.ellipse(x, y, x + size, y + size, fill);
      break;
    case 1:  // square
      canvas.rect(x, y, x + size, y + size, fill);
      break;
    case 2: {  // triangle
      double cx = x + size / 2, cy = y + size / 2, r = size / 2;
      double xs[3] = {cx, cx - r, cx + r};
      double ys[3] = {cy - r, cy + r, cy + r};
      canvas.polygon(xs, ys, 3, fill);
      break;
    }
    case 3: {  // five-pointed star
      double cx = x + size / 2, cy = y + size / 2;
      double r_out = size / 2, r_in = size / 4;
      double xs[10], ys[10];
      for (int i = 0; i < 5; ++i) {
        double a_out = M_PI / 2 + i * 2 * M_PI / 5;
        double a_in = M_PI / 2 + (i + 0.5) * 2 * M_PI / 5;
        xs[2 * i] = cx + r_out * std::cos(a_out);
        ys[2 * i] = cy - r_out * std::sin(a_out);
        xs[2 * i + 1] = cx + r_in * std::cos(a_in);
        ys[2 * i + 1] = cy - r_in * std::sin(a_in);
      }
      canvas.polygon(xs, ys, 10, fill);
      break;
    }
    case 4: {  // cross
      int w = size / 3;
      canvas.rect(x, y + size / 2 - w / 2, x + size, y + size / 2 + w / 2, fill);
      canvas.rect(x + size / 2 - w / 2, y, x + size / 2 + w / 2, y + size, fill);
      break;
    }
    default:
      break;
  }
}

}  // namespace

extern "C" {

// Render a full split: labels/seeds drawn from the split-level RandomState
// (bit-identical stream to numpy), images rasterized per-sample.
// out: [num_samples, image_size, image_size, channels] uint8 (caller-owned)
// labels_out: [num_samples] int32
void vst_generate_split(uint8_t* out, int32_t* labels_out, int num_samples,
                        int num_classes, int image_size, int channels,
                        uint32_t split_seed) {
  Mt19937 split_rng(split_seed);
  std::vector<int32_t> labels(num_samples);
  std::vector<uint32_t> seeds(num_samples);
  for (int i = 0; i < num_samples; ++i)
    labels[i] = static_cast<int32_t>(split_rng.randint(0, num_classes));
  for (int i = 0; i < num_samples; ++i)
    seeds[i] = static_cast<uint32_t>(split_rng.randint(0, 0x80000000ull));

  const int stride = image_size * image_size * channels;
  for (int i = 0; i < num_samples; ++i) {
    labels_out[i] = labels[i];
    draw_sample(out + static_cast<int64_t>(i) * stride, labels[i], seeds[i],
                image_size, channels);
  }
}

// Single-image variant for testing.
void vst_rasterize(uint8_t* out, int label, uint32_t seed, int image_size,
                   int channels) {
  draw_sample(out, label, seed, image_size, channels);
}

// MT19937 stream probe for parity tests against numpy.
void vst_mt19937_randint(uint32_t seed, uint64_t low, uint64_t high,
                         int count, uint64_t* out) {
  Mt19937 rng(seed);
  for (int i = 0; i < count; ++i) out[i] = rng.randint(low, high);
}

}  // extern "C"
