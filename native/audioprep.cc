// audioprep — native host-side audio preparation for the data pipeline.
//
// The reference's data path leans on torchaudio's C++ kernels for resampling
// (reference trainer.py:117); this library is the equivalent native layer for
// the TPU framework's host-side prep: a windowed-sinc polyphase resampler
// (scipy.signal.resample_poly-compatible design: kaiser(beta=5.0) low-pass,
// half-length 10*max(up,down)) plus 16-bit PCM decode. Exposed over a plain
// C ABI for ctypes (no pybind11 dependency in the image).
//
// Build: `make -C native` -> libaudioprep.so.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// modified Bessel function of the first kind, order 0 (series expansion)
double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  const double x2 = x * x / 4.0;
  for (int k = 1; k < 64; ++k) {
    term *= x2 / (static_cast<double>(k) * k);
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

int64_t gcd64(int64_t a, int64_t b) {
  while (b) { int64_t t = a % b; a = b; b = t; }
  return a;
}

// firwin(numtaps, cutoff, window=('kaiser', 5.0)) equivalent: windowed sinc,
// unit DC gain, centered, odd length 2*half+1.
std::vector<double> design_lowpass(int64_t half, double cutoff) {
  const int64_t n = 2 * half + 1;
  std::vector<double> h(n);
  const double beta = 5.0;
  const double i0b = bessel_i0(beta);
  double sum = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    const double m = static_cast<double>(i) - half;
    // sinc low-pass at normalized cutoff (cutoff in (0, 1], Nyquist = 1)
    double s = (m == 0.0) ? cutoff : std::sin(M_PI * cutoff * m) / (M_PI * m);
    // kaiser window
    const double r = 2.0 * i / (n - 1) - 1.0;
    const double w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r))) / i0b;
    h[i] = s * w;
    sum += h[i];
  }
  // firwin normalisation: exact unit DC gain
  for (int64_t i = 0; i < n; ++i) h[i] /= sum;
  return h;
}

}  // namespace

extern "C" {

// Number of output samples resample() will produce (scipy convention:
// ceil(n_in * up / down) after rational reduction).
int64_t audioprep_resample_out_len(int64_t n_in, int64_t sr_in, int64_t sr_out) {
  const int64_t g = gcd64(sr_in, sr_out);
  const int64_t up = sr_out / g, down = sr_in / g;
  return (n_in * up + down - 1) / down;
}

// Polyphase rational resampling, matching scipy.signal.resample_poly's
// filter design (kaiser beta 5, half-length 10*max(up,down), gain `up`).
// Returns the number of samples written (== audioprep_resample_out_len), or
// -1 on error.
int64_t audioprep_resample(const float* x, int64_t n_in,
                           int64_t sr_in, int64_t sr_out, float* y) {
  if (n_in <= 0 || sr_in <= 0 || sr_out <= 0) return -1;
  const int64_t g = gcd64(sr_in, sr_out);
  const int64_t up = sr_out / g, down = sr_in / g;
  const int64_t n_out = (n_in * up + down - 1) / down;

  if (up == 1 && down == 1) {
    std::memcpy(y, x, sizeof(float) * n_in);
    return n_in;
  }

  const int64_t max_rate = std::max(up, down);
  const int64_t half = 10 * max_rate;
  const double cutoff = 1.0 / static_cast<double>(max_rate);
  std::vector<double> h = design_lowpass(half, cutoff);
  const int64_t taps = static_cast<int64_t>(h.size());

  // y[j] = up * sum_i x[i] * h[j*down - i*up + half]
  for (int64_t j = 0; j < n_out; ++j) {
    const int64_t t = j * down + half;
    // valid i range: 0 <= t - i*up < taps  =>  (t - taps + 1)/up < ... <= t/up
    int64_t i_lo = (t - taps + 1 + up - 1) / up;   // ceil
    if (i_lo < 0) i_lo = 0;
    int64_t i_hi = t / up;                          // floor
    if (i_hi >= n_in) i_hi = n_in - 1;
    double acc = 0.0;
    for (int64_t i = i_lo; i <= i_hi; ++i) {
      acc += static_cast<double>(x[i]) * h[t - i * up];
    }
    y[j] = static_cast<float>(acc * up);
  }
  return n_out;
}

// 16-bit little-endian PCM -> float32 in [-1, 1]; multi-channel input is
// averaged to mono. Returns frames written.
int64_t audioprep_pcm16_to_float(const int16_t* pcm, int64_t n_samples,
                                 int32_t n_channels, float* out) {
  if (n_channels <= 0) return -1;
  const int64_t frames = n_samples / n_channels;
  const float scale = 1.0f / 32767.0f;
  for (int64_t f = 0; f < frames; ++f) {
    int32_t acc = 0;
    for (int32_t c = 0; c < n_channels; ++c) acc += pcm[f * n_channels + c];
    out[f] = scale * static_cast<float>(acc) / n_channels;
  }
  return frames;
}

}  // extern "C"
