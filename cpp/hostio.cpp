// hostio: native host-side data-pipeline kernels for the TPU RNN-T stack.
//
// The TPU owns the model math (JAX/XLA/Pallas); this library owns the
// CPU-side work that feeds it: FBANK/log-mel feature extraction for raw
// audio (the reference family uses kaldi-style host extraction) and
// batch edit-distance for WER/PER scoring. Plain C ABI, bound from
// Python with ctypes (no pybind11 in this image).
//
// Build: make -C cpp   (g++ -O3 -shared; see cpp/Makefile)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Iterative radix-2 complex FFT (n must be a power of two).
void fft_radix2(float* re, float* im, int n) {
  // bit-reversal permutation
  for (int i = 1, j = 0; i < n; ++i) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  for (int len = 2; len <= n; len <<= 1) {
    const double ang = -2.0 * M_PI / len;
    const double wr = std::cos(ang), wi = std::sin(ang);
    for (int i = 0; i < n; i += len) {
      double cr = 1.0, ci = 0.0;
      for (int k = 0; k < len / 2; ++k) {
        const int a = i + k, b = i + k + len / 2;
        const double ur = re[a], ui = im[a];
        const double vr = re[b] * cr - im[b] * ci;
        const double vi = re[b] * ci + im[b] * cr;
        re[a] = static_cast<float>(ur + vr);
        im[a] = static_cast<float>(ui + vi);
        re[b] = static_cast<float>(ur - vr);
        im[b] = static_cast<float>(ui - vi);
        const double ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
      }
    }
  }
}

}  // namespace

extern "C" {

// Number of frames produced for n samples (snip-edges framing).
int hostio_num_frames(int n_samples, int win, int hop) {
  if (n_samples < win) return 0;
  return 1 + (n_samples - win) / hop;
}

// Log-mel FBANK extraction.
//   audio:  n_samples float32
//   mel_fb: (n_fft/2+1, n_mels) row-major filterbank matrix
//   out:    (num_frames, n_mels) row-major
// Matches rnn_transducer_tpu.ops.logmel.log_mel_oracle (Hann window,
// pre-emphasis, power spectrum, log with floor).
int hostio_fbank(const float* audio, int n_samples, int n_fft, int hop,
                 int win, int n_mels, float preemph, float log_floor,
                 const float* mel_fb, float* out) {
  if (n_fft & (n_fft - 1)) return -1;  // power of two required
  const int n_bins = n_fft / 2 + 1;
  const int T = hostio_num_frames(n_samples, win, hop);
  std::vector<float> pre(n_samples);
  pre[0] = audio[0];
  for (int i = 1; i < n_samples; ++i)
    pre[i] = audio[i] - preemph * audio[i - 1];
  std::vector<float> window(win);
  for (int i = 0; i < win; ++i)
    window[i] = 0.5f - 0.5f * std::cos(2.0 * M_PI * i / (win - 1));
  std::vector<float> re(n_fft), im(n_fft), power(n_bins);
  for (int t = 0; t < T; ++t) {
    const float* fr = pre.data() + t * hop;
    for (int i = 0; i < win; ++i) re[i] = fr[i] * window[i];
    std::memset(re.data() + win, 0, sizeof(float) * (n_fft - win));
    std::memset(im.data(), 0, sizeof(float) * n_fft);
    fft_radix2(re.data(), im.data(), n_fft);
    for (int k = 0; k < n_bins; ++k)
      power[k] = re[k] * re[k] + im[k] * im[k];
    float* orow = out + static_cast<int64_t>(t) * n_mels;
    for (int m = 0; m < n_mels; ++m) {
      double acc = 0.0;
      const float* fb = mel_fb + m;  // column m, stride n_mels
      for (int k = 0; k < n_bins; ++k) acc += power[k] * fb[(int64_t)k * n_mels];
      orow[m] = std::log(acc > log_floor ? acc : log_floor);
    }
  }
  return T;
}

// Levenshtein distance between two int32 token sequences.
int hostio_edit_distance(const int32_t* ref, int n, const int32_t* hyp,
                         int m) {
  std::vector<int> d(m + 1), prev(m + 1);
  for (int j = 0; j <= m; ++j) d[j] = j;
  for (int i = 1; i <= n; ++i) {
    prev = d;
    d[0] = i;
    for (int j = 1; j <= m; ++j) {
      const int sub = prev[j - 1] + (ref[i - 1] != hyp[j - 1] ? 1 : 0);
      const int del = prev[j] + 1;
      const int ins = d[j - 1] + 1;
      d[j] = sub < del ? (sub < ins ? sub : ins) : (del < ins ? del : ins);
    }
  }
  return d[m];
}

// Batched corpus edit distance: concatenated refs/hyps with per-pair
// lengths. Returns total edits; total ref tokens via out param.
int64_t hostio_corpus_edits(const int32_t* refs, const int32_t* ref_lens,
                            const int32_t* hyps, const int32_t* hyp_lens,
                            int n_pairs, int64_t* total_ref_tokens) {
  int64_t edits = 0, total = 0;
  const int32_t* r = refs;
  const int32_t* h = hyps;
  for (int i = 0; i < n_pairs; ++i) {
    edits += hostio_edit_distance(r, ref_lens[i], h, hyp_lens[i]);
    total += ref_lens[i];
    r += ref_lens[i];
    h += hyp_lens[i];
  }
  if (total_ref_tokens) *total_ref_tokens = total;
  return edits;
}

}  // extern "C"
