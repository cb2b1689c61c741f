// Native audio loader: WAV parsing + mono mixdown + linear resampling.
//
// The reference delegates audio decode to ffmpeg via pydub
// (nano_audio.py); neither exists in this image, so this is the native
// data-loader for the engine's hot path: PCM 8/16/24/32-bit and float32
// WAV, arbitrary channel count, resampled to the target rate.
//
// C ABI for ctypes. Returns the number of output samples, or a negative
// error code. Call once with out=nullptr to query the output length.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct Fmt {
  uint16_t format = 0;
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
};

constexpr int kErrOpen = -1;
constexpr int kErrParse = -2;
constexpr int kErrFormat = -3;

bool read_exact(FILE* f, void* buf, size_t n) {
  return fread(buf, 1, n, f) == n;
}

}  // namespace

extern "C" {

// Decode a WAV file to mono float64 at dst_rate.
// out may be nullptr to query the required length.
int64_t load_wav_mono(const char* path, int dst_rate, double* out,
                      int64_t out_capacity) {
  FILE* f = fopen(path, "rb");
  if (!f) return kErrOpen;

  char riff[4], wave[4];
  uint32_t riff_size;
  if (!read_exact(f, riff, 4) || !read_exact(f, &riff_size, 4) ||
      !read_exact(f, wave, 4) || memcmp(riff, "RIFF", 4) != 0 ||
      memcmp(wave, "WAVE", 4) != 0) {
    fclose(f);
    return kErrParse;
  }

  Fmt fmt;
  std::vector<uint8_t> data;
  while (true) {
    char id[4];
    uint32_t size;
    if (!read_exact(f, id, 4) || !read_exact(f, &size, 4)) break;
    if (memcmp(id, "fmt ", 4) == 0) {
      std::vector<uint8_t> chunk(size);
      if (!read_exact(f, chunk.data(), size)) { fclose(f); return kErrParse; }
      memcpy(&fmt.format, chunk.data(), 2);
      memcpy(&fmt.channels, chunk.data() + 2, 2);
      memcpy(&fmt.sample_rate, chunk.data() + 4, 4);
      memcpy(&fmt.bits, chunk.data() + 14, 2);
    } else if (memcmp(id, "data", 4) == 0) {
      data.resize(size);
      if (!read_exact(f, data.data(), size)) { fclose(f); return kErrParse; }
    } else {
      fseek(f, (size + 1) & ~1u, SEEK_CUR);
      continue;
    }
    if (size & 1) fseek(f, 1, SEEK_CUR);
  }
  fclose(f);

  if (fmt.channels == 0 || fmt.sample_rate == 0 || data.empty())
    return kErrParse;
  const bool is_float = fmt.format == 3;
  const bool is_pcm = fmt.format == 1 || fmt.format == 0xFFFE;
  if (!is_float && !is_pcm) return kErrFormat;

  const int ch = fmt.channels;
  const int bytes = fmt.bits / 8;
  const int64_t n_frames = static_cast<int64_t>(data.size()) / (bytes * ch);
  std::vector<double> mono(n_frames);
  const uint8_t* p = data.data();
  for (int64_t i = 0; i < n_frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < ch; ++c) {
      const uint8_t* s = p + (i * ch + c) * bytes;
      double v = 0.0;
      if (is_float && fmt.bits == 32) {
        float fv;
        memcpy(&fv, s, 4);
        v = fv;
      } else if (fmt.bits == 8) {
        v = (static_cast<int>(s[0]) - 128) / 128.0;
      } else if (fmt.bits == 16) {
        int16_t iv;
        memcpy(&iv, s, 2);
        v = iv / 32768.0;
      } else if (fmt.bits == 24) {
        int32_t iv = s[0] | (s[1] << 8) | (s[2] << 16);
        if (iv >= (1 << 23)) iv -= (1 << 24);
        v = iv / 8388608.0;
      } else if (fmt.bits == 32) {
        int32_t iv;
        memcpy(&iv, s, 4);
        v = iv / 2147483648.0;
      } else {
        return kErrFormat;
      }
      acc += v;
    }
    mono[i] = acc / ch;
  }

  // linear resample
  const int64_t n_out = (fmt.sample_rate == static_cast<uint32_t>(dst_rate))
      ? n_frames
      : static_cast<int64_t>(n_frames * static_cast<double>(dst_rate)
                             / fmt.sample_rate);
  if (out == nullptr) return n_out;
  if (out_capacity < n_out) return kErrParse;
  if (fmt.sample_rate == static_cast<uint32_t>(dst_rate)) {
    memcpy(out, mono.data(), n_frames * sizeof(double));
    return n_out;
  }
  const double step = static_cast<double>(fmt.sample_rate) / dst_rate;
  for (int64_t i = 0; i < n_out; ++i) {
    const double pos = i * step;
    const int64_t i0 = static_cast<int64_t>(pos);
    const int64_t i1 = std::min(i0 + 1, n_frames - 1);
    const double frac = pos - i0;
    out[i] = mono[i0] * (1.0 - frac) + mono[i1] * frac;
  }
  return n_out;
}

}  // extern "C"
