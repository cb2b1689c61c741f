// Universal audio decode via the system FFmpeg libraries.
//
// TPU-native replacement for the reference's pydub→ffmpeg subprocess
// decode (reference fun_asr_gguf/nano_audio.py:3-30): instead of piping
// PCM through an external ffmpeg process, we link libavformat/libavcodec/
// libswresample directly and decode any container/codec (mp3, m4a, flac,
// ogg, wav, ...) to mono float32 at the requested rate, in-process.
//
// Built as a separate shared object (libfunasr_audio.so) so the core
// native library keeps zero external dependencies; Python falls back to
// pure-Python WAV parsing when this library is absent.
//
// C ABI:
//   long fa_decode_audio(path, dst_rate, &out) -> n samples (malloc'd
//       float32 buffer in *out, caller frees with fa_free_audio) or
//       negative error code.
//   void fa_free_audio(float*)
//   long fa_encode_mp3(pcm, n, sample_rate, path) -> bytes written or
//       negative. Test helper (round-trip fixtures); uses libmp3lame via
//       dlopen so the decoder works even without lame installed.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

#include <dlfcn.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct DecodeCtx {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  SwrContext* swr = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  ~DecodeCtx() {
    if (swr) swr_free(&swr);
    if (dec) avcodec_free_context(&dec);
    if (fmt) avformat_close_input(&fmt);
    if (pkt) av_packet_free(&pkt);
    if (frame) av_frame_free(&frame);
  }
};

// Lazily initialise the resampler from the first decoded frame (some
// codecs only report the true layout/format once a frame is out).
int ensure_swr(DecodeCtx& c, const AVFrame* f, int dst_rate) {
  if (c.swr) return 0;
  AVChannelLayout out_layout = AV_CHANNEL_LAYOUT_MONO;
  // zero-init: av_channel_layout_copy uninits dst first, and garbage bytes
  // reading as AV_CHANNEL_ORDER_CUSTOM would av_freep a wild pointer
  AVChannelLayout in_layout = {};
  if (f->ch_layout.nb_channels > 0) {
    av_channel_layout_copy(&in_layout, &f->ch_layout);
  } else {
    av_channel_layout_default(&in_layout, 1);
  }
  int ret = swr_alloc_set_opts2(&c.swr, &out_layout, AV_SAMPLE_FMT_FLT,
                                dst_rate, &in_layout,
                                (AVSampleFormat)f->format, f->sample_rate,
                                0, nullptr);
  av_channel_layout_uninit(&in_layout);
  if (ret < 0) return ret;
  return swr_init(c.swr);
}

int convert_frame(DecodeCtx& c, const AVFrame* f, int dst_rate,
                  std::vector<float>& out) {
  // Upper bound on output samples for this frame (plus buffered tail).
  int64_t in_n = f ? f->nb_samples : 0;
  int64_t max_out =
      av_rescale_rnd(swr_get_delay(c.swr, dst_rate) + in_n * (int64_t)dst_rate,
                     1, f ? f->sample_rate : dst_rate, AV_ROUND_UP) + 64;
  size_t base = out.size();
  out.resize(base + (size_t)max_out);
  uint8_t* dst[1] = {reinterpret_cast<uint8_t*>(out.data() + base)};
  int got = swr_convert(c.swr, dst, (int)max_out,
                        f ? const_cast<const uint8_t**>(f->extended_data)
                          : nullptr,
                        f ? f->nb_samples : 0);
  if (got < 0) {
    out.resize(base);
    return got;
  }
  out.resize(base + (size_t)got);
  return 0;
}

}  // namespace

extern "C" {

long fa_decode_audio(const char* path, int dst_rate, float** out_samples) {
  if (!path || !out_samples || dst_rate <= 0) return -1;
  *out_samples = nullptr;
  av_log_set_level(AV_LOG_ERROR);

  DecodeCtx c;
  if (avformat_open_input(&c.fmt, path, nullptr, nullptr) < 0) return -2;
  if (avformat_find_stream_info(c.fmt, nullptr) < 0) return -3;

  const AVCodec* codec = nullptr;
  int stream = av_find_best_stream(c.fmt, AVMEDIA_TYPE_AUDIO, -1, -1,
                                   &codec, 0);
  if (stream < 0 || !codec) return -4;

  c.dec = avcodec_alloc_context3(codec);
  if (!c.dec) return -5;
  if (avcodec_parameters_to_context(c.dec, c.fmt->streams[stream]->codecpar)
      < 0) return -6;
  if (avcodec_open2(c.dec, codec, nullptr) < 0) return -7;

  c.pkt = av_packet_alloc();
  c.frame = av_frame_alloc();
  if (!c.pkt || !c.frame) return -8;

  std::vector<float> pcm;
  pcm.reserve((size_t)dst_rate * 64);

  bool eof = false;
  while (!eof) {
    int r = av_read_frame(c.fmt, c.pkt);
    if (r == AVERROR_EOF) {
      eof = true;
    } else if (r < 0) {
      return -9;
    } else if (c.pkt->stream_index != stream) {
      av_packet_unref(c.pkt);
      continue;
    }
    // send may return EAGAIN (decoder output queue full) — drain frames
    // and re-send the same packet so no audio is silently dropped
    bool sent = false;
    while (!sent) {
      r = avcodec_send_packet(c.dec, eof ? nullptr : c.pkt);
      if (r == 0 || r == AVERROR_EOF) {
        sent = true;
      } else if (r != AVERROR(EAGAIN)) {
        if (!eof) av_packet_unref(c.pkt);
        return -10;
      }
      while (true) {
        r = avcodec_receive_frame(c.dec, c.frame);
        if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
        if (r < 0) {
          if (!eof) av_packet_unref(c.pkt);
          return -11;
        }
        if (ensure_swr(c, c.frame, dst_rate) < 0) return -12;
        if (convert_frame(c, c.frame, dst_rate, pcm) < 0) return -13;
        av_frame_unref(c.frame);
      }
    }
    if (!eof) av_packet_unref(c.pkt);
  }
  // Flush the resampler's buffered tail.
  if (c.swr) {
    int64_t tail = swr_get_delay(c.swr, dst_rate) + 64;
    size_t base = pcm.size();
    pcm.resize(base + (size_t)tail);
    uint8_t* dst[1] = {reinterpret_cast<uint8_t*>(pcm.data() + base)};
    int got = swr_convert(c.swr, dst, (int)tail, nullptr, 0);
    pcm.resize(base + (got > 0 ? (size_t)got : 0));
  }

  if (pcm.empty()) return -14;
  float* buf = (float*)malloc(pcm.size() * sizeof(float));
  if (!buf) return -15;
  memcpy(buf, pcm.data(), pcm.size() * sizeof(float));
  *out_samples = buf;
  return (long)pcm.size();
}

void fa_free_audio(float* p) { free(p); }

// ---------------------------------------------------------------------------
// Test-fixture MP3 encoder (libmp3lame via dlopen; header-free declarations).
// ---------------------------------------------------------------------------

typedef void* lame_t;

long fa_encode_mp3(const float* pcm, long n, int sample_rate,
                   const char* path) {
  void* lib = dlopen("libmp3lame.so.0", RTLD_NOW);
  if (!lib) lib = dlopen("libmp3lame.so", RTLD_NOW);
  if (!lib) return -1;

  auto init = (lame_t (*)())dlsym(lib, "lame_init");
  auto set_in_rate = (int (*)(lame_t, int))dlsym(lib, "lame_set_in_samplerate");
  auto set_channels = (int (*)(lame_t, int))dlsym(lib, "lame_set_num_channels");
  auto set_mode = (int (*)(lame_t, int))dlsym(lib, "lame_set_mode");
  auto set_brate = (int (*)(lame_t, int))dlsym(lib, "lame_set_brate");
  auto init_params = (int (*)(lame_t))dlsym(lib, "lame_init_params");
  auto encode = (int (*)(lame_t, const float*, const float*, int,
                         unsigned char*, int))
      dlsym(lib, "lame_encode_buffer_ieee_float");
  auto flush = (int (*)(lame_t, unsigned char*, int))dlsym(
      lib, "lame_encode_flush");
  auto close_fn = (int (*)(lame_t))dlsym(lib, "lame_close");
  if (!init || !set_in_rate || !set_channels || !init_params || !encode ||
      !flush || !close_fn) {
    dlclose(lib);
    return -2;
  }

  lame_t gf = init();
  set_in_rate(gf, sample_rate);
  set_channels(gf, 1);
  if (set_mode) set_mode(gf, 3);    // MONO
  if (set_brate) set_brate(gf, 128);
  if (init_params(gf) < 0) {
    close_fn(gf);
    dlclose(lib);
    return -3;
  }

  std::vector<unsigned char> out((size_t)(1.25 * n + 7200) + 65536);
  long written = 0;
  const long chunk = 65536;
  FILE* fp = fopen(path, "wb");
  if (!fp) {
    close_fn(gf);
    dlclose(lib);
    return -4;
  }
  for (long i = 0; i < n; i += chunk) {
    int m = (int)((n - i) < chunk ? (n - i) : chunk);
    int got = encode(gf, pcm + i, pcm + i, m, out.data(), (int)out.size());
    if (got < 0) {
      fclose(fp);
      close_fn(gf);
      dlclose(lib);
      return -5;
    }
    fwrite(out.data(), 1, (size_t)got, fp);
    written += got;
  }
  int got = flush(gf, out.data(), (int)out.size());
  if (got > 0) {
    fwrite(out.data(), 1, (size_t)got, fp);
    written += got;
  }
  fclose(fp);
  close_fn(gf);
  dlclose(lib);
  return written;
}

}  // extern "C"
