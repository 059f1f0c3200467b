// Native video decode/encode shim for the TPU framework.
//
// Replaces the reference's PyAV (FFmpeg) and torchvision.io decode paths
// (ref: datasets_custom/video_container.py:6, datasets_custom/decoder.py:65-304,
// dino_loss_loader.py:81, frame_selection_loader.py:93,
// timesformer_evaluation.py:13-31) with a direct libavformat/libavcodec/
// libswscale implementation exposed through a C ABI for ctypes.
//
// Three decode modes mirror the reference's usage patterns:
//   * whole-video decode with a pre-sampling stride (dino_loss_loader /
//     frame_selection_loader read the full file then slice [::rate])
//   * selective decode of an explicit frame-index list
//     (timesformer_evaluation re-decodes only the selected frames)
//   * PTS-window decode (decoder.py pyav_decode's clip seek path)
// plus a tiny mpeg4 encoder used to synthesize test fixtures.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

namespace {

struct DecodeResult {
  std::vector<uint8_t> rgb;  // T*H*W*3 (RGB24) or T*H*3/2*W (packed I420)
  int64_t t = 0;
  int h = 0;
  int w = 0;
  double fps = 0.0;
  int64_t total_frames = 0;  // container-reported (may be 0)
};

thread_local std::string g_error;

void set_error(const std::string& msg) { g_error = msg; }

// Shared decode loop. `want(i)` decides whether display-ordered frame i is
// kept; decoding stops after `stop_after` (or EOF when < 0).
//
// `seek_to` >= 0 requests a keyframe seek to that display-ordered frame
// before decoding (the reference's pyav PTS-window path,
// ref: datasets_custom/decoder.py:217-304): the demuxer jumps to the
// nearest keyframe at or before the target instead of decoding the whole
// prefix. After a seek the display index of each frame is recovered from
// its best-effort PTS; streams without usable PTS fall back to a plain
// from-the-start decode (count-based indexing stays exact).
// When `yuv` is true the output buffer keeps the codec's own planar 4:2:0
// layout — packed I420, (T, H*3/2, W) with even H/W — instead of converting
// to RGB24 on the host. Color conversion then happens on the accelerator,
// fused into the compute kernels (see data/yuv.py), and the host->device
// wire carries half the bytes. swscale still runs once per kept frame to
// normalize pix_fmt/dimensions (a plane copy for the common yuv420p case).
template <typename WantFn>
int decode_loop(const char* path, WantFn want, int64_t stop_after,
                DecodeResult* out, int64_t seek_to = -1, bool yuv = false) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) {
    set_error(std::string("cannot open ") + path);
    return -1;
  }
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    set_error("no stream info");
    return -1;
  }
  int vstream = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (vstream < 0) {
    avformat_close_input(&fmt);
    set_error("no video stream");
    return -1;
  }
  AVStream* st = fmt->streams[vstream];
  const AVCodec* codec = avcodec_find_decoder(st->codecpar->codec_id);
  if (!codec) {
    avformat_close_input(&fmt);
    set_error("no decoder for codec");
    return -1;
  }
  AVCodecContext* cc = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(cc, st->codecpar);
  cc->thread_count = 0;  // auto threads (multi-thread decode,
                         // ref: video_container.py:23-29)
  if (avcodec_open2(cc, codec, nullptr) < 0) {
    avcodec_free_context(&cc);
    avformat_close_input(&fmt);
    set_error("cannot open codec");
    return -1;
  }

  // 4:2:0 needs even dimensions; odd sources lose their last row/column
  // (matching swscale's own handling of odd-sized chroma targets)
  const int he = cc->height & ~1;
  const int we = cc->width & ~1;
  out->w = yuv ? we : cc->width;
  out->h = yuv ? he : cc->height;
  AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  out->fps = fr.den ? av_q2d(fr) : 0.0;
  out->total_frames = st->nb_frames;

  // optional keyframe seek; indices then derive from PTS. Index math uses
  // r_frame_rate (the stream's base rate from pts deltas) — avg_frame_rate
  // folds container duration rounding (e.g. mp4 reports 60/1.967s = 30.5
  // for a 30 fps stream) and would drift the mapping by a frame per ~2 s.
  bool idx_from_pts = false;
  const double tb = av_q2d(st->time_base);
  AVRational ifr = st->r_frame_rate.num ? st->r_frame_rate : st->avg_frame_rate;
  const double idx_fps = ifr.den ? av_q2d(ifr) : 0.0;
  if (seek_to > 0 && idx_fps > 0.0 && tb > 0.0) {
    int64_t ts = static_cast<int64_t>(llround(seek_to / idx_fps / tb));
    if (av_seek_frame(fmt, vstream, ts, AVSEEK_FLAG_BACKWARD) >= 0) {
      avcodec_flush_buffers(cc);
      idx_from_pts = true;
    }
  }

  SwsContext* sws = nullptr;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t idx = 0;
  const size_t frame_bytes =
      yuv ? static_cast<size_t>(we) * he * 3 / 2
          : static_cast<size_t>(cc->width) * cc->height * 3;
  int ret = 0;
  bool done = false;
  // sws_scale's SIMD paths can write past unaligned row ends, so it
  // targets a 32-byte-aligned scratch image whose rows are then packed
  // into the contiguous output (widths like 300 px corrupted the heap
  // when scaling straight into the packed buffer)
  uint8_t* scratch_data[4] = {nullptr};
  int scratch_linesize[4] = {0};

  auto handle_frame = [&](AVFrame* f) {
    if (idx_from_pts) {
      int64_t pts = f->best_effort_timestamp;
      if (pts == AV_NOPTS_VALUE) {
        // unusable timestamps: bail out; caller retries without seeking
        done = true;
        ret = -2;
        return;
      }
      idx = static_cast<int64_t>(llround(pts * tb * idx_fps));
    }
    if (want(idx)) {
      const AVPixelFormat dst_fmt = yuv ? AV_PIX_FMT_YUV420P : AV_PIX_FMT_RGB24;
      const int dw = yuv ? we : cc->width;
      const int dh = yuv ? he : cc->height;
      if (!sws) {
        sws = sws_getContext(cc->width, cc->height,
                             static_cast<AVPixelFormat>(f->format), dw, dh,
                             dst_fmt, SWS_BILINEAR, nullptr, nullptr, nullptr);
        av_image_alloc(scratch_data, scratch_linesize, dw, dh, dst_fmt, 32);
      }
      sws_scale(sws, f->data, f->linesize, 0, cc->height, scratch_data,
                scratch_linesize);
      size_t off = out->rgb.size();
      out->rgb.resize(off + frame_bytes);
      uint8_t* dst = out->rgb.data() + off;
      if (yuv) {
        // pack I420 planes contiguously: Y (dh x dw), U then V (dh/2 x dw/2)
        for (int y = 0; y < dh; ++y, dst += dw)
          std::memcpy(dst, scratch_data[0] +
                               static_cast<size_t>(y) * scratch_linesize[0], dw);
        for (int p = 1; p <= 2; ++p)
          for (int y = 0; y < dh / 2; ++y, dst += dw / 2)
            std::memcpy(dst, scratch_data[p] +
                                 static_cast<size_t>(y) * scratch_linesize[p],
                        dw / 2);
      } else {
        const int row = dw * 3;
        for (int y = 0; y < dh; ++y)
          std::memcpy(dst + static_cast<size_t>(y) * row,
                      scratch_data[0] +
                          static_cast<size_t>(y) * scratch_linesize[0],
                      row);
      }
      out->t += 1;
    }
    idx += 1;
    if (stop_after >= 0 && idx > stop_after) done = true;
  };

  while (!done && av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == vstream) {
      if (avcodec_send_packet(cc, pkt) == 0) {
        while (avcodec_receive_frame(cc, frame) == 0) {
          handle_frame(frame);
          if (done) break;
        }
      }
    }
    av_packet_unref(pkt);
  }
  // flush
  if (!done) {
    avcodec_send_packet(cc, nullptr);
    while (avcodec_receive_frame(cc, frame) == 0) {
      handle_frame(frame);
      if (done) break;
    }
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  if (sws) sws_freeContext(sws);
  if (scratch_data[0]) av_freep(&scratch_data[0]);
  avcodec_free_context(&cc);
  avformat_close_input(&fmt);
  return ret;
}

uint8_t* move_to_heap(DecodeResult& r) {
  uint8_t* buf = static_cast<uint8_t*>(std::malloc(r.rgb.size()));
  if (!buf && !r.rgb.empty()) return nullptr;
  std::memcpy(buf, r.rgb.data(), r.rgb.size());
  return buf;
}

}  // namespace

extern "C" {

const char* dvst_last_error() { return g_error.c_str(); }

void dvst_free(uint8_t* buf) { std::free(buf); }

// Probe container metadata without decoding.
int dvst_video_info(const char* path, int64_t* nframes, double* fps, int* w,
                    int* h, double* duration_sec) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) {
    set_error(std::string("cannot open ") + path);
    return -1;
  }
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    set_error("no stream info");
    return -1;
  }
  int vstream = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (vstream < 0) {
    avformat_close_input(&fmt);
    set_error("no video stream");
    return -1;
  }
  AVStream* st = fmt->streams[vstream];
  *nframes = st->nb_frames;
  AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  *fps = fr.den ? av_q2d(fr) : 0.0;
  *w = st->codecpar->width;
  *h = st->codecpar->height;
  *duration_sec =
      fmt->duration > 0 ? fmt->duration / static_cast<double>(AV_TIME_BASE) : 0.0;
  avformat_close_input(&fmt);
  return 0;
}

// Decode every `stride`-th display-ordered frame starting at `start`,
// up to `max_frames` kept frames (<=0: unlimited). Returns an RGB24 buffer
// (caller frees with dvst_free) laid out (T, H, W, 3).
int dvst_decode_strided(const char* path, int64_t start, int64_t stride,
                        int64_t max_frames, uint8_t** out, int64_t* T, int* H,
                        int* W, double* fps) {
  if (stride <= 0) stride = 1;
  DecodeResult r;
  int64_t kept = 0;
  auto want = [&](int64_t i) {
    if (i < start || (i - start) % stride != 0) return false;
    if (max_frames > 0 && kept >= max_frames) return false;
    kept += 1;
    return true;
  };
  if (decode_loop(path, want, -1, &r) != 0) return -1;
  *out = move_to_heap(r);
  *T = r.t;
  *H = r.h;
  *W = r.w;
  *fps = r.fps;
  return 0;
}

// Like dvst_decode_strided, but emits packed planar I420 — (T, H*3/2, W)
// uint8, even H/W — leaving YUV->RGB for the accelerator (data/yuv.py).
// H/W report the FRAME dimensions; the buffer holds H*3/2 rows per frame.
int dvst_decode_strided_yuv(const char* path, int64_t start, int64_t stride,
                            int64_t max_frames, uint8_t** out, int64_t* T,
                            int* H, int* W, double* fps) {
  if (stride <= 0) stride = 1;
  DecodeResult r;
  int64_t kept = 0;
  auto want = [&](int64_t i) {
    if (i < start || (i - start) % stride != 0) return false;
    if (max_frames > 0 && kept >= max_frames) return false;
    kept += 1;
    return true;
  };
  if (decode_loop(path, want, -1, &r, /*seek_to=*/-1, /*yuv=*/true) != 0)
    return -1;
  *out = move_to_heap(r);
  *T = r.t;
  *H = r.h;
  *W = r.w;
  *fps = r.fps;
  return 0;
}

// Selective PTS-range decode: keyframe-seek to `start`, decode only frames
// with display index in [start, end], keeping every `stride`-th
// (ref: datasets_custom/decoder.py:217-304 pyav_decode's clip window).
// Falls back to a from-the-start decode if the stream's timestamps are
// unusable after seeking. Returns RGB24 (T, H, W, 3).
int dvst_decode_range(const char* path, int64_t start, int64_t end,
                      int64_t stride, uint8_t** out, int64_t* T, int* H,
                      int* W, double* fps) {
  if (stride <= 0) stride = 1;
  if (start < 0) start = 0;
  auto want = [&](int64_t i) {
    return i >= start && i <= end && (i - start) % stride == 0;
  };
  DecodeResult r;
  int rc = decode_loop(path, want, end, &r, /*seek_to=*/start);
  if (rc == -2) {  // no usable PTS after seek: retry without seeking
    r = DecodeResult();
    rc = decode_loop(path, want, end, &r);
  }
  if (rc != 0) return -1;
  *out = move_to_heap(r);
  *T = r.t;
  *H = r.h;
  *W = r.w;
  *fps = r.fps;
  return 0;
}

// Decode exactly the display-ordered frames named in `indices` (sorted or
// not; duplicates allowed — each unique frame is decoded once and copied
// per occurrence, matching read_video_pyav's gather semantics,
// ref: timesformer_evaluation.py:13-31).
int dvst_decode_indices(const char* path, const int64_t* indices, int64_t n,
                        uint8_t** out, int64_t* T, int* H, int* W) {
  std::vector<int64_t> sorted(indices, indices + n);
  std::vector<int64_t> uniq = sorted;
  std::sort(uniq.begin(), uniq.end());
  uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());

  size_t next = 0;
  std::vector<int64_t> decoded_ids;  // display index of each kept rgb row
  int64_t last = uniq.empty() ? -1 : uniq.back();
  auto want = [&](int64_t i) {
    // a (non-exact) seek may land past early targets; skip them
    while (next < uniq.size() && uniq[next] < i) next += 1;
    if (next < uniq.size() && i == uniq[next]) {
      next += 1;
      decoded_ids.push_back(i);
      return true;
    }
    return false;
  };
  DecodeResult r;
  int64_t first = uniq.empty() ? -1 : uniq.front();
  int rc = decode_loop(path, want, last, &r, /*seek_to=*/first);
  if (rc == -2) {  // no usable PTS after seek: retry without seeking
    next = 0;
    decoded_ids.clear();
    r = DecodeResult();
    rc = decode_loop(path, want, last, &r);
  }
  if (rc != 0) return -1;

  // gather into requested order; out-of-range indices clamp to the nearest
  // decoded frame at or below (or the first decoded frame)
  const size_t fb = static_cast<size_t>(r.h) * r.w * 3;
  std::vector<uint8_t> gathered(fb * n);
  const size_t decoded = decoded_ids.size();
  for (int64_t k = 0; k < n; ++k) {
    if (decoded == 0) {
      std::memset(gathered.data() + fb * k, 0, fb);
      continue;
    }
    int64_t want_idx = indices[k];
    size_t pos = 0;
    for (size_t u = 0; u < decoded; ++u) {
      if (decoded_ids[u] <= want_idx) pos = u;
      if (decoded_ids[u] >= want_idx) break;
    }
    std::memcpy(gathered.data() + fb * k, r.rgb.data() + fb * pos, fb);
  }
  r.rgb = std::move(gathered);
  r.t = n;
  *out = move_to_heap(r);
  *T = r.t;
  *H = r.h;
  *W = r.w;
  return 0;
}

// Encode an RGB24 (T, H, W, 3) buffer to `path` with mpeg4 at `fps`.
// Test-fixture synthesis; quality knobs deliberately minimal.
int dvst_encode_video(const char* path, const uint8_t* rgb, int64_t T, int H,
                      int W, double fps) {
  const AVCodec* codec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!codec) {
    set_error("mpeg4 encoder unavailable");
    return -1;
  }
  AVFormatContext* fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, nullptr, path) < 0 || !fmt) {
    set_error("cannot alloc output context");
    return -1;
  }
  AVStream* st = avformat_new_stream(fmt, nullptr);
  AVCodecContext* cc = avcodec_alloc_context3(codec);
  cc->width = W;
  cc->height = H;
  cc->time_base = AVRational{100, static_cast<int>(fps * 100)};
  cc->framerate = AVRational{static_cast<int>(fps * 100), 100};
  cc->pix_fmt = AV_PIX_FMT_YUV420P;
  cc->gop_size = 12;
  cc->bit_rate = 4000000;
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    cc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(cc, codec, nullptr) < 0) {
    set_error("cannot open encoder");
    return -1;
  }
  avcodec_parameters_from_context(st->codecpar, cc);
  st->time_base = cc->time_base;
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) {
    if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) {
      set_error("cannot open output file");
      return -1;
    }
  }
  if (avformat_write_header(fmt, nullptr) < 0) {
    set_error("cannot write header");
    return -1;
  }

  SwsContext* sws =
      sws_getContext(W, H, AV_PIX_FMT_RGB24, W, H, AV_PIX_FMT_YUV420P,
                     SWS_BILINEAR, nullptr, nullptr, nullptr);
  AVFrame* frame = av_frame_alloc();
  frame->format = AV_PIX_FMT_YUV420P;
  frame->width = W;
  frame->height = H;
  av_frame_get_buffer(frame, 0);
  AVPacket* pkt = av_packet_alloc();

  auto write_packets = [&]() {
    while (avcodec_receive_packet(cc, pkt) == 0) {
      av_packet_rescale_ts(pkt, cc->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
  };

  const size_t fb = static_cast<size_t>(H) * W * 3;
  for (int64_t i = 0; i < T; ++i) {
    av_frame_make_writable(frame);
    const uint8_t* src_data[1] = {rgb + fb * i};
    int src_linesize[1] = {W * 3};
    sws_scale(sws, src_data, src_linesize, 0, H, frame->data, frame->linesize);
    frame->pts = i;
    avcodec_send_frame(cc, frame);
    write_packets();
  }
  avcodec_send_frame(cc, nullptr);
  write_packets();

  av_write_trailer(fmt);
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
  av_packet_free(&pkt);
  av_frame_free(&frame);
  sws_freeContext(sws);
  avcodec_free_context(&cc);
  avformat_free_context(fmt);
  return 0;
}

}  // extern "C"
