// pgasr_io — native host-side audio IO for the TPU input pipeline.
//
// The reference decodes audio on the host in Python via torchaudio, one file
// at a time, per batch, per epoch (reference data.py:54-61). In this
// framework the host's only data-plane job is: read bytes -> PCM decode ->
// fill a padded float32 batch buffer; all DSP runs on-device. This library
// does that job in C++ with a thread pool, writing straight into the
// numpy-owned batch buffer handed over via ctypes (zero extra copies on the
// Python side).
//
// Exposed C ABI:
//   pgasr_read_wav(path, out, max_samples, &sr)           -> n_samples | -err
//   pgasr_wav_info(path, &sr, &n_samples)                 -> 0 | -err
//   pgasr_load_batch(paths[], n, out, stride, lens[], srs[], max_samples,
//                    n_threads)                           -> 0 | -err
//
// Error codes: -1 open failed, -2 malformed header, -3 unsupported format.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Riff {
  FILE* f = nullptr;
  uint16_t format = 0;      // 1 = PCM, 3 = IEEE float
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  long data_offset = 0;
  uint32_t data_bytes = 0;
};

bool read_u32(FILE* f, uint32_t* v) { return fread(v, 4, 1, f) == 1; }
bool read_u16(FILE* f, uint16_t* v) { return fread(v, 2, 1, f) == 1; }

// Parse RIFF/WAVE chunks up to the data chunk. Returns 0 on success.
int open_wav(const char* path, Riff* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char tag[4];
  uint32_t sz;
  if (fread(tag, 1, 4, f) != 4 || memcmp(tag, "RIFF", 4) != 0 ||
      !read_u32(f, &sz) || fread(tag, 1, 4, f) != 4 ||
      memcmp(tag, "WAVE", 4) != 0) {
    fclose(f);
    return -2;
  }
  bool have_fmt = false;
  while (fread(tag, 1, 4, f) == 4 && read_u32(f, &sz)) {
    if (memcmp(tag, "fmt ", 4) == 0) {
      uint16_t fmt, ch, block, bits;
      uint32_t rate, byterate;
      if (!read_u16(f, &fmt) || !read_u16(f, &ch) || !read_u32(f, &rate) ||
          !read_u32(f, &byterate) || !read_u16(f, &block) ||
          !read_u16(f, &bits)) {
        fclose(f);
        return -2;
      }
      if (sz > 16) fseek(f, sz - 16, SEEK_CUR);
      w->format = fmt;
      w->channels = ch;
      w->sample_rate = rate;
      w->bits = bits;
      have_fmt = true;
    } else if (memcmp(tag, "data", 4) == 0) {
      if (!have_fmt) {
        fclose(f);
        return -2;
      }
      w->data_offset = ftell(f);
      w->data_bytes = sz;
      w->f = f;
      return 0;
    } else {
      fseek(f, sz + (sz & 1), SEEK_CUR);  // chunks are 2-byte aligned
    }
  }
  fclose(f);
  return -2;
}

// Decode to mono float32 in [-1, 1]; returns sample count or negative error.
long decode(Riff* w, float* out, long max_samples) {
  const int ch = w->channels;
  const int bytes_per = w->bits / 8;
  if (ch < 1 || bytes_per < 1) return -2;
  long frames = w->data_bytes / (bytes_per * ch);
  if (max_samples > 0 && frames > max_samples) frames = max_samples;

  fseek(w->f, w->data_offset, SEEK_SET);
  std::vector<uint8_t> raw((size_t)frames * ch * bytes_per);
  size_t got = fread(raw.data(), 1, raw.size(), w->f);
  frames = (long)(got / (bytes_per * ch));

  const uint8_t* p = raw.data();
  const float inv_ch = 1.0f / ch;
  for (long i = 0; i < frames; ++i) {
    float acc = 0.0f;
    for (int c = 0; c < ch; ++c) {
      const uint8_t* s = p + ((size_t)i * ch + c) * bytes_per;
      float v;
      if (w->format == 3 && w->bits == 32) {
        float fv;
        memcpy(&fv, s, 4);
        v = fv;
      } else if (w->bits == 16) {
        int16_t iv;
        memcpy(&iv, s, 2);
        v = (float)iv / 32768.0f;
      } else if (w->bits == 32) {
        int32_t iv;
        memcpy(&iv, s, 4);
        v = (float)iv / 2147483648.0f;
      } else if (w->bits == 8) {
        v = ((float)s[0] - 128.0f) / 128.0f;
      } else if (w->bits == 24) {
        int32_t iv = (s[0] << 8) | (s[1] << 16) | (s[2] << 24);
        v = (float)(iv >> 8) / 8388608.0f;
      } else {
        return -3;
      }
      acc += v;
    }
    out[i] = acc * inv_ch;
  }
  return frames;
}

// Linear resample matching numpy.interp(linspace(0, n_in-1, n_out),
// arange(n_in), in) — the Python fallback's exact semantics.
void resample_linear(const float* in, long n_in, float* out, long n_out) {
  if (n_out <= 0) return;
  if (n_in <= 1) {
    for (long i = 0; i < n_out; ++i) out[i] = n_in > 0 ? in[0] : 0.0f;
    return;
  }
  if (n_out == 1) {
    out[0] = in[0];
    return;
  }
  const double scale = (double)(n_in - 1) / (double)(n_out - 1);
  for (long i = 0; i < n_out; ++i) {
    const double x = (double)i * scale;
    long j = (long)x;
    if (j >= n_in - 1) j = n_in - 2;
    const double fr = x - (double)j;
    out[i] = (float)((double)in[j] + ((double)in[j + 1] - (double)in[j]) * fr);
  }
}

}  // namespace

extern "C" {

// Standalone resampler (used by the Python pipeline for rate-mismatched
// corpora; the threaded batch loader below resamples in its workers).
void pgasr_resample_linear(const float* in, long n_in, float* out,
                           long n_out) {
  resample_linear(in, n_in, out, n_out);
}

long pgasr_read_wav(const char* path, float* out, long max_samples,
                    int* sample_rate) {
  Riff w;
  int rc = open_wav(path, &w);
  if (rc != 0) return rc;
  if (sample_rate) *sample_rate = (int)w.sample_rate;
  long n = decode(&w, out, max_samples);
  fclose(w.f);
  return n;
}

int pgasr_wav_info(const char* path, int* sample_rate, long* n_samples) {
  Riff w;
  int rc = open_wav(&path[0], &w);
  if (rc != 0) return rc;
  if (sample_rate) *sample_rate = (int)w.sample_rate;
  if (n_samples)
    *n_samples = (long)(w.data_bytes / ((w.bits / 8) * w.channels));
  fclose(w.f);
  return 0;
}

// Fill a padded (n, stride) float32 batch buffer from n WAV paths in
// parallel. lens[i] receives the decoded sample count (0 on error), srs[i]
// the sample rate. Rows are zero-padded to `stride`. With target_rate > 0,
// rate-mismatched files are linearly resampled in the worker threads and
// lens[i]/srs[i] report the POST-resample count/rate.
int pgasr_load_batch_rs(const char** paths, int n, float* out, long stride,
                        int* lens, int* srs, long max_samples, int n_threads,
                        int target_rate) {
  if (n <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;

  std::atomic<int> next(0);
  std::atomic<int> errors(0);
  auto worker = [&]() {
    std::vector<float> tmp;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      float* row = out + (size_t)i * stride;
      memset(row, 0, sizeof(float) * (size_t)stride);
      long cap = stride < max_samples || max_samples <= 0 ? stride : max_samples;
      int sr = 0;

      Riff w;
      int rc = open_wav(paths[i], &w);
      long got = rc;
      if (rc == 0) {
        sr = (int)w.sample_rate;
        if (target_rate > 0 && sr != target_rate && sr > 0) {
          // decode everything, then resample into the row
          long frames = w.data_bytes / ((w.bits / 8) * w.channels);
          tmp.resize((size_t)frames);
          got = decode(&w, tmp.data(), frames);
          if (got > 0) {
            long n_out = (long)((double)got * target_rate / sr + 0.5);
            if (n_out > cap) n_out = cap;
            resample_linear(tmp.data(), got, row, n_out);
            got = n_out;
            sr = target_rate;
          }
        } else {
          got = decode(&w, row, cap);
        }
        fclose(w.f);
      }

      if (got < 0) {
        lens[i] = 0;
        srs[i] = 0;
        errors.fetch_add(1);
      } else {
        lens[i] = (int)got;
        srs[i] = sr;
      }
    }
  };

  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads - 1; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
  return -errors.load();
}

// Back-compat ABI: no resampling.
int pgasr_load_batch(const char** paths, int n, float* out, long stride,
                     int* lens, int* srs, long max_samples, int n_threads) {
  return pgasr_load_batch_rs(paths, n, out, stride, lens, srs, max_samples,
                             n_threads, 0);
}

// int16 batch loader: fills a padded (n, stride) int16 buffer. For the
// dominant case — mono 16-bit PCM at the target rate — each row is ONE
// fread straight from the data chunk (no float conversion at all); other
// formats/rates decode to float (+ resample) and quantize to int16
// (round-half-away, clamped). The TPU converts back with x/32768 inside
// the jitted step (ops/features.extract_features), so 16-bit sources
// round-trip bit-exactly while host decode cost and host->device transfer
// bytes are HALVED vs the float32 path.
int pgasr_load_batch_i16(const char** paths, int n, int16_t* out, long stride,
                         int* lens, int* srs, long max_samples, int n_threads,
                         int target_rate) {
  if (n <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;

  std::atomic<int> next(0);
  std::atomic<int> errors(0);
  auto worker = [&]() {
    std::vector<float> tmp, tmp2;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int16_t* row = out + (size_t)i * stride;
      memset(row, 0, sizeof(int16_t) * (size_t)stride);
      long cap = stride < max_samples || max_samples <= 0 ? stride : max_samples;
      int sr = 0;

      Riff w;
      int rc = open_wav(paths[i], &w);
      long got = rc;
      if (rc == 0) {
        sr = (int)w.sample_rate;
        bool rate_ok = target_rate <= 0 || sr == target_rate || sr <= 0;
        if (rate_ok && w.format == 1 && w.bits == 16 && w.channels == 1) {
          // fast path: raw PCM frames ARE the row
          long frames = w.data_bytes / 2;
          if (frames > cap) frames = cap;
          fseek(w.f, w.data_offset, SEEK_SET);
          size_t rd = fread(row, 2, (size_t)frames, w.f);
          got = (long)rd;
        } else {
          long frames = w.data_bytes / ((w.bits / 8) * w.channels);
          tmp.resize((size_t)frames);
          got = decode(&w, tmp.data(), frames);
          const float* src = tmp.data();
          if (got > 0 && !rate_ok) {
            long n_out = (long)((double)got * target_rate / sr + 0.5);
            if (n_out > cap) n_out = cap;
            tmp2.resize((size_t)n_out);
            resample_linear(tmp.data(), got, tmp2.data(), n_out);
            src = tmp2.data();
            got = n_out;
            sr = target_rate;
          }
          if (got > cap) got = cap;
          for (long j = 0; j < got; ++j) {
            float v = src[j] * 32768.0f;
            long q = lrintf(v);
            if (q > 32767) q = 32767;
            if (q < -32768) q = -32768;
            row[j] = (int16_t)q;
          }
        }
        fclose(w.f);
      }

      if (got < 0) {
        lens[i] = 0;
        srs[i] = 0;
        errors.fetch_add(1);
      } else {
        lens[i] = (int)got;
        srs[i] = sr;
      }
    }
  };

  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads - 1; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
  return -errors.load();
}

}  // extern "C"
