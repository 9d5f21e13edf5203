// ttsdata — native data-loading runtime for mamba_tts_tpu.
//
// Replaces the roles the reference delegates to torchaudio/libsndfile/soxr C
// paths (reference: dataset.py:69-80, data_utils/audio_encoder.py:188-216):
//   - tar / tar.gz archive indexing and member extraction (zlib)
//   - RIFF WAV decoding (PCM16/PCM24/PCM32/float32, any channel count)
//   - windowed-sinc polyphase resampling to the target rate
//   - multi-threaded batch loading
//
// Exposed as a C ABI consumed via ctypes (mamba_tts_tpu/data/native.py).
// Build: make -C native   (g++ -O3 -shared -fPIC, links zlib + pthread)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

// ----------------------------------------------------------------- WAV decode

struct Wav {
  std::vector<float> samples;  // mono
  int sample_rate = 0;
};

static uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
static uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

// Decode a RIFF WAV byte buffer to mono float32. Returns false on parse error.
static bool decode_wav(const uint8_t* data, size_t n, Wav* out) {
  if (n < 44 || memcmp(data, "RIFF", 4) != 0 || memcmp(data + 8, "WAVE", 4) != 0)
    return false;
  size_t pos = 12;
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  const uint8_t* pcm = nullptr;
  size_t pcm_len = 0;
  while (pos + 8 <= n) {
    const uint8_t* hdr = data + pos;
    uint32_t chunk_len = rd_u32(hdr + 4);
    const uint8_t* body = hdr + 8;
    if (pos + 8 + chunk_len > n) chunk_len = (uint32_t)(n - pos - 8);
    if (memcmp(hdr, "fmt ", 4) == 0 && chunk_len >= 16) {
      fmt = rd_u16(body);
      channels = rd_u16(body + 2);
      rate = rd_u32(body + 4);
      bits = rd_u16(body + 14);
    } else if (memcmp(hdr, "data", 4) == 0) {
      pcm = body;
      pcm_len = chunk_len;
    }
    pos += 8 + chunk_len + (chunk_len & 1);
  }
  if (!pcm || channels == 0 || rate == 0) return false;
  if (fmt == 0xFFFE) fmt = 1;  // extensible: assume PCM layout read above

  size_t bytes_per = bits / 8;
  if (bytes_per == 0) return false;
  size_t frames = pcm_len / (bytes_per * channels);
  out->sample_rate = (int)rate;
  out->samples.resize(frames);
  const float inv_ch = 1.0f / (float)channels;
  for (size_t i = 0; i < frames; i++) {
    float acc = 0.f;
    for (int c = 0; c < channels; c++) {
      const uint8_t* s = pcm + (i * channels + c) * bytes_per;
      float v = 0.f;
      if (fmt == 3 && bits == 32) {  // IEEE float
        float f;
        memcpy(&f, s, 4);
        v = f;
      } else if (bits == 16) {
        int16_t x = (int16_t)rd_u16(s);
        v = (float)x / 32768.0f;
      } else if (bits == 32) {
        int32_t x = (int32_t)rd_u32(s);
        v = (float)x / 2147483648.0f;
      } else if (bits == 24) {
        int32_t x = (int32_t)((uint32_t)s[0] << 8 | (uint32_t)s[1] << 16 |
                              (uint32_t)s[2] << 24) >> 8;
        v = (float)x / 8388608.0f;
      } else if (bits == 8) {
        v = ((float)s[0] - 128.0f) / 128.0f;
      } else {
        return false;
      }
      acc += v;
    }
    out->samples[i] = acc * inv_ch;
  }
  return true;
}

// ------------------------------------------------------------ resampler

static double sinc(double x) {
  if (std::abs(x) < 1e-9) return 1.0;
  double px = M_PI * x;
  return std::sin(px) / px;
}

static double bessel_i0(double x) {
  // series expansion; converges fast for the beta range we use
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 64; k++) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-12 * sum) break;
  }
  return sum;
}

// Rational polyphase resampler (Kaiser-windowed sinc), matching the role of
// scipy.signal.resample_poly / soxr.
static std::vector<float> resample(const std::vector<float>& in, int sr_in,
                                   int sr_out) {
  if (sr_in == sr_out || in.empty()) return in;
  int g = 1;
  {
    int a = sr_in, b = sr_out;
    while (b) { int t = a % b; a = b; b = t; }
    g = a;
  }
  const int up = sr_out / g, down = sr_in / g;
  const int taps_per_phase = 24;
  const int half = taps_per_phase / 2;
  const double cutoff = 0.5 / std::max(up, down);  // normalized to up-rate
  const double beta = 8.6;
  const double i0b = bessel_i0(beta);

  // filter h[k] over k in [-half*up, half*up)
  const int flen = 2 * half * up;
  std::vector<double> h(flen);
  for (int k = 0; k < flen; k++) {
    double t = (double)(k - half * up);
    double w_arg = t / (double)(half * up);
    double kaiser =
        bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - w_arg * w_arg))) / i0b;
    h[k] = 2.0 * cutoff * (double)up * sinc(2.0 * cutoff * t) * kaiser;
  }

  const long n_out = (long)((int64_t)in.size() * up / down);
  std::vector<float> out((size_t)n_out);
  for (long i = 0; i < n_out; i++) {
    // output sample i taps input around position (i*down)/up
    int64_t num = (int64_t)i * down;
    long center = (long)(num / up);
    int phase = (int)(num % up);
    double acc = 0.0;
    // h index: k = (j_in offset)*up + phase alignment
    for (int t = -half; t < half; t++) {
      long j = center + t;
      if (j < 0 || j >= (long)in.size()) continue;
      long k = (long)(t + half) * up + (up - phase) % up;
      if (k < 0 || k >= flen) continue;
      acc += (double)in[(size_t)j] * h[(size_t)k];
    }
    out[(size_t)i] = (float)acc;
  }
  return out;
}

// ------------------------------------------------------------ tar index

struct Member {
  std::string name;
  uint64_t offset;  // offset of file DATA in the (decompressed) stream
  uint64_t size;
};

struct TarIndex {
  std::string path;
  bool gz = false;
  std::vector<Member> members;
  std::map<std::string, int> by_name;
  std::mutex io_mu;
};

static uint64_t parse_octal(const char* p, size_t n) {
  uint64_t v = 0;
  for (size_t i = 0; i < n && p[i]; i++) {
    if (p[i] < '0' || p[i] > '7') continue;
    v = v * 8 + (uint64_t)(p[i] - '0');
  }
  return v;
}

static bool build_index(TarIndex* idx) {
  gzFile f = gzopen(idx->path.c_str(), "rb");
  if (!f) return false;
  char hdr[512];
  uint64_t off = 0;
  std::string long_name;
  while (true) {
    int n = gzread(f, hdr, 512);
    if (n < 512) break;
    off += 512;
    if (hdr[0] == 0) break;  // end-of-archive zero block
    uint64_t size = parse_octal(hdr + 124, 12);
    char type = hdr[156];
    std::string name(hdr, strnlen(hdr, 100));
    if (type == 'L') {  // GNU long name
      std::vector<char> buf((size + 511) & ~511ull);
      gzread(f, buf.data(), (unsigned)buf.size());
      off += buf.size();
      long_name.assign(buf.data(), size ? size - 1 : 0);
      continue;
    }
    if (!long_name.empty()) {
      name = long_name;
      long_name.clear();
    }
    if ((type == '0' || type == 0) && size > 0) {
      idx->by_name[name] = (int)idx->members.size();
      idx->members.push_back({name, off, size});
    }
    uint64_t skip = (size + 511) & ~511ull;
    // gzseek forward
    if (skip) gzseek(f, (z_off_t)(off + skip), SEEK_SET);
    off += skip;
  }
  gzclose(f);
  return true;
}

static bool read_member(TarIndex* idx, int i, std::vector<uint8_t>* out) {
  if (i < 0 || i >= (int)idx->members.size()) return false;
  std::lock_guard<std::mutex> lock(idx->io_mu);
  gzFile f = gzopen(idx->path.c_str(), "rb");
  if (!f) return false;
  const Member& m = idx->members[(size_t)i];
  out->resize(m.size);
  bool ok = gzseek(f, (z_off_t)m.offset, SEEK_SET) >= 0 &&
            gzread(f, out->data(), (unsigned)m.size) == (int)m.size;
  gzclose(f);
  return ok;
}

}  // namespace

// ================================================================== C ABI

extern "C" {

void* tts_tar_open(const char* path) {
  auto* idx = new TarIndex();
  idx->path = path;
  if (!build_index(idx)) {
    delete idx;
    return nullptr;
  }
  return idx;
}

int tts_tar_count(void* h) { return (int)((TarIndex*)h)->members.size(); }

int tts_tar_find(void* h, const char* name) {
  auto* idx = (TarIndex*)h;
  auto it = idx->by_name.find(name);
  return it == idx->by_name.end() ? -1 : it->second;
}

// Copies the i-th member name into buf (truncated to buf_len-1). Returns len.
int tts_tar_name(void* h, int i, char* buf, int buf_len) {
  auto* idx = (TarIndex*)h;
  if (i < 0 || i >= (int)idx->members.size()) return -1;
  const std::string& s = idx->members[(size_t)i].name;
  int n = (int)std::min((size_t)(buf_len - 1), s.size());
  memcpy(buf, s.data(), (size_t)n);
  buf[n] = 0;
  return (int)s.size();
}

void tts_tar_close(void* h) { delete (TarIndex*)h; }

// Decode WAV bytes -> mono float32 at target_sr. Returns sample count
// (malloc'd into *out) or -1.
long tts_decode_wav(const uint8_t* bytes, long n, int target_sr, float** out) {
  Wav w;
  if (!decode_wav(bytes, (size_t)n, &w)) return -1;
  std::vector<float> res =
      (target_sr > 0) ? resample(w.samples, w.sample_rate, target_sr)
                      : std::move(w.samples);
  *out = (float*)malloc(res.size() * sizeof(float));
  memcpy(*out, res.data(), res.size() * sizeof(float));
  return (long)res.size();
}

// Read member i and decode. Returns sample count or -1.
long tts_tar_read_wav(void* h, int i, int target_sr, float** out) {
  std::vector<uint8_t> bytes;
  if (!read_member((TarIndex*)h, i, &bytes)) return -1;
  return tts_decode_wav(bytes.data(), (long)bytes.size(), target_sr, out);
}

// Batch: decode many members in parallel threads. lengths[i] receives the
// sample count (or -1); buffers[i] the malloc'd data.
void tts_tar_read_batch(void* h, const int* ids, int count, int target_sr,
                        int n_threads, float** buffers, long* lengths) {
  auto* idx = (TarIndex*)h;
  std::vector<std::thread> pool;
  std::mutex next_mu;
  int next = 0;
  auto worker = [&]() {
    while (true) {
      int i;
      {
        std::lock_guard<std::mutex> lk(next_mu);
        if (next >= count) return;
        i = next++;
      }
      lengths[i] = tts_tar_read_wav(idx, ids[i], target_sr, &buffers[i]);
    }
  };
  int nt = std::max(1, std::min(n_threads, count));
  for (int t = 0; t < nt; t++) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

void tts_free(float* p) { free(p); }

}  // extern "C"
