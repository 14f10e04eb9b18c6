// Native audio ingest for the TPU-native edge-diffusion-tts framework.
//
// Hot host-side path of the data pipeline: WAV decode -> polyphase resample
// -> random crop/pad -> clamp, over a batch, in parallel worker threads —
// the C++ counterpart of data/collate.py (which remains the pure-python
// fallback).  The resampler consumes the SAME windowed-sinc kernel bank the
// JAX/numpy paths build (ops/resample.py::_sinc_kernel), so all three
// implementations agree bit-for-bit in float32.
//
// Exposed as a C ABI consumed via ctypes (data/native.py).  Build:
//   g++ -O3 -march=native -shared -fPIC -o libedtaudio.so wavio.cpp -lpthread

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

#pragma pack(push, 1)
struct RiffHeader {
  char riff[4];
  uint32_t size;
  char wave[4];
};
struct ChunkHeader {
  char id[4];
  uint32_t size;
};
struct FmtChunk {
  uint16_t format;
  uint16_t channels;
  uint32_t sample_rate;
  uint32_t byte_rate;
  uint16_t block_align;
  uint16_t bits;
};
#pragma pack(pop)

// Decode a PCM16/PCM32/float32 WAV to float32 mono in [-1, 1].
// Returns 0 on success; *out is malloc'd (caller frees via edt_free).
// Errors: -1 open, -2 not RIFF/WAVE, -3 missing fmt/data, -4 unsupported
// encoding, -5 truncated/corrupt chunk sizes, -6 allocation failure.
int read_wav_impl(const char* path, float** out, int64_t* out_len, int* out_sr) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  // Total file size: header chunk sizes are untrusted input — a truncated
  // or corrupt size must become an error, not silent zeros or a bad_alloc
  // from resize(0xFFFFFFFF).
  fseek(f, 0, SEEK_END);
  const int64_t fsize = ftell(f);
  fseek(f, 0, SEEK_SET);

  RiffHeader rh;
  if (fread(&rh, sizeof(rh), 1, f) != 1 || memcmp(rh.riff, "RIFF", 4) != 0 ||
      memcmp(rh.wave, "WAVE", 4) != 0) {
    fclose(f);
    return -2;
  }

  FmtChunk fmt{};
  bool have_fmt = false;
  std::vector<uint8_t> data;
  ChunkHeader ch;
  while (fread(&ch, sizeof(ch), 1, f) == 1) {
    const int64_t remaining = fsize - ftell(f);
    if (static_cast<int64_t>(ch.size) > remaining) {
      fclose(f);
      return -5;
    }
    if (memcmp(ch.id, "fmt ", 4) == 0) {
      uint32_t n = ch.size < sizeof(fmt) ? ch.size : sizeof(fmt);
      if (fread(&fmt, n, 1, f) != 1) break;
      // Skip any fmt extension plus the RIFF odd-size pad byte, or every
      // following chunk header is read one byte off.
      uint32_t skip = ch.size - n + (ch.size & 1);
      if (skip) fseek(f, skip, SEEK_CUR);
      have_fmt = true;
    } else if (memcmp(ch.id, "data", 4) == 0) {
      data.resize(ch.size);
      if (ch.size && fread(data.data(), 1, ch.size, f) != ch.size) {
        fclose(f);
        return -5;  // truncated data chunk must not decode as silence
      }
      if (ch.size & 1) fseek(f, 1, SEEK_CUR);
    } else {
      fseek(f, ch.size + (ch.size & 1), SEEK_CUR);
    }
  }
  fclose(f);
  if (!have_fmt || data.empty()) return -3;

  const int ch_n = fmt.channels ? fmt.channels : 1;
  int64_t frames = 0;
  std::vector<float> mono;

  if (fmt.format == 1 && fmt.bits == 16) {
    const int16_t* s = reinterpret_cast<const int16_t*>(data.data());
    frames = static_cast<int64_t>(data.size()) / (2 * ch_n);
    mono.resize(frames);
    for (int64_t i = 0; i < frames; ++i) {
      float acc = 0.f;
      for (int c = 0; c < ch_n; ++c) acc += s[i * ch_n + c] / 32768.f;
      mono[i] = acc / ch_n;
    }
  } else if (fmt.format == 1 && fmt.bits == 32) {
    const int32_t* s = reinterpret_cast<const int32_t*>(data.data());
    frames = static_cast<int64_t>(data.size()) / (4 * ch_n);
    mono.resize(frames);
    for (int64_t i = 0; i < frames; ++i) {
      float acc = 0.f;
      for (int c = 0; c < ch_n; ++c) acc += s[i * ch_n + c] / 2147483648.f;
      mono[i] = acc / ch_n;
    }
  } else if (fmt.format == 3 && fmt.bits == 32) {
    const float* s = reinterpret_cast<const float*>(data.data());
    frames = static_cast<int64_t>(data.size()) / (4 * ch_n);
    mono.resize(frames);
    for (int64_t i = 0; i < frames; ++i) {
      float acc = 0.f;
      for (int c = 0; c < ch_n; ++c) acc += s[i * ch_n + c];
      mono[i] = acc / ch_n;
    }
  } else {
    return -4;  // unsupported encoding
  }

  *out = static_cast<float*>(malloc(sizeof(float) * frames));
  if (!*out) return -6;
  memcpy(*out, mono.data(), sizeof(float) * frames);
  *out_len = frames;
  *out_sr = static_cast<int>(fmt.sample_rate);
  return 0;
}

// Polyphase resample with a host-provided kernel bank.
// kernel: [new_g, kw] row-major; left pad `width`, right pad `width + orig_g`
// (identical to ops/resample.py).  Output length ceil(new_g * n / orig_g).
void resample_impl(const float* in, int64_t n, const float* kernel, int kw,
                   int orig_g, int new_g, int width, std::vector<float>* out) {
  const int64_t padded = n + width + width + orig_g;
  std::vector<float> buf(padded, 0.f);
  memcpy(buf.data() + width, in, sizeof(float) * n);

  const int64_t blocks = (padded - kw) / orig_g + 1;
  const int64_t target = (new_g * n + orig_g - 1) / orig_g;
  out->assign(blocks * new_g, 0.f);
  for (int64_t b = 0; b < blocks; ++b) {
    const float* seg = buf.data() + b * orig_g;
    for (int p = 0; p < new_g; ++p) {
      const float* k = kernel + static_cast<int64_t>(p) * kw;
      float acc = 0.f;
      for (int i = 0; i < kw; ++i) acc += seg[i] * k[i];
      (*out)[b * new_g + p] = acc;
    }
  }
  out->resize(target < static_cast<int64_t>(out->size()) ? target : out->size());
}

// splitmix64 — deterministic per-(seed, item) crop offsets.
uint64_t splitmix64(uint64_t x) {
  x += 0x9E3779B97f4A7C15ull;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ull;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBull;
  return x ^ (x >> 31);
}

}  // namespace

extern "C" {

int edt_read_wav(const char* path, float** out, int64_t* out_len, int* out_sr) {
  return read_wav_impl(path, out, out_len, out_sr);
}

void edt_free(float* p) { free(p); }

// Batch collate: for each path, decode -> (resample if sr != target_sr,
// using the provided kernel bank, which is valid ONLY for kernel_sr-rate
// input — a file at any other rate is an error, never a wrong-ratio
// resample) -> crop at a seeded random offset (or 0 when deterministic) ->
// zero-pad -> clamp [-1, 1] -> write out[b].
// Parallel over batch items with up to `threads` workers.
// Returns 0, or the 1-based index of the first failing item, negated.
int edt_collate(const char** paths, int n, int64_t seg_len, int target_sr,
                const float* kernel, int kw, int orig_g, int new_g, int width,
                int kernel_sr, uint64_t seed, int deterministic, int threads,
                float* out) {
  std::atomic<int> err{0};
  std::atomic<int> next{0};
  if (threads < 1) threads = 1;

  auto worker = [&]() {
    try {
      for (;;) {
        const int b = next.fetch_add(1);
        if (b >= n || err.load()) return;

        float* raw = nullptr;
        int64_t len = 0;
        int sr = 0;
        if (read_wav_impl(paths[b], &raw, &len, &sr) != 0) {
          err.store(-(b + 1));
          return;
        }
        std::vector<float> wav;
        if (sr != target_sr) {
          if (kernel == nullptr || sr != kernel_sr) {
            // The polyphase kernel encodes a FIXED source rate; silently
            // applying it to a different-rate file would pitch-shift the
            // audio with no error.
            free(raw);
            err.store(-(b + 1));
            return;
          }
          resample_impl(raw, len, kernel, kw, orig_g, new_g, width, &wav);
        } else {
          wav.assign(raw, raw + len);
        }
        free(raw);

        const int64_t m = static_cast<int64_t>(wav.size());
        int64_t start = 0;
        if (!deterministic && m > seg_len) {
          start = static_cast<int64_t>(
              splitmix64(seed * 0x100000001b3ull + b) %
              static_cast<uint64_t>(m - seg_len + 1));
        }
        float* dst = out + static_cast<int64_t>(b) * seg_len;
        const int64_t count = m - start < seg_len ? m - start : seg_len;
        for (int64_t i = 0; i < count; ++i) {
          float v = wav[start + i];
          dst[i] = v < -1.f ? -1.f : (v > 1.f ? 1.f : v);
        }
        for (int64_t i = count; i < seg_len; ++i) dst[i] = 0.f;
      }
    } catch (...) {
      // An exception on a worker thread (e.g. bad_alloc) would otherwise
      // std::terminate the whole process; report it as an item failure.
      err.store(-n);
    }
  };

  std::vector<std::thread> pool;
  const int nt = threads < n ? threads : n;
  pool.reserve(nt);
  for (int i = 0; i < nt; ++i) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return err.load();
}

}  // extern "C"
