// Native runtime components for pota_tpu: sample-stream IO + EXR scanline IO.
//
// The reference's runtime is a C++ Arnold plugin; its offline replay path
// reads dumped render samples from text (zpelgrims/pota
// src/cuda_prototype/lentil_thin_lens_bokeh_cuda.cu:285-295 reading
// tests/cuda/sampledata.txt).  This library provides the TPU build's native
// equivalents:
//
//  * a binary sample-stream format (the golden-replay fixture: capture a
//    render's per-sample AOV stream once, re-splat offline, diff images)
//  * uncompressed float32 scanline EXR write/read (drivers/imagers IO)
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (pota_tpu/native/__init__.py); a pure-python fallback exists for both.
//
// Build: cc -O3 -shared -fPIC potanative.cpp -o libpotanative.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr uint32_t kStreamMagic = 0x41544F50;  // "POTA"
constexpr uint32_t kStreamVersion = 1;

#pragma pack(push, 1)
struct StreamHeader {
  uint32_t magic;
  uint32_t version;
  uint64_t n_samples;
  uint32_t n_fields;   // floats per sample
  uint32_t reserved;
};
#pragma pack(pop)

}  // namespace

extern "C" {

// ---------------------------------------------------------------- streams --

// Write a sample stream: data is [n_samples, n_fields] row-major float32.
int pota_stream_write(const char* path, const float* data, uint64_t n_samples,
                      uint32_t n_fields) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  StreamHeader h{kStreamMagic, kStreamVersion, n_samples, n_fields, 0};
  if (fwrite(&h, sizeof(h), 1, f) != 1) { fclose(f); return -2; }
  const uint64_t total = n_samples * n_fields;
  if (fwrite(data, sizeof(float), total, f) != total) { fclose(f); return -3; }
  fclose(f);
  return 0;
}

// Query sizes; returns 0 on success.
int pota_stream_info(const char* path, uint64_t* n_samples, uint32_t* n_fields) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  StreamHeader h;
  if (fread(&h, sizeof(h), 1, f) != 1 || h.magic != kStreamMagic) {
    fclose(f);
    return -2;
  }
  *n_samples = h.n_samples;
  *n_fields = h.n_fields;
  fclose(f);
  return 0;
}

// Read into a caller-allocated buffer of n_samples*n_fields floats.
int pota_stream_read(const char* path, float* out, uint64_t capacity_floats) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  StreamHeader h;
  if (fread(&h, sizeof(h), 1, f) != 1 || h.magic != kStreamMagic) {
    fclose(f);
    return -2;
  }
  const uint64_t total = h.n_samples * h.n_fields;
  if (total > capacity_floats) { fclose(f); return -3; }
  if (fread(out, sizeof(float), total, f) != total) { fclose(f); return -4; }
  fclose(f);
  return 0;
}

// Parse whitespace-separated float text dumps (the reference's
// sampledata.txt shape) into a float buffer. Returns count parsed, or -1.
int64_t pota_stream_parse_text(const char* path, float* out,
                               uint64_t capacity_floats) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint64_t n = 0;
  while (n < capacity_floats) {
    float v;
    int got = fscanf(f, "%f", &v);
    if (got != 1) break;
    out[n++] = v;
  }
  fclose(f);
  return static_cast<int64_t>(n);
}

// -------------------------------------------------------------------- exr --

namespace {

void put_attr(std::string& s, const char* name, const char* type,
              const void* data, int32_t size) {
  s.append(name);
  s.push_back('\0');
  s.append(type);
  s.push_back('\0');
  s.append(reinterpret_cast<const char*>(&size), 4);
  s.append(reinterpret_cast<const char*>(data), size);
}

}  // namespace

// Write an uncompressed float32 scanline EXR.
// channel_names: concatenated NUL-separated names (already sorted!),
// planes: [n_channels, h, w] row-major.
int pota_exr_write(const char* path, const char* channel_names,
                   uint32_t n_channels, const float* planes, uint32_t height,
                   uint32_t width) {
  std::vector<std::string> names;
  {
    const char* p = channel_names;
    for (uint32_t i = 0; i < n_channels; ++i) {
      names.emplace_back(p);
      p += names.back().size() + 1;
    }
  }

  std::string chlist;
  for (auto& n : names) {
    chlist.append(n);
    chlist.push_back('\0');
    int32_t v[4] = {2 /*FLOAT*/, 0, 1, 1};
    chlist.append(reinterpret_cast<const char*>(v), 16);
  }
  chlist.push_back('\0');

  int32_t box[4] = {0, 0, static_cast<int32_t>(width) - 1,
                    static_cast<int32_t>(height) - 1};
  uint8_t comp = 0, lineorder = 0;
  float par = 1.0f, swc[2] = {0.f, 0.f}, sww = 1.0f;

  std::string header;
  put_attr(header, "channels", "chlist", chlist.data(),
           static_cast<int32_t>(chlist.size()));
  put_attr(header, "compression", "compression", &comp, 1);
  put_attr(header, "dataWindow", "box2i", box, 16);
  put_attr(header, "displayWindow", "box2i", box, 16);
  put_attr(header, "lineOrder", "lineOrder", &lineorder, 1);
  put_attr(header, "pixelAspectRatio", "float", &par, 4);
  put_attr(header, "screenWindowCenter", "v2f", swc, 8);
  put_attr(header, "screenWindowWidth", "float", &sww, 4);
  header.push_back('\0');

  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  int32_t magic = 20000630, version = 2;
  fwrite(&magic, 4, 1, f);
  fwrite(&version, 4, 1, f);
  fwrite(header.data(), 1, header.size(), f);

  const uint64_t scan_bytes = 4ull * width * n_channels;
  const uint64_t table_pos = 8 + header.size();
  const uint64_t data_start = table_pos + 8ull * height;
  for (uint32_t y = 0; y < height; ++y) {
    uint64_t off = data_start + y * (8 + scan_bytes);
    fwrite(&off, 8, 1, f);
  }
  std::vector<float> row(width * n_channels);
  for (uint32_t y = 0; y < height; ++y) {
    int32_t yy = static_cast<int32_t>(y);
    int32_t nb = static_cast<int32_t>(scan_bytes);
    fwrite(&yy, 4, 1, f);
    fwrite(&nb, 4, 1, f);
    for (uint32_t c = 0; c < n_channels; ++c) {
      memcpy(row.data() + c * width,
             planes + (static_cast<uint64_t>(c) * height + y) * width,
             4ull * width);
    }
    fwrite(row.data(), 4, width * n_channels, f);
  }
  fclose(f);
  return 0;
}

}  // extern "C"
