#include "wav.h"

#include <cstdio>
#include <cstring>

namespace efs2 {

namespace {
uint32_t ReadU32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}
uint16_t ReadU16(const uint8_t* p) { return p[0] | (p[1] << 8); }
}  // namespace

bool ReadWav(const std::string& path, Wave* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  uint8_t hdr[12];
  if (std::fread(hdr, 1, 12, f) != 12 || std::memcmp(hdr, "RIFF", 4) != 0 ||
      std::memcmp(hdr + 8, "WAVE", 4) != 0) {
    std::fclose(f);
    return false;
  }
  int channels = 0, bits = 0;
  out->sample_rate = 0;
  out->samples.clear();
  uint8_t chunk[8];
  while (std::fread(chunk, 1, 8, f) == 8) {
    uint32_t size = ReadU32(chunk + 4);
    if (std::memcmp(chunk, "fmt ", 4) == 0) {
      std::vector<uint8_t> fmt(size);
      if (std::fread(fmt.data(), 1, size, f) != size) break;
      uint16_t audio_format = ReadU16(fmt.data());
      channels = ReadU16(fmt.data() + 2);
      out->sample_rate = ReadU32(fmt.data() + 4);
      bits = ReadU16(fmt.data() + 14);
      if (audio_format != 1 || bits != 16) {  // PCM16 only
        std::fclose(f);
        return false;
      }
    } else if (std::memcmp(chunk, "data", 4) == 0) {
      std::vector<int16_t> raw(size / 2);
      size_t got = std::fread(raw.data(), 2, raw.size(), f);
      raw.resize(got);
      if (channels <= 0) channels = 1;
      size_t frames = raw.size() / channels;
      out->samples.resize(frames);
      for (size_t i = 0; i < frames; ++i) {
        int32_t acc = 0;
        for (int c = 0; c < channels; ++c) acc += raw[i * channels + c];
        out->samples[i] = float(acc) / channels / 32768.0f;
      }
      std::fclose(f);
      return out->sample_rate > 0 && !out->samples.empty();
    } else {
      std::fseek(f, long(size + (size & 1)), SEEK_CUR);
    }
  }
  std::fclose(f);
  return false;
}

}  // namespace efs2
