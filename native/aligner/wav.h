// Minimal RIFF/WAVE PCM reader (16-bit mono/stereo).
//
// The aligner's native replacement for the Kaldi feature pipeline's wav
// ingestion (the reference reaches Kaldi through kalpy;
// SURVEY.md §2.6). No external dependencies.
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace efs2 {

struct Wave {
  int sample_rate = 0;
  std::vector<float> samples;  // mono, [-1, 1]
};

// Returns false on malformed/unsupported files.
bool ReadWav(const std::string& path, Wave* out);

}  // namespace efs2
