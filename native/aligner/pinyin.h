// Pinyin syllable → MFA phoneme decomposition (C++ mirror of the Python
// front-end rules in expressive_fastspeech2_mandarin_tpu/text/pinyin.py,
// which reproduce reference: synthesize_chinese_pinyin.py:34-104).
#pragma once

#include <string>
#include <vector>

namespace efs2 {

std::vector<std::string> PinyinToPhonemes(const std::string& syllable);

// Space-separated pinyin transcript → flat phoneme list.
std::vector<std::string> TranscriptToPhonemes(const std::string& text);

}  // namespace efs2
