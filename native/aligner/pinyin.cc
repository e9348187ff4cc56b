#include "pinyin.h"

#include <algorithm>
#include <cctype>
#include <map>
#include <sstream>

namespace efs2 {

namespace {
const char* kInitials2[] = {"zh", "ch", "sh"};
const char* kInitials1[] = {"b", "p", "m", "f", "d", "t", "n", "l",
                            "g", "k", "h", "j", "q", "x", "r", "z",
                            "c", "s", "y", "w"};

const std::map<std::string, std::string>& Finals() {
  static const std::map<std::string, std::string> m = {
      {"a", "a"},     {"o", "o"},      {"e", "e"},     {"i", "i"},
      {"u", "u"},     {"v", "y"},      {"ai", "ai"},   {"ei", "ei"},
      {"ui", "ui"},   {"ao", "ao"},    {"ou", "ou"},   {"iu", "iu"},
      {"ie", "ie"},   {"ue", "ue"},    {"ve", "ue"},   {"an", "a n"},
      {"en", "e n"},  {"in", "i n"},   {"un", "u n"},  {"vn", "y n"},
      {"ang", "a ng"}, {"eng", "e ng"}, {"ing", "i ng"}, {"ong", "o ng"},
      {"er", "er"},   {"iao", "iao"},  {"ian", "ia n"}, {"iang", "ia ng"},
      {"iong", "io ng"}, {"uai", "uai"}, {"uan", "ua n"}, {"uang", "ua ng"},
  };
  return m;
}

void AppendSplit(const std::string& s, std::vector<std::string>* out) {
  std::istringstream iss(s);
  std::string tok;
  while (iss >> tok) out->push_back(tok);
}
}  // namespace

std::vector<std::string> PinyinToPhonemes(const std::string& raw) {
  std::string syl;
  for (char c : raw)
    if (!std::isdigit(static_cast<unsigned char>(c)))
      syl += char(std::tolower(static_cast<unsigned char>(c)));
  std::vector<std::string> out;
  if (syl.empty()) return out;

  std::string initial, final = syl;
  for (const char* in2 : kInitials2) {
    if (syl.rfind(in2, 0) == 0) {
      initial = in2;
      final = syl.substr(initial.size());
      break;
    }
  }
  if (initial.empty()) {
    for (const char* in1 : kInitials1) {
      if (syl.rfind(in1, 0) == 0) {
        initial = in1;
        final = syl.substr(initial.size());
        break;
      }
    }
  }
  if (!initial.empty()) out.push_back(initial);
  if (!final.empty()) {
    auto it = Finals().find(final);
    if (it != Finals().end()) {
      AppendSplit(it->second, &out);
    } else {
      for (char c : final) {
        std::string ch(1, c);
        auto jt = Finals().find(ch);
        if (jt != Finals().end())
          AppendSplit(jt->second, &out);
        else
          out.push_back(ch);
      }
    }
  }
  return out;
}

std::vector<std::string> TranscriptToPhonemes(const std::string& text) {
  std::istringstream iss(text);
  std::string syl;
  std::vector<std::string> out;
  while (iss >> syl) {
    auto ph = PinyinToPhonemes(syl);
    out.insert(out.end(), ph.begin(), ph.end());
  }
  return out;
}

}  // namespace efs2
