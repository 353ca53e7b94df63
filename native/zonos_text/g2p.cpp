// zonos_text: host-side native text frontend — English grapheme→phoneme.
//
// Role: the reference stack leans on the eSpeak NG C library for G2P
// (reference zonos/conditioning.py:291-335, installed natively per
// 1_Install.ps1:78-90). On TPU-VM hosts without espeak this library supplies
// a native fallback: a letter-to-sound rule engine in the style of the
// public-domain NRL algorithm (Elovitz et al., NRL Report 7948, 1976),
// emitting IPA symbols compatible with the model's phoneme table
// (conditioning.py:227-236).
//
// C ABI (ctypes-friendly):
//   const char* ztx_phonemize(const char* utf8_text);  // malloc'd UTF-8
//   void        ztx_free(const char* p);
//   int         ztx_version();
//
// Build: g++ -O2 -fPIC -shared g2p.cpp -o libzonos_text.so

#include <cctype>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

// A rule: left-context [match] right-context -> output (IPA).
// Context special symbols (NRL conventions):
//   '#' one or more vowels    '*' zero or more vowels (our extension)
//   '^' one consonant         ':' zero or more consonants
//   '.' a voiced consonant (b d g j l m n r v w z)
//   '%' suffix: e(r|s|d) / ing / ely
//   '&' a sibilant (s c g z x j ch sh)
//   '@' t s r d l z n j th ch sh preceding long u
//   ' ' word boundary
struct Rule {
  const char* left;
  const char* match;
  const char* right;
  const char* out;  // IPA UTF-8
};

bool isvowel(char c) { return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'||c=='y'; }
bool iscons(char c)  { return c>='a'&&c<='z'&&!isvowel(c); }
bool isvoiced(char c){ return strchr("bdgjlmnrvwz", c) != nullptr; }
bool issib(char c)   { return strchr("scgzxj", c) != nullptr; }

// Rules are matched in order; first match wins. Match key is the first
// character of `match` — rules are grouped per letter for speed.
static const Rule kRules[] = {
  // --- punctuation / digits pass through (handled outside) ---
  // --- A ---
  {" ", "are", " ", "ɑːɹ"}, {" ", "ar", "o", "əɹ"}, {"", "ar", "#", "ɛɹ"},
  {"^", "as", "#", "eɪs"}, {"", "aw", "", "ɔː"}, {" :", "any", "", "ɛni"},
  {"", "a", "^+#", "eɪ"}, {"#:", "ally", "", "əli"}, {" ", "al", "#", "əl"},
  {"", "again", "", "əɡɛn"}, {"#:", "ag", "e", "ɪdʒ"},
  {"", "a", "^+:#", "æ"}, {" :", "a", "^+ ", "eɪ"},
  {" ", "arr", "", "əɹ"}, {"", "arr", "", "æɹ"}, {" :", "ar", " ", "ɑːɹ"},
  {"", "ar", " ", "əɹ"}, {"", "ar", "", "ɑːɹ"}, {"", "air", "", "ɛɹ"},
  {"", "ai", "", "eɪ"}, {"", "ay", "", "eɪ"}, {"", "au", "", "ɔː"},
  {"#:", "al", " ", "əl"}, {"#:", "als", " ", "əlz"}, {"", "alk", "", "ɔːk"},
  {"", "al", "^", "ɔːl"}, {" :", "able", "", "eɪbəl"}, {"", "able", "", "əbəl"},
  {"", "ang", "+", "eɪndʒ"}, {"", "a", "", "æ"},
  // --- B ---
  {" ", "be", "^#", "bɪ"}, {"", "being", "", "biːɪŋ"}, {" ", "both", " ", "boʊθ"},
  {" ", "bus", "#", "bɪz"}, {"", "buil", "", "bɪl"}, {"", "b", "", "b"},
  // --- C ---
  {" ", "ch", "^", "k"}, {"^e", "ch", "", "k"}, {"", "ch", "", "tʃ"},
  {" s", "ci", "#", "saɪ"}, {"", "ci", "a", "ʃ"}, {"", "ci", "o", "ʃ"},
  {"", "ci", "en", "ʃ"}, {"", "c", "+", "s"}, {"", "ck", "", "k"},
  {"", "com", "%", "kʌm"}, {"", "c", "", "k"},
  // --- D ---
  {"#:", "ded", " ", "dɪd"}, {".e", "d", " ", "d"}, {"#:^e", "d", " ", "t"},
  {" ", "de", "^#", "dɪ"}, {" ", "do", " ", "duː"}, {" ", "does", "", "dʌz"},
  {" ", "doing", "", "duːɪŋ"}, {" ", "dow", "", "daʊ"}, {"", "du", "a", "dʒuː"},
  {"", "d", "", "d"},
  // --- E ---
  {"#:", "e", " ", ""}, {"':^", "e", " ", ""}, {" :", "e", " ", "iː"},
  {"#", "ed", " ", "d"}, {"#:", "e", "d ", ""}, {"", "ev", "er", "ɛv"},
  {"", "e", "^%", "iː"}, {"", "eri", "#", "iːɹi"}, {"", "eri", "", "ɛɹɪ"},
  {"#:", "er", "#", "ɚ"}, {"", "er", "#", "ɛɹ"}, {"", "er", "", "ɚ"},
  {" ", "even", "", "iːvɛn"}, {"#:", "e", "w", ""}, {"@", "ew", "", "uː"},
  {"", "ew", "", "juː"}, {"", "e", "o", "iː"}, {"#:&", "es", " ", "ɪz"},
  {"#:", "e", "s ", ""}, {"#:", "ely", " ", "li"}, {"#:", "ement", "", "mənt"},
  {"", "eful", "", "fʊl"}, {"", "ee", "", "iː"}, {"", "earn", "", "ɝːn"},
  {" ", "ear", "^", "ɝː"}, {"", "ead", "", "ɛd"}, {"#:", "ea", " ", "iːə"},
  {"", "ea", "su", "ɛ"}, {"", "ea", "", "iː"}, {"", "eigh", "", "eɪ"},
  {"", "ei", "", "iː"}, {" ", "eye", "", "aɪ"}, {"", "ey", "", "i"},
  {"", "eu", "", "juː"}, {"", "e", "", "ɛ"},
  // --- F ---
  {"", "ful", "", "fʊl"}, {"", "f", "", "f"},
  // --- G ---
  {"", "giv", "", "ɡɪv"}, {" ", "g", "i^", "ɡ"}, {"", "ge", "t", "ɡɛ"},
  {"su", "gges", "", "ɡdʒɛs"}, {"", "gg", "", "ɡ"}, {" b#", "g", "", "ɡ"},
  {"", "g", "+", "dʒ"}, {"", "great", "", "ɡɹeɪt"}, {"#", "gh", "", ""},
  {"", "g", "", "ɡ"},
  // --- H ---
  {" ", "hav", "", "hæv"}, {" ", "here", "", "hɪɹ"}, {" ", "hour", "", "aʊɚ"},
  {"", "how", "", "haʊ"}, {"", "h", "#", "h"}, {"", "h", "", ""},
  // --- I ---
  {" ", "in", "", "ɪn"}, {" ", "i", " ", "aɪ"}, {"", "in", "d", "aɪn"},
  {"", "ier", "", "iɚ"}, {"#:r", "ied", "", "iːd"}, {"", "ied", " ", "aɪd"},
  {"", "ien", "", "iːɛn"}, {"", "ie", "t", "aɪɛ"}, {" :", "i", "%", "aɪ"},
  {"", "i", "%", "i"}, {"", "ie", "", "iː"}, {"", "i", "^+:#", "ɪ"},
  {"", "ir", "#", "aɪɹ"}, {"", "iz", "%", "aɪz"}, {"", "is", "%", "aɪz"},
  {"", "i", "d%", "aɪ"}, {"+^", "i", "^+", "ɪ"}, {"", "i", "t%", "aɪ"},
  {"#:^", "i", "^+", "ɪ"}, {"", "i", "^+", "aɪ"}, {"", "ir", "", "ɝː"},
  {"", "igh", "", "aɪ"}, {"", "ild", "", "aɪld"}, {"", "ign", " ", "aɪn"},
  {"", "ign", "^", "aɪn"}, {"", "ign", "%", "aɪn"}, {"", "ique", "", "iːk"},
  {"", "i", "", "ɪ"},
  // --- J ---
  {"", "j", "", "dʒ"},
  // --- K ---
  {" ", "k", "n", ""}, {"", "k", "", "k"},
  // --- L ---
  {"", "lo", "c#", "loʊ"}, {"l", "l", "", ""}, {"#:^", "l", "%", "əl"},
  {" ", "lead", "", "liːd"}, {"", "l", "", "l"},
  // --- M ---
  {"", "mov", "", "muːv"}, {"", "m", "", "m"},
  // --- N ---
  {"e", "ng", "+", "ndʒ"}, {"", "ng", "r", "ŋɡ"}, {"", "ng", "#", "ŋɡ"},
  {"", "ngl", "%", "ŋɡəl"}, {"", "ng", "", "ŋ"}, {"", "nk", "", "ŋk"},
  {" ", "now", " ", "naʊ"}, {"", "n", "", "n"},
  // --- O ---
  {"", "of", " ", "əv"}, {"", "orough", "", "ɝːoʊ"}, {"#:", "or", " ", "ɚ"},
  {"#:", "ors", " ", "ɚz"}, {"", "or", "", "ɔːɹ"}, {" ", "one", "", "wʌn"},
  {"", "ow", " ", "oʊ"}, {" ", "over", "", "oʊvɚ"}, {"", "ov", "", "ʌv"},
  {"", "o", "^%", "oʊ"}, {"", "o", "^en", "oʊ"}, {"", "o", "^i#", "oʊ"},
  {"", "ol", "d", "oʊl"}, {"", "ought", "", "ɔːt"}, {"", "ough", "", "ʌf"},
  {" ", "ou", "", "aʊ"}, {"h", "ou", "s#", "aʊ"}, {"", "ous", "", "əs"},
  {"", "our", "", "ɔːɹ"}, {"", "ould", "", "ʊd"}, {"^", "ou", "^l", "ʌ"},
  {"", "oup", "", "uːp"}, {"", "ou", "", "aʊ"}, {"", "oy", "", "ɔɪ"},
  {"", "oing", "", "oʊɪŋ"}, {"", "oi", "", "ɔɪ"}, {"", "oor", "", "ɔːɹ"},
  {"", "ook", "", "ʊk"}, {"", "ood", "", "ʊd"}, {"", "oo", "", "uː"},
  {"", "o", "e", "oʊ"}, {"", "o", " ", "oʊ"}, {"", "oa", "", "oʊ"},
  {" ", "only", "", "oʊnli"}, {" ", "once", "", "wʌns"}, {"", "on't", "", "oʊnt"},
  {"c", "o", "n", "ɑː"}, {"", "o", "ng", "ɔː"}, {" :^", "o", "n", "ʌ"},
  {"i", "on", "", "ən"}, {"#:", "on", " ", "ən"}, {"#^", "on", "", "ən"},
  {"", "o", "st ", "oʊ"}, {"", "of", "^", "ɔːf"}, {"", "other", "", "ʌðɚ"},
  {"", "oss", " ", "ɔːs"}, {"#:^", "om", "", "ʌm"}, {"", "o", "", "ɑː"},
  // --- P ---
  {"", "ph", "", "f"}, {"", "peop", "", "piːp"}, {"", "pow", "", "paʊ"},
  {"", "put", " ", "pʊt"}, {"", "p", "", "p"},
  // --- Q ---
  {"", "quar", "", "kwɔːɹ"}, {"", "qu", "", "kw"}, {"", "q", "", "k"},
  // --- R ---
  {" ", "re", "^#", "ɹiː"}, {"", "r", "", "ɹ"},
  // --- S ---
  {"", "sh", "", "ʃ"}, {"#", "sion", "", "ʒən"}, {"", "some", "", "sʌm"},
  {"#", "sur", "#", "ʒɚ"}, {"", "sur", "#", "ʃɚ"}, {"#", "su", "#", "ʒuː"},
  {"#", "ssu", "#", "ʃuː"}, {"#", "sed", " ", "zd"}, {"#", "s", "#", "z"},
  {"", "said", "", "sɛd"}, {"^", "sion", "", "ʃən"}, {"", "s", "s", ""},
  {".", "s", " ", "z"}, {"#:.e", "s", " ", "z"}, {"#:^##", "s", " ", "z"},
  {"#:^#", "s", " ", "s"}, {"u", "s", " ", "s"}, {" :#", "s", " ", "z"},
  {" ", "sch", "", "sk"}, {"", "s", "c+", ""}, {"#", "sm", "", "zm"},
  {"#", "sn", "'", "zən"}, {"", "s", "", "s"},
  // --- T ---
  {" ", "the", " ", "ðə"}, {"", "to", " ", "tuː"}, {"", "that", " ", "ðæt"},
  {" ", "this", " ", "ðɪs"}, {" ", "they", "", "ðeɪ"}, {" ", "there", "", "ðɛɹ"},
  {"", "ther", "", "ðɚ"}, {"", "their", "", "ðɛɹ"}, {" ", "than", " ", "ðæn"},
  {" ", "them", " ", "ðɛm"}, {"", "these", " ", "ðiːz"}, {" ", "then", "", "ðɛn"},
  {"", "through", "", "θɹuː"}, {"", "those", "", "ðoʊz"}, {"", "though", " ", "ðoʊ"},
  {" ", "thus", "", "ðʌs"}, {"", "th", "", "θ"}, {"#:", "ted", " ", "tɪd"},
  {"s", "ti", "#n", "tʃ"}, {"", "ti", "o", "ʃ"}, {"", "ti", "a", "ʃ"},
  {"", "tien", "", "ʃən"}, {"", "tur", "#", "tʃɚ"}, {"", "tu", "a", "tʃuː"},
  {" ", "two", "", "tuː"}, {"", "t", "", "t"},
  // --- U ---
  {" ", "un", "i", "juːn"}, {" ", "un", "", "ʌn"}, {" ", "upon", "", "əpɔːn"},
  {"@", "ur", "#", "ʊɹ"}, {"", "ur", "#", "jʊɹ"}, {"", "ur", "", "ɝː"},
  {"", "u", "^ ", "ʌ"}, {"", "u", "^^", "ʌ"}, {"", "uy", "", "aɪ"},
  {" g", "u", "#", ""}, {"g", "u", "%", ""}, {"g", "u", "#", "w"},
  {"#n", "u", "", "juː"}, {"@", "u", "", "uː"}, {"", "u", "", "juː"},
  // --- V ---
  {"", "view", "", "vjuː"}, {"", "v", "", "v"},
  // --- W ---
  {" ", "were", "", "wɝː"}, {"", "wa", "s", "wɑː"}, {"", "wa", "t", "wɑː"},
  {"", "where", "", "wɛɹ"}, {"", "what", "", "wɑːt"}, {"", "whol", "", "hoʊl"},
  {"", "who", "", "huː"}, {"", "wh", "", "w"}, {"", "war", "", "wɔːɹ"},
  {"", "wor", "^", "wɝː"}, {"", "wr", "", "ɹ"}, {"", "w", "", "w"},
  // --- X ---
  {" ", "x", "", "z"}, {"", "x", "", "ks"},
  // --- Y ---
  {"", "young", "", "jʌŋ"}, {" ", "you", "", "juː"}, {" ", "yes", "", "jɛs"},
  {" ", "y", "", "j"}, {"#:^", "y", " ", "i"}, {"#:^", "y", "i", "i"},
  {" :", "y", " ", "aɪ"}, {" :", "y", "#", "aɪ"}, {" :", "y", "^+:#", "ɪ"},
  {" :", "y", "^#", "aɪ"}, {"", "y", "", "ɪ"},
  // --- Z ---
  {"", "z", "", "z"},
};

constexpr int kNumRules = sizeof(kRules) / sizeof(Rule);

// Match `ctx` (right-context pattern) forward from word[pos].
bool match_right(const std::string& w, size_t pos, const char* ctx) {
  for (const char* p = ctx; *p; ++p) {
    char pc = *p;
    switch (pc) {
      case ' ': if (pos < w.size() && w[pos] != ' ') return false; if (pos < w.size()) ++pos; break;
      case '#': { size_t n = 0; while (pos < w.size() && isvowel(w[pos])) { ++pos; ++n; } if (!n) return false; break; }
      case ':': while (pos < w.size() && iscons(w[pos])) ++pos; break;
      case '^': if (pos >= w.size() || !iscons(w[pos])) return false; ++pos; break;
      case '.': if (pos >= w.size() || !isvoiced(w[pos])) return false; ++pos; break;
      case '&': {
        if (pos >= w.size()) return false;
        if (issib(w[pos])) { ++pos; }
        else if (pos + 1 < w.size() && ((w[pos]=='c'||w[pos]=='s') && w[pos+1]=='h')) { pos += 2; }
        else return false;
        break;
      }
      case '@': {
        if (pos >= w.size()) return false;
        if (strchr("tsrdlzn", w[pos])) { ++pos; }
        else if (pos + 1 < w.size() && ((w[pos]=='t'&&w[pos+1]=='h')||(w[pos]=='c'&&w[pos+1]=='h')||(w[pos]=='s'&&w[pos+1]=='h'))) { pos += 2; }
        else return false;
        break;
      }
      case '%': {
        // suffix: -e, -er, -es, -ed, -ely, -ing
        if (pos >= w.size()) return false;
        if (w.compare(pos, 3, "ing") == 0) { pos += 3; }
        else if (w[pos] == 'e') {
          ++pos;
          if (pos < w.size() && (w[pos]=='r'||w[pos]=='s'||w[pos]=='d')) ++pos;
          else if (pos + 1 < w.size() && w[pos]=='l' && w[pos+1]=='y') pos += 2;
        } else return false;
        break;
      }
      case '+': if (pos >= w.size() || (w[pos]!='e'&&w[pos]!='i'&&w[pos]!='y')) return false; ++pos; break;
      case '*': while (pos < w.size() && isvowel(w[pos])) ++pos; break;
      default:  if (pos >= w.size() || w[pos] != pc) return false; ++pos; break;
    }
  }
  return true;
}

// Match `ctx` (left-context pattern) backward ending just before word[pos].
bool match_left(const std::string& w, size_t pos, const char* ctx) {
  size_t len = strlen(ctx);
  long i = static_cast<long>(pos) - 1;
  for (long ci = static_cast<long>(len) - 1; ci >= 0; --ci) {
    char pc = ctx[ci];
    switch (pc) {
      case ' ': if (i >= 0 && w[i] != ' ') return false; if (i >= 0) --i; break;
      case '#': { long n = 0; while (i >= 0 && isvowel(w[i])) { --i; ++n; } if (!n) return false; break; }
      case ':': while (i >= 0 && iscons(w[i])) --i; break;
      case '^': if (i < 0 || !iscons(w[i])) return false; --i; break;
      case '.': if (i < 0 || !isvoiced(w[i])) return false; --i; break;
      case '&': if (i < 0 || !issib(w[i])) return false; --i; break;
      case '+': if (i < 0 || (w[i]!='e'&&w[i]!='i'&&w[i]!='y')) return false; --i; break;
      case '@': if (i < 0 || !strchr("tsrdlzn", w[i])) return false; --i; break;
      case '*': while (i >= 0 && isvowel(w[i])) --i; break;
      default:  if (i < 0 || w[i] != pc) return false; --i; break;
    }
  }
  return true;
}

std::string phonemize_word(const std::string& raw) {
  // Pad with spaces so boundary contexts can match.
  std::string w = " " + raw + " ";
  std::string out;
  size_t pos = 1;
  while (pos + 1 < w.size() || (pos < w.size() && w[pos] != ' ')) {
    if (w[pos] == ' ') break;
    bool matched = false;
    for (int r = 0; r < kNumRules; ++r) {
      const Rule& rule = kRules[r];
      size_t mlen = strlen(rule.match);
      if (mlen == 0 || w.compare(pos, mlen, rule.match) != 0) continue;
      if (!match_left(w, pos, rule.left)) continue;
      if (!match_right(w, pos + mlen, rule.right)) continue;
      out += rule.out;
      pos += mlen;
      matched = true;
      break;
    }
    if (!matched) ++pos;  // unknown character: skip
  }
  return out;
}

}  // namespace

extern "C" {

int ztx_version() { return 1; }

// Phonemize UTF-8 text: ASCII letters run through the rule engine word by
// word; punctuation from the model symbol table passes through; everything
// else is dropped. Returned buffer is malloc'd; free with ztx_free.
const char* ztx_phonemize(const char* utf8_text) {
  if (!utf8_text) return nullptr;
  std::string text(utf8_text);
  std::string result;
  std::string word;

  auto flush = [&]() {
    if (!word.empty()) {
      result += phonemize_word(word);
      word.clear();
    }
  };

  for (size_t i = 0; i < text.size(); ++i) {
    unsigned char c = text[i];
    if (c < 128 && isalpha(c)) {
      word += static_cast<char>(tolower(c));
    } else if (c == '\'') {
      word += c;  // keep apostrophes inside words (don't, it's)
    } else {
      flush();
      if (strchr(";:,.!?()\"- ", c)) {
        if (c == ' ' && !result.empty() && result.back() == ' ') continue;
        result += static_cast<char>(c);
      }
      // non-ASCII bytes and digits are dropped (digits are expanded to words
      // by the Python normalizer before reaching this library)
    }
  }
  flush();

  char* buf = static_cast<char*>(malloc(result.size() + 1));
  memcpy(buf, result.c_str(), result.size() + 1);
  return buf;
}

void ztx_free(const char* p) { free(const_cast<char*>(p)); }

}  // extern "C"
