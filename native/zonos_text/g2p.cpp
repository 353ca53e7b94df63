// zonos_text: host-side native text frontend — multilingual grapheme→phoneme.
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
//   const char* ztx_phonemize(const char* utf8_text);  // malloc'd UTF-8 (en)
//   const char* ztx_phonemize_lang(const char* utf8_text, const char* lang);
//   void        ztx_free(const char* p);
//   int         ztx_version();
//
// Languages (see ztx_phonemize_lang at the bottom for the full dispatch and
// docs/LANGUAGES.md for per-language status): "en" is an NRL-style rule
// engine + irregular-word lexicon + stress heuristic; the other engines are
// per-language orthographic rule sets over Latin, Cyrillic, Greek, Hangul,
// Georgian and Armenian scripts, each with language-appropriate stress
// placement. Unsupported codes return nullptr (caller falls back).
//
// Build: g++ -O2 -fPIC -shared g2p.cpp -o libzonos_text.so

#include <cctype>
#include <cstdlib>
#include <cstring>
#include <map>
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
  {"", "mb", " ", "m"}, {"", "mn", " ", "m"},
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
  {"", "sten", " ", "sən"}, {"", "stle", " ", "səl"},
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

// --- Irregular-word lexicon (en) -------------------------------------------
// Looked up before the rule engine; entries carry eSpeak-style stress marks
// (ˈ immediately before the stressed vowel). Covers high-frequency words the
// letter-to-sound rules get wrong plus classic irregulars.
struct LexEntry { const char* word; const char* ipa; };
static const LexEntry kLexiconEn[] = {
  {"a", "ə"}, {"an", "ən"}, {"and", "ænd"}, {"as", "æz"}, {"at", "æt"},
  {"because", "bɪkˈʌz"}, {"been", "bɪn"}, {"busy", "bˈɪzi"},
  {"choir", "kwˈaɪɚ"}, {"colonel", "kˈɜːnəl"}, {"come", "kˈʌm"},
  {"cough", "kˈɔːf"}, {"could", "kʊd"}, {"debt", "dˈɛt"},
  {"dr", "dˈɑːktɚ"}, {"done", "dˈʌn"}, {"enough", "ɪnˈʌf"},
  {"eight", "ˈeɪt"}, {"friend", "fɹˈɛnd"}, {"from", "fɹʌm"},
  {"gone", "ɡˈɔːn"}, {"have", "hæv"}, {"heart", "hˈɑːɹt"},
  {"iron", "ˈaɪɚn"}, {"island", "ˈaɪlənd"}, {"isle", "ˈaɪl"},
  {"laugh", "lˈæf"}, {"love", "lˈʌv"}, {"live", "lˈɪv"},
  {"many", "mˈɛni"}, {"minute", "mˈɪnɪt"}, {"money", "mˈʌni"},
  {"mr", "mˈɪstɚ"}, {"mrs", "mˈɪsɪz"}, {"ms", "mˈɪz"},
  {"none", "nˈʌn"}, {"of", "ʌv"}, {"off", "ˈɔːf"},
  {"once", "wˈʌns"}, {"one", "wˈʌn"}, {"people", "pˈiːpəl"},
  {"pretty", "pɹˈɪti"}, {"quay", "kˈiː"}, {"queue", "kjˈuː"},
  {"receipt", "ɹɪsˈiːt"}, {"rough", "ɹˈʌf"}, {"said", "sˈɛd"},
  {"says", "sˈɛz"}, {"sew", "sˈoʊ"}, {"shoe", "ʃˈuː"},
  {"some", "sʌm"}, {"something", "sˈʌmθɪŋ"}, {"sure", "ʃˈʊɹ"},
  {"the", "ðə"}, {"to", "tə"}, {"tomb", "tˈuːm"},
  {"tongue", "tˈʌŋ"}, {"touch", "tˈʌtʃ"}, {"tough", "tˈʌf"},
  {"two", "tˈuː"}, {"was", "wʌz"}, {"were", "wɚ"},
  {"woman", "wˈʊmən"}, {"women", "wˈɪmɪn"}, {"won", "wˈʌn"},
  {"would", "wʊd"}, {"you", "juː"}, {"your", "jʊɹ"},
  {"yacht", "jˈɑːt"}, {"does", "dʌz"}, {"do", "duː"},
  {"says", "sˈɛz"}, {"said", "sˈɛd"}, {"eye", "ˈaɪ"},
  {"answer", "ˈænsɚ"}, {"sword", "sˈɔːɹd"}, {"whole", "hˈoʊl"},
  {"water", "wˈɔːtɚ"}, {"again", "əɡˈɛn"}, {"against", "əɡˈɛnst"},
  {"brown", "bɹˈaʊn"}, {"down", "dˈaʊn"}, {"town", "tˈaʊn"},
  {"crown", "kɹˈaʊn"}, {"crowd", "kɹˈaʊd"}, {"gown", "ɡˈaʊn"},
  {"own", "ˈoʊn"}, {"only", "ˈoʊnli"}, {"very", "vˈɛɹi"},
  {"every", "ˈɛvɹi"}, {"any", "ˈɛni"}, {"many", "mˈɛni"},
  {"ocean", "ˈoʊʃən"}, {"early", "ˈɝːli"}, {"earth", "ˈɝːθ"},
  // round-3 audit batch (tools: en-word audit; worst rule misses)
  {"another", "ənˈʌðɚ"}, {"father", "fˈɑːðɚ"}, {"heard", "hˈɝːd"},
  {"house", "hˈaʊs"}, {"about", "əbˈaʊt"}, {"prove", "pɹˈuːv"},
  {"lose", "lˈuːz"}, {"want", "wˈɑːnt"}, {"watch", "wˈɑːtʃ"},
  {"beautiful", "bjˈuːtɪfəl"}, {"machine", "məʃˈiːn"},
  {"chocolate", "tʃˈɑːklət"}, {"stomach", "stˈʌmək"},
  {"character", "kˈɛɹəktɚ"}, {"echo", "ˈɛkoʊ"}, {"half", "hˈæf"},
  {"calm", "kˈɑːm"}, {"country", "kˈʌntɹi"}, {"blood", "blˈʌd"},
  {"flood", "flˈʌd"}, {"sugar", "ʃˈʊɡɚ"}, {"guarantee", "ɡɛɹəntˈiː"},
  {"juice", "dʒˈuːs"}, {"fruit", "fɹˈuːt"}, {"suit", "sˈuːt"},
  {"biscuit", "bˈɪskɪt"}, {"circuit", "sˈɝːkɪt"}, {"honest", "ˈɑːnɪst"},
  {"honor", "ˈɑːnɚ"}, {"ghost", "ɡˈoʊst"}, {"anxiety", "æŋzˈaɪəti"},
  {"christmas", "kɹˈɪsməs"}, {"aisle", "ˈaɪl"}, {"poor", "pˈʊɹ"},
  {"usually", "jˈuːʒuəli"}, {"usual", "jˈuːʒuəl"}, {"quarter", "kwˈɔːɹtɚ"},
  {"europe", "jˈʊɹəp"}, {"area", "ˈɛɹiə"}, {"idea", "aɪdˈiːə"},
  {"real", "ɹˈiːl"}, {"really", "ɹˈiːli"}, {"video", "vˈɪdioʊ"},
  {"radio", "ɹˈeɪdioʊ"}, {"piano", "piˈænoʊ"}, {"police", "pəlˈiːs"},
  {"hotel", "hoʊtˈɛl"}, {"café", "kæfˈeɪ"}, {"cafe", "kæfˈeɪ"},
  {"coffee", "kˈɔːfi"}, {"break", "bɹˈeɪk"}, {"steak", "stˈeɪk"},
  {"bear", "bˈɛɹ"}, {"wear", "wˈɛɹ"}, {"pear", "pˈɛɹ"},
  {"weird", "wˈɪɹd"}, {"height", "hˈaɪt"}, {"weight", "wˈeɪt"},
  {"foreign", "fˈɔːɹɪn"}, {"recipe", "ɹˈɛsəpi"}, {"routine", "ɹuːtˈiːn"},
  {"genre", "ʒˈɑːnɹə"}, {"vehicle", "vˈiːɪkəl"}, {"chaos", "kˈeɪɑːs"},
  {"choice", "tʃˈɔɪs"}, {"voice", "vˈɔɪs"}, {"noise", "nˈɔɪz"},
  {"comb", "kˈoʊm"}, {"climb", "klˈaɪm"}, {"tomb", "tˈuːm"},
  {"womb", "wˈuːm"}, {"bomb", "bˈɑːm"}, {"plumber", "plˈʌmɚ"},
  // round-3 batch 2: multisyllabic stress + vowel reduction the first-vowel
  // heuristic gets wrong (Latinate vocabulary, -tion/-sion, silent letters)
  {"hello", "həlˈoʊ"}, {"although", "ɔːlðˈoʊ"}, {"though", "ðˈoʊ"},
  {"dough", "dˈoʊ"}, {"thorough", "θˈɝːoʊ"}, {"drought", "dɹˈaʊt"},
  {"daughter", "dˈɔːtɚ"}, {"caught", "kˈɔːt"}, {"taught", "tˈɔːt"},
  {"bought", "bˈɔːt"}, {"brought", "bɹˈɔːt"}, {"fought", "fˈɔːt"},
  {"ought", "ˈɔːt"}, {"thought", "θˈɔːt"},
  {"other", "ˈʌðɚ"}, {"mother", "mˈʌðɚ"}, {"brother", "bɹˈʌðɚ"},
  {"nothing", "nˈʌθɪŋ"}, {"someone", "sˈʌmwʌn"}, {"somebody", "sˈʌmbɑːdi"},
  {"anything", "ˈɛniθɪŋ"}, {"everything", "ˈɛvɹiθɪŋ"},
  {"everyone", "ˈɛvɹiwʌn"}, {"anyone", "ˈɛniwʌn"}, {"nobody", "nˈoʊbɑːdi"},
  {"today", "tədˈeɪ"}, {"tomorrow", "təmˈɑːɹoʊ"},
  {"yesterday", "jˈɛstɚdeɪ"}, {"together", "təɡˈɛðɚ"},
  {"until", "əntˈɪl"}, {"maybe", "mˈeɪbi"}, {"perhaps", "pɚhˈæps"},
  {"almost", "ˈɔːlmoʊst"}, {"already", "ɔːlɹˈɛdi"}, {"always", "ˈɔːlweɪz"},
  {"also", "ˈɔːlsoʊ"}, {"away", "əwˈeɪ"}, {"around", "əɹˈaʊnd"},
  {"above", "əbˈʌv"}, {"ago", "əɡˈoʊ"}, {"across", "əkɹˈɑːs"},
  {"along", "əlˈɔːŋ"}, {"among", "əmˈʌŋ"}, {"between", "bɪtwˈiːn"},
  {"behind", "bɪhˈaɪnd"}, {"before", "bɪfˈoːɹ"}, {"below", "bɪlˈoʊ"},
  {"beyond", "bɪjˈɑːnd"}, {"become", "bɪkˈʌm"}, {"began", "bɪɡˈæn"},
  {"begin", "bɪɡˈɪn"}, {"believe", "bɪlˈiːv"},
  {"give", "ɡˈɪv"}, {"given", "ɡˈɪvən"}, {"move", "mˈuːv"},
  {"remove", "ɹɪmˈuːv"}, {"include", "ɪnklˈuːd"}, {"provide", "pɹəvˈaɪd"},
  {"decide", "dɪsˈaɪd"}, {"receive", "ɹɪsˈiːv"}, {"remember", "ɹɪmˈɛmbɚ"},
  {"understand", "ʌndɚstˈænd"}, {"continue", "kəntˈɪnjuː"},
  {"consider", "kənsˈɪdɚ"}, {"suppose", "səpˈoʊz"},
  {"explain", "ɪksplˈeɪn"}, {"happen", "hˈæpən"}, {"appear", "əpˈɪɹ"},
  {"return", "ɹɪtˈɝːn"}, {"report", "ɹɪpˈoːɹt"}, {"support", "səpˈoːɹt"},
  {"suggest", "səɡdʒˈɛst"}, {"develop", "dɪvˈɛləp"},
  {"create", "kɹiːˈeɪt"}, {"produce", "pɹədˈuːs"}, {"prepare", "pɹɪpˈɛɹ"},
  {"compare", "kəmpˈɛɹ"}, {"perform", "pɚfˈɔːɹm"}, {"allow", "əlˈaʊ"},
  {"follow", "fˈɑːloʊ"}, {"borrow", "bˈɑːɹoʊ"}, {"arrive", "əɹˈaɪv"},
  {"achieve", "ətʃˈiːv"}, {"imagine", "ɪmˈædʒɪn"},
  {"involve", "ɪnvˈɑːlv"}, {"require", "ɹɪkwˈaɪɚ"},
  {"realize", "ɹˈiːəlaɪz"}, {"recognize", "ɹˈɛkəɡnaɪz"},
  {"organize", "ˈɔːɹɡənaɪz"}, {"occur", "əkˈɝː"}, {"accept", "əksˈɛpt"},
  {"open", "ˈoʊpən"}, {"listen", "lˈɪsən"}, {"often", "ˈɔːfən"},
  {"whistle", "wˈɪsəl"}, {"castle", "kˈæsəl"}, {"subtle", "sˈʌtəl"},
  {"doubt", "dˈaʊt"}, {"soften", "sˈɔːfən"}, {"fasten", "fˈæsən"},
  {"wrestle", "ɹˈɛsəl"}, {"muscle", "mˈʌsəl"}, {"scissors", "sˈɪzɚz"},
  {"salmon", "sˈæmən"}, {"almond", "ˈɑːmənd"}, {"palm", "pˈɑːm"},
  {"folk", "fˈoʊk"}, {"yolk", "jˈoʊk"}, {"wednesday", "wˈɛnzdeɪ"},
  {"february", "fˈɛbjuːɛɹi"}, {"library", "lˈaɪbɹɛɹi"},
  {"literature", "lˈɪtɚətʃɚ"}, {"temperature", "tˈɛmpɹətʃɚ"},
  {"evening", "ˈiːvnɪŋ"}, {"favorite", "fˈeɪvɚɪt"}, {"camera", "kˈæmɹə"},
  {"jewelry", "dʒˈuːəlɹi"}, {"extraordinary", "ɪkstɹˈɔːɹdɪnɛɹi"},
  {"computer", "kəmpjˈuːtɚ"}, {"important", "ɪmpˈɔːɹtənt"},
  {"information", "ɪnfɚmˈeɪʃən"}, {"education", "ɛdʒʊkˈeɪʃən"},
  {"government", "ɡˈʌvɚnmənt"}, {"development", "dɪvˈɛləpmənt"},
  {"environment", "ɪnvˈaɪɹənmənt"}, {"experience", "ɪkspˈɪɹiəns"},
  {"technology", "tɛknˈɑːlədʒi"}, {"university", "juːnɪvˈɝːsɪti"},
  {"different", "dˈɪfɹənt"}, {"difference", "dˈɪfɹəns"},
  {"interesting", "ˈɪntɹəstɪŋ"}, {"interest", "ˈɪntɹəst"},
  {"probably", "pɹˈɑːbəbli"}, {"possible", "pˈɑːsəbəl"},
  {"impossible", "ɪmpˈɑːsəbəl"}, {"available", "əvˈeɪləbəl"},
  {"necessary", "nˈɛsəsɛɹi"}, {"especially", "ɪspˈɛʃəli"},
  {"language", "lˈæŋɡwɪdʒ"}, {"message", "mˈɛsɪdʒ"},
  {"manage", "mˈænɪdʒ"}, {"village", "vˈɪlɪdʒ"}, {"image", "ˈɪmɪdʒ"},
  {"average", "ˈævɹɪdʒ"}, {"knowledge", "nˈɑːlɪdʒ"},
  {"college", "kˈɑːlɪdʒ"}, {"company", "kˈʌmpəni"},
  {"community", "kəmjˈuːnɪti"}, {"society", "səsˈaɪəti"},
  {"economy", "ɪkˈɑːnəmi"}, {"economic", "ɛkənˈɑːmɪk"},
  {"political", "pəlˈɪtɪkəl"}, {"hospital", "hˈɑːspɪtəl"},
  {"business", "bˈɪznəs"}, {"moment", "mˈoʊmənt"},
  {"problem", "pɹˈɑːbləm"}, {"example", "ɪɡzˈæmpəl"},
  {"measure", "mˈɛʒɚ"}, {"pleasure", "plˈɛʒɚ"}, {"treasure", "tɹˈɛʒɚ"},
  {"picture", "pˈɪktʃɚ"}, {"nature", "nˈeɪtʃɚ"}, {"future", "fjˈuːtʃɚ"},
  {"culture", "kˈʌltʃɚ"}, {"century", "sˈɛntʃɚi"},
  {"service", "sˈɝːvɪs"}, {"office", "ˈɔːfɪs"}, {"notice", "nˈoʊtɪs"},
  {"practice", "pɹˈæktɪs"}, {"justice", "dʒˈʌstɪs"},
  {"promise", "pɹˈɑːmɪs"}, {"purpose", "pˈɝːpəs"},
  {"surface", "sˈɝːfəs"}, {"private", "pɹˈaɪvət"},
  {"climate", "klˈaɪmət"}, {"separate", "sˈɛpɚət"},
  {"delicate", "dˈɛlɪkət"}, {"certain", "sˈɝːtən"},
  {"captain", "kˈæptən"}, {"mountain", "mˈaʊntən"},
  {"fountain", "fˈaʊntən"}, {"curtain", "kˈɝːtən"},
  {"cousin", "kˈʌzən"}, {"dozen", "dˈʌzən"}, {"oven", "ˈʌvən"},
  {"onion", "ˈʌnjən"}, {"union", "jˈuːnjən"}, {"million", "mˈɪljən"},
  {"billion", "bˈɪljən"}, {"opinion", "əpˈɪnjən"},
  {"companion", "kəmpˈænjən"}, {"attention", "ətˈɛnʃən"},
  {"position", "pəzˈɪʃən"}, {"condition", "kəndˈɪʃən"},
  {"decision", "dɪsˈɪʒən"}, {"television", "tˈɛlɪvɪʒən"},
  {"occasion", "əkˈeɪʒən"}, {"situation", "sɪtʃuːˈeɪʃən"},
  {"population", "pɑːpjʊlˈeɪʃən"}, {"direction", "dɚɹˈɛkʃən"},
  {"collection", "kəlˈɛkʃən"}, {"connection", "kənˈɛkʃən"},
  {"american", "əmˈɛɹɪkən"}, {"national", "nˈæʃənəl"},
  {"international", "ɪntɚnˈæʃənəl"}, {"general", "dʒˈɛnɚəl"},
  {"several", "sˈɛvɚəl"}, {"natural", "nˈætʃɚəl"},
  {"personal", "pˈɝːsənəl"}, {"professional", "pɹəfˈɛʃənəl"},
  {"original", "əɹˈɪdʒɪnəl"}, {"popular", "pˈɑːpjʊlɚ"},
  {"particular", "pɚtˈɪkjʊlɚ"}, {"regular", "ɹˈɛɡjʊlɚ"},
  {"similar", "sˈɪmɪlɚ"}, {"familiar", "fəmˈɪljɚ"},
  {"wonderful", "wˈʌndɚfəl"}, {"successful", "səksˈɛsfəl"},
  {"careful", "kˈɛɹfəl"}, {"serious", "sˈɪɹiəs"},
  {"various", "vˈɛɹiəs"}, {"obvious", "ˈɑːbviəs"},
  {"previous", "pɹˈiːviəs"}, {"curious", "kjˈʊɹiəs"},
  {"dangerous", "dˈeɪndʒɚəs"}, {"famous", "fˈeɪməs"},
  {"nervous", "nˈɝːvəs"}, {"enormous", "ɪnˈɔːɹməs"},
  {"delicious", "dɪlˈɪʃəs"}, {"religious", "ɹɪlˈɪdʒəs"},
  {"anxious", "ˈæŋkʃəs"}, {"conscious", "kˈɑːnʃəs"},
  {"complete", "kəmplˈiːt"}, {"extreme", "ɪkstɹˈiːm"},
  {"expensive", "ɪkspˈɛnsɪv"}, {"positive", "pˈɑːzɪtɪv"},
  {"negative", "nˈɛɡətɪv"}, {"active", "ˈæktɪv"},
  {"effective", "ɪfˈɛktɪv"}, {"attractive", "ətɹˈæktɪv"},
  {"sensitive", "sˈɛnsɪtɪv"}, {"relative", "ɹˈɛlətɪv"},
  {"alternative", "ɔːltˈɝːnətɪv"}, {"comfortable", "kˈʌmftɚbəl"},
  {"vegetable", "vˈɛdʒtəbəl"}, {"terrible", "tˈɛɹəbəl"},
  {"horrible", "hˈɔːɹəbəl"}, {"responsible", "ɹɪspˈɑːnsəbəl"},
  {"incredible", "ɪnkɹˈɛdəbəl"},
  {"children", "tʃˈɪldɹən"}, {"restaurant", "ɹˈɛstɚɑːnt"},
  {"breakfast", "bɹˈɛkfəst"}, {"schedule", "skˈɛdʒuːl"},
  {"architect", "ˈɑːɹkɪtɛkt"}, {"mechanic", "məkˈænɪk"},
  {"orchestra", "ˈɔːɹkɪstɹə"}, {"headache", "hˈɛdeɪk"},
  {"chemistry", "kˈɛmɪstɹi"}, {"champagne", "ʃæmpˈeɪn"},
  {"chef", "ʃˈɛf"}, {"heaven", "hˈɛvən"}, {"heavy", "hˈɛvi"},
  {"weather", "wˈɛðɚ"}, {"leather", "lˈɛðɚ"}, {"feather", "fˈɛðɚ"},
  {"breath", "bɹˈɛθ"}, {"breathe", "bɹˈiːð"}, {"bread", "bɹˈɛd"},
  {"dead", "dˈɛd"}, {"death", "dˈɛθ"}, {"ready", "ɹˈɛdi"},
  {"instead", "ɪnstˈɛd"}, {"meant", "mˈɛnt"}, {"threat", "θɹˈɛt"},
  {"sweat", "swˈɛt"}, {"sweater", "swˈɛtɚ"}, {"pleasant", "plˈɛzənt"},
  {"jealous", "dʒˈɛləs"}, {"great", "ɡɹˈeɪt"},
  {"eleven", "ɪlˈɛvən"}, {"seven", "sˈɛvən"}, {"seventy", "sˈɛvənti"},
  {"thirteen", "θɝːtˈiːn"}, {"thirty", "θˈɝːti"},
  {"fourteen", "foːɹtˈiːn"}, {"forty", "fˈɔːɹti"},
  {"fifteen", "fɪftˈiːn"}, {"fifty", "fˈɪfti"}, {"eighty", "ˈeɪti"},
  {"ninety", "nˈaɪnti"}, {"ninth", "nˈaɪnθ"}, {"twelfth", "twˈɛlfθ"},
  {"hundred", "hˈʌndɹəd"}, {"thousand", "θˈaʊzənd"},
  {"hour", "ˈaʊɚ"}, {"our", "ˈaʊɚ"}, {"their", "ðˈɛɹ"},
  {"there", "ðˈɛɹ"}, {"where", "wˈɛɹ"}, {"who", "hˈuː"},
  {"whom", "hˈuːm"}, {"whose", "hˈuːz"}, {"what", "wˈʌt"},
};
constexpr int kNumLexEn = sizeof(kLexiconEn) / sizeof(LexEntry);

// Unstressed function words: single-syllable words NOT in this set get a
// primary stress mark (content words are stressed in eSpeak's output).
static const char* kUnstressedEn[] = {
  "a", "an", "and", "as", "at", "be", "but", "by", "for", "from", "had",
  "has", "his", "her", "in", "is", "it", "its", "nor", "of", "on", "or",
  "the", "to", "was", "with", "am", "are", "were", "shall", "should",
  "can", "could", "would", "must", "that", "than", "them", "so", "if",
  "up", "out", "not",
};
constexpr int kNumUnstressedEn = sizeof(kUnstressedEn) / sizeof(char*);

bool is_unstressed_en(const std::string& w) {
  for (int i = 0; i < kNumUnstressedEn; ++i)
    if (w == kUnstressedEn[i]) return true;
  return false;
}

// IPA vowel nuclei the stress mark can precede. Multi-byte UTF-8 sequences;
// longest-match. Diphthong/long-vowel starters are covered by their first
// code point (eɪ starts with 'e' etc.).
static const char* kIpaVowelStarts[] = {
  "ɑ", "æ", "ʌ", "ɔ", "ɛ", "ɚ", "ɝ", "ə", "ɪ", "ʊ", "a", "e", "i", "o", "u",
};
constexpr int kNumIpaVowels = sizeof(kIpaVowelStarts) / sizeof(char*);

// Byte offset of the n-th vowel nucleus in an IPA string, or npos.
size_t ipa_vowel_pos(const std::string& ipa, int nth) {
  int seen = 0;
  size_t i = 0;
  bool in_vowel = false;
  while (i < ipa.size()) {
    bool matched = false;
    for (int v = 0; v < kNumIpaVowels; ++v) {
      size_t len = strlen(kIpaVowelStarts[v]);
      if (ipa.compare(i, len, kIpaVowelStarts[v]) == 0) {
        if (!in_vowel) {
          if (seen == nth) return i;
          ++seen;
          in_vowel = true;
        }
        i += len;
        matched = true;
        break;
      }
    }
    if (!matched) {
      // Long marks/offglides keep us inside the same nucleus.
      if (ipa.compare(i, 2, "ː") == 0) { i += 2; }
      else if (ipa.compare(i, 2, "ɪ") == 0 || ipa.compare(i, 2, "ʊ") == 0) { i += 2; }
      else { in_vowel = false; i += 1; }
    }
  }
  return std::string::npos;
}

int ipa_vowel_count(const std::string& ipa) {
  int n = 0;
  while (ipa_vowel_pos(ipa, n) != std::string::npos) ++n;
  return n;
}

// English stress heuristic: lexicon entries already carry stress; for
// rule-generated words put primary stress on the first non-schwa vowel
// (initial stress is the majority pattern in English), skipping unstressed
// function words.
std::string add_stress_en(const std::string& word, const std::string& ipa) {
  if (ipa.find("ˈ") != std::string::npos) return ipa;
  if (is_unstressed_en(word)) return ipa;
  int n = ipa_vowel_count(ipa);
  if (n == 0) return ipa;
  for (int v = 0; v < n; ++v) {
    size_t pos = ipa_vowel_pos(ipa, v);
    // ə and ɚ are never stressed; try the next nucleus.
    if (ipa.compare(pos, 2, "ə") == 0 || ipa.compare(pos, 2, "ɚ") == 0) continue;
    std::string out = ipa;
    out.insert(pos, "ˈ");
    return out;
  }
  return ipa;
}

const char* en_lex_find(const std::string& raw) {
  for (int i = 0; i < kNumLexEn; ++i)
    if (raw == kLexiconEn[i].word) return kLexiconEn[i].ipa;
  return nullptr;
}

bool ipa_ends(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  return s.size() >= n && s.compare(s.size() - n, n, suf) == 0;
}

// Regular-inflection suffix phonology (last SOUND of the stem's IPA).
std::string en_plural_suffix(const std::string& ipa) {
  for (const char* sib : {"s", "z", "ʃ", "ʒ", "tʃ", "dʒ"})
    if (ipa_ends(ipa, sib)) return "ɪz";
  for (const char* vl : {"p", "t", "k", "f", "θ"})
    if (ipa_ends(ipa, vl)) return "s";
  return "z";
}

std::string en_past_suffix(const std::string& ipa) {
  if (ipa_ends(ipa, "tʃ")) return "t";
  if (ipa_ends(ipa, "dʒ")) return "d";
  if (ipa_ends(ipa, "t") || ipa_ends(ipa, "d")) return "ɪd";
  for (const char* vl : {"p", "k", "f", "θ", "s", "ʃ"})
    if (ipa_ends(ipa, vl)) return "t";
  return "d";
}

// Lexicon lookup through the regular inflections (-s/-es, -ed, -ing, -ly,
// -er/-est), so "computers"/"decided"/"moving" reuse the stem's stress and
// reduced vowels instead of falling back to the first-vowel heuristic.
// Handles silent-e drop (moving → move) and consonant doubling
// (stopped → stop). Empty string = no hit.
std::string en_lex_inflected(const std::string& raw) {
  size_t n = raw.size();
  if (n < 4) return "";
  auto stem = [&](const std::string& base) -> const char* {
    const char* hit = en_lex_find(base);
    if (hit) return hit;
    return nullptr;
  };
  // -ing (drop, +e restore, undouble)
  if (n > 4 && raw.compare(n - 3, 3, "ing") == 0) {
    std::string b = raw.substr(0, n - 3);
    if (const char* h = stem(b)) return std::string(h) + "ɪŋ";
    if (const char* h = stem(b + "e")) return std::string(h) + "ɪŋ";
    if (b.size() > 2 && b[b.size() - 1] == b[b.size() - 2])
      if (const char* h = stem(b.substr(0, b.size() - 1)))
        return std::string(h) + "ɪŋ";
    return "";
  }
  // -ed (loved → love via -d; wanted → want via -ed; stopped undoubles)
  if (raw.compare(n - 2, 2, "ed") == 0) {
    if (const char* h = stem(raw.substr(0, n - 1)))  // silent-e stem
      return std::string(h) + en_past_suffix(h);
    std::string b = raw.substr(0, n - 2);
    if (const char* h = stem(b)) return std::string(h) + en_past_suffix(h);
    if (b.size() > 2 && b[b.size() - 1] == b[b.size() - 2])
      if (const char* h = stem(b.substr(0, b.size() - 1)))
        return std::string(h) + en_past_suffix(h);
    return "";
  }
  // -ly
  if (raw.compare(n - 2, 2, "ly") == 0) {
    if (const char* h = stem(raw.substr(0, n - 2))) return std::string(h) + "li";
    return "";
  }
  // -er / -est (lexicon stems only; agentive and comparative share IPA)
  if (n > 4 && raw.compare(n - 3, 3, "est") == 0) {
    if (const char* h = stem(raw.substr(0, n - 3))) return std::string(h) + "ɪst";
    if (const char* h = stem(raw.substr(0, n - 2))) return std::string(h) + "st";
  }
  if (raw.compare(n - 2, 2, "er") == 0) {
    if (const char* h = stem(raw.substr(0, n - 2))) return std::string(h) + "ɚ";
    if (const char* h = stem(raw.substr(0, n - 1))) return std::string(h) + "ɚ";
  }
  // -s / -es (boxes restores nothing; watches → watch via -es)
  if (raw[n - 1] == 's' && raw[n - 2] != 's') {
    if (const char* h = stem(raw.substr(0, n - 1)))
      return std::string(h) + en_plural_suffix(h);
    if (raw.compare(n - 2, 2, "es") == 0)
      if (const char* h = stem(raw.substr(0, n - 2)))
        return std::string(h) + "ɪz";
  }
  return "";
}

std::string phonemize_word(const std::string& raw) {
  // Irregular lexicon first (stress included), then its inflections.
  if (const char* hit = en_lex_find(raw)) return hit;
  {
    std::string infl = en_lex_inflected(raw);
    if (!infl.empty()) return infl;
  }
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
  return add_stress_en(raw, out);
}

// --- Spanish ----------------------------------------------------------------
// Spanish orthography is near-phonemic: a compact context-rule engine covers
// it well (Castilian conventions, matching eSpeak's "es" voice: c/z → θ,
// ll/y → ʝ, j/ge/gi → x). Stress follows orthography: an accented vowel wins;
// otherwise penultimate syllable for vowel/n/s-final words, final otherwise.

struct EsPhone { std::string ipa; bool vowel; bool accented; };

bool es_vowel_char(char c) { return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'; }

// Decode one UTF-8 "letter" of Spanish text (lowercased ASCII + á é í ó ú ü ñ).
// Returns bytes consumed; writes the base letter and accent flag.
size_t es_letter(const std::string& w, size_t i, char* base, bool* accented, bool* dieresis) {
  *accented = false;
  *dieresis = false;
  unsigned char c = w[i];
  if (c < 128) { *base = static_cast<char>(c); return 1; }
  if (i + 1 < w.size() && c == 0xC3) {
    unsigned char d = w[i + 1];
    switch (d) {
      case 0xA1: *base = 'a'; *accented = true; return 2;  // á
      case 0xA9: *base = 'e'; *accented = true; return 2;  // é
      case 0xAD: *base = 'i'; *accented = true; return 2;  // í
      case 0xB3: *base = 'o'; *accented = true; return 2;  // ó
      case 0xBA: *base = 'u'; *accented = true; return 2;  // ú
      case 0xBC: *base = 'u'; *dieresis = true; return 2;  // ü
      case 0xB1: *base = '~'; return 2;                    // ñ → marker
    }
  }
  *base = '?';
  return 1;  // unknown multibyte lead: consume one byte
}

std::string phonemize_word_es(const std::string& raw) {
  // Normalize to a base-letter string, remembering accents.
  std::string w;
  std::vector<bool> acc, die;
  for (size_t i = 0; i < raw.size();) {
    char base; bool a, di;
    i += es_letter(raw, i, &base, &a, &di);
    if (base == '?') continue;
    w += (base == '~') ? '~' : base;  // '~' = ñ
    acc.push_back(a);
    die.push_back(di);
  }

  std::vector<EsPhone> ph;
  size_t n = w.size();
  for (size_t i = 0; i < n;) {
    char c = w[i];
    char next = (i + 1 < n) ? w[i + 1] : '\0';
    char prev = (i > 0) ? w[i - 1] : '\0';
    bool a = acc[i];
    switch (c) {
      case 'a': ph.push_back({"a", true, a}); ++i; break;
      case 'e': ph.push_back({"e", true, a}); ++i; break;
      case 'i':
        ph.push_back({"i", true, a}); ++i; break;
      case 'o': ph.push_back({"o", true, a}); ++i; break;
      case 'u': ph.push_back({"u", true, a}); ++i; break;
      case '~': ph.push_back({"ɲ", false, false}); ++i; break;
      case 'b': case 'v':
        ph.push_back({(i == 0 || prev=='m' || prev=='n') ? "b" : "β", false, false}); ++i; break;
      case 'c':
        if (next == 'h') { ph.push_back({"tʃ", false, false}); i += 2; }
        else if (next == 'e' || next == 'i') { ph.push_back({"θ", false, false}); ++i; }
        else { ph.push_back({"k", false, false}); ++i; }
        break;
      case 'd': ph.push_back({(i == 0 || prev=='n' || prev=='l') ? "d" : "ð", false, false}); ++i; break;
      case 'f': ph.push_back({"f", false, false}); ++i; break;
      case 'g':
        if (next == 'e' || next == 'i') { ph.push_back({"x", false, false}); ++i; }
        else if (next == 'u' && i + 2 < n && (w[i+2]=='e' || w[i+2]=='i') && !acc[i+1]) {
          // gue/gui: u silent; güe/güi (dieresis) keeps /w/
          ph.push_back({"ɡ", false, false});
          if (die[i + 1]) ph.push_back({"w", false, false});
          i += 2;
        }
        else { ph.push_back({"ɡ", false, false}); ++i; }
        break;
      case 'h': ++i; break;  // silent
      case 'j': ph.push_back({"x", false, false}); ++i; break;
      case 'k': ph.push_back({"k", false, false}); ++i; break;
      case 'l':
        if (next == 'l') { ph.push_back({"ʝ", false, false}); i += 2; }
        else { ph.push_back({"l", false, false}); ++i; }
        break;
      case 'm': ph.push_back({"m", false, false}); ++i; break;
      case 'n': ph.push_back({"n", false, false}); ++i; break;
      case 'p': ph.push_back({"p", false, false}); ++i; break;
      case 'q':
        if (next == 'u') i += 2; else ++i;
        ph.push_back({"k", false, false});
        break;
      case 'r':
        if (next == 'r') { ph.push_back({"r", false, false}); i += 2; }
        else { ph.push_back({(i == 0 || prev=='n' || prev=='l' || prev=='s') ? "r" : "ɾ", false, false}); ++i; }
        break;
      case 's': ph.push_back({"s", false, false}); ++i; break;
      case 't': ph.push_back({"t", false, false}); ++i; break;
      case 'w': ph.push_back({"w", false, false}); ++i; break;
      case 'x':
        // Historic-spelling names keep x = /x/ (México, Texas, Oaxaca)
        if (w.compare(0, 5, "mexic") == 0 || w.compare(0, 4, "texa") == 0 ||
            w.find("oaxac") != std::string::npos)
          ph.push_back({"x", false, false});
        else ph.push_back({"ks", false, false});
        ++i; break;
      case 'y':
        if (n == 1) ph.push_back({"i", true, false});
        else if (i + 1 == n) ph.push_back({"i", true, false});
        else ph.push_back({"ʝ", false, false});
        ++i; break;
      case 'z': ph.push_back({"θ", false, false}); ++i; break;
      default: ++i; break;
    }
  }

  // Stress: accented vowel wins; else penultimate vowel when the word ends
  // in a vowel/n/s, else the last vowel. Weak vowels (i, u) next to strong
  // ones form diphthongs — treat a strong+weak/weak+strong pair as one
  // nucleus for stress counting.
  // Rising diphthongs: an unaccented weak vowel (i/u) directly before
  // another vowel is a glide, not a nucleus (bueno → bweno, tiene → tjene,
  // agua → aɡwa — matches eSpeak's es voice). Accented í/ú stay vowels
  // (día → dia) and the gue/qui silent-u cases never reach here.
  for (size_t i = 0; i + 1 < ph.size(); ++i) {
    if (!ph[i].vowel || ph[i].accented || !ph[i + 1].vowel) continue;
    if (ph[i].ipa == "i") { ph[i] = {"j", false, false}; }
    else if (ph[i].ipa == "u") { ph[i] = {"w", false, false}; }
  }

  std::vector<int> nuclei;  // indices into ph (first vowel of each nucleus)
  int stressed_nucleus = -1;
  for (size_t i = 0; i < ph.size(); ++i) {
    if (!ph[i].vowel) continue;
    // A vowel merges into the previous nucleus (diphthong) when adjacent to
    // a vowel and either side is an unaccented weak vowel (i/u).
    bool merge = false;
    if (i > 0 && ph[i - 1].vowel) {
      bool prev_weak = (ph[i - 1].ipa == "i" || ph[i - 1].ipa == "u") && !ph[i - 1].accented;
      bool cur_weak = (ph[i].ipa == "i" || ph[i].ipa == "u") && !ph[i].accented;
      merge = prev_weak || cur_weak;
    }
    if (!merge) nuclei.push_back(static_cast<int>(i));
    if (ph[i].accented) stressed_nucleus = static_cast<int>(nuclei.size()) - 1;
  }
  if (!nuclei.empty() && nuclei.size() > 1) {
    if (stressed_nucleus < 0) {
      char last = w.empty() ? '\0' : w[w.size() - 1];
      bool penult = es_vowel_char(last) || last == 'n' || last == 's';
      stressed_nucleus = static_cast<int>(nuclei.size()) - (penult ? 2 : 1);
    }
  } else if (nuclei.size() == 1) {
    stressed_nucleus = -1;  // monosyllables: no mark (matches eSpeak es)
  }

  std::string out;
  for (size_t i = 0; i < ph.size(); ++i) {
    if (stressed_nucleus >= 0 && static_cast<size_t>(nuclei[stressed_nucleus]) == i)
      out += "ˈ";
    out += ph[i].ipa;
  }
  return out;
}

// --- German -----------------------------------------------------------------
// German orthography is regular enough for a context-rule engine (eSpeak "de"
// conventions): sch→ʃ, initial sp/st→ʃp/ʃt, ach/ich-laut split on the
// preceding vowel, final devoicing of b/d/g, -ig→ɪç, vocalized final r→ɐ,
// schwa in final -e/-en/-el, w→v, z→ts, ei/au/eu diphthongs, vowel+h long.
// Stress: first syllable, unless the word starts with one of the standard
// unstressed verbal prefixes (ge-, be-, ver-, er-, ent-, zer-, emp-, ...).

struct DePhone { std::string ipa; bool vowel; };

// Normalized marker letters: '@'=ä '#'=ö '&'=ü '$'=ß.
bool de_vowel(char c) {
  return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'||c=='y'||c=='@'||c=='#'||c=='&';
}

std::string phonemize_word_de(const std::string& raw) {
  // Irregulars / loanwords the rule engine misses (round-3 audit).
  static const std::map<std::string, const char*> kLexDe = {
    {"vielleicht", "fɪlˈaɪçt"}, {"familie", "famˈiːliə"},
    {"europa", "ɔʏʁˈoːpa"}, {"minute", "minˈuːtə"}, {"monat", "mˈoːnat"},
    {"montag", "mˈoːntaːk"}, {"dienstag", "dˈiːnstaːk"},
    {"warum", "vaʁˈʊm"}, {"sofort", "zofˈɔɐt"}, {"zusammen", "tsuzˈamən"},
    {"natur", "natˈuːɐ"}, {"musik", "muzˈiːk"}, {"papier", "papˈiːɐ"},
    {"idee", "idˈeː"}, {"interessant", "ɪntəʁɛsˈant"},
    {"information", "ɪnfɔɐmatsiˈoːn"}, {"universität", "unɪvɛɐzitˈɛːt"},
    {"student", "ʃtudˈɛnt"}, {"hotel", "hotˈɛl"}, {"kaffee", "kˈafeː"},
    {"büro", "byʁˈoː"}, {"telefon", "tˈeːlefoːn"}, {"problem", "pʁoblˈeːm"},
    {"moment", "momˈɛnt"}, {"person", "pɛɐzˈoːn"}, {"polizei", "politsˈaɪ"},
    {"restaurant", "ʁɛstoʁˈɑ̃ː"}, {"familien", "famˈiːliən"},
  };
  {
    std::string lower;
    for (char ch : raw) lower += static_cast<char>(tolower(static_cast<unsigned char>(ch)));
    // fold umlauts in the key the cheap way: multibyte keys above are ASCII-only
    auto it = kLexDe.find(lower);
    if (it != kLexDe.end()) return it->second;
  }
  // Fold UTF-8 umlauts/eszett to single-byte markers.
  std::string w;
  for (size_t i = 0; i < raw.size();) {
    unsigned char c = raw[i];
    if (c < 128) { w += static_cast<char>(c); ++i; continue; }
    if (c == 0xC3 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      switch (d) {
        case 0xA4: case 0x84: w += '@'; break;  // ä Ä
        case 0xB6: case 0x96: w += '#'; break;  // ö Ö
        case 0xBC: case 0x9C: w += '&'; break;  // ü Ü
        case 0x9F: w += '$'; break;             // ß
        default: break;  // other letters dropped
      }
      i += 2;
      continue;
    }
    ++i;
  }

  std::vector<DePhone> ph;
  size_t n = w.size();
  for (size_t i = 0; i < n;) {
    char c = w[i];
    char c1 = (i + 1 < n) ? w[i + 1] : '\0';
    char c2 = (i + 2 < n) ? w[i + 2] : '\0';
    char c3 = (i + 3 < n) ? w[i + 3] : '\0';
    char prev = (i > 0) ? w[i - 1] : '\0';
    bool word_final_2 = (i + 2 == n);

    // Multigraph consonants first.
    if (c=='t' && c1=='s' && c2=='c' && c3=='h') { ph.push_back({"tʃ", false}); i += 4; continue; }
    if (c=='s' && c1=='c' && c2=='h') { ph.push_back({"ʃ", false}); i += 3; continue; }
    if (c=='c' && c1=='h' && c2=='s') { ph.push_back({"ks", false}); i += 3; continue; }
    if (c=='c' && c1=='h') {
      bool dark = prev=='a' || prev=='o' || prev=='u';
      ph.push_back({dark ? "x" : "ç", false}); i += 2; continue;
    }
    if (c=='c' && c1=='k') { ph.push_back({"k", false}); i += 2; continue; }
    // Doubled consonant letters mark the SHORT preceding vowel and are one
    // sound (kommen → kɔmən, Mann → man): drop the second letter and
    // re-read the lookahead (c1/c2 are stale after the erase).
    if (c == 's' && c1 == 's') {
      // ss is ALWAYS voiceless (dropping one letter would re-trigger the
      // intervocalic s → z rule: besser must stay bˈɛsɐ).
      ph.push_back({"s", false}); i += 2; continue;
    }
    if (c == c1 && !de_vowel(c) && c >= 'a' && c <= 'z') {
      w.erase(i + 1, 1); n = w.size(); continue;
    }
    if (i == 0 && c=='s' && c1=='p') { ph.push_back({"ʃp", false}); i += 2; continue; }
    if (i == 0 && c=='s' && c1=='t') { ph.push_back({"ʃt", false}); i += 2; continue; }
    if (c=='t' && c1=='z') { ph.push_back({"ts", false}); i += 2; continue; }
    if (c=='p' && c1=='h') { ph.push_back({"f", false}); i += 2; continue; }
    if (c=='t' && c1=='h') { ph.push_back({"t", false}); i += 2; continue; }
    if (c=='q' && c1=='u') { ph.push_back({"kv", false}); i += 2; continue; }
    if (c=='n' && c1=='g') { ph.push_back({"ŋ", false}); i += 2; continue; }
    if (c=='i' && c1=='g' && word_final_2) { ph.push_back({"ɪ", true}); ph.push_back({"ç", false}); i += 2; continue; }

    // Vowel clusters.
    if (c=='i' && c1=='e') { ph.push_back({"iː", true}); i += 2; continue; }
    if ((c=='e' || c=='a') && c1=='i') { ph.push_back({"aɪ", true}); i += 2; continue; }
    if (c=='e' && c1=='y') { ph.push_back({"aɪ", true}); i += 2; continue; }
    if (c=='a' && c1=='u') { ph.push_back({"aʊ", true}); i += 2; continue; }
    if ((c=='e' || c=='@') && c1=='u') { ph.push_back({"ɔʏ", true}); i += 2; continue; }
    if (c=='a' && c1=='a') { ph.push_back({"aː", true}); i += 2; continue; }
    if (c=='e' && c1=='e') { ph.push_back({"eː", true}); i += 2; continue; }
    if (c=='o' && c1=='o') { ph.push_back({"oː", true}); i += 2; continue; }
    if (de_vowel(c) && c1=='h') {  // vowel + length-h (the h is silent)
      switch (c) {
        case 'a': ph.push_back({"aː", true}); break;
        case 'e': ph.push_back({"eː", true}); break;
        case 'i': ph.push_back({"iː", true}); break;
        case 'o': ph.push_back({"oː", true}); break;
        case 'u': ph.push_back({"uː", true}); break;
        case '@': ph.push_back({"ɛː", true}); break;
        case '#': ph.push_back({"øː", true}); break;
        case '&': ph.push_back({"yː", true}); break;
        case 'y': ph.push_back({"yː", true}); break;
      }
      i += 2; continue;
    }

    if (de_vowel(c) && c1 == '$') {
      // Vowel before ß is long/tense (post-1996 orthography: Straße, groß;
      // short vowels take ss instead).
      switch (c) {
        case 'a': ph.push_back({"aː", true}); break;
        case 'e': ph.push_back({"eː", true}); break;
        case 'i': ph.push_back({"iː", true}); break;
        case 'o': ph.push_back({"oː", true}); break;
        case 'u': ph.push_back({"uː", true}); break;
        case '@': ph.push_back({"ɛː", true}); break;
        case '#': ph.push_back({"øː", true}); break;
        case '&': ph.push_back({"yː", true}); break;
        case 'y': ph.push_back({"yː", true}); break;
      }
      ++i; continue;
    }

    switch (c) {
      // Vowels (short/lax defaults; final -e/-en/-el/-er get schwa below).
      case 'a': ph.push_back({"a", true}); ++i; break;
      case 'e':
        if (i + 1 == n) ph.push_back({"ə", true});                       // final -e
        else if (c1=='n' && i + 2 == n) ph.push_back({"ə", true});       // final -en
        else if (c1=='l' && i + 2 == n) ph.push_back({"ə", true});       // final -el
        else if (c1=='r' && i + 2 == n) { ph.push_back({"ɐ", true}); ++i; }  // final -er
        else ph.push_back({"ɛ", true});
        ++i; break;
      case 'i': ph.push_back({"ɪ", true}); ++i; break;
      case 'o': ph.push_back({"ɔ", true}); ++i; break;
      case 'u': ph.push_back({"ʊ", true}); ++i; break;
      case 'y': ph.push_back({"ʏ", true}); ++i; break;
      case '@': ph.push_back({"ɛ", true}); ++i; break;
      case '#': ph.push_back({"œ", true}); ++i; break;
      case '&': ph.push_back({"ʏ", true}); ++i; break;
      // Consonants.
      case 'b': ph.push_back({(i + 1 == n || c1=='s' || c1=='t') ? "p" : "b", false}); ++i; break;
      case 'c': ph.push_back({"k", false}); ++i; break;  // loanword fallback
      case 'd': ph.push_back({(i + 1 == n || c1=='s' || c1=='t') ? "t" : "d", false}); ++i; break;
      case 'f': ph.push_back({"f", false}); ++i; break;
      case 'g': ph.push_back({(i + 1 == n || c1=='s' || c1=='t') ? "k" : "ɡ", false}); ++i; break;
      case 'h': if (i == 0 || !de_vowel(prev)) ph.push_back({"h", false}); ++i; break;
      case 'j': ph.push_back({"j", false}); ++i; break;
      case 'k': ph.push_back({"k", false}); ++i; break;
      case 'l': ph.push_back({"l", false}); ++i; break;
      case 'm': ph.push_back({"m", false}); ++i; break;
      case 'n': ph.push_back({"n", false}); ++i; break;
      case 'p': ph.push_back({"p", false}); ++i; break;
      case 'r':
        if (de_vowel(prev) && (i + 1 == n || !de_vowel(c1)))
          ph.push_back({"ɐ", false});  // vocalized coda r
        else
          ph.push_back({"ʁ", false});
        ++i; break;
      case 's':
        if (c1=='s') { ph.push_back({"s", false}); i += 2; }
        else if (i + 1 < n && de_vowel(c1)) { ph.push_back({"z", false}); ++i; }
        else { ph.push_back({"s", false}); ++i; }
        break;
      case '$': ph.push_back({"s", false}); ++i; break;
      case 't': ph.push_back({"t", false}); ++i; break;
      case 'v': ph.push_back({"f", false}); ++i; break;
      case 'w': ph.push_back({"v", false}); ++i; break;
      case 'x': ph.push_back({"ks", false}); ++i; break;
      case 'z': ph.push_back({"ts", false}); ++i; break;
      default: ++i; break;
    }
  }

  // Stress: first vowel nucleus, unless the word carries a standard
  // unstressed prefix — then the next nucleus.
  static const char* kUnstressedPrefix[] = {"ge", "be", "ver", "er", "ent", "zer", "emp", "miss"};
  int total_vowels = 0;
  for (const auto& p : ph) total_vowels += p.vowel ? 1 : 0;
  int skip = 0;
  for (const char* p : kUnstressedPrefix) {
    size_t len = strlen(p);
    // Only a real prefix when a consonant follows (Beere is not be-+ere)
    // AND the word has ≥3 nuclei — in 2-syllable words the "prefix" is
    // usually the root (geben, gehen, gestern, besser, erden).
    if (w.size() > len + 2 && w.compare(0, len, p) == 0 && !de_vowel(w[len]) &&
        total_vowels >= 3) {
      skip = 1; break;
    }
  }
  int stress_at = (skip < total_vowels) ? skip : total_vowels - 1;
  int nuclei_seen = 0;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel) {
      if (nuclei_seen == stress_at && total_vowels > 1)
        out += "ˈ";  // monosyllables unmarked
      ++nuclei_seen;
    }
    out += p.ipa;
  }
  return out;
}

// --- Italian ----------------------------------------------------------------
// Italian orthography is near-phonemic (eSpeak "it" conventions): c/g soften
// before e/i (ce→tʃe, ge→dʒe), ch/gh restore the stop, ci/gi+vowel have a
// silent i, gn→ɲ, gli→ʎ, sc+e/i→ʃ, z→ts, qu→kw, intervocalic s→z.
// Stress: accented final vowel wins (città); otherwise penultimate nucleus.

struct ItPhone { std::string ipa; bool vowel; bool accented; };

bool it_vowel_char(char c) { return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'; }

std::string phonemize_word_it(const std::string& raw) {
  // Fold UTF-8 accented vowels (à è é ì í ò ó ù ú) to base + accent flag.
  std::string w;
  std::vector<bool> acc;
  for (size_t i = 0; i < raw.size();) {
    unsigned char c = raw[i];
    if (c < 128) { w += static_cast<char>(c); acc.push_back(false); ++i; continue; }
    if (c == 0xC3 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      char base = 0;
      switch (d) {
        case 0xA0: case 0x80: base = 'a'; break;  // à À
        case 0xA8: case 0x88: case 0xA9: case 0x89: base = 'e'; break;  // è È é É
        case 0xAC: case 0x8C: case 0xAD: base = 'i'; break;  // ì Ì í
        case 0xB2: case 0x92: case 0xB3: base = 'o'; break;  // ò Ò ó
        case 0xB9: case 0x99: case 0xBA: base = 'u'; break;  // ù Ù ú
      }
      if (base) { w += base; acc.push_back(true); }
      i += 2;
      continue;
    }
    ++i;
  }

  std::vector<ItPhone> ph;
  size_t n = w.size();
  for (size_t i = 0; i < n;) {
    char c = w[i];
    char c1 = (i + 1 < n) ? w[i + 1] : '\0';
    char c2 = (i + 2 < n) ? w[i + 2] : '\0';
    char prev = (i > 0) ? w[i - 1] : '\0';
    bool a = acc.empty() ? false : acc[i];
    switch (c) {
      case 'a': ph.push_back({"a", true, a}); ++i; break;
      case 'e': ph.push_back({"e", true, a}); ++i; break;
      case 'i': ph.push_back({"i", true, a}); ++i; break;
      case 'o': ph.push_back({"o", true, a}); ++i; break;
      case 'u': ph.push_back({"u", true, a}); ++i; break;
      case 'b': ph.push_back({"b", false, false}); ++i; break;
      case 'c':
        if (c1 == 'h') { ph.push_back({"k", false, false}); i += 2; }
        else if (c1 == 'c' && (c2 == 'e' || c2 == 'i')) {
          // doubled soft c: braccio → ttʃ (one long affricate); the i is
          // silent before another vowel, a nucleus otherwise
          ph.push_back({"ttʃ", false, false});
          i += (c2 == 'i' && i + 3 < n && it_vowel_char(w[i + 3])) ? 3 : 2;
        }
        else if (c1 == 'i' && it_vowel_char(c2)) { ph.push_back({"tʃ", false, false}); i += 2; }
        else if (c1 == 'e' || c1 == 'i') { ph.push_back({"tʃ", false, false}); ++i; }
        else { ph.push_back({"k", false, false}); ++i; }
        break;
      case 'd': ph.push_back({"d", false, false}); ++i; break;
      case 'f': ph.push_back({"f", false, false}); ++i; break;
      case 'g':
        if (c1 == 'h') { ph.push_back({"ɡ", false, false}); i += 2; }
        else if (c1 == 'g' && (c2 == 'e' || c2 == 'i')) {
          // doubled soft g: formaggio → ddʒ (one long affricate); the i is
          // silent before another vowel, a nucleus otherwise
          ph.push_back({"ddʒ", false, false});
          i += (c2 == 'i' && i + 3 < n && it_vowel_char(w[i + 3])) ? 3 : 2;
        }
        else if (c1 == 'n') { ph.push_back({"ɲ", false, false}); i += 2; }
        else if (c1 == 'l' && c2 == 'i') {
          // gli+vowel: i silent; gli before consonant/end keeps /i/.
          ph.push_back({"ʎ", false, false});
          if (i + 3 < n && it_vowel_char(w[i + 3])) i += 3;
          else { ph.push_back({"i", true, false}); i += 3; }
        }
        else if (c1 == 'i' && it_vowel_char(c2)) { ph.push_back({"dʒ", false, false}); i += 2; }
        else if (c1 == 'e' || c1 == 'i') { ph.push_back({"dʒ", false, false}); ++i; }
        else { ph.push_back({"ɡ", false, false}); ++i; }
        break;
      case 'h': ++i; break;  // silent
      case 'j': ph.push_back({"j", false, false}); ++i; break;
      case 'k': ph.push_back({"k", false, false}); ++i; break;
      case 'l': ph.push_back({"l", false, false}); ++i; break;
      case 'm': ph.push_back({"m", false, false}); ++i; break;
      case 'n': ph.push_back({"n", false, false}); ++i; break;
      case 'p': ph.push_back({"p", false, false}); ++i; break;
      case 'q':
        if (c1 == 'u') { ph.push_back({"kw", false, false}); i += 2; }
        else { ph.push_back({"k", false, false}); ++i; }
        break;
      case 'r': ph.push_back({"r", false, false}); ++i; break;
      case 's':
        if (c1 == 'c' && (c2 == 'e' || c2 == 'i')) {
          // sce/sci → ʃ (sci+vowel: i silent)
          if (c2 == 'i' && i + 3 < n && it_vowel_char(w[i + 3])) { ph.push_back({"ʃ", false, false}); i += 3; }
          else { ph.push_back({"ʃ", false, false}); i += 2; }
        }
        else if (c1 == 's') { ph.push_back({"s", false, false}); i += 2; }
        else if (it_vowel_char(prev) && it_vowel_char(c1)) { ph.push_back({"z", false, false}); ++i; }
        else { ph.push_back({"s", false, false}); ++i; }
        break;
      case 't': ph.push_back({"t", false, false}); ++i; break;
      case 'v': ph.push_back({"v", false, false}); ++i; break;
      case 'w': ph.push_back({"w", false, false}); ++i; break;
      case 'x': ph.push_back({"ks", false, false}); ++i; break;
      case 'y': ph.push_back({"j", false, false}); ++i; break;
      case 'z':
        if (c1 == 'z') { ph.push_back({"ts", false, false}); i += 2; }
        else { ph.push_back({"ts", false, false}); ++i; }
        break;
      default: ++i; break;
    }
  }

  // Rising diphthongs: unaccented i/u directly before another vowel are
  // glides (piazza → pjattsa, buono → bwono, chiesa → kjeza — eSpeak's it
  // voice). The softening-i of cia/gio/scia never reaches here (consumed
  // by the c/g rules above); accented ì/ù stay syllabic.
  for (size_t i = 0; i + 1 < ph.size(); ++i) {
    if (!ph[i].vowel || ph[i].accented || !ph[i + 1].vowel) continue;
    if (ph[i].ipa == "i") { ph[i] = {"j", false, false}; }
    else if (ph[i].ipa == "u") { ph[i] = {"w", false, false}; }
  }

  // Stress: accented vowel wins; else penultimate nucleus (Italian default).
  // i/u adjacent to a strong vowel merge into the same nucleus (diphthong).
  std::vector<int> nuclei;
  int stressed = -1;
  for (size_t i = 0; i < ph.size(); ++i) {
    if (!ph[i].vowel) continue;
    bool merge = false;
    if (i > 0 && ph[i - 1].vowel) {
      bool prev_weak = (ph[i - 1].ipa == "i" || ph[i - 1].ipa == "u") && !ph[i - 1].accented;
      bool cur_weak = (ph[i].ipa == "i" || ph[i].ipa == "u") && !ph[i].accented;
      merge = prev_weak || cur_weak;
    }
    if (!merge) nuclei.push_back(static_cast<int>(i));
    if (ph[i].accented) stressed = static_cast<int>(nuclei.size()) - 1;
  }
  if (nuclei.size() > 1 && stressed < 0)
    stressed = static_cast<int>(nuclei.size()) - 2;  // penultimate
  if (nuclei.size() <= 1) stressed = -1;  // monosyllables unmarked

  std::string out;
  for (size_t i = 0; i < ph.size(); ++i) {
    if (stressed >= 0 && static_cast<size_t>(nuclei[stressed]) == i) out += "ˈ";
    out += ph[i].ipa;
  }
  return out;
}

// --- French -----------------------------------------------------------------
// French needs more machinery than es/it: silent final consonants (CaReFuL
// rule), silent final e/es/-ent, nasal vowels before coda n/m, many vowel
// digraphs, c/g softening, and a small function-word lexicon for the
// articles/clitics whose rules-only readings would be wrong. Quality target
// is "clearly intelligible", not liaison-aware (eSpeak remains better).

struct FrLex { const char* word; const char* ipa; };
static const FrLex kLexFr[] = {
    {"le", "lə"}, {"la", "la"}, {"les", "le"}, {"de", "də"}, {"des", "de"},
    {"du", "dy"}, {"un", "œ̃"}, {"une", "yn"}, {"et", "e"}, {"est", "ɛ"},
    {"es", "ɛ"}, {"je", "ʒə"}, {"me", "mə"}, {"te", "tə"}, {"se", "sə"},
    {"ce", "sə"}, {"ne", "nə"}, {"que", "kə"}, {"qui", "ki"}, {"ue", "y"},
    {"vous", "vu"}, {"nous", "nu"}, {"ils", "il"}, {"elles", "ɛl"},
    {"elle", "ɛl"}, {"il", "il"}, {"sont", "sɔ̃"}, {"ont", "ɔ̃"},
    {"a", "a"}, {"as", "a"}, {"aux", "o"}, {"au", "o"}, {"eux", "ø"},
    {"deux", "dø"}, {"dans", "dɑ̃"}, {"pas", "pa"}, {"plus", "ply"},
    {"tout", "tu"}, {"tous", "tus"}, {"fils", "fis"}, {"monsieur", "məsjø"},
    {"femme", "fam"}, {"ville", "vil"}, {"mille", "mil"}, {"hier", "jɛʁ"},
    {"oui", "wi"}, {"huit", "ɥit"}, {"dix", "dis"}, {"six", "sis"},
    {"pays", "pei"}, {"y", "i"}, {"eau", "o"}, {"eaux", "o"},
    // round-3 audit: -ent nouns/adverbs the 3pl-verb rule would silence,
    // CaReFuL monosyllables, and assorted irregulars
    {"argent", "aʁʒɑ̃"}, {"parent", "paʁɑ̃"}, {"parents", "paʁɑ̃"},
    {"dent", "dɑ̃"}, {"cent", "sɑ̃"}, {"vent", "vɑ̃"}, {"souvent", "suvɑ̃"},
    {"accident", "aksidɑ̃"}, {"client", "klijɑ̃"}, {"patient", "pasjɑ̃"},
    {"mer", "mɛʁ"}, {"fer", "fɛʁ"}, {"cher", "ʃɛʁ"}, {"vert", "vɛʁ"},
    {"hiver", "ivɛʁ"}, {"question", "kɛstjɔ̃"}, {"gestion", "ʒɛstjɔ̃"},
    {"madame", "madam"}, {"travailler", "tʁavaje"}, {"travaille", "tʁavaj"},
    {"merveilleux", "mɛʁvɛjø"}, {"meilleur", "mɛjœʁ"},
    {"monde", "mɔ̃d"}, {"grande", "ɡʁɑ̃d"}, {"seconde", "səɡɔ̃d"},
    // elision stems (c'est splits to c + est — bare "c" must read s, the
    // elided vowel was e) and CaReFuL casualties
    {"c", "s"}, {"j", "ʒ"}, {"aujourd", "oʒuʁd"}, {"sud", "syd"},
    {"but", "byt"}, {"fait", "fɛ"}, {"faits", "fɛ"},
    {"8il", "œj"}, {"oeil", "œj"}, {"yeux", "jø"},  // 8 = œ marker
};

bool fr_vowel_char(char c) {
  // markers: '1'=é '2'=è/ê '8'=œ
  return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'||c=='y'||c=='1'||c=='2'||c=='8';
}

std::string phonemize_word_fr(const std::string& raw) {
  // Fold UTF-8 accents to markers / base letters.
  std::string w;
  for (size_t i = 0; i < raw.size();) {
    unsigned char c = raw[i];
    if (c < 128) { w += static_cast<char>(c); ++i; continue; }
    if (c == 0xC3 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      switch (d) {
        case 0xA9: case 0x89: w += '1'; break;             // é É
        case 0xA8: case 0xAA: case 0x88: case 0x8A: w += '2'; break;  // è ê È Ê
        case 0xAB: w += 'e'; break;                        // ë
        case 0xA0: case 0xA2: case 0x80: case 0x82: w += 'a'; break;  // à â À Â
        case 0xAE: case 0xAF: case 0x8E: w += 'i'; break;  // î ï Î
        case 0xB4: case 0x94: w += 'o'; break;             // ô Ô
        case 0xB9: case 0xBB: case 0xBC: case 0x99: case 0x9B: w += 'u'; break;  // ù û ü
        case 0xA7: case 0x87: w += '5'; break;             // ç Ç → marker
      }
      i += 2;
      continue;
    }
    if (c == 0xC5 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0x93 || d == 0x92) w += '8';  // œ Œ
      i += 2;
      continue;
    }
    ++i;
  }

  for (const FrLex& lx : kLexFr)
    if (w == lx.word) return lx.ipa;

  size_t n = w.size();
  // Silent endings (order matters): -ment → mɑ̃ handled by rules below;
  // other final -ent silent; final e/es silent; final s/t/d/p/x/z/g/b silent.
  if (n > 4 && w.compare(n - 4, 4, "ment") == 0) {
    // keep; the nasal rule reads "en" before final t... strip just final t.
    w = w.substr(0, n - 1);
  } else if (n > 3 && w.compare(n - 3, 3, "ent") == 0) {
    w = w.substr(0, n - 3);  // 3pl verb ending: silent
  } else if (n > 2 && w.compare(n - 2, 2, "er") == 0) {
    w = w.substr(0, n - 2) + "1";  // -er → é
  } else if (n > 2 && w.compare(n - 2, 2, "ez") == 0) {
    w = w.substr(0, n - 2) + "1";  // -ez → é
  }
  bool mute_e = false;  // the word ended in mute e: its consonant SOUNDS
  if (n > 2 && w.compare(w.size() - 2, 2, "es") == 0 && w.size() == n) {
    w = w.substr(0, w.size() - 2);
    mute_e = true;
  } else if (n > 2 && !w.empty() && w.back() == 'e' && w.size() == n) {
    w = w.substr(0, w.size() - 1);
    mute_e = true;
  }
  if (mute_e && w.size() >= 2) {
    // -que/-gue: the u is orthographic (langue → lɑ̃ɡ, banque → bɑ̃k).
    if (w.compare(w.size() - 2, 2, "qu") == 0) w = w.substr(0, w.size() - 2) + "k";
    else if (w.compare(w.size() - 2, 2, "gu") == 0) w.pop_back();
    // The mute e also preserved softening/voicing of the consonant before
    // it: -ge → ʒ (rouge), -ce → s (France), vowel+se → z (chose).
    else if (w.back() == 'g') w.back() = 'j';
    else if (w.back() == 'c') w.back() = '5';  // ç marker = s
    else if (w.back() == 's' && w.size() >= 2 && fr_vowel_char(w[w.size() - 2]))
      w.back() = 'z';
  }
  // CaReFuL: keep final c/r/f/l; drop trailing s/d/t/p/x/z/g/b (repeatedly —
  // plural/verb endings stack, e.g. "enfants" → enfan). A consonant exposed
  // by stripping MUTE E is pronounced — that is what the e was for
  // (porte → pɔʁt, chose → ʃoz) — so no stripping in that case.
  if (!mute_e)
    for (int strip = 0; strip < 2 && w.size() > 1 && strchr("sdtpxzgb", w.back()); ++strip)
      w = w.substr(0, w.size() - 1);
  n = w.size();

  std::string out;
  auto nasal_ctx = [&](size_t after) {
    // n/m at `after` nasalizes when followed by a consonant (not n/m/vowel)
    // or the word end — unless the word ended in MUTE E, which keeps the
    // nasal consonant oral and pronounced (semaine → səmɛn, not səmɛ̃).
    if (after + 1 >= n) return !mute_e;
    char nx = w[after + 1];
    return !fr_vowel_char(nx) && nx != 'n' && nx != 'm';
  };

  for (size_t i = 0; i < n;) {
    char c = w[i];
    char c1 = (i + 1 < n) ? w[i + 1] : '\0';
    char c2 = (i + 2 < n) ? w[i + 2] : '\0';
    char c3 = (i + 3 < n) ? w[i + 3] : '\0';
    char prev = (i > 0) ? w[i - 1] : '\0';

    // --- doubled consonants collapse (belle → bɛl, allez → ale) ---
    if (c == c1 && !fr_vowel_char(c) && c != 'n' && c != 'm' && c != 's' && c != 'l') { ++i; continue; }
    if (c == 'l' && c1 == 'l' && !(prev == 'i')) { ++i; continue; }
    if ((c == 'n' && c1 == 'n') || (c == 'm' && c1 == 'm')) { ++i; continue; }

    // --- multigraphs / clusters ---
    if (c=='t' && c1=='i' && c2=='o' && c3=='n' && i + 4 >= n) { out += "sjɔ̃"; i += 4; continue; }
    if (c=='e' && c1=='a' && c2=='u') { out += "o"; i += 3; continue; }
    if (c=='a' && c1=='u') { out += "o"; i += 2; continue; }
    if (c=='o' && c1=='i' && c2=='n' && nasal_ctx(i + 2)) { out += "wɛ̃"; i += 3; continue; }
    if (c=='o' && c1=='i') { out += "wa"; i += 2; continue; }
    if (c=='o' && c1=='u') { out += "u"; i += 2; continue; }
    if (c=='i' && c1=='e' && c2=='n' && nasal_ctx(i + 2)) { out += "jɛ̃"; i += 3; continue; }
    if ((c=='a' || c=='e') && c1=='i' && c2=='n' && nasal_ctx(i + 2)) { out += "ɛ̃"; i += 3; continue; }
    if (c=='e' && c1=='u' && c2=='i' && c3=='l') { out += "œj"; i += 4; continue; }
    // ail/eil glides must precede the generic ai/ei → ɛ rule.
    if (c=='a' && c1=='i' && c2=='l' && i + 3 >= n) { out += "aj"; i += 3; continue; }
    if (c=='e' && c1=='i' && c2=='l') { out += "ɛj"; i += 3; continue; }
    if ((c=='a' || c=='e') && c1=='i') { out += "ɛ"; i += 2; continue; }
    if ((c=='e' || c=='8') && c1=='u') { out += "ø"; i += 2; continue; }
    if (c=='i' && c1=='l' && c2=='l') { out += "ij"; i += 3; continue; }
    // nasal vowels
    if ((c=='i' || c=='y') && (c1=='n' || c1=='m') && nasal_ctx(i + 1)) { out += "ɛ̃"; i += 2; continue; }
    if (c=='u' && (c1=='n' || c1=='m') && nasal_ctx(i + 1)) { out += "œ̃"; i += 2; continue; }
    if (c=='o' && (c1=='n' || c1=='m') && nasal_ctx(i + 1)) { out += "ɔ̃"; i += 2; continue; }
    if ((c=='a' || c=='e') && (c1=='n' || c1=='m') && nasal_ctx(i + 1)) { out += "ɑ̃"; i += 2; continue; }
    // consonant digraphs
    if (c=='c' && c1=='h') { out += "ʃ"; i += 2; continue; }
    if (c=='p' && c1=='h') { out += "f"; i += 2; continue; }
    if (c=='t' && c1=='h') { out += "t"; i += 2; continue; }
    if (c=='g' && c1=='n') { out += "ɲ"; i += 2; continue; }
    if (c=='q' && c1=='u') { out += "k"; i += 2; continue; }
    if (c=='q') { out += "k"; ++i; continue; }
    if (c=='g' && c1=='u' && (c2=='e' || c2=='i' || c2=='1' || c2=='2' || c2=='y')) { out += "ɡ"; i += 2; continue; }

    switch (c) {
      case 'a': out += "a"; ++i; break;
      case '1': out += "e"; ++i; break;  // é
      case '2': out += "ɛ"; ++i; break;  // è/ê
      case 'e':
        // e before a doubled consonant or two consonants → ɛ; else ə.
        if (c1 && c1 == c2 && !fr_vowel_char(c1)) out += "ɛ";
        else if (c1 && c2 && !fr_vowel_char(c1) && !fr_vowel_char(c2) && c1 != 'h') out += "ɛ";
        else if (i + 1 >= n) out += "ə";
        else out += "ə";
        ++i; break;
      case 'i': out += (fr_vowel_char(c1) ? "j" : "i"); ++i; break;
      case 'y': out += (fr_vowel_char(c1) ? "j" : "i"); ++i; break;
      case 'o': out += "ɔ"; ++i; break;
      case 'u': out += (c1=='i' ? "ɥ" : "y"); ++i; break;
      case '8': out += "œ"; ++i; break;
      case 'b': out += "b"; ++i; break;
      case 'c':
        if (c1=='e' || c1=='i' || c1=='y' || c1=='1' || c1=='2') out += "s";
        else if (c1=='k') { out += "k"; ++i; }
        else out += "k";
        ++i; break;
      case '5': out += "s"; ++i; break;  // ç
      case 'd': out += "d"; ++i; break;
      case 'f': out += "f"; ++i; break;
      case 'g':
        if (c1=='e' || c1=='i' || c1=='y' || c1=='1' || c1=='2') out += "ʒ";
        else out += "ɡ";
        ++i; break;
      case 'h': ++i; break;  // silent
      case 'j': out += "ʒ"; ++i; break;
      case 'k': out += "k"; ++i; break;
      case 'l': out += "l"; ++i; break;
      case 'm': out += "m"; ++i; break;
      case 'n': out += "n"; ++i; break;
      case 'p': out += "p"; ++i; break;
      case 'r': out += "ʁ"; ++i; break;
      case 's':
        if (c1=='s') { out += "s"; i += 2; }
        else if (fr_vowel_char(prev) && fr_vowel_char(c1)) { out += "z"; ++i; }
        else { out += "s"; ++i; }
        break;
      case 't': out += "t"; ++i; break;
      case 'v': out += "v"; ++i; break;
      case 'w': out += "w"; ++i; break;
      case 'x': out += "ks"; ++i; break;
      case 'z': out += "z"; ++i; break;
      default: ++i; break;
    }
  }
  return out;  // French: no lexical stress marks (phrase-final prominence)
}

// --- Portuguese (Brazilian conventions, eSpeak "pt-br"-style) ---------------
// Near-phonemic with predictable mutations: nasal vowels and -ão/-em glides,
// lh/nh palatals, c/g softening + ç, x→ʃ default, BR d/t palatalization
// before i (and final unstressed e→i which feeds it: "de"→dʒi), final
// unstressed o→u, intervocalic s voicing, orthographic stress (accents win,
// else penultimate for vowel/s/m-final words, final otherwise).

struct PtPhone { std::string ipa; bool vowel; bool accented; };

bool pt_vowel_char(char c) {
  // includes the fold markers: '3'=ê '7'=ô 'A'=ã 'O'=õ
  return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'||c=='3'||c=='7'||c=='A'||c=='O';
}

std::string phonemize_word_pt(const std::string& raw) {
  // Fold UTF-8: acute/circumflex vowels keep accent flag; ã/õ nasal markers
  // 'A'/'O'; ç → '5'.
  std::string w;
  std::vector<bool> acc;
  for (size_t i = 0; i < raw.size();) {
    unsigned char c = raw[i];
    if (c < 128) { w += static_cast<char>(c); acc.push_back(false); ++i; continue; }
    if (c == 0xC3 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      char base = 0; bool a = false;
      switch (d) {
        case 0xA1: case 0x81: case 0xA2: case 0x82: base = 'a'; a = true; break;  // á â
        case 0xA9: case 0x89: base = 'e'; a = true; break;                       // é (open)
        case 0xAA: case 0x8A: base = '3'; a = true; break;                       // ê (closed)
        case 0xAD: case 0x8D: base = 'i'; a = true; break;                        // í
        case 0xB3: case 0x93: base = 'o'; a = true; break;                        // ó (open)
        case 0xB4: case 0x94: base = '7'; a = true; break;                        // ô (closed)
        case 0xBA: case 0x9A: base = 'u'; a = true; break;                        // ú
        case 0xA3: case 0x83: base = 'A'; a = false; break;                       // ã
        case 0xB5: case 0x95: base = 'O'; a = false; break;                       // õ
        case 0xA7: case 0x87: base = '5'; break;                                  // ç
        case 0xBC: base = 'u'; break;                                             // ü (old orth.)
      }
      if (base) { w += base; acc.push_back(a); }
      i += 2;
      continue;
    }
    ++i;
  }

  std::vector<PtPhone> ph;
  size_t n = w.size();
  auto nasal_ctx = [&](size_t after) {
    if (after + 1 >= n) return true;
    char nx = w[after + 1];
    return !pt_vowel_char(nx) && nx != 'n' && nx != 'm' && nx != 'h';
  };

  for (size_t i = 0; i < n;) {
    char c = w[i];
    char c1 = (i + 1 < n) ? w[i + 1] : '\0';
    char c2 = (i + 2 < n) ? w[i + 2] : '\0';
    char prev = (i > 0) ? w[i - 1] : '\0';
    bool a = acc.empty() ? false : acc[i];

    // nasal diphthongs / vowels
    if (c=='A' && c1=='o') { ph.push_back({"ɐ̃w̃", true, false}); i += 2; continue; }
    if (c=='A' && c1=='e') { ph.push_back({"ɐ̃j̃", true, false}); i += 2; continue; }
    if (c=='O' && c1=='e') { ph.push_back({"o\xcc\x83j\xcc\x83", true, false}); i += 2; continue; }
    if (c=='A') { ph.push_back({"ɐ̃", true, false}); ++i; continue; }
    if (c=='O') { ph.push_back({"o\xcc\x83", true, false}); ++i; continue; }
    if (c=='a' && (c1=='m' || c1=='n') && nasal_ctx(i + 1)) {
      // final -am → ɐ̃w̃ (3pl), else ɐ̃
      if (c1=='m' && i + 2 >= n) ph.push_back({"ɐ̃w̃", true, a});
      else ph.push_back({"ɐ̃", true, a});
      i += 2; continue;
    }
    if (c=='e' && (c1=='m' || c1=='n') && nasal_ctx(i + 1)) {
      if (c1=='m' && i + 2 >= n) ph.push_back({"e\xcc\x83j\xcc\x83", true, a});  // final -em
      else ph.push_back({"e\xcc\x83", true, a});
      i += 2; continue;
    }
    if (c=='i' && (c1=='m' || c1=='n') && nasal_ctx(i + 1)) { ph.push_back({"i\xcc\x83", true, a}); i += 2; continue; }
    if (c=='o' && (c1=='m' || c1=='n') && nasal_ctx(i + 1)) { ph.push_back({"o\xcc\x83", true, a}); i += 2; continue; }
    if (c=='u' && (c1=='m' || c1=='n') && nasal_ctx(i + 1)) { ph.push_back({"u\xcc\x83", true, a}); i += 2; continue; }
    // digraphs
    if (c=='l' && c1=='h') { ph.push_back({"ʎ", false, false}); i += 2; continue; }
    if (c=='n' && c1=='h') { ph.push_back({"ɲ", false, false}); i += 2; continue; }
    if (c=='c' && c1=='h') { ph.push_back({"ʃ", false, false}); i += 2; continue; }
    if (c=='q' && c1=='u') {
      // que/qui: u silent; qua/quo: /kw/
      if (c2=='e' || c2=='i' || c2=='3') { ph.push_back({"k", false, false}); i += 2; }
      else { ph.push_back({"kw", false, false}); i += 2; }
      continue;
    }
    if (c=='g' && c1=='u' && (c2=='e' || c2=='i' || c2=='3')) { ph.push_back({"ɡ", false, false}); i += 2; continue; }
    if (c=='s' && c1=='s') { ph.push_back({"s", false, false}); i += 2; continue; }
    if (c=='r' && c1=='r') { ph.push_back({"ʁ", false, false}); i += 2; continue; }

    switch (c) {
      case 'a': ph.push_back({"a", true, a}); ++i; break;
      case 'e':
        // final unstressed e → i (BR), which triggers d/t palatalization.
        if (i + 1 >= n && !a) ph.push_back({"i", true, false});
        else ph.push_back({a ? "ɛ" : "e", true, a});
        ++i; break;
      case '3': ph.push_back({"e", true, true}); ++i; break;  // ê closed
      case '7': ph.push_back({"o", true, true}); ++i; break;  // ô closed
      case 'i': ph.push_back({"i", true, a}); ++i; break;
      case 'o':
        if (i + 1 >= n && !a) ph.push_back({"u", true, false});  // final o → u
        else ph.push_back({a ? "ɔ" : "o", true, a});
        ++i; break;
      case 'u': ph.push_back({"u", true, a}); ++i; break;
      case 'b': ph.push_back({"b", false, false}); ++i; break;
      case 'c':
        if (c1=='e' || c1=='i' || c1=='3') ph.push_back({"s", false, false});
        else ph.push_back({"k", false, false});
        ++i; break;
      case '5': ph.push_back({"s", false, false}); ++i; break;
      case 'd': ph.push_back({"d", false, false}); ++i; break;  // palatalized below
      case 'f': ph.push_back({"f", false, false}); ++i; break;
      case 'g':
        if (c1=='e' || c1=='i' || c1=='3') ph.push_back({"ʒ", false, false});
        else ph.push_back({"ɡ", false, false});
        ++i; break;
      case 'h': ++i; break;  // silent
      case 'j': ph.push_back({"ʒ", false, false}); ++i; break;
      case 'k': ph.push_back({"k", false, false}); ++i; break;
      case 'l':
        // coda l → w (BR): Brasil → bɾaziw
        if (i + 1 >= n || !pt_vowel_char(c1)) ph.push_back({"w", false, false});
        else ph.push_back({"l", false, false});
        ++i; break;
      case 'm': ph.push_back({"m", false, false}); ++i; break;
      case 'n': ph.push_back({"n", false, false}); ++i; break;
      case 'p': ph.push_back({"p", false, false}); ++i; break;
      case 'r':
        ph.push_back({(i == 0) ? "ʁ" : "ɾ", false, false}); ++i; break;
      case 's':
        if (pt_vowel_char(prev) && pt_vowel_char(c1)) ph.push_back({"z", false, false});
        else ph.push_back({"s", false, false});
        ++i; break;
      case 't': ph.push_back({"t", false, false}); ++i; break;
      case 'v': ph.push_back({"v", false, false}); ++i; break;
      case 'w': ph.push_back({"w", false, false}); ++i; break;
      case 'x': ph.push_back({"ʃ", false, false}); ++i; break;
      case 'y': ph.push_back({"i", true, a}); ++i; break;
      case 'z':
        // final z → s, else z
        ph.push_back({(i + 1 >= n) ? "s" : "z", false, false}); ++i; break;
      default: ++i; break;
    }
  }

  // BR palatalization: d/t before /i/ → dʒ/tʃ.
  for (size_t i = 0; i + 1 < ph.size(); ++i) {
    if (!ph[i].vowel && ph[i + 1].vowel &&
        (ph[i + 1].ipa == "i" || ph[i + 1].ipa == "i\xcc\x83")) {
      if (ph[i].ipa == "d") ph[i].ipa = "dʒ";
      else if (ph[i].ipa == "t") ph[i].ipa = "tʃ";
    }
  }

  // Stress: accent wins; else penultimate when the word ends in a/e/o/s/m/am,
  // final otherwise (r/l/z/i/u/nasal-diphthong endings). Diphthong merging as
  // in Spanish.
  std::vector<int> nuclei;
  int stressed = -1;
  for (size_t i = 0; i < ph.size(); ++i) {
    if (!ph[i].vowel) continue;
    bool merge = false;
    if (i > 0 && ph[i - 1].vowel) {
      bool prev_weak = (ph[i - 1].ipa == "i" || ph[i - 1].ipa == "u") && !ph[i - 1].accented;
      bool cur_weak = (ph[i].ipa == "i" || ph[i].ipa == "u") && !ph[i].accented;
      merge = prev_weak || cur_weak;
    }
    if (!merge) nuclei.push_back(static_cast<int>(i));
    if (ph[i].accented) stressed = static_cast<int>(nuclei.size()) - 1;
  }
  if (nuclei.size() > 1 && stressed < 0) {
    char last = w.empty() ? '\0' : w.back();
    char last2 = (w.size() > 1) ? w[w.size() - 2] : '\0';
    bool penult = (last=='a' || last=='e' || last=='o' || last=='s' ||
                   (last=='m' && (last2=='a' || last2=='e')));
    // Nasal-diphthong endings (-ão, -ãe, -õe) attract FINAL stress.
    const std::string& last_nuc = ph[nuclei.back()].ipa;
    if (last_nuc.find("\xcc\x83") != std::string::npos)  // combining tilde
      penult = false;
    stressed = static_cast<int>(nuclei.size()) - (penult ? 2 : 1);
  }
  if (nuclei.size() <= 1) stressed = -1;

  std::string out;
  for (size_t i = 0; i < ph.size(); ++i) {
    if (stressed >= 0 && static_cast<size_t>(nuclei[stressed]) == i) out += "ˈ";
    out += ph[i].ipa;
  }
  return out;
}

// --- Russian ----------------------------------------------------------------
// Cyrillic is otherwise a TOTAL loss for the grapheme fallback (the phoneme
// table has no Cyrillic symbols — every letter became UNK). Russian
// orthography is regular except for free lexical stress; without a stress
// dictionary this engine emits full (unreduced) vowels — stilted but fully
// intelligible. Covered: palatalization by soft vowels/ь, /j/ onset for
// е ё ю я after vowels/signs/word-start, ж ш ц hardness, ч щ й softness,
// final devoicing, -ого/-его genitive г→в, and a tiny exception list
// (что, сегодня, здравствуйте).

// Internal letter ids for Cyrillic (lowercased), in Unicode order
// (U+0430..U+044F); ё (U+0451) appended at the end.
enum RuL {
  RA, RB, RV, RG, RD, RE, RZH, RZ, RI, RJ, RK, RL, RM, RN, RO, RP,   // а..п
  RR, RS, RT, RU, RF, RH, RC, RCH, RSH, RSHCH, RHARD, RY, RSOFT, REH, RYU, RYA,  // р..я
  RYO,
  RUKI,   // ukr і
  RUKJI,  // ukr ї
  RUKJE,  // ukr є
  RUKG,   // ukr ґ
  RMKJ, RMKLJ, RMKNJ, RMKDZH, RMKGJ, RMKKJ, RMKDZ,  // mk/sr-cyr ј љ њ џ ѓ ќ ѕ
  RSRDJ, RSRTJ,  // sr-cyr ђ ћ
  R_NONE
};

// Decode one UTF-8 char; returns bytes consumed, sets id (R_NONE if not
// Cyrillic).
size_t ru_letter(const std::string& t, size_t i, int* id) {
  *id = R_NONE;
  unsigned char c = t[i];
  if (c == 0xD0 && i + 1 < t.size()) {
    unsigned char d = t[i + 1];
    if (d == 0x81) { *id = RYO; return 2; }                       // Ё
    if (d == 0x86) { *id = RUKI; return 2; }                      // І
    if (d == 0x87) { *id = RUKJI; return 2; }                     // Ї
    if (d == 0x84) { *id = RUKJE; return 2; }                     // Є
    if (d == 0x88) { *id = RMKJ; return 2; }                      // Ј
    if (d == 0x89) { *id = RMKLJ; return 2; }                     // Љ
    if (d == 0x8A) { *id = RMKNJ; return 2; }                     // Њ
    if (d == 0x8F) { *id = RMKDZH; return 2; }                    // Џ
    if (d == 0x83) { *id = RMKGJ; return 2; }                     // Ѓ
    if (d == 0x8C) { *id = RMKKJ; return 2; }                     // Ќ
    if (d == 0x85) { *id = RMKDZ; return 2; }                     // Ѕ
    if (d == 0x82) { *id = RSRDJ; return 2; }                     // Ђ
    if (d == 0x8B) { *id = RSRTJ; return 2; }                     // Ћ
    if (d >= 0x90 && d <= 0x9F) { *id = d - 0x90; return 2; }     // А..П
    if (d >= 0xA0 && d <= 0xAF) { *id = RR + (d - 0xA0); return 2; }  // Р..Я
    if (d >= 0xB0 && d <= 0xBF) { *id = d - 0xB0; return 2; }     // а..п
    return 2;
  }
  if (c == 0xD1 && i + 1 < t.size()) {
    unsigned char d = t[i + 1];
    if (d == 0x91) { *id = RYO; return 2; }           // ё
    if (d >= 0x80 && d <= 0x8F) { *id = RR + (d - 0x80); return 2; }  // р..я
    switch (d) {  // Ukrainian / Macedonian-Serbian lowercase
      case 0x96: *id = RUKI; return 2;   // і
      case 0x97: *id = RUKJI; return 2;  // ї
      case 0x94: *id = RUKJE; return 2;  // є
      case 0x98: *id = RMKJ; return 2;   // ј
      case 0x99: *id = RMKLJ; return 2;  // љ
      case 0x9A: *id = RMKNJ; return 2;  // њ
      case 0x9F: *id = RMKDZH; return 2; // џ
      case 0x93: *id = RMKGJ; return 2;  // ѓ
      case 0x9C: *id = RMKKJ; return 2;  // ќ
      case 0x95: *id = RMKDZ; return 2;  // ѕ
      case 0x92: *id = RSRDJ; return 2;  // ђ
      case 0x9B: *id = RSRTJ; return 2;  // ћ
    }
    return 2;
  }
  if (c == 0xD2 && i + 1 < t.size()) {
    unsigned char d = t[i + 1];
    if (d == 0x91 || d == 0x90) { *id = RUKG; return 2; }  // ґ Ґ
    return 2;
  }
  return 0;
}

bool ru_is_vowel(int id) {
  return id==RA||id==RE||id==RYO||id==RI||id==RO||id==RU||id==RY||id==REH||id==RYU||id==RYA;
}
bool ru_always_hard(int id) { return id==RZH||id==RSH||id==RC; }
bool ru_always_soft(int id) { return id==RCH||id==RSHCH||id==RJ; }
bool ru_is_cons(int id) {
  return !ru_is_vowel(id) && id != RHARD && id != RSOFT && id != R_NONE;
}

// --- Russian stress lexicon + vowel reduction --------------------------------
// Russian stress is free/lexical, so the base engine emits full (unreduced)
// vowels — intelligible but stilted. This embedded lexicon records the
// stressed-vowel index (1-based) for high-frequency words and their common
// inflected forms; for words it covers the engine then renders REAL Russian
// phonetics: ˈ on the stressed syllable, аканье (unstressed о → ɐ
// immediately pretonic / ə elsewhere, а → ɐ/ə) and иканье (unstressed е/я
// → ɪ). Out-of-lexicon words keep the safe unreduced reading — a wrong
// stress guess would be worse than none.

// Key = the word's letter-id sequence encoded one byte per id (+1).
std::string ru_key(const std::vector<int>& w) {
  std::string k;
  for (int id : w) k += static_cast<char>(id + 1);
  return k;
}

int ru_stress_lookup(const std::vector<int>& w) {
  struct E { const char* word; int v; };  // UTF-8 word, stressed vowel (1-based)
  static const E kLex[] = {
    // pronouns / function words
    {"меня", 2}, {"тебя", 2}, {"себя", 2}, {"него", 2}, {"неё", 2},
    {"мне", 1}, {"тебе", 2}, {"себе", 2}, {"ему", 2}, {"нему", 2},
    {"они", 2}, {"оно", 2}, {"она", 2}, {"вами", 1}, {"нами", 1},
    {"этот", 1}, {"это", 1}, {"эта", 1}, {"эти", 1}, {"того", 2},
    {"тогда", 2}, {"когда", 2}, {"всегда", 2}, {"иногда", 3},
    {"здесь", 1}, {"теперь", 2}, {"потом", 2}, {"почему", 3},
    {"потому", 3}, {"сегодня", 2}, {"завтра", 1}, {"вчера", 2},
    {"очень", 1}, {"ещё", 2}, {"уже", 2}, {"тоже", 1}, {"также", 1},
    {"только", 1}, {"просто", 1}, {"сейчас", 2}, {"вообще", 3},
    {"конечно", 2}, {"например", 3}, {"между", 1}, {"перед", 1},
    {"через", 1}, {"около", 1}, {"против", 1},
    // common nouns
    {"человек", 3}, {"человека", 3}, {"люди", 1}, {"людей", 2},
    {"время", 1}, {"времени", 1}, {"год", 1}, {"года", 1}, {"году", 2},
    {"годы", 1}, {"день", 1}, {"дня", 1}, {"дни", 1}, {"ночь", 1},
    {"утро", 1}, {"вечер", 1}, {"неделя", 2}, {"месяц", 1},
    {"работа", 2}, {"работу", 2}, {"работы", 2}, {"дело", 1}, {"дела", 2},
    {"слово", 1}, {"слова", 2}, {"место", 1}, {"места", 2},
    {"город", 1}, {"города", 3}, {"страна", 2}, {"страны", 2},
    {"мир", 1}, {"мира", 1}, {"земля", 2}, {"вода", 2}, {"воду", 1},
    {"воды", 1}, {"дом", 1}, {"дома", 1}, {"домой", 2},
    {"рука", 2}, {"руки", 1}, {"руку", 1}, {"нога", 2}, {"ноги", 1},
    {"голова", 3}, {"голову", 1}, {"глаза", 2}, {"глаз", 1},
    {"лицо", 2}, {"сердце", 1}, {"душа", 2}, {"жизнь", 1}, {"жизни", 1},
    {"смерть", 1}, {"друг", 1}, {"друга", 1}, {"друзья", 2},
    {"отец", 2}, {"мать", 1}, {"мама", 1}, {"папа", 1}, {"сын", 1},
    {"дочь", 1}, {"брат", 1}, {"сестра", 2}, {"семья", 2},
    {"ребёнок", 2}, {"дети", 1}, {"женщина", 1}, {"мужчина", 2},
    {"девушка", 1}, {"мальчик", 1}, {"девочка", 1},
    {"вопрос", 2}, {"ответ", 2}, {"книга", 1}, {"книги", 1},
    {"язык", 2}, {"языка", 3}, {"голос", 1}, {"музыка", 1},
    {"песня", 1}, {"история", 2}, {"деньги", 1}, {"денег", 1},
    {"машина", 2}, {"дорога", 2}, {"дверь", 1}, {"окно", 2},
    {"стол", 1}, {"стул", 1}, {"комната", 1}, {"школа", 1},
    {"учитель", 2}, {"студент", 2}, {"письмо", 2}, {"бумага", 2},
    {"телефон", 3}, {"компьютер", 2}, {"интернет", 3},
    {"правда", 1}, {"счастье", 1}, {"любовь", 2}, {"любви", 2},
    {"война", 2}, {"войны", 2}, {"народ", 2}, {"государство", 3},
    {"россия", 2}, {"москва", 2}, {"москве", 2},
    {"солнце", 1}, {"небо", 1}, {"звезда", 2}, {"луна", 2},
    {"лес", 1}, {"море", 1}, {"река", 2}, {"гора", 2}, {"горы", 1},
    {"ветер", 1}, {"дождь", 1}, {"снег", 1}, {"зима", 2}, {"зимой", 2},
    {"лето", 1}, {"летом", 1}, {"весна", 2}, {"осень", 1},
    {"утром", 1}, {"вечером", 1}, {"ночью", 1}, {"днём", 1},
    {"хлеб", 1}, {"молоко", 3}, {"мясо", 1}, {"чай", 1}, {"кофе", 1},
    // verbs (common forms)
    {"быть", 1}, {"был", 1}, {"была", 2}, {"было", 1}, {"были", 1},
    {"будет", 1}, {"будем", 1}, {"будут", 1}, {"буду", 1},
    {"есть", 1}, {"иметь", 2}, {"имеет", 2},
    {"говорить", 3}, {"говорит", 3}, {"говорил", 3}, {"говорила", 3},
    {"говорю", 3}, {"сказать", 2}, {"сказал", 2}, {"сказала", 3},
    {"скажи", 2}, {"скажите", 2},
    {"знать", 1}, {"знаю", 1}, {"знает", 1}, {"знал", 1}, {"знаешь", 1},
    {"думать", 1}, {"думаю", 1}, {"думает", 1}, {"думал", 1},
    {"хотеть", 2}, {"хочу", 2}, {"хочет", 1}, {"хотел", 2}, {"хотела", 3},
    {"мочь", 1}, {"могу", 2}, {"может", 1}, {"можно", 1}, {"мог", 1},
    {"нужно", 1}, {"надо", 1}, {"нельзя", 2},
    {"делать", 1}, {"делаю", 1}, {"делает", 1}, {"сделать", 2},
    {"видеть", 1}, {"вижу", 1}, {"видит", 1}, {"видел", 1}, {"видела", 1},
    {"смотреть", 2}, {"смотрит", 2}, {"смотрю", 2},
    {"слышать", 1}, {"слышу", 1}, {"слушать", 1}, {"слушаю", 1},
    {"идти", 2}, {"иду", 2}, {"идёт", 2}, {"шёл", 1}, {"шла", 1},
    {"пойти", 2}, {"пошёл", 2}, {"пошла", 2}, {"прийти", 2},
    {"пришёл", 2}, {"пришла", 2}, {"ходить", 2}, {"ходит", 1},
    {"ехать", 1}, {"еду", 1}, {"едет", 1}, {"приехать", 3},
    {"жить", 1}, {"живу", 2}, {"живёт", 2}, {"жил", 1}, {"жила", 2},
    {"работать", 2}, {"работаю", 2}, {"работает", 2},
    {"любить", 2}, {"люблю", 2}, {"любит", 1}, {"любил", 2},
    {"стоять", 2}, {"стоит", 2}, {"стоял", 2},
    {"сидеть", 2}, {"сидит", 2}, {"сидел", 2},
    {"лежать", 2}, {"лежит", 2}, {"лежал", 2},
    {"спать", 1}, {"сплю", 1}, {"спит", 1}, {"спал", 1},
    {"писать", 2}, {"пишу", 2}, {"пишет", 1}, {"написал", 3},
    {"читать", 2}, {"читаю", 2}, {"читает", 2}, {"прочитал", 3},
    {"давать", 2}, {"даю", 2}, {"дать", 1}, {"дал", 1}, {"дай", 1},
    {"взять", 1}, {"взял", 1}, {"взяла", 3}, {"брать", 1}, {"беру", 2},
    {"найти", 2}, {"нашёл", 2}, {"нашла", 2}, {"искать", 2}, {"ищу", 2},
    {"понять", 2}, {"понял", 1}, {"поняла", 3}, {"понимать", 3},
    {"понимаю", 3}, {"понимает", 3},
    {"помнить", 1}, {"помню", 1}, {"забыть", 2}, {"забыл", 2},
    {"начать", 2}, {"начал", 1}, {"начала", 3}, {"кончить", 1},
    {"открыть", 2}, {"открыл", 2}, {"закрыть", 2}, {"закрыл", 2},
    {"купить", 2}, {"купил", 2}, {"продать", 2},
    {"играть", 2}, {"играет", 2}, {"играл", 2},
    {"стать", 1}, {"стал", 1}, {"стала", 1}, {"становится", 2},
    {"казаться", 2}, {"кажется", 1},
    {"спросить", 2}, {"спросил", 2}, {"ответить", 2}, {"ответил", 2},
    {"помочь", 2}, {"помогите", 3}, {"помогать", 3},
    {"ждать", 1}, {"жду", 1}, {"ждёт", 1}, {"подождите", 3},
    {"показать", 3}, {"показал", 3},
    // adjectives / adverbs
    {"хорошо", 3}, {"хороший", 2}, {"хорошая", 2}, {"хорошее", 2},
    {"плохо", 1}, {"плохой", 2}, {"большой", 2}, {"большая", 2},
    {"маленький", 1}, {"новый", 1}, {"новая", 1}, {"новое", 1},
    {"старый", 1}, {"старая", 1}, {"молодой", 3}, {"молодая", 3},
    {"красивый", 2}, {"красивая", 2}, {"белый", 1}, {"чёрный", 1},
    {"красный", 1}, {"синий", 1}, {"зелёный", 2}, {"жёлтый", 1},
    {"длинный", 1}, {"короткий", 2}, {"высокий", 2}, {"низкий", 1},
    {"быстро", 1}, {"медленно", 1}, {"легко", 2}, {"трудно", 1},
    {"важно", 1}, {"важный", 1}, {"главный", 1}, {"последний", 2},
    {"первый", 1}, {"второй", 2}, {"третий", 1}, {"другой", 2},
    {"другая", 2}, {"каждый", 1}, {"каждая", 1}, {"самый", 1},
    {"русский", 1}, {"русская", 1}, {"добрый", 1}, {"дорогой", 3},
    {"счастливый", 2}, {"свободный", 2}, {"далеко", 3}, {"близко", 1},
    {"долго", 1}, {"давно", 2}, {"рано", 1}, {"поздно", 1},
    {"много", 1}, {"мало", 1}, {"больше", 1}, {"меньше", 1},
    {"лучше", 1}, {"хуже", 1}, {"снова", 1}, {"опять", 2},
    {"вместе", 1}, {"вокруг", 2}, {"вперёд", 2}, {"назад", 2},
    {"направо", 2}, {"налево", 2}, {"прямо", 1},
    {"спасибо", 2}, {"пожалуйста", 2}, {"здравствуйте", 1},
    {"привет", 2}, {"извините", 3}, {"простите", 2},
    {"свидания", 2}, {"удачи", 2},
    // numbers / time
    {"один", 2}, {"одна", 2}, {"одно", 2}, {"четыре", 2}, {"пять", 1},
    {"шесть", 1}, {"семь", 1}, {"восемь", 1}, {"девять", 1}, {"десять", 1},
    {"одиннадцать", 2}, {"двенадцать", 2}, {"тринадцать", 2},
    {"двадцать", 1}, {"тридцать", 1}, {"сорок", 1}, {"пятьдесят", 3},
    {"девяносто", 3}, {"тысяча", 1}, {"миллион", 3}, {"миллиард", 3},
    {"первая", 1}, {"второе", 2}, {"половина", 3}, {"минута", 2},
    {"минут", 2}, {"секунда", 2}, {"часов", 2}, {"часа", 2},
    {"января", 3}, {"февраля", 3}, {"марта", 1}, {"апреля", 2},
    {"июня", 2}, {"июля", 2}, {"августа", 1}, {"сентября", 3},
    {"октября", 3}, {"ноября", 3}, {"декабря", 3},
    {"понедельник", 3}, {"вторник", 1}, {"среда", 2}, {"четверг", 2},
    {"пятница", 1}, {"суббота", 2}, {"воскресенье", 3},
    // more nouns
    {"разговор", 3}, {"встреча", 1}, {"помощь", 1}, {"право", 1},
    {"закон", 2}, {"суд", 1}, {"власть", 1}, {"сила", 1}, {"свет", 1},
    {"цвет", 1}, {"звук", 1}, {"запах", 1}, {"вкус", 1}, {"еда", 2},
    {"обед", 2}, {"ужин", 1}, {"завтрак", 1}, {"магазин", 3},
    {"больница", 2}, {"врач", 1}, {"доктор", 1}, {"улица", 1},
    {"площадь", 1}, {"квартира", 2}, {"этаж", 2}, {"лестница", 1},
    {"поезд", 1}, {"самолёт", 3}, {"автобус", 2}, {"метро", 2},
    {"билет", 2}, {"аэропорт", 4}, {"вокзал", 2}, {"гостиница", 2},
    {"номер", 1}, {"ключ", 1}, {"карта", 1}, {"фотография", 3},
    {"картина", 2}, {"фильм", 1}, {"игра", 2}, {"спорт", 1},
    {"футбол", 2}, {"команда", 2}, {"группа", 1}, {"театр", 2},
    {"кино", 2}, {"концерт", 2}, {"праздник", 1}, {"подарок", 2},
    {"цветы", 2}, {"погода", 2}, {"воздух", 1}, {"огонь", 2},
    {"камень", 1}, {"дерево", 1}, {"деревья", 2}, {"трава", 2},
    {"птица", 1}, {"собака", 2}, {"кошка", 1}, {"лошадь", 1},
    {"корова", 2}, {"рыба", 1}, {"медведь", 2}, {"волк", 1},
    {"граница", 2}, {"север", 1}, {"юг", 1}, {"запад", 1}, {"восток", 2},
    {"центр", 1}, {"край", 1}, {"область", 1}, {"район", 2},
    {"деревня", 2}, {"столица", 2}, {"житель", 1}, {"сосед", 2},
    {"гость", 1}, {"хозяин", 2}, {"начальник", 2}, {"директор", 2},
    {"президент", 3}, {"министр", 2}, {"солдат", 2}, {"армия", 1},
    {"оружие", 2}, {"победа", 2}, {"поражение", 3}, {"будущее", 1},
    {"прошлое", 1}, {"настоящее", 3}, {"начало", 2}, {"конец", 2},
    {"середина", 3}, {"причина", 2}, {"результат", 3}, {"решение", 2},
    {"условие", 2}, {"возможность", 2}, {"проблема", 2}, {"ошибка", 2},
    {"успех", 2}, {"опыт", 1}, {"знание", 1}, {"память", 1},
    {"мысль", 1}, {"мечта", 2}, {"надежда", 2}, {"страх", 1},
    {"радость", 1}, {"грусть", 1}, {"боль", 1}, {"улыбка", 2},
    {"смех", 1}, {"слеза", 2}, {"слёзы", 1},
    // more verbs / adverbs
    {"приходить", 3}, {"приходит", 2}, {"уходить", 3}, {"уходит", 2},
    {"ушёл", 2}, {"ушла", 2}, {"выйти", 1}, {"вышел", 1}, {"вышла", 1},
    {"войти", 2}, {"вошёл", 2}, {"останется", 2}, {"остался", 2},
    {"осталась", 2}, {"остаться", 2}, {"вернуться", 2}, {"вернулся", 2},
    {"вернулась", 3}, {"получить", 3}, {"получил", 3}, {"получает", 3},
    {"отвечает", 3}, {"спрашивает", 2}, {"рассказал", 3},
    {"рассказывает", 2}, {"объяснить", 3}, {"учиться", 2}, {"учится", 1},
    {"учить", 2}, {"изучать", 3}, {"помогает", 3}, {"бежать", 2},
    {"бежит", 2}, {"летать", 2}, {"летит", 2}, {"плавать", 1},
    {"петь", 1}, {"поёт", 2}, {"танцевать", 3}, {"рисовать", 3},
    {"строить", 1}, {"построил", 3}, {"ломать", 2}, {"чувствовать", 1},
    {"чувствует", 1}, {"болеть", 2}, {"болит", 2}, {"лечить", 2},
    {"умереть", 3}, {"умер", 1}, {"родиться", 2}, {"родился", 2},
    {"вырос", 1}, {"расти", 2}, {"растёт", 2}, {"менять", 2},
    {"изменить", 3}, {"проверить", 2}, {"решить", 2}, {"решил", 2},
    {"выбрать", 1}, {"выбрал", 1}, {"платить", 2}, {"платит", 1},
    {"заплатил", 3}, {"стоить", 1}, {"считать", 2}, {"считает", 2},
    {"верить", 1}, {"верю", 1}, {"надеюсь", 2}, {"бояться", 2},
    {"боюсь", 2}, {"боится", 2}, {"смеяться", 2}, {"смеётся", 2},
    {"плакать", 1}, {"плачет", 1}, {"кричать", 2}, {"кричит", 2},
    {"молчать", 2}, {"молчит", 2}, {"шутить", 2},
    {"попробовать", 2}, {"пробовать", 1}, {"пытаться", 2},
    {"стараться", 2}, {"мешать", 2}, {"разрешить", 3}, {"запретить", 3},
    {"случилось", 2}, {"происходит", 3}, {"произошло", 4},
    {"кажется", 1}, {"например", 3}, {"наверное", 2}, {"обязательно", 3},
    {"действительно", 3}, {"особенно", 2}, {"совершенно", 3},
    {"абсолютно", 3}, {"срочно", 1}, {"внезапно", 2}, {"однажды", 2},
    {"недавно", 2}, {"скоро", 1}, {"позже", 1}, {"раньше", 1},
    {"дальше", 1}, {"ближе", 1}, {"выше", 1}, {"ниже", 1},
    {"громко", 1}, {"тихо", 1}, {"весело", 1}, {"грустно", 1},
    {"страшно", 1}, {"интересно", 3}, {"понятно", 2}, {"правильно", 1},
    {"неправильно", 2}, {"отлично", 2}, {"прекрасно", 2},
    {"возможно", 2}, {"невозможно", 3},
  };
  static std::map<std::string, int>* lex = nullptr;
  if (lex == nullptr) {
    lex = new std::map<std::string, int>();
    for (const auto& e : kLex) {
      // Convert the UTF-8 entry to the id-sequence key once at first use.
      std::string t(e.word), key;
      bool ok = true;
      for (size_t i = 0; i < t.size();) {
        int id;
        size_t n = ru_letter(t, i, &id);
        if (!n || id == R_NONE) { ok = false; break; }
        key += static_cast<char>(id + 1);
        i += n;
      }
      if (ok) (*lex)[key] = e.v;
    }
  }
  auto it = lex->find(ru_key(w));
  return it == lex->end() ? 0 : it->second;
}

std::string phonemize_word_ru(const std::vector<int>& w0, int stress = 0) {
  std::vector<int> w = w0;
  size_t n = w.size();
  // --- exceptions / morphology ---
  // genitive -ого/-его: г → в
  if (n >= 3 && w[n - 1] == RO && w[n - 2] == RG && (w[n - 3] == RO || w[n - 3] == RE))
    w[n - 2] = RV;

  static const char* kCons[] = {
    /*RA*/ "", /*RB*/ "b", /*RV*/ "v", /*RG*/ "ɡ", /*RD*/ "d", /*RE*/ "",
    /*RZH*/ "ʐ", /*RZ*/ "z", /*RI*/ "", /*RJ*/ "j", /*RK*/ "k",
    /*RL*/ "l", /*RM*/ "m", /*RN*/ "n", /*RO*/ "", /*RP*/ "p", /*RR*/ "r",
    /*RS*/ "s", /*RT*/ "t", /*RU*/ "", /*RF*/ "f", /*RH*/ "x", /*RC*/ "ts",
    /*RCH*/ "tɕ", /*RSH*/ "ʂ", /*RSHCH*/ "ɕː", /*RHARD*/ "", /*RY*/ "",
    /*RSOFT*/ "", /*REH*/ "", /*RYU*/ "", /*RYA*/ "", /*RYO*/ "",
  };
  static const char* kDevoiced[] = {"p", "f", "k", "t", "ʂ", "s"};  // б в г д ж з

  // Vowel ordinals for stress placement / reduction (count vowel LETTERS).
  int v_ord = 0;
  auto vowel_prefix = [&](std::string* out_) {
    ++v_ord;
    if (stress > 0 && v_ord == stress) *out_ += "ˈ";
  };
  // Reduction applies only when the stressed syllable is KNOWN (lexicon hit).
  auto reduced_ao = [&]() -> const char* {
    // аканье: immediately pretonic (or word-initial ordinal 1) → ɐ, else ə.
    return (v_ord == stress - 1 || v_ord == 1) ? "ɐ" : "ə";
  };

  std::string out;
  for (size_t i = 0; i < n;) {
    int c = w[i];
    int next = (i + 1 < n) ? w[i + 1] : R_NONE;
    int prev = (i > 0) ? w[i - 1] : R_NONE;

    if (c > RYO) {
      // Non-Russian Cyrillic letters (Ukrainian і/ї/є/ґ, Macedonian/Serbian
      // ј љ њ џ ѓ ќ ѕ ђ ћ) appearing in ru-tagged text: read them with
      // their native values instead of indexing past kCons (found by the
      // ASan fuzz harness — global-buffer-overflow at kCons[37]).
      switch (c) {
        case RUKI: out += "i"; break;
        case RUKJI: out += "ji"; break;
        case RUKJE: out += "je"; break;
        case RUKG: out += "ɡ"; break;
        case RMKJ: out += "j"; break;
        case RMKLJ: out += "ʎ"; break;
        case RMKNJ: out += "ɲ"; break;
        case RMKDZH: out += "dʒ"; break;
        case RMKGJ: out += "ɟ"; break;
        case RMKKJ: out += "c"; break;
        case RMKDZ: out += "dz"; break;
        case RSRDJ: out += "dʑ"; break;
        case RSRTJ: out += "tɕ"; break;
        default: break;
      }
      ++i;
      continue;
    }
    if (ru_is_cons(c)) {
      // Final devoicing of б в г д ж з.
      const char* base = kCons[c];
      bool at_end = (i + 1 >= n) || (next == RSOFT && i + 2 >= n);
      if (at_end) {
        switch (c) {
          case RB: base = kDevoiced[0]; break;
          case RV: base = kDevoiced[1]; break;
          case RG: base = kDevoiced[2]; break;
          case RD: base = kDevoiced[3]; break;
          case RZH: base = kDevoiced[4]; break;
          case RZ: base = kDevoiced[5]; break;
        }
      }
      out += base;
      // Palatalization: soft sign or soft vowel follows (and the consonant
      // is not always-hard); always-soft consonants are already palatal.
      bool soften = !ru_always_hard(c) && !ru_always_soft(c) &&
                    (next == RSOFT || next == RE || next == RYO ||
                     next == RI || next == RYU || next == RYA);
      if (soften) out += "ʲ";
      ++i;
      continue;
    }
    switch (c) {
      case RA:
        vowel_prefix(&out);
        out += (stress > 0 && v_ord != stress) ? reduced_ao() : "a";
        ++i; break;
      case RO:
        vowel_prefix(&out);
        out += (stress > 0 && v_ord != stress) ? reduced_ao() : "o";
        ++i; break;
      case RU: vowel_prefix(&out); out += "u"; ++i; break;
      case RY: vowel_prefix(&out); out += "ɨ"; ++i; break;
      case REH: vowel_prefix(&out); out += "ɛ"; ++i; break;
      case RI:
        vowel_prefix(&out);
        // и after ж ш ц is hard ɨ.
        out += ru_always_hard(prev) ? "ɨ" : "i";
        ++i; break;
      case RE: case RYO: case RYU: case RYA: {
        bool j_onset = (prev == R_NONE) || ru_is_vowel(prev) ||
                       prev == RSOFT || prev == RHARD;
        vowel_prefix(&out);
        const char* v = (c == RE) ? "e" : (c == RYO) ? "o" : (c == RYU) ? "u" : "a";
        // иканье: unstressed е/я → ɪ (ё is inherently stressed; ю keeps u).
        if (stress > 0 && v_ord != stress && (c == RE || c == RYA)) v = "ɪ";
        if (j_onset) out += "j";
        out += v;
        ++i; break;
      }
      case RSOFT: case RHARD: ++i; break;  // handled by neighbors
      default: ++i; break;
    }
  }
  return out;
}

// Ukrainian: mostly phonemic — и→ɪ (hard), і→i (palatalizing), е→ɛ (plain,
// never j-onset), є/ї carry the glide, г→ɦ vs ґ→ɡ, щ→ʃtʃ, hard ч/ш/ж,
// NO final devoicing, no vowel reduction.
std::string phonemize_word_uk(const std::vector<int>& w) {
  size_t n = w.size();
  auto is_vowel = [](int id) {
    return id==RA||id==RE||id==RI||id==RO||id==RU||id==RY||id==RYU||id==RYA||
           id==RUKI||id==RUKJI||id==RUKJE;
  };
  std::string out;
  for (size_t i = 0; i < n;) {
    int c = w[i];
    int next = (i + 1 < n) ? w[i + 1] : R_NONE;
    int prev = (i > 0) ? w[i - 1] : R_NONE;
    switch (c) {
      case RA: out += "a"; break;
      case RB: out += "b"; break;
      case RV: out += "v"; break;
      case RG: out += "ɦ"; break;       // г
      case RUKG: out += "ɡ"; break;     // ґ
      case RD: out += "d"; break;
      case RE: out += "ɛ"; break;       // е plain
      case RZH: out += "ʒ"; break;
      case RZ: out += "z"; break;
      case RI: out += "ɪ"; break;       // и hard
      case RUKI: out += "i"; break;     // і
      case RUKJI: out += "ji"; break;   // ї
      case RUKJE: {                     // є
        bool j = (prev == R_NONE) || is_vowel(prev) || prev == RSOFT;
        out += j ? "jɛ" : "ʲɛ";
        break;
      }
      case RJ: out += "j"; break;
      case RK: out += "k"; break;
      case RL: out += "l"; break;
      case RM: out += "m"; break;
      case RN: out += "n"; break;
      case RO: out += "o"; break;
      case RP: out += "p"; break;
      case RR: out += "r"; break;
      case RS: out += "s"; break;
      case RT: out += "t"; break;
      case RU: out += "u"; break;
      case RF: out += "f"; break;
      case RH: out += "x"; break;
      case RC: out += "ts"; break;
      case RCH: out += "tʃ"; break;
      case RSH: out += "ʃ"; break;
      case RSHCH: out += "ʃtʃ"; break;
      case RYU: {
        bool j = (prev == R_NONE) || is_vowel(prev) || prev == RSOFT;
        out += j ? "ju" : "ʲu";
        break;
      }
      case RYA: {
        bool j = (prev == R_NONE) || is_vowel(prev) || prev == RSOFT;
        out += j ? "ja" : "ʲa";
        break;
      }
      case RSOFT:
        if (next == R_NONE && !out.empty()) out += "ʲ";
        break;
      default: break;
    }
    ++i;
  }
  return out;
}

// Bulgarian: ъ is a full vowel /ɤ/, щ→ʃt, е→ɛ (plain), я/ю get j-onset or
// palatalize, final devoicing applies, no ы/э/ё/і.
std::string phonemize_word_bg(const std::vector<int>& w) {
  size_t n = w.size();
  auto is_vowel = [](int id) {
    return id==RA||id==RE||id==RI||id==RO||id==RU||id==RHARD||id==RYU||id==RYA;
  };
  std::string out;
  for (size_t i = 0; i < n;) {
    int c = w[i];
    int next = (i + 1 < n) ? w[i + 1] : R_NONE;
    int prev = (i > 0) ? w[i - 1] : R_NONE;
    bool fin = (i + 1 >= n);
    switch (c) {
      case RA: out += "a"; break;
      case RB: out += fin ? "p" : "b"; break;
      case RV: out += fin ? "f" : "v"; break;
      case RG: out += fin ? "k" : "ɡ"; break;
      case RD: out += fin ? "t" : "d"; break;
      case RE: out += "ɛ"; break;
      case RZH: out += fin ? "ʃ" : "ʒ"; break;
      case RZ: out += fin ? "s" : "z"; break;
      case RI: out += "i"; break;
      case RJ: out += "j"; break;
      case RK: out += "k"; break;
      case RL: out += "l"; break;
      case RM: out += "m"; break;
      case RN: out += "n"; break;
      case RO: out += "o"; break;
      case RP: out += "p"; break;
      case RR: out += "r"; break;
      case RS: out += "s"; break;
      case RT: out += "t"; break;
      case RU: out += "u"; break;
      case RF: out += "f"; break;
      case RH: out += "x"; break;
      case RC: out += "ts"; break;
      case RCH: out += "tʃ"; break;
      case RSH: out += "ʃ"; break;
      case RSHCH: out += "ʃt"; break;   // щ
      case RHARD: out += "ɤ"; break;    // ъ is a vowel in Bulgarian
      case RYU: {
        bool j = (prev == R_NONE) || is_vowel(prev) || prev == RSOFT;
        out += j ? "ju" : "ʲu";
        break;
      }
      case RYA: {
        bool j = (prev == R_NONE) || is_vowel(prev) || prev == RSOFT;
        out += j ? "ja" : "ʲa";
        break;
      }
      case RSOFT: break;  // ьо handled by following о
      default: break;
    }
    (void)next;
    ++i;
  }
  return out;
}

// Macedonian: Cyrillic with ј/љ/њ/џ/ѕ/ѓ/ќ, plain five vowels, no yers in
// modern orthography, and FIXED antepenultimate stress.
std::string phonemize_word_mk(const std::vector<int>& w) {
  struct MP { std::string ipa; bool vowel; };
  std::vector<MP> ph;
  for (int c : w) {
    switch (c) {
      case RA: ph.push_back({"a", true}); break;
      case RB: ph.push_back({"b", false}); break;
      case RV: ph.push_back({"v", false}); break;
      case RG: ph.push_back({"ɡ", false}); break;
      case RD: ph.push_back({"d", false}); break;
      case RE: ph.push_back({"ɛ", true}); break;
      case RZH: ph.push_back({"ʒ", false}); break;
      case RZ: ph.push_back({"z", false}); break;
      case RI: ph.push_back({"i", true}); break;
      case RMKJ: case RJ: ph.push_back({"j", false}); break;
      case RK: ph.push_back({"k", false}); break;
      case RL: ph.push_back({"l", false}); break;
      case RM: ph.push_back({"m", false}); break;
      case RN: ph.push_back({"n", false}); break;
      case RO: ph.push_back({"o", true}); break;
      case RP: ph.push_back({"p", false}); break;
      case RR: ph.push_back({"r", false}); break;
      case RS: ph.push_back({"s", false}); break;
      case RT: ph.push_back({"t", false}); break;
      case RU: ph.push_back({"u", true}); break;
      case RF: ph.push_back({"f", false}); break;
      case RH: ph.push_back({"x", false}); break;
      case RC: ph.push_back({"ts", false}); break;
      case RCH: ph.push_back({"tʃ", false}); break;
      case RSH: ph.push_back({"ʃ", false}); break;
      case RMKLJ: ph.push_back({"ʎ", false}); break;
      case RMKNJ: ph.push_back({"ɲ", false}); break;
      case RMKDZH: ph.push_back({"dʒ", false}); break;
      case RMKGJ: ph.push_back({"ɟ", false}); break;
      case RMKKJ: ph.push_back({"c", false}); break;
      case RMKDZ: ph.push_back({"dz", false}); break;
      default: break;
    }
  }
  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  // Antepenultimate, or as far left as the word allows.
  int target = total - 2;  // 1-indexed: total-2 = antepenult
  if (target < 1) target = 1;
  int seen = 0;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel) { ++seen; if (seen == target && total > 1) out += "ˈ"; }
    out += p.ipa;
  }
  return out;
}

// --- Serbian (Cyrillic) -----------------------------------------------------
// Vukovica is a strict 1:1 transliteration of Gajica (one letter per sound,
// "пиши као што говориш"); emits the SAME IPA inventory as the Latin hr/bs/sr
// engine (phonemize_word_hr) so both scripts of Serbian sound identical.
// Neutral first-syllable stress (pitch accent is lexical, as for hr).
std::string phonemize_word_sr_cyr(const std::vector<int>& w) {
  struct SP { std::string ipa; bool vowel; };
  std::vector<SP> ph;
  for (int c : w) {
    switch (c) {
      case RA: ph.push_back({"a", true}); break;
      case RB: ph.push_back({"b", false}); break;
      case RV: ph.push_back({"v", false}); break;
      case RG: ph.push_back({"\xc9\xa1", false}); break;
      case RD: ph.push_back({"d", false}); break;
      case RSRDJ: ph.push_back({"d\xca\x91", false}); break;   // ђ = đ
      case RE: ph.push_back({"e", true}); break;
      case RZH: ph.push_back({"\xca\x92", false}); break;
      case RZ: ph.push_back({"z", false}); break;
      case RI: ph.push_back({"i", true}); break;
      case RMKJ: case RJ: ph.push_back({"j", false}); break;
      case RK: ph.push_back({"k", false}); break;
      case RL: ph.push_back({"l", false}); break;
      case RMKLJ: ph.push_back({"\xca\x8e", false}); break;    // љ
      case RM: ph.push_back({"m", false}); break;
      case RN: ph.push_back({"n", false}); break;
      case RMKNJ: ph.push_back({"\xc9\xb2", false}); break;    // њ
      case RO: ph.push_back({"o", true}); break;
      case RP: ph.push_back({"p", false}); break;
      case RR: ph.push_back({"r", false}); break;
      case RS: ph.push_back({"s", false}); break;
      case RT: ph.push_back({"t", false}); break;
      case RSRTJ: ph.push_back({"t\xc9\x95", false}); break;   // ћ = ć
      case RU: ph.push_back({"u", true}); break;
      case RF: ph.push_back({"f", false}); break;
      case RH: ph.push_back({"x", false}); break;
      case RC: ph.push_back({"ts", false}); break;
      case RCH: ph.push_back({"t\xca\x83", false}); break;     // ч
      case RMKDZH: ph.push_back({"d\xca\x92", false}); break;  // џ
      case RSH: ph.push_back({"\xca\x83", false}); break;      // ш
      default: break;  // non-Serbian Cyrillic letters dropped
    }
  }
  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  bool placed = false;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel && !placed) { if (total > 1) out += "\xcb\x88"; placed = true; }
    out += p.ipa;
  }
  return out;
}

const char* phonemize_text_cyrillic(const char* utf8_text, int which) {
  // which: 0 = uk, 1 = bg, 2 = mk, 3 = sr. Same tokenizer loop as Russian.
  if (!utf8_text) return nullptr;
  std::string text(utf8_text);
  std::string result;
  std::vector<int> word;
  auto flush = [&]() {
    if (word.empty()) return;
    if (which == 0) result += phonemize_word_uk(word);
    else if (which == 1) result += phonemize_word_bg(word);
    else if (which == 3) result += phonemize_word_sr_cyr(word);
    else result += phonemize_word_mk(word);
    word.clear();
  };
  for (size_t i = 0; i < text.size();) {
    int id;
    size_t consumed = ru_letter(text, i, &id);
    if (consumed) {
      if (id != R_NONE) word.push_back(id);
      i += consumed;
      continue;
    }
    unsigned char c = text[i];
    if (which == 0 && c == 0xE2 && i + 2 < text.size() &&
        static_cast<unsigned char>(text[i+1]) == 0x80 &&
        static_cast<unsigned char>(text[i+2]) == 0x99) {
      // U+2019 apostrophe inside Ukrainian words (м'ята) = separator like ъ.
      word.push_back(RHARD);
      i += 3;
      continue;
    }
    if (c == '\'' && which == 0) { word.push_back(RHARD); ++i; continue; }
    flush();
    if (c < 128 && strchr(";:,.!?()\"- ", c)) {
      if (!(c == ' ' && !result.empty() && result.back() == ' '))
        result += static_cast<char>(c);
    }
    i += (c < 128) ? 1 : ((c >> 5) == 0x6 ? 2 : (c >> 4) == 0xE ? 3 : 4);
  }
  flush();
  char* buf = static_cast<char*>(malloc(result.size() + 1));
  memcpy(buf, result.c_str(), result.size() + 1);
  return buf;
}

// Georgian: mkhedruli is strictly one letter = one phoneme, including the
// aspirated/ejective stop series (ejectives marked with the IPA apostrophe,
// which is in the model's symbol table). No lexical stress marks (Georgian
// stress is weak). Fourth non-Latin script tier.
// Armenian (Eastern): regular script — each letter one phoneme, with the
// aspirated series (tʰ tʃʰ tsʰ pʰ kʰ), ե/ո gaining j/v onsets word-
// initially, the ու digraph → u, and final-syllable stress. 5th script.
const char* phonemize_text_hy(const char* utf8_text) {
  if (!utf8_text) return nullptr;
  // ա(0561)..ֆ(0586) → indices 0..37; և handled separately.
  static const char* kHy[38] = {
      "a", "b", "ɡ", "d", "e", "z", "e", "ə", "tʰ", "ʒ", "i", "l", "x",
      "ts", "k", "h", "dz", "ʁ", "tʃ", "m", "j", "n", "ʃ", "o", "tʃʰ",
      "p", "dʒ", "r", "s", "v", "t", "ɾ", "tsʰ", "v", "pʰ", "kʰ", "o", "f"};
  static const bool kHyVowel[38] = {
      true, false, false, false, true, false, true, true, false, false, true,
      false, false, false, false, false, false, false, false, false, false,
      false, false, true, false, false, false, false, false, false, false,
      false, false, false, false, false, true, false};

  std::string text(utf8_text);
  std::string result;
  std::vector<int> word;

  auto decode = [&](size_t i, int* id) -> size_t {
    *id = -1;
    unsigned char c = text[i];
    if ((c == 0xD4 || c == 0xD5 || c == 0xD6) && i + 1 < text.size()) {
      unsigned cp = ((c & 0x1F) << 6) | (text[i + 1] & 0x3F);
      if (cp >= 0x0561 && cp <= 0x0586) *id = static_cast<int>(cp - 0x0561);
      else if (cp >= 0x0531 && cp <= 0x0556) *id = static_cast<int>(cp - 0x0531);
      else if (cp == 0x0587) *id = 100;  // և = ev
      return 2;
    }
    return 0;
  };

  auto flush = [&]() {
    if (word.empty()) { return; }
    struct HP { std::string ipa; bool vowel; };
    std::vector<HP> ph;
    size_t n = word.size();
    for (size_t i = 0; i < n; ++i) {
      int id = word[i];
      if (id == 100) { ph.push_back({"e", true}); ph.push_back({"v", false}); continue; }
      // ու digraph: ո(23) + ւ(33) → u.
      if (id == 23 && i + 1 < n && word[i + 1] == 33) {
        ph.push_back({"u", true});
        ++i;
        continue;
      }
      std::string ipa = kHy[id];
      bool vowel = kHyVowel[id];
      // Word-initial ե → je, ո → vo.
      if (i == 0 && id == 4) ipa = "je";
      if (i == 0 && id == 23) ipa = "vo";
      ph.push_back({ipa, vowel});
    }
    int total = 0;
    for (const auto& p : ph) total += p.vowel ? 1 : 0;
    int seen = 0;
    for (const auto& p : ph) {
      if (p.vowel) {
        ++seen;
        if (seen == total && total > 1 && p.ipa != "ə") result += "ˈ";
      }
      result += p.ipa;
    }
    word.clear();
  };

  for (size_t i = 0; i < text.size();) {
    int id;
    size_t consumed = decode(i, &id);
    if (consumed) {
      if (id >= 0) word.push_back(id);
      i += consumed;
      continue;
    }
    unsigned char c = text[i];
    flush();
    if (c < 128 && strchr(";:,.!?()\"- ", c)) {
      if (!(c == ' ' && !result.empty() && result.back() == ' '))
        result += static_cast<char>(c);
    }
    i += (c < 128) ? 1 : ((c >> 5) == 0x6 ? 2 : (c >> 4) == 0xE ? 3 : 4);
  }
  flush();
  char* buf = static_cast<char*>(malloc(result.size() + 1));
  memcpy(buf, result.c_str(), result.size() + 1);
  return buf;
}

const char* phonemize_text_ka(const char* utf8_text) {
  if (!utf8_text) return nullptr;
  static const char* kGe[33] = {
      "a", "b", "ɡ", "d", "e", "v", "z", "tʰ", "i", "kʼ", "l", "m", "n",
      "o", "pʼ", "ʒ", "r", "s", "tʼ", "u", "pʰ", "kʰ", "ɣ", "qʼ", "ʃ",
      "tʃʰ", "tsʰ", "dz", "tsʼ", "tʃʼ", "x", "dʒ", "h"};
  std::string text(utf8_text);
  std::string result;
  for (size_t i = 0; i < text.size();) {
    unsigned char c = text[i];
    if (c == 0xE1 && i + 2 < text.size()) {
      unsigned cp = ((c & 0x0F) << 12) |
                    ((text[i + 1] & 0x3F) << 6) | (text[i + 2] & 0x3F);
      if (cp >= 0x10D0 && cp <= 0x10F0) {
        // Main mkhedruli block; archaic ჱ(10F1)+ excluded by range.
        unsigned k = cp - 0x10D0;
        if (k < 33) result += kGe[k];
        i += 3;
        continue;
      }
      i += 3;
      continue;
    }
    if (c < 128 && strchr(";:,.!?()\"- ", c)) {
      if (!(c == ' ' && !result.empty() && result.back() == ' '))
        result += static_cast<char>(c);
      ++i;
      continue;
    }
    i += (c < 128) ? 1 : ((c >> 5) == 0x6 ? 2 : (c >> 4) == 0xE ? 3 : 4);
  }
  char* buf = static_cast<char*>(malloc(result.size() + 1));
  memcpy(buf, result.c_str(), result.size() + 1);
  return buf;
}

const char* phonemize_text_ru(const char* utf8_text) {
  if (!utf8_text) return nullptr;
  std::string text(utf8_text);
  std::string result;
  std::vector<int> word;

  // Tiny exception lexicon (checked on the letter-id word).
  auto ids = [](std::initializer_list<int> l) { return std::vector<int>(l); };
  static const std::vector<int> kChto = {RCH, RT, RO};               // что → што
  static const std::vector<int> kSegodnya = {RS, RE, RG, RO, RD, RN, RYA};  // г→в
  (void)ids;

  // Unpronounceable-cluster simplification (regular across the lexicon:
  // солнце, сердце, лестница, праздник, здравствуйте, чувство,
  // счастливый): drop the silent middle consonant.
  auto simplify_clusters = [](std::vector<int>& w) {
    static const struct { std::vector<int> pat; int drop; } kRules[] = {
        {{RV, RS, RT, RV}, 0},  // вств → ств
        {{RL, RN, RC}, 0},      // лнц → нц
        {{RR, RD, RC}, 1},      // рдц → рц
        {{RS, RT, RN}, 1},      // стн → сн
        {{RZ, RD, RN}, 1},      // здн → зн
        {{RS, RT, RL}, 1},      // стл → сл
    };
    for (const auto& r : kRules) {
      for (size_t i = 0; i + r.pat.size() <= w.size();) {
        if (std::equal(r.pat.begin(), r.pat.end(), w.begin() + i)) {
          w.erase(w.begin() + i + r.drop);
        } else {
          ++i;
        }
      }
    }
    // сч/зч assimilate to щ (счастье → щастье, грузчик → грущик).
    for (size_t i = 0; i + 1 < w.size(); ++i) {
      if ((w[i] == RS || w[i] == RZ) && w[i + 1] == RCH) {
        w[i] = RSHCH;
        w.erase(w.begin() + i + 1);
      }
    }
  };

  auto flush = [&]() {
    if (word.empty()) return;
    std::vector<int> w = word;
    if (w == kChto) w[0] = RSH;
    else if (w == kSegodnya) w[2] = RV;
    simplify_clusters(w);
    result += phonemize_word_ru(w, ru_stress_lookup(word));
    word.clear();
  };

  for (size_t i = 0; i < text.size();) {
    int id;
    size_t consumed = ru_letter(text, i, &id);
    if (consumed) {
      if (id != R_NONE) word.push_back(id);
      i += consumed;
      continue;
    }
    unsigned char c = text[i];
    flush();
    if (strchr(";:,.!?()\"- ", c)) {
      if (!(c == ' ' && !result.empty() && result.back() == ' '))
        result += static_cast<char>(c);
    }
    ++i;
  }
  flush();

  char* buf = static_cast<char*>(malloc(result.size() + 1));
  memcpy(buf, result.c_str(), result.size() + 1);
  return buf;
}

// --- Turkish ----------------------------------------------------------------
// Turkish orthography is almost exactly one letter = one phoneme: c→dʒ,
// ç→tʃ, ş→ʃ, j→ʒ, ı→ɯ, ö→œ, ü→y; yumuşak ğ lengthens the preceding vowel.
// Stress: word-final (the regular default).

std::string phonemize_word_tr(const std::string& raw) {
  // Fold UTF-8 specials to markers: ı='I' i='i' ğ='G' ş='S' ç='C' ö='O' ü='U'.
  std::string w;
  for (size_t i = 0; i < raw.size();) {
    unsigned char c = raw[i];
    if (c < 128) { w += static_cast<char>(c); ++i; continue; }
    if (c == 0xC4 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0xB1) w += 'I';                 // ı
      else if (d == 0xB0) w += 'i';            // İ (dotted capital)
      else if (d == 0x9F || d == 0x9E) w += 'G';  // ğ Ğ
      i += 2; continue;
    }
    if (c == 0xC5 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0x9F || d == 0x9E) w += 'S';    // ş Ş
      i += 2; continue;
    }
    if (c == 0xC3 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0xA7 || d == 0x87) w += 'C';    // ç Ç
      else if (d == 0xB6 || d == 0x96) w += 'O';  // ö Ö
      else if (d == 0xBC || d == 0x9C) w += 'U';  // ü Ü
      else if (d == 0xA2 || d == 0xAE || d == 0xBB) {
        // â î û (old orthography): fold to plain vowels.
        w += (d == 0xA2) ? 'a' : (d == 0xAE) ? 'i' : 'u';
      }
      i += 2; continue;
    }
    if (c == 0xC9 && i + 1 < raw.size()) {
      if (raw[i + 1] == '\x99') w += 'E';  // ə (Azerbaijani schwa-letter → æ)
      i += 2; continue;
    }
    if (c == 0xC6 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0x8F) w += 'E';  // Ə
      i += 2; continue;
    }
    ++i;
  }

  auto tr_vowel = [](char c) {
    return c=='a'||c=='e'||c=='i'||c=='I'||c=='o'||c=='O'||c=='u'||c=='U';
  };
  struct TP { std::string ipa; bool vowel; };
  std::vector<TP> ph;
  size_t n = w.size();
  for (size_t i = 0; i < n; ++i) {
    char c = w[i];
    switch (c) {
      case 'a': ph.push_back({"a", true}); break;
      case 'e': ph.push_back({"e", true}); break;
      case 'i': ph.push_back({"i", true}); break;
      case 'I': ph.push_back({"ɯ", true}); break;
      case 'o': ph.push_back({"o", true}); break;
      case 'O': ph.push_back({"œ", true}); break;
      case 'u': ph.push_back({"u", true}); break;
      case 'U': ph.push_back({"y", true}); break;
      case 'E': ph.push_back({"æ", true}); break;  // Azerbaijani ə
      case 'b': ph.push_back({"b", false}); break;
      case 'c': ph.push_back({"dʒ", false}); break;
      case 'C': ph.push_back({"tʃ", false}); break;
      case 'd': ph.push_back({"d", false}); break;
      case 'f': ph.push_back({"f", false}); break;
      case 'g': ph.push_back({"ɡ", false}); break;
      case 'G':
        // yumuşak ğ: lengthen the preceding vowel (or glide between vowels).
        if (!ph.empty() && ph.back().vowel) ph.back().ipa += "ː";
        break;
      case 'h': ph.push_back({"h", false}); break;
      case 'j': ph.push_back({"ʒ", false}); break;
      case 'k': ph.push_back({"k", false}); break;
      case 'l': ph.push_back({"l", false}); break;
      case 'm': ph.push_back({"m", false}); break;
      case 'n': ph.push_back({"n", false}); break;
      case 'p': ph.push_back({"p", false}); break;
      case 'r': ph.push_back({"ɾ", false}); break;
      case 's': ph.push_back({"s", false}); break;
      case 'S': ph.push_back({"ʃ", false}); break;
      case 't': ph.push_back({"t", false}); break;
      case 'v': ph.push_back({"v", false}); break;
      case 'y': ph.push_back({"j", false}); break;
      case 'z': ph.push_back({"z", false}); break;
      case 'q': ph.push_back({"ɡ", false}); break;  // Azerbaijani
      case 'x': ph.push_back({"x", false}); break;  // Azerbaijani
      default: break;
    }
    (void)tr_vowel;
  }

  // Final-syllable stress (regular default; exceptions need a lexicon).
  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  int seen = 0;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel) {
      ++seen;
      if (seen == total && total > 1) out += "ˈ";
    }
    out += p.ipa;
  }
  return out;
}

// --- Polish -----------------------------------------------------------------
// Regular orthography with rich digraphs: sz/cz/rz/ch/dz/dż/dź, the palatal
// series ć ś ź ń dź (also spelled ci/si/zi/ni/dzi before vowels, where the
// i is silent), nasal ą/ę (ę denasalizes word-finally), ł→w, w→v, y→ɨ,
// ó→u, final devoicing. Stress: penultimate (regular).

std::string phonemize_word_pl(const std::string& raw) {
  // Markers: A=ą C=ć E=ę L=ł N=ń S=ś Z=ź X=ż (ó folds to 'u').
  std::string w;
  for (size_t i = 0; i < raw.size();) {
    unsigned char c = raw[i];
    if (c < 128) { w += static_cast<char>(c); ++i; continue; }
    if (c == 0xC4 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0x85 || d == 0x84) w += 'A';       // ą
      else if (d == 0x87 || d == 0x86) w += 'C';  // ć
      else if (d == 0x99 || d == 0x98) w += 'E';  // ę
      i += 2; continue;
    }
    if (c == 0xC5 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0x82 || d == 0x81) w += 'L';       // ł
      else if (d == 0x84 || d == 0x83) w += 'N';  // ń
      else if (d == 0x9B || d == 0x9A) w += 'S';  // ś
      else if (d == 0xBA || d == 0xB9) w += 'Z';  // ź
      else if (d == 0xBC || d == 0xBB) w += 'X';  // ż
      i += 2; continue;
    }
    if (c == 0xC3 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0xB3 || d == 0x93) w += 'u';       // ó → /u/
      i += 2; continue;
    }
    ++i;
  }

  auto pl_vowel = [](char c) {
    return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'||c=='y'||c=='A'||c=='E';
  };
  struct PP { std::string ipa; bool vowel; };
  std::vector<PP> ph;
  size_t n = w.size();
  for (size_t i = 0; i < n;) {
    char c = w[i];
    char c1 = (i + 1 < n) ? w[i + 1] : '\0';
    char c2 = (i + 2 < n) ? w[i + 2] : '\0';
    bool at_end_after = (i + 2 >= n);

    // digraphs
    if (c=='s' && c1=='z') { ph.push_back({"ʂ", false}); i += 2; continue; }
    if (c=='c' && c1=='z') { ph.push_back({"tʂ", false}); i += 2; continue; }
    if (c=='r' && c1=='z') { ph.push_back({at_end_after ? "ʂ" : "ʐ", false}); i += 2; continue; }
    if (c=='c' && c1=='h') { ph.push_back({"x", false}); i += 2; continue; }
    if (c=='d' && c1=='z' && c2=='i' && i + 3 < n && pl_vowel(w[i + 3])) {
      ph.push_back({"dʑ", false}); i += 3; continue;  // dzi+V, i silent
    }
    if (c=='d' && c1=='z') { ph.push_back({"dz", false}); i += 2; continue; }
    if (c=='d' && c1=='X') { ph.push_back({"dʐ", false}); i += 2; continue; }
    if (c=='d' && c1=='Z') { ph.push_back({"dʑ", false}); i += 2; continue; }
    // palatal series spelled with i before a vowel (i silent)
    if (c=='c' && c1=='i' && pl_vowel(c2)) { ph.push_back({"tɕ", false}); i += 2; continue; }
    if (c=='s' && c1=='i' && pl_vowel(c2)) { ph.push_back({"ɕ", false}); i += 2; continue; }
    if (c=='z' && c1=='i' && pl_vowel(c2)) { ph.push_back({"ʑ", false}); i += 2; continue; }
    if (c=='n' && c1=='i' && pl_vowel(c2)) { ph.push_back({"ɲ", false}); i += 2; continue; }

    switch (c) {
      case 'a': ph.push_back({"a", true}); ++i; break;
      case 'A': ph.push_back({"ɔ\xcc\x83", true}); ++i; break;  // ą
      case 'e': ph.push_back({"ɛ", true}); ++i; break;
      case 'E':
        // ę denasalizes word-finally.
        ph.push_back({(i + 1 >= n) ? "ɛ" : "ɛ\xcc\x83", true}); ++i; break;
      case 'i':
        // i before a vowel marks palatalization: emit a glide, not a nucleus
        // (mówię → muvjɛ). Handled after the ci/si/zi/ni/dzi digraphs above.
        if (pl_vowel(c1) && c1 != 'i') ph.push_back({"j", false});
        else ph.push_back({"i", true});
        ++i; break;
      case 'o': ph.push_back({"ɔ", true}); ++i; break;
      case 'u': ph.push_back({"u", true}); ++i; break;
      case 'y': ph.push_back({"ɨ", true}); ++i; break;
      case 'b': ph.push_back({(i + 1 >= n) ? "p" : "b", false}); ++i; break;
      case 'c': ph.push_back({"ts", false}); ++i; break;
      case 'C': ph.push_back({"tɕ", false}); ++i; break;
      case 'd': ph.push_back({(i + 1 >= n) ? "t" : "d", false}); ++i; break;
      case 'f': ph.push_back({"f", false}); ++i; break;
      case 'g': ph.push_back({(i + 1 >= n) ? "k" : "ɡ", false}); ++i; break;
      case 'h': ph.push_back({"x", false}); ++i; break;
      case 'j': ph.push_back({"j", false}); ++i; break;
      case 'k': ph.push_back({"k", false}); ++i; break;
      case 'l': ph.push_back({"l", false}); ++i; break;
      case 'L': ph.push_back({"w", false}); ++i; break;
      case 'm': ph.push_back({"m", false}); ++i; break;
      case 'n': ph.push_back({"n", false}); ++i; break;
      case 'N': ph.push_back({"ɲ", false}); ++i; break;
      case 'p': ph.push_back({"p", false}); ++i; break;
      case 'r': ph.push_back({"r", false}); ++i; break;
      case 's': ph.push_back({"s", false}); ++i; break;
      case 'S': ph.push_back({"ɕ", false}); ++i; break;
      case 't': ph.push_back({"t", false}); ++i; break;
      case 'w': ph.push_back({(i + 1 >= n) ? "f" : "v", false}); ++i; break;
      case 'X': ph.push_back({(i + 1 >= n) ? "ʂ" : "ʐ", false}); ++i; break;
      case 'z': ph.push_back({(i + 1 >= n) ? "s" : "z", false}); ++i; break;
      case 'Z': ph.push_back({"ʑ", false}); ++i; break;
      default: ++i; break;
    }
  }

  // Penultimate stress.
  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  int target = (total > 1) ? total - 1 : -1;  // 1-indexed from start: penult
  int seen = 0;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel) {
      ++seen;
      if (seen == target) out += "ˈ";
    }
    out += p.ipa;
  }
  return out;
}

// --- Dutch ------------------------------------------------------------------
// Regular digraph-heavy orthography: long/short vowel pairs (aa/a, ee/e,
// oo/o, uu/u) with open-syllable lengthening, ij/ei→ɛi, ui→œy, oe→u, eu→øː,
// ou/au→ʌu, g/ch→x(ɣ), sch→sx, w→ʋ, final devoicing, schwa in final -e/-en.
// Stress: first syllable (Germanic default; prefixes as in German).

std::string phonemize_word_nl(const std::string& raw) {
  if (raw == "een") return "ən";  // the article (the numeral 'één' folds to 'een' too rarely)
  std::string w;
  for (size_t i = 0; i < raw.size();) {
    unsigned char c = raw[i];
    if (c < 128) { w += static_cast<char>(c); ++i; continue; }
    if (c == 0xC3 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      // ë ï é è (trema/accents fold to plain vowels)
      switch (d) {
        case 0xAB: w += 'e'; break;
        case 0xAF: w += 'i'; break;
        case 0xA9: case 0xA8: w += 'e'; break;
        case 0xB6: w += 'o'; break;
        case 0xBC: w += 'u'; break;
      }
      i += 2; continue;
    }
    ++i;
  }

  auto nl_vowel = [](char c) {
    return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'||c=='y';
  };
  struct NP { std::string ipa; bool vowel; };
  std::vector<NP> ph;
  size_t n = w.size();
  for (size_t i = 0; i < n;) {
    char c = w[i];
    char c1 = (i + 1 < n) ? w[i + 1] : '\0';
    char c2 = (i + 2 < n) ? w[i + 2] : '\0';

    // trigraphs / digraph vowels
    if (c=='a' && c1=='a' && c2=='i') { ph.push_back({"aːi", true}); i += 3; continue; }
    if (c=='o' && c1=='o' && c2=='i') { ph.push_back({"oːi", true}); i += 3; continue; }
    if (c=='i' && c1=='e' && c2=='u' && i + 3 < n && w[i+3]=='w') { ph.push_back({"iu", true}); i += 4; continue; }
    if (c=='a' && c1=='a') { ph.push_back({"aː", true}); i += 2; continue; }
    if (c=='e' && c1=='e') { ph.push_back({"eː", true}); i += 2; continue; }
    if (c=='o' && c1=='o') { ph.push_back({"oː", true}); i += 2; continue; }
    if (c=='u' && c1=='u') { ph.push_back({"y", true}); i += 2; continue; }
    if (c=='i' && c1=='e') { ph.push_back({"i", true}); i += 2; continue; }
    if (c=='o' && c1=='e') { ph.push_back({"u", true}); i += 2; continue; }
    if (c=='e' && c1=='u') { ph.push_back({"øː", true}); i += 2; continue; }
    if (c=='u' && c1=='i') { ph.push_back({"œy", true}); i += 2; continue; }
    if ((c=='i' && c1=='j') || (c=='e' && c1=='i')) { ph.push_back({"ɛi", true}); i += 2; continue; }
    if ((c=='o' || c=='a') && c1=='u') {
      ph.push_back({"ʌu", true});
      i += 2;
      if (i < n && w[i] == 'w') ++i;  // ouw/auw
      continue;
    }
    // consonant clusters
    if (c=='s' && c1=='c' && c2=='h') {
      // word-final -isch → /is/; else s+x
      if (i + 3 >= n && i >= 1) { ph.push_back({"s", false}); i += 3; continue; }
      ph.push_back({"sx", false}); i += 3; continue;
    }
    if (c=='c' && c1=='h') { ph.push_back({"x", false}); i += 2; continue; }
    if (c=='n' && c1=='g') { ph.push_back({"ŋ", false}); i += 2; continue; }
    if (c=='n' && c1=='k') { ph.push_back({"ŋk", false}); i += 2; continue; }
    if (c=='t' && c1=='i' && c2=='e' && i + 3 >= n) { ph.push_back({"tsi", true}); i += 3; continue; }

    switch (c) {
      case 'a':
        // open syllable (single consonant + vowel follows) → long.
        if (!nl_vowel(c1) && c1 && nl_vowel(c2)) ph.push_back({"aː", true});
        else ph.push_back({"ɑ", true});
        ++i; break;
      case 'e':
        if (i + 1 >= n) ph.push_back({"ə", true});                     // final -e
        else if (c1=='n' && i + 2 >= n) ph.push_back({"ə", true});     // final -en
        else if (c1=='r' && i + 2 >= n) ph.push_back({"ə", true});     // final -er
        else if (!nl_vowel(c1) && c1 && nl_vowel(c2)) ph.push_back({"eː", true});
        else ph.push_back({"ɛ", true});
        ++i; break;
      case 'i': ph.push_back({"ɪ", true}); ++i; break;
      case 'o':
        if (!nl_vowel(c1) && c1 && nl_vowel(c2)) ph.push_back({"oː", true});
        else ph.push_back({"ɔ", true});
        ++i; break;
      case 'u':
        if (!nl_vowel(c1) && c1 && nl_vowel(c2)) ph.push_back({"y", true});
        else ph.push_back({"ʏ", true});
        ++i; break;
      case 'y': ph.push_back({"i", true}); ++i; break;
      case 'b': ph.push_back({(i + 1 >= n) ? "p" : "b", false}); ++i; break;
      case 'c': ph.push_back({(c1=='e' || c1=='i') ? "s" : "k", false}); ++i; break;
      case 'd': ph.push_back({(i + 1 >= n) ? "t" : "d", false}); ++i; break;
      case 'f': ph.push_back({"f", false}); ++i; break;
      case 'g': ph.push_back({"ɣ", false}); ++i; break;
      case 'h': ph.push_back({"ɦ", false}); ++i; break;
      case 'j': ph.push_back({"j", false}); ++i; break;
      case 'k': ph.push_back({"k", false}); ++i; break;
      case 'l': ph.push_back({"l", false}); ++i; break;
      case 'm': ph.push_back({"m", false}); ++i; break;
      case 'n': ph.push_back({"n", false}); ++i; break;
      case 'p': ph.push_back({"p", false}); ++i; break;
      case 'q': ph.push_back({"k", false}); ++i; break;
      case 'r': ph.push_back({"r", false}); ++i; break;
      case 's': ph.push_back({"s", false}); ++i; break;
      case 't': ph.push_back({"t", false}); ++i; break;
      case 'v': ph.push_back({"v", false}); ++i; break;
      case 'w': ph.push_back({"ʋ", false}); ++i; break;
      case 'x': ph.push_back({"ks", false}); ++i; break;
      case 'z': ph.push_back({"z", false}); ++i; break;
      default: ++i; break;
    }
  }

  // First-syllable stress; skip unstressed verbal prefixes (as in German).
  static const char* kNlPrefix[] = {"ge", "be", "ver", "er", "ont", "her"};
  int skip = 0;
  for (const char* p : kNlPrefix) {
    size_t len = strlen(p);
    // Only a real prefix when a consonant follows (beetje is not be-+etje).
    if (w.size() > len + 2 && w.compare(0, len, p) == 0 && !nl_vowel(w[len])) {
      skip = 1; break;
    }
  }
  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  int stress_at = (skip < total) ? skip : total - 1;
  int seen = 0;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel) {
      if (seen == stress_at && total > 1) out += "ˈ";
      ++seen;
    }
    out += p.ipa;
  }
  return out;
}

// --- Czech ------------------------------------------------------------------
// Very regular: háček consonants (č š ž ř ď ť ň), acute = vowel length,
// ů→uː, ě palatalizes the preceding d/t/n (and mě→mɲe), di/ti/ni likewise,
// ch→x, c→ts, h→ɦ, final devoicing. Stress: ALWAYS first syllable.

std::string phonemize_word_cs(const std::string& raw) {
  // Markers: uppercase = háček/special; '1'-suffix handled via pairs:
  // A E I O U Y = long vowels; C=č S=š Z=ž R=ř D=ď T=ť N=ň J=ě W=ů(→uː)
  std::string w;
  for (size_t i = 0; i < raw.size();) {
    unsigned char c = raw[i];
    if (c < 128) { w += static_cast<char>(c); ++i; continue; }
    if (c == 0xC3 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      switch (d) {
        case 0xA1: case 0x81: w += 'A'; break;  // á
        case 0xA9: case 0x89: w += 'E'; break;  // é
        case 0xAD: case 0x8D: w += 'I'; break;  // í
        case 0xB3: case 0x93: w += 'O'; break;  // ó
        case 0xBA: case 0x9A: w += 'U'; break;  // ú
        case 0xBD: case 0x9D: w += 'Y'; break;  // ý
        case 0xA4: case 0x84: w += '4'; break;  // ä (Slovak)
        case 0xB4: case 0x94: w += '8'; break;  // ô (Slovak)
      }
      i += 2; continue;
    }
    if (c == 0xC4 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0x8D || d == 0x8C) w += 'C';       // č
      else if (d == 0x8F || d == 0x8E) w += 'D';  // ď
      else if (d == 0x9B || d == 0x9A) w += 'J';  // ě
      else if (d == 0xBE || d == 0xBD) w += 'G';  // ľ (Slovak)
      else if (d == 0xBA || d == 0xB9) w += 'H';  // ĺ (Slovak)
      i += 2; continue;
    }
    if (c == 0xC5 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0xA1 || d == 0xA0) w += 'S';       // š
      else if (d == 0xBE || d == 0xBD) w += 'Z';  // ž
      else if (d == 0x99 || d == 0x98) w += 'R';  // ř
      else if (d == 0xA5 || d == 0xA4) w += 'T';  // ť
      else if (d == 0x88 || d == 0x87) w += 'N';  // ň
      else if (d == 0xAF || d == 0xAE) w += 'W';  // ů
      i += 2; continue;
    }
    ++i;
  }

  auto cs_vowel = [](char c) {
    return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'||c=='y'||
           c=='A'||c=='E'||c=='I'||c=='O'||c=='U'||c=='Y'||c=='W'||c=='J';
  };
  struct CP { std::string ipa; bool vowel; };
  std::vector<CP> ph;
  size_t n = w.size();
  for (size_t i = 0; i < n;) {
    char c = w[i];
    char c1 = (i + 1 < n) ? w[i + 1] : '\0';
    bool fin = (i + 1 >= n);

    if (c=='c' && c1=='h') { ph.push_back({"x", false}); i += 2; continue; }
    // palatalizing ě / i after d t n m
    if ((c=='d' || c=='t' || c=='n' || c=='m') && c1=='J') {
      if (c=='d') ph.push_back({"ɟ", false});
      else if (c=='t') ph.push_back({"c", false});
      else if (c=='n') ph.push_back({"ɲ", false});
      else { ph.push_back({"m", false}); ph.push_back({"ɲ", false}); }  // mě→mɲe
      ph.push_back({"ɛ", true});
      i += 2; continue;
    }
    if ((c=='d' || c=='t' || c=='n') && (c1=='i' || c1=='I')) {
      ph.push_back({c=='d' ? "ɟ" : c=='t' ? "c" : "ɲ", false});
      ph.push_back({c1=='i' ? "ɪ" : "iː", true});
      i += 2; continue;
    }

    switch (c) {
      case 'a': ph.push_back({"a", true}); ++i; break;
      case 'A': ph.push_back({"aː", true}); ++i; break;
      case 'e': ph.push_back({"ɛ", true}); ++i; break;
      case 'E': ph.push_back({"ɛː", true}); ++i; break;
      case 'i': case 'y': ph.push_back({"ɪ", true}); ++i; break;
      case 'I': case 'Y': ph.push_back({"iː", true}); ++i; break;
      case 'o': ph.push_back({"o", true}); ++i; break;
      case 'O': ph.push_back({"oː", true}); ++i; break;
      case 'u': ph.push_back({"u", true}); ++i; break;
      case 'U': case 'W': ph.push_back({"uː", true}); ++i; break;
      case 'J': ph.push_back({"jɛ", true}); ++i; break;  // ě elsewhere (vě→vjɛ)
      case '4': ph.push_back({"ɛ", true}); ++i; break;    // ä (Slovak)
      case '8': ph.push_back({"uo", true}); ++i; break;   // ô (Slovak)
      case 'G': ph.push_back({"ʎ", false}); ++i; break;   // ľ
      case 'H': ph.push_back({"lː", false}); ++i; break;  // ĺ
      case 'b': ph.push_back({fin ? "p" : "b", false}); ++i; break;
      case 'c': ph.push_back({"ts", false}); ++i; break;
      case 'C': ph.push_back({"tʃ", false}); ++i; break;
      case 'd': ph.push_back({fin ? "t" : "d", false}); ++i; break;
      case 'D': ph.push_back({"ɟ", false}); ++i; break;
      case 'f': ph.push_back({"f", false}); ++i; break;
      case 'g': ph.push_back({fin ? "k" : "ɡ", false}); ++i; break;
      case 'h': ph.push_back({fin ? "x" : "ɦ", false}); ++i; break;
      case 'j': ph.push_back({"j", false}); ++i; break;
      case 'k': ph.push_back({"k", false}); ++i; break;
      case 'l': ph.push_back({"l", false}); ++i; break;
      case 'm': ph.push_back({"m", false}); ++i; break;
      case 'n': ph.push_back({"n", false}); ++i; break;
      case 'N': ph.push_back({"ɲ", false}); ++i; break;
      case 'p': ph.push_back({"p", false}); ++i; break;
      case 'q': ph.push_back({"k", false}); ++i; break;
      case 'r': ph.push_back({"r", false}); ++i; break;
      case 'R': ph.push_back({fin ? "rʃ" : "rʒ", false}); ++i; break;  // ř approx
      case 's': ph.push_back({"s", false}); ++i; break;
      case 'S': ph.push_back({"ʃ", false}); ++i; break;
      case 't': ph.push_back({"t", false}); ++i; break;
      case 'T': ph.push_back({"c", false}); ++i; break;
      case 'v': ph.push_back({fin ? "f" : "v", false}); ++i; break;
      case 'w': ph.push_back({"v", false}); ++i; break;
      case 'x': ph.push_back({"ks", false}); ++i; break;
      case 'z': ph.push_back({fin ? "s" : "z", false}); ++i; break;
      case 'Z': ph.push_back({fin ? "ʃ" : "ʒ", false}); ++i; break;
      default: ++i; break;
    }
  }

  // First-syllable stress, always.
  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  bool placed = false;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel && !placed) {
      if (total > 1) out += "ˈ";
      placed = true;
    }
    out += p.ipa;
  }
  return out;
}

// --- Romanian ---------------------------------------------------------------
// Regular: ă→ə, â/î→ɨ, ș→ʃ, ț→ts, ce/ci→tʃ (che/chi→k), ge/gi→dʒ
// (ghe/ghi→ɡ), j→ʒ, final -i after a consonant is a nonsyllabic palatal
// glide. Stress: penultimate default (lexical in reality).

std::string phonemize_word_ro(const std::string& raw) {
  // Markers: '@'=ă '^'=â/î 'S'=ș 'T'=ț
  std::string w;
  for (size_t i = 0; i < raw.size();) {
    unsigned char c = raw[i];
    if (c < 128) { w += static_cast<char>(c); ++i; continue; }
    if (c == 0xC4 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0x83 || d == 0x82) w += '@';  // ă
      else if (d == 0x82) w += '@';
      i += 2; continue;
    }
    if (c == 0xC3 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0xA2 || d == 0x82 || d == 0xAE || d == 0x8E) w += '^';  // â î
      i += 2; continue;
    }
    if (c == 0xC8 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0x99 || d == 0x98) w += 'S';       // ș (comma-below)
      else if (d == 0x9B || d == 0x9A) w += 'T';  // ț
      i += 2; continue;
    }
    if (c == 0xC5 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0x9F || d == 0x9E) w += 'S';       // ş (legacy cedilla)
      else if (d == 0xA3 || d == 0xA2) w += 'T';  // ţ
      i += 2; continue;
    }
    ++i;
  }

  auto ro_vowel = [](char c) {
    return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'||c=='@'||c=='^';
  };
  struct RP { std::string ipa; bool vowel; };
  std::vector<RP> ph;
  size_t n = w.size();
  for (size_t i = 0; i < n;) {
    char c = w[i];
    char c1 = (i + 1 < n) ? w[i + 1] : '\0';
    char c2 = (i + 2 < n) ? w[i + 2] : '\0';
    char prev = (i > 0) ? w[i - 1] : '\0';

    if (c=='c' && c1=='h' && (c2=='e' || c2=='i')) { ph.push_back({"k", false}); i += 2; continue; }
    if (c=='g' && c1=='h' && (c2=='e' || c2=='i')) { ph.push_back({"ɡ", false}); i += 2; continue; }
    if (c=='c' && (c1=='e' || c1=='i')) {
      // ci at word end: the i is the glide, fold in (tʃʲ ~ tʃ).
      if (c1=='i' && i + 2 >= n && !ro_vowel(prev)) { ph.push_back({"tʃ", false}); i += 2; continue; }
      ph.push_back({"tʃ", false}); ++i; continue;
    }
    if (c=='g' && (c1=='e' || c1=='i')) {
      if (c1=='i' && i + 2 >= n && !ro_vowel(prev)) { ph.push_back({"dʒ", false}); i += 2; continue; }
      ph.push_back({"dʒ", false}); ++i; continue;
    }
    // diphthongs ea / oa (semivowel + vowel)
    if (c=='e' && c1=='a') { ph.push_back({"ea", true}); i += 2; continue; }
    if (c=='o' && c1=='a') { ph.push_back({"oa", true}); i += 2; continue; }

    switch (c) {
      case 'a': ph.push_back({"a", true}); ++i; break;
      case '@': ph.push_back({"ə", true}); ++i; break;
      case '^': ph.push_back({"ɨ", true}); ++i; break;
      case 'e': ph.push_back({"e", true}); ++i; break;
      case 'i': {
        // final i after a consonant is a nonsyllabic palatal glide — but only
        // when the word already has a nucleus (și/zi keep syllabic i).
        bool has_nucleus = false;
        for (const auto& q : ph) has_nucleus |= q.vowel;
        if (i + 1 >= n && !ro_vowel(prev) && prev && has_nucleus)
          ph.push_back({"ʲ", false});
        else ph.push_back({"i", true});
        ++i; break;
      }
      case 'o': ph.push_back({"o", true}); ++i; break;
      case 'u': ph.push_back({"u", true}); ++i; break;
      case 'b': ph.push_back({"b", false}); ++i; break;
      case 'c': ph.push_back({"k", false}); ++i; break;
      case 'd': ph.push_back({"d", false}); ++i; break;
      case 'f': ph.push_back({"f", false}); ++i; break;
      case 'g': ph.push_back({"ɡ", false}); ++i; break;
      case 'h': ph.push_back({"h", false}); ++i; break;
      case 'j': ph.push_back({"ʒ", false}); ++i; break;
      case 'k': ph.push_back({"k", false}); ++i; break;
      case 'l': ph.push_back({"l", false}); ++i; break;
      case 'm': ph.push_back({"m", false}); ++i; break;
      case 'n': ph.push_back({"n", false}); ++i; break;
      case 'p': ph.push_back({"p", false}); ++i; break;
      case 'r': ph.push_back({"r", false}); ++i; break;
      case 's': ph.push_back({"s", false}); ++i; break;
      case 'S': ph.push_back({"ʃ", false}); ++i; break;
      case 't': ph.push_back({"t", false}); ++i; break;
      case 'T': ph.push_back({"ts", false}); ++i; break;
      case 'v': ph.push_back({"v", false}); ++i; break;
      case 'w': ph.push_back({"v", false}); ++i; break;
      case 'x': ph.push_back({"ks", false}); ++i; break;
      case 'z': ph.push_back({"z", false}); ++i; break;
      default: ++i; break;
    }
  }

  // Penultimate stress default.
  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  int target = (total > 1) ? total - 1 : -1;
  int seen = 0;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel) {
      ++seen;
      if (seen == target) out += "ˈ";
    }
    out += p.ipa;
  }
  return out;
}

// --- Finnish ----------------------------------------------------------------
// The most regular orthography in this set: one letter = one phoneme,
// double letters = length (vowels and consonants alike), ä→æ, ö→ø, y→y,
// ng→ŋː, nk→ŋk. Stress: always the first syllable.

std::string phonemize_word_fi(const std::string& raw) {
  std::string w;
  for (size_t i = 0; i < raw.size();) {
    unsigned char c = raw[i];
    if (c < 128) { w += static_cast<char>(c); ++i; continue; }
    if (c == 0xC3 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0xA4 || d == 0x84) w += '@';       // ä
      else if (d == 0xB6 || d == 0x96) w += '#';  // ö
      else if (d == 0xA5 || d == 0x85) w += 'o';  // å (Swedish loans) → o
      else if (d == 0xB5 || d == 0x95) w += '~';  // õ (Estonian) → ɤ
      else if (d == 0xBC || d == 0x9C) w += 'y';  // ü (Estonian) → y
      i += 2; continue;
    }
    ++i;
  }

  auto fi_vowel = [](char c) {
    return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'||c=='y'||c=='@'||c=='#'||c=='~';
  };
  struct FP { std::string ipa; bool vowel; };
  std::vector<FP> ph;
  size_t n = w.size();
  auto base_of = [](char c) -> const char* {
    switch (c) {
      case 'a': return "ɑ"; case 'e': return "e"; case 'i': return "i";
      case 'o': return "o"; case 'u': return "u"; case 'y': return "y";
      case '@': return "æ"; case '#': return "ø"; case '~': return "ɤ";
      case 'b': return "b"; case 'c': return "k"; case 'd': return "d";
      case 'f': return "f"; case 'g': return "ɡ"; case 'h': return "h";
      case 'j': return "j"; case 'k': return "k"; case 'l': return "l";
      case 'm': return "m"; case 'n': return "n"; case 'p': return "p";
      case 'r': return "r"; case 's': return "s"; case 't': return "t";
      case 'v': case 'w': return "ʋ"; case 'z': return "ts"; case 'x': return "ks";
      default: return "";
    }
  };
  for (size_t i = 0; i < n;) {
    char c = w[i];
    char c1 = (i + 1 < n) ? w[i + 1] : '\0';
    if (c=='n' && c1=='g') { ph.push_back({"ŋː", false}); i += 2; continue; }
    if (c=='n' && c1=='k') { ph.push_back({"ŋk", false}); i += 2; continue; }
    const char* b = base_of(c);
    if (!*b) { ++i; continue; }
    if (c1 == c) {  // doubled letter = long
      ph.push_back({std::string(b) + "ː", fi_vowel(c)});
      i += 2; continue;
    }
    ph.push_back({b, fi_vowel(c)});
    ++i;
  }

  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  bool placed = false;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel && !placed) { if (total > 1) out += "ˈ"; placed = true; }
    out += p.ipa;
  }
  return out;
}

// --- Hungarian --------------------------------------------------------------
// Regular with distinctive digraphs: s→ʃ but sz→s, zs→ʒ, cs→tʃ, gy→ɟ,
// ty→c, ny→ɲ, ly→j, c→ts; short a→ɒ, é/á/ó/ő/ű long. Stress: first
// syllable, always.

std::string phonemize_word_hu(const std::string& raw) {
  // Markers: A=á E=é I=í O=ó U=ú 1=ö 2=ő 3=ü 4=ű
  std::string w;
  for (size_t i = 0; i < raw.size();) {
    unsigned char c = raw[i];
    if (c < 128) { w += static_cast<char>(c); ++i; continue; }
    if (c == 0xC3 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      switch (d) {
        case 0xA1: case 0x81: w += 'A'; break;  // á
        case 0xA9: case 0x89: w += 'E'; break;  // é
        case 0xAD: case 0x8D: w += 'I'; break;  // í
        case 0xB3: case 0x93: w += 'O'; break;  // ó
        case 0xBA: case 0x9A: w += 'U'; break;  // ú
        case 0xB6: case 0x96: w += '1'; break;  // ö
        case 0xBC: case 0x9C: w += '3'; break;  // ü
      }
      i += 2; continue;
    }
    if (c == 0xC5 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0x91 || d == 0x90) w += '2';       // ő
      else if (d == 0xB1 || d == 0xB0) w += '4';  // ű
      i += 2; continue;
    }
    ++i;
  }

  auto hu_vowel = [](char c) {
    return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'||c=='A'||c=='E'||c=='I'||
           c=='O'||c=='U'||c=='1'||c=='2'||c=='3'||c=='4';
  };
  struct HP { std::string ipa; bool vowel; };
  std::vector<HP> ph;
  size_t n = w.size();
  for (size_t i = 0; i < n;) {
    char c = w[i];
    char c1 = (i + 1 < n) ? w[i + 1] : '\0';
    char c2 = (i + 2 < n) ? w[i + 2] : '\0';
    // digraphs (doubled digraphs like ssz/ggy simplify to the digraph)
    if (c=='d' && c1=='z' && c2=='s') { ph.push_back({"dʒ", false}); i += 3; continue; }
    if (c=='s' && c1=='z') { ph.push_back({"s", false}); i += 2; continue; }
    if (c=='z' && c1=='s') { ph.push_back({"ʒ", false}); i += 2; continue; }
    if (c=='c' && c1=='s') { ph.push_back({"tʃ", false}); i += 2; continue; }
    if (c=='g' && c1=='y') { ph.push_back({"ɟ", false}); i += 2; continue; }
    if (c=='t' && c1=='y') { ph.push_back({"c", false}); i += 2; continue; }
    if (c=='n' && c1=='y') { ph.push_back({"ɲ", false}); i += 2; continue; }
    if (c=='l' && c1=='y') { ph.push_back({"j", false}); i += 2; continue; }
    switch (c) {
      case 'a': ph.push_back({"ɒ", true}); ++i; break;
      case 'A': ph.push_back({"aː", true}); ++i; break;
      case 'e': ph.push_back({"ɛ", true}); ++i; break;
      case 'E': ph.push_back({"eː", true}); ++i; break;
      case 'i': ph.push_back({"i", true}); ++i; break;
      case 'I': ph.push_back({"iː", true}); ++i; break;
      case 'o': ph.push_back({"o", true}); ++i; break;
      case 'O': ph.push_back({"oː", true}); ++i; break;
      case 'u': ph.push_back({"u", true}); ++i; break;
      case 'U': ph.push_back({"uː", true}); ++i; break;
      case '1': ph.push_back({"ø", true}); ++i; break;
      case '2': ph.push_back({"øː", true}); ++i; break;
      case '3': ph.push_back({"y", true}); ++i; break;
      case '4': ph.push_back({"yː", true}); ++i; break;
      case 'b': ph.push_back({"b", false}); ++i; break;
      case 'c': ph.push_back({"ts", false}); ++i; break;
      case 'd': ph.push_back({"d", false}); ++i; break;
      case 'f': ph.push_back({"f", false}); ++i; break;
      case 'g': ph.push_back({"ɡ", false}); ++i; break;
      case 'h': ph.push_back({"h", false}); ++i; break;
      case 'j': ph.push_back({"j", false}); ++i; break;
      case 'k': ph.push_back({"k", false}); ++i; break;
      case 'l': ph.push_back({"l", false}); ++i; break;
      case 'm': ph.push_back({"m", false}); ++i; break;
      case 'n': ph.push_back({"n", false}); ++i; break;
      case 'p': ph.push_back({"p", false}); ++i; break;
      case 'r': ph.push_back({"r", false}); ++i; break;
      case 's': ph.push_back({"ʃ", false}); ++i; break;
      case 't': ph.push_back({"t", false}); ++i; break;
      case 'v': case 'w': ph.push_back({"v", false}); ++i; break;
      case 'x': ph.push_back({"ks", false}); ++i; break;
      case 'z': ph.push_back({"z", false}); ++i; break;
      default: ++i; break;
    }
  }

  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  bool placed = false;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel && !placed) { if (total > 1) out += "ˈ"; placed = true; }
    out += p.ipa;
  }
  return out;
}

// --- Greek (modern) ---------------------------------------------------------
// Second non-Latin script (after Cyrillic): without this, Greek text is
// all-UNK in the grapheme fallback. Modern Greek orthography is regular AND
// marks stress explicitly (tonos) — readings are high quality. Digraphs:
// ου→u, αι→e, ει/οι/υι→i, αυ/ευ→av/af|ev/ef (voiced/voiceless context),
// μπ→b, ντ→d, γκ/γγ→ɡ/ŋɡ, τσ→ts, τζ→dz; γ→ʝ before front vowels else ɣ,
// χ→ç/x likewise, σ final→ς→s.

// Letter ids: 0-23 = α..ω, with markers for stress carried separately.
size_t el_letter(const std::string& t, size_t i, int* id, bool* stressed) {
  *id = -1; *stressed = false;
  unsigned char c = t[i];
  if (c == 0xCE && i + 1 < t.size()) {
    unsigned char d = t[i + 1];
    // lowercase α(B1)..ω; uppercase Α(91)..Ω(A9); tonos forms.
    if (d >= 0xB1) { *id = d - 0xB1; return 2; }         // α..ο (B1..BF → 0..14)
    if (d >= 0x91 && d <= 0xA9 && d != 0xA2) {           // Α..Ρ, Σ..Ω
      int k = d - 0x91;          // Α..Ρ → 0..16
      if (d >= 0xA3) ++k;        // Σ(0xA3) → σ slot 18 (skip final-ς slot 17)
      *id = k; return 2;
    }
    switch (d) {  // accented lowercase in CE page
      case 0xAC: *id = 0; *stressed = true; return 2;   // ά
      case 0xAD: *id = 4; *stressed = true; return 2;   // έ
      case 0xAE: *id = 6; *stressed = true; return 2;   // ή
      case 0xAF: *id = 8; *stressed = true; return 2;   // ί
      case 0x86: *id = 0; *stressed = true; return 2;   // Ά
      case 0x88: *id = 4; *stressed = true; return 2;   // Έ
      case 0x89: *id = 6; *stressed = true; return 2;   // Ή
      case 0x8A: *id = 8; *stressed = true; return 2;   // Ί
      case 0x8C: *id = 14; *stressed = true; return 2;  // Ό
    }
    return 2;
  }
  if (c == 0xCF && i + 1 < t.size()) {
    unsigned char d = t[i + 1];
    if (d >= 0x80 && d <= 0x89) { *id = 15 + (d - 0x80); return 2; }  // π..ω
    switch (d) {
      case 0x8C: *id = 14; *stressed = true; return 2;  // ό
      case 0x8D: *id = 20; *stressed = true; return 2;  // ύ
      case 0x8E: *id = 24; *stressed = true; return 2;  // ώ
    }
    return 2;
  }
  return 0;
}

// α β γ δ ε ζ η θ ι κ λ μ ν ξ ο π ρ ς σ τ υ φ χ ψ ω → indices 0..24
// (CE B1..BF = α..ο → 0..14; CF 80..89 = π ρ ς σ τ υ φ χ ψ ω → 15..24)
std::string phonemize_word_el(const std::vector<std::pair<int,bool>>& w0) {
  enum { A=0, B=1, G=2, D=3, E=4, Z=5, H=6, TH=7, I=8, K=9, L=10, M=11, N=12,
         X=13, O=14, P=15, R=16, FS=17, S=18, T=19, Y=20, F=21, CH=22, PS=23, W=24 };
  std::vector<int> w;
  std::vector<bool> st;
  for (auto& pr : w0) { w.push_back(pr.first); st.push_back(pr.second); }
  size_t n = w.size();
  auto is_v = [&](int id) { return id==A||id==E||id==H||id==I||id==O||id==Y||id==W; };
  auto front_next = [&](size_t i) {
    // front vowel follows (ε/ι-type sounds) → palatal γ/χ.
    if (i + 1 >= n) return false;
    int v = w[i + 1];
    return v==E||v==H||v==I||v==Y;
  };
  auto voiced_next = [&](size_t i) {
    if (i + 1 >= n) return false;  // word-final αυ/ευ → f
    int c = w[i + 1];
    return is_v(c) || c==B||c==G||c==D||c==Z||c==L||c==M||c==N||c==R;
  };

  struct GP { std::string ipa; bool vowel; bool stressed; };
  std::vector<GP> ph;
  for (size_t i = 0; i < n;) {
    int c = w[i];
    int c1 = (i + 1 < n) ? w[i + 1] : -1;
    bool s0 = st[i];
    bool s1 = (i + 1 < n) ? st[i + 1] : false;
    // vowel digraphs (stress on either letter marks the nucleus)
    if (c==O && c1==Y) { ph.push_back({"u", true, s0 || s1}); i += 2; continue; }
    if (c==A && c1==I) { ph.push_back({"e", true, s0 || s1}); i += 2; continue; }
    if ((c==E || c==O || c==Y) && c1==I) { ph.push_back({"i", true, s0 || s1}); i += 2; continue; }
    if (c==A && c1==Y) { ph.push_back({voiced_next(i + 1) ? "av" : "af", true, s0 || s1}); i += 2; continue; }
    if (c==E && c1==Y) { ph.push_back({voiced_next(i + 1) ? "ev" : "ef", true, s0 || s1}); i += 2; continue; }
    // consonant digraphs
    if (c==M && c1==P) { ph.push_back({(i == 0) ? "b" : "mb", false, false}); i += 2; continue; }
    if (c==N && c1==T) { ph.push_back({(i == 0) ? "d" : "nd", false, false}); i += 2; continue; }
    if (c==G && c1==K) { ph.push_back({(i == 0) ? "ɡ" : "ŋɡ", false, false}); i += 2; continue; }
    if (c==G && c1==G) { ph.push_back({"ŋɡ", false, false}); i += 2; continue; }
    if (c==T && c1==S) { ph.push_back({"ts", false, false}); i += 2; continue; }
    if (c==T && c1==Z) { ph.push_back({"dz", false, false}); i += 2; continue; }

    switch (c) {
      case A: ph.push_back({"a", true, s0}); break;
      case B: ph.push_back({"v", false, false}); break;
      case G: ph.push_back({front_next(i) ? "ʝ" : "ɣ", false, false}); break;
      case D: ph.push_back({"ð", false, false}); break;
      case E: ph.push_back({"e", true, s0}); break;
      case Z: ph.push_back({"z", false, false}); break;
      case H: ph.push_back({"i", true, s0}); break;
      case TH: ph.push_back({"θ", false, false}); break;
      case I: ph.push_back({"i", true, s0}); break;
      case K: ph.push_back({"k", false, false}); break;
      case L: ph.push_back({"l", false, false}); break;
      case M: ph.push_back({"m", false, false}); break;
      case N: ph.push_back({"n", false, false}); break;
      case X: ph.push_back({"ks", false, false}); break;
      case O: ph.push_back({"o", true, s0}); break;
      case P: ph.push_back({"p", false, false}); break;
      case R: ph.push_back({"r", false, false}); break;
      case FS: case S: ph.push_back({"s", false, false}); break;
      case T: ph.push_back({"t", false, false}); break;
      case Y: ph.push_back({"i", true, s0}); break;
      case F: ph.push_back({"f", false, false}); break;
      case CH: ph.push_back({front_next(i) ? "ç" : "x", false, false}); break;
      case PS: ph.push_back({"ps", false, false}); break;
      case W: ph.push_back({"o", true, s0}); break;
      default: break;
    }
    ++i;
  }

  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel && p.stressed && total > 1) out += "ˈ";
    out += p.ipa;
  }
  return out;
}

const char* phonemize_text_el(const char* utf8_text) {
  if (!utf8_text) return nullptr;
  std::string text(utf8_text);
  std::string result;
  std::vector<std::pair<int,bool>> word;

  auto flush = [&]() {
    if (!word.empty()) {
      result += phonemize_word_el(word);
      word.clear();
    }
  };
  for (size_t i = 0; i < text.size();) {
    int id; bool stressed;
    size_t consumed = el_letter(text, i, &id, &stressed);
    if (consumed) {
      if (id >= 0 && id <= 24) word.push_back({id, stressed});
      i += consumed;
      continue;
    }
    unsigned char c = text[i];
    flush();
    if (strchr(";:,.!?()\"- ", c)) {
      if (!(c == ' ' && !result.empty() && result.back() == ' '))
        result += static_cast<char>(c);
    }
    ++i;
  }
  flush();
  char* buf = static_cast<char*>(malloc(result.size() + 1));
  memcpy(buf, result.c_str(), result.size() + 1);
  return buf;
}

// --- Korean -----------------------------------------------------------------
// Hangul decomposes algorithmically: syllable = U+AC00 + (initial·21 +
// medial)·28 + final — so Korean reading is fully regular given the jamo →
// IPA tables plus basic liaison (연음: a final consonant resyllabifies onto
// a following vowel-initial syllable). Third non-Latin tier (after
// Cyrillic and Greek); Korean text was all-UNK before.

std::string phonemize_text_ko_word(const std::vector<int>& sylls) {
  // Jamo tables. Finals use unreleased-stop neutralizations (k/t/p).
  static const char* kInit[19] = {
      "k", "k͈", "n", "t", "t͈", "ɾ", "m", "p", "p͈", "s", "s͈", "",
      "tɕ", "t͈ɕ", "tɕʰ", "kʰ", "tʰ", "pʰ", "h"};
  static const char* kInitPlain[19] = {  // table-safe (no combining U+0348)
      "k", "k", "n", "t", "t", "ɾ", "m", "p", "p", "s", "s", "",
      "tɕ", "tɕ", "tɕʰ", "kʰ", "tʰ", "pʰ", "h"};
  static const char* kMed[21] = {
      "a", "ɛ", "ja", "jɛ", "ʌ", "e", "jʌ", "je", "o", "wa", "wɛ",
      "we", "jo", "u", "wʌ", "we", "wi", "ju", "ɯ", "ɰi", "i"};
  static const char* kFin[28] = {
      "", "k", "k", "k", "n", "n", "n", "t", "l", "k", "m", "l", "l",
      "l", "p", "l", "m", "p", "p", "t", "t", "ŋ", "t", "t", "k", "t",
      "p", "t"};
  // Liaison onsets by UNDERLYING final index (연음 restores the lexical
  // consonant; ㅎ deletes, stops voice intervocalically).
  static const char* kLiaison[28] = {
      "", "ɡ", "k", "ks", "n", "ndʑ", "n", "d", "ɾ", "lɡ", "lm", "lb",
      "ls", "ltʰ", "lpʰ", "ɾ", "m", "b", "ps", "s", "s", "ŋ", "dʑ",
      "tɕʰ", "kʰ", "tʰ", "pʰ", ""};
  (void)kInit;

  std::string out;
  size_t n = sylls.size();
  for (size_t i = 0; i < n; ++i) {
    int s = sylls[i];
    int ini = s / (21 * 28);
    int med = (s / 28) % 21;
    int fin = s % 28;
    int next_ini = (i + 1 < n) ? sylls[i + 1] / (21 * 28) : -1;
    int prev_fin = (i > 0) ? sylls[i - 1] % 28 : -1;
    bool prev_open = (i > 0) && (prev_fin == 0 || prev_fin == 27);  // vowel/ㅎ
    bool prev_sonorant =
        (i > 0) && (prev_fin == 4 || prev_fin == 5 || prev_fin == 6 ||  // ㄴ-type
                    prev_fin == 8 || prev_fin == 10 || prev_fin == 16 ||  // ㄹ ㄻ ㅁ
                    prev_fin == 21);                                      // ㅇ

    std::string onset = kInitPlain[ini];
    // Intervocalic / post-sonorant lenition of plain stops (표준 발음):
    // ㄱ ㄷ ㅂ ㅈ voice between voiced sounds.
    if ((prev_open || prev_sonorant) && i > 0) {
      if (ini == 0) onset = "ɡ";
      else if (ini == 3) onset = "d";
      else if (ini == 7) onset = "b";
      else if (ini == 12) onset = "dʑ";
    }
    out += onset;
    out += kMed[med];
    if (fin) {
      if (next_ini == 11) {
        out += kLiaison[fin];  // resyllabified onto the next vowel
      } else {
        const char* coda = kFin[fin];
        // Nasal assimilation: obstruent coda + nasal onset → nasal coda.
        int ni = next_ini;
        bool nasal_next = (ni == 2 || ni == 6);  // ㄴ ㅁ
        if (nasal_next) {
          if (strcmp(coda, "k") == 0) coda = "ŋ";
          else if (strcmp(coda, "t") == 0) coda = "n";
          else if (strcmp(coda, "p") == 0) coda = "m";
        }
        out += coda;
      }
    }
  }
  return out;
}

const char* phonemize_text_ko(const char* utf8_text) {
  if (!utf8_text) return nullptr;
  std::string text(utf8_text);
  std::string result;
  std::vector<int> word;

  auto flush = [&]() {
    if (!word.empty()) {
      result += phonemize_text_ko_word(word);
      word.clear();
    }
  };
  for (size_t i = 0; i < text.size();) {
    unsigned char c = text[i];
    // Hangul syllables: U+AC00–U+D7A3 = 3-byte UTF-8 EA B0 80 … ED 9E A3.
    if ((c == 0xEA || c == 0xEB || c == 0xEC || c == 0xED) && i + 2 < text.size()) {
      unsigned cp = ((c & 0x0F) << 12) | ((text[i + 1] & 0x3F) << 6) | (text[i + 2] & 0x3F);
      if (cp >= 0xAC00 && cp <= 0xD7A3) {
        word.push_back(static_cast<int>(cp - 0xAC00));
        i += 3;
        continue;
      }
      i += 3;
      continue;
    }
    flush();
    if (c < 128 && strchr(";:,.!?()\"- ", c)) {
      if (!(c == ' ' && !result.empty() && result.back() == ' '))
        result += static_cast<char>(c);
    }
    i += (c < 128) ? 1 : ((c >> 5) == 0x6 ? 2 : (c >> 4) == 0xE ? 3 : 4);
  }
  flush();
  char* buf = static_cast<char*>(malloc(result.size() + 1));
  memcpy(buf, result.c_str(), result.size() + 1);
  return buf;
}

// --- Indonesian / Malay -----------------------------------------------------
// Near 1:1: c→tʃ, j→dʒ, ny→ɲ, ng→ŋ, sy→ʃ, kh→x, y→j; e is ə in closed/
// penultimate positions (approximated as ə except word-finally), final
// k→ʔ-like unreleased (kept as k). Stress: penultimate.

std::string phonemize_word_id(const std::string& raw) {
  std::string w;
  for (char ch : raw) if (static_cast<unsigned char>(ch) < 128) w += ch;

  auto id_vowel = [](char c) { return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'; };
  struct IP { std::string ipa; bool vowel; };
  std::vector<IP> ph;
  size_t n = w.size();
  for (size_t i = 0; i < n;) {
    char c = w[i];
    char c1 = (i + 1 < n) ? w[i + 1] : '\0';
    if (c=='n' && c1=='y') { ph.push_back({"ɲ", false}); i += 2; continue; }
    if (c=='n' && c1=='g') { ph.push_back({"ŋ", false}); i += 2; continue; }
    if (c=='s' && c1=='y') { ph.push_back({"ʃ", false}); i += 2; continue; }
    if (c=='k' && c1=='h') { ph.push_back({"x", false}); i += 2; continue; }
    switch (c) {
      case 'a': ph.push_back({"a", true}); ++i; break;
      case 'e': ph.push_back({"ə", true}); ++i; break;
      case 'i': ph.push_back({"i", true}); ++i; break;
      case 'o': ph.push_back({"o", true}); ++i; break;
      case 'u': ph.push_back({"u", true}); ++i; break;
      case 'b': ph.push_back({"b", false}); ++i; break;
      case 'c': ph.push_back({"tʃ", false}); ++i; break;
      case 'd': ph.push_back({"d", false}); ++i; break;
      case 'f': ph.push_back({"f", false}); ++i; break;
      case 'g': ph.push_back({"ɡ", false}); ++i; break;
      case 'h': ph.push_back({"h", false}); ++i; break;
      case 'j': ph.push_back({"dʒ", false}); ++i; break;
      case 'k': ph.push_back({"k", false}); ++i; break;
      case 'l': ph.push_back({"l", false}); ++i; break;
      case 'm': ph.push_back({"m", false}); ++i; break;
      case 'n': ph.push_back({"n", false}); ++i; break;
      case 'p': ph.push_back({"p", false}); ++i; break;
      case 'q': ph.push_back({"k", false}); ++i; break;
      case 'r': ph.push_back({"r", false}); ++i; break;
      case 's': ph.push_back({"s", false}); ++i; break;
      case 't': ph.push_back({"t", false}); ++i; break;
      case 'v': ph.push_back({"f", false}); ++i; break;
      case 'w': ph.push_back({"w", false}); ++i; break;
      case 'x': ph.push_back({"ks", false}); ++i; break;
      case 'y': ph.push_back({"j", false}); ++i; break;
      case 'z': ph.push_back({"z", false}); ++i; break;
      default: ++i; break;
    }
    (void)id_vowel;
  }

  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  int target = (total > 1) ? total - 1 : -1;  // penultimate
  int seen = 0;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel) { ++seen; if (seen == target) out += "ˈ"; }
    out += p.ipa;
  }
  return out;
}

// --- Swahili ----------------------------------------------------------------
// Fully regular: pure five vowels, ch→tʃ, sh→ʃ, ny→ɲ, ng'→ŋ, ng→ŋɡ,
// dh→ð, th→θ, gh→ɣ, j→dʒ, y→j. Stress: penultimate, always.

std::string phonemize_word_sw(const std::string& raw) {
  std::string w;
  for (char ch : raw) {
    unsigned char u = static_cast<unsigned char>(ch);
    if (u < 128) w += ch;
  }

  auto sw_vowel = [](char c) { return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'; };
  struct SP { std::string ipa; bool vowel; };
  std::vector<SP> ph;
  size_t n = w.size();
  for (size_t i = 0; i < n;) {
    char c = w[i];
    char c1 = (i + 1 < n) ? w[i + 1] : '\0';
    char c2 = (i + 2 < n) ? w[i + 2] : '\0';
    if (c=='c' && c1=='h') { ph.push_back({"tʃ", false}); i += 2; continue; }
    if (c=='s' && c1=='h') { ph.push_back({"ʃ", false}); i += 2; continue; }
    if (c=='n' && c1=='y') { ph.push_back({"ɲ", false}); i += 2; continue; }
    if (c=='n' && c1=='g' && c2=='\'') { ph.push_back({"ŋ", false}); i += 3; continue; }
    if (c=='n' && c1=='g') { ph.push_back({"ŋɡ", false}); i += 2; continue; }
    if (c=='d' && c1=='h') { ph.push_back({"ð", false}); i += 2; continue; }
    if (c=='t' && c1=='h') { ph.push_back({"θ", false}); i += 2; continue; }
    if (c=='g' && c1=='h') { ph.push_back({"ɣ", false}); i += 2; continue; }
    switch (c) {
      case 'a': ph.push_back({"a", true}); ++i; break;
      case 'e': ph.push_back({"ɛ", true}); ++i; break;
      case 'i': ph.push_back({"i", true}); ++i; break;
      case 'o': ph.push_back({"ɔ", true}); ++i; break;
      case 'u': ph.push_back({"u", true}); ++i; break;
      case 'b': ph.push_back({"b", false}); ++i; break;
      case 'd': ph.push_back({"d", false}); ++i; break;
      case 'f': ph.push_back({"f", false}); ++i; break;
      case 'g': ph.push_back({"ɡ", false}); ++i; break;
      case 'h': ph.push_back({"h", false}); ++i; break;
      case 'j': ph.push_back({"dʒ", false}); ++i; break;
      case 'k': ph.push_back({"k", false}); ++i; break;
      case 'l': ph.push_back({"l", false}); ++i; break;
      case 'm': ph.push_back({"m", false}); ++i; break;
      case 'n': ph.push_back({"n", false}); ++i; break;
      case 'p': ph.push_back({"p", false}); ++i; break;
      case 'r': ph.push_back({"r", false}); ++i; break;
      case 's': ph.push_back({"s", false}); ++i; break;
      case 't': ph.push_back({"t", false}); ++i; break;
      case 'v': ph.push_back({"v", false}); ++i; break;
      case 'w': ph.push_back({"w", false}); ++i; break;
      case 'y': ph.push_back({"j", false}); ++i; break;
      case 'z': ph.push_back({"z", false}); ++i; break;
      default: ++i; break;
    }
    (void)sw_vowel;
  }

  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  int target = (total > 1) ? total - 1 : -1;
  int seen = 0;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel) { ++seen; if (seen == target) out += "ˈ"; }
    out += p.ipa;
  }
  return out;
}

// --- Croatian / Bosnian / Serbian (Latin) -----------------------------------
// Gajica is fully phonemic: č→tʃ, ć→tɕ, š→ʃ, ž→ʒ, đ→dʑ, dž→dʒ, lj→ʎ,
// nj→ɲ, c→ts, j→j, h→x; five pure vowels, syllabic r tolerated as r.
// Pitch accent is lexical — first-syllable stress as a neutral default.

std::string phonemize_word_hr(const std::string& raw) {
  // Markers: C=č 6=ć S=š Z=ž D=đ
  std::string w;
  for (size_t i = 0; i < raw.size();) {
    unsigned char c = raw[i];
    if (c < 128) { w += static_cast<char>(c); ++i; continue; }
    if (c == 0xC4 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0x8D || d == 0x8C) w += 'C';       // č
      else if (d == 0x87 || d == 0x86) w += '6';  // ć
      else if (d == 0x91 || d == 0x90) w += 'D';  // đ
      i += 2; continue;
    }
    if (c == 0xC5 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0xA1 || d == 0xA0) w += 'S';       // š
      else if (d == 0xBE || d == 0xBD) w += 'Z';  // ž
      i += 2; continue;
    }
    ++i;
  }

  auto hr_vowel = [](char c) { return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'; };
  struct HRP { std::string ipa; bool vowel; };
  std::vector<HRP> ph;
  size_t n = w.size();
  for (size_t i = 0; i < n;) {
    char c = w[i];
    char c1 = (i + 1 < n) ? w[i + 1] : '\0';
    if (c=='d' && c1=='Z') { ph.push_back({"dʒ", false}); i += 2; continue; }  // dž
    if (c=='l' && c1=='j') { ph.push_back({"ʎ", false}); i += 2; continue; }
    if (c=='n' && c1=='j') { ph.push_back({"ɲ", false}); i += 2; continue; }
    switch (c) {
      case 'a': ph.push_back({"a", true}); ++i; break;
      case 'e': ph.push_back({"e", true}); ++i; break;
      case 'i': ph.push_back({"i", true}); ++i; break;
      case 'o': ph.push_back({"o", true}); ++i; break;
      case 'u': ph.push_back({"u", true}); ++i; break;
      case 'b': ph.push_back({"b", false}); ++i; break;
      case 'c': ph.push_back({"ts", false}); ++i; break;
      case 'C': ph.push_back({"tʃ", false}); ++i; break;
      case '6': ph.push_back({"tɕ", false}); ++i; break;
      case 'd': ph.push_back({"d", false}); ++i; break;
      case 'D': ph.push_back({"dʑ", false}); ++i; break;
      case 'f': ph.push_back({"f", false}); ++i; break;
      case 'g': ph.push_back({"ɡ", false}); ++i; break;
      case 'h': ph.push_back({"x", false}); ++i; break;
      case 'j': ph.push_back({"j", false}); ++i; break;
      case 'k': ph.push_back({"k", false}); ++i; break;
      case 'l': ph.push_back({"l", false}); ++i; break;
      case 'm': ph.push_back({"m", false}); ++i; break;
      case 'n': ph.push_back({"n", false}); ++i; break;
      case 'p': ph.push_back({"p", false}); ++i; break;
      case 'r': ph.push_back({"r", false}); ++i; break;
      case 's': ph.push_back({"s", false}); ++i; break;
      case 'S': ph.push_back({"ʃ", false}); ++i; break;
      case 't': ph.push_back({"t", false}); ++i; break;
      case 'v': ph.push_back({"v", false}); ++i; break;
      case 'z': ph.push_back({"z", false}); ++i; break;
      case 'Z': ph.push_back({"ʒ", false}); ++i; break;
      default: ++i; break;
    }
    (void)hr_vowel;
  }

  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  bool placed = false;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel && !placed) { if (total > 1) out += "ˈ"; placed = true; }
    out += p.ipa;
  }
  return out;
}

// --- Esperanto --------------------------------------------------------------
// Designed-regular: one letter = one phoneme; ĉ→tʃ ĝ→dʒ ĥ→x ĵ→ʒ ŝ→ʃ ŭ→w,
// c→ts, stress ALWAYS penultimate.

std::string phonemize_word_eo(const std::string& raw) {
  // Markers: C=ĉ G=ĝ H=ĥ J=ĵ S=ŝ W=ŭ
  std::string w;
  for (size_t i = 0; i < raw.size();) {
    unsigned char c = raw[i];
    if (c < 128) { w += static_cast<char>(c); ++i; continue; }
    if (c == 0xC4 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0x89 || d == 0x88) w += 'C';       // ĉ
      else if (d == 0x9D || d == 0x9C) w += 'G';  // ĝ
      else if (d == 0xA5 || d == 0xA4) w += 'H';  // ĥ
      else if (d == 0xB5 || d == 0xB4) w += 'J';  // ĵ
      i += 2; continue;
    }
    if (c == 0xC5 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0x9D || d == 0x9C) w += 'S';       // ŝ
      else if (d == 0xAD || d == 0xAC) w += 'W';  // ŭ
      i += 2; continue;
    }
    ++i;
  }

  auto eo_vowel = [](char c) { return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'; };
  struct EP { std::string ipa; bool vowel; };
  std::vector<EP> ph;
  for (char c : w) {
    switch (c) {
      case 'a': ph.push_back({"a", true}); break;
      case 'e': ph.push_back({"e", true}); break;
      case 'i': ph.push_back({"i", true}); break;
      case 'o': ph.push_back({"o", true}); break;
      case 'u': ph.push_back({"u", true}); break;
      case 'b': ph.push_back({"b", false}); break;
      case 'c': ph.push_back({"ts", false}); break;
      case 'C': ph.push_back({"tʃ", false}); break;
      case 'd': ph.push_back({"d", false}); break;
      case 'f': ph.push_back({"f", false}); break;
      case 'g': ph.push_back({"ɡ", false}); break;
      case 'G': ph.push_back({"dʒ", false}); break;
      case 'h': ph.push_back({"h", false}); break;
      case 'H': ph.push_back({"x", false}); break;
      case 'j': ph.push_back({"j", false}); break;
      case 'J': ph.push_back({"ʒ", false}); break;
      case 'k': ph.push_back({"k", false}); break;
      case 'l': ph.push_back({"l", false}); break;
      case 'm': ph.push_back({"m", false}); break;
      case 'n': ph.push_back({"n", false}); break;
      case 'p': ph.push_back({"p", false}); break;
      case 'r': ph.push_back({"r", false}); break;
      case 's': ph.push_back({"s", false}); break;
      case 'S': ph.push_back({"ʃ", false}); break;
      case 't': ph.push_back({"t", false}); break;
      case 'v': ph.push_back({"v", false}); break;
      case 'W': ph.push_back({"w", false}); break;
      case 'z': ph.push_back({"z", false}); break;
      default: break;
    }
  }
  (void)eo_vowel;

  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  int target = (total > 1) ? total - 1 : -1;
  int seen = 0;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel) { ++seen; if (seen == target) out += "ˈ"; }
    out += p.ipa;
  }
  return out;
}

// --- Basque -----------------------------------------------------------------
// Standard Basque is near 1:1: tx→tʃ, ts/tz→ts, x→ʃ, z/s→s, ñ→ɲ, ll→ʎ,
// in→iɲ-ish (left as written), j→j (standard), h kept; weak penult stress.

std::string phonemize_word_eu(const std::string& raw) {
  std::string w;
  for (size_t i = 0; i < raw.size();) {
    unsigned char c = raw[i];
    if (c < 128) { w += static_cast<char>(c); ++i; continue; }
    if (c == 0xC3 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0xB1 || d == 0x91) w += '~';  // ñ
      i += 2; continue;
    }
    ++i;
  }
  auto eu_vowel = [](char c) { return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'; };
  struct BP { std::string ipa; bool vowel; };
  std::vector<BP> ph;
  size_t n = w.size();
  for (size_t i = 0; i < n;) {
    char c = w[i];
    char c1 = (i + 1 < n) ? w[i + 1] : '\0';
    if (c=='t' && c1=='x') { ph.push_back({"tʃ", false}); i += 2; continue; }
    if (c=='t' && (c1=='s' || c1=='z')) { ph.push_back({"ts", false}); i += 2; continue; }
    if (c=='l' && c1=='l') { ph.push_back({"ʎ", false}); i += 2; continue; }
    if (c=='r' && c1=='r') { ph.push_back({"r", false}); i += 2; continue; }
    switch (c) {
      case 'a': ph.push_back({"a", true}); ++i; break;
      case 'e': ph.push_back({"e", true}); ++i; break;
      case 'i': ph.push_back({"i", true}); ++i; break;
      case 'o': ph.push_back({"o", true}); ++i; break;
      case 'u': ph.push_back({"u", true}); ++i; break;
      case 'b': ph.push_back({"b", false}); ++i; break;
      case 'd': ph.push_back({"d", false}); ++i; break;
      case 'f': ph.push_back({"f", false}); ++i; break;
      case 'g': ph.push_back({"ɡ", false}); ++i; break;
      case 'h': ph.push_back({"h", false}); ++i; break;
      case 'j': ph.push_back({"j", false}); ++i; break;
      case 'k': ph.push_back({"k", false}); ++i; break;
      case 'l': ph.push_back({"l", false}); ++i; break;
      case 'm': ph.push_back({"m", false}); ++i; break;
      case 'n': ph.push_back({"n", false}); ++i; break;
      case '~': ph.push_back({"ɲ", false}); ++i; break;
      case 'p': ph.push_back({"p", false}); ++i; break;
      case 'r': ph.push_back({"ɾ", false}); ++i; break;
      case 's': ph.push_back({"s", false}); ++i; break;
      case 't': ph.push_back({"t", false}); ++i; break;
      case 'x': ph.push_back({"ʃ", false}); ++i; break;
      case 'z': ph.push_back({"s", false}); ++i; break;
      default: ++i; break;
    }
    (void)eu_vowel;
  }
  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  int target = (total > 1) ? total - 1 : -1;
  int seen = 0;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel) { ++seen; if (seen == target) out += "ˈ"; }
    out += p.ipa;
  }
  return out;
}

// --- Latvian ----------------------------------------------------------------
// Regular: macron = length, č/š/ž as usual, ķ→c ģ→ɟ ļ→ʎ ņ→ɲ, native o→uo,
// c→ts, dz/dž affricates. Stress: first syllable, always.

std::string phonemize_word_lv(const std::string& raw) {
  // Markers: A E I U = long vowels; C=č S=š Z=ž K=ķ G=ģ L=ļ N=ņ
  std::string w;
  for (size_t i = 0; i < raw.size();) {
    unsigned char c = raw[i];
    if (c < 128) { w += static_cast<char>(c); ++i; continue; }
    if (c == 0xC4 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0x81 || d == 0x80) w += 'A';       // ā
      else if (d == 0x93 || d == 0x92) w += 'E';  // ē
      else if (d == 0xAB || d == 0xAA) w += 'I';  // ī
      else if (d == 0x8D || d == 0x8C) w += 'C';  // č
      else if (d == 0xB7 || d == 0xB6) w += 'K';  // ķ
      else if (d == 0xA3 || d == 0xA2) w += 'G';  // ģ
      else if (d == 0xBC || d == 0xBB) w += 'L';  // ļ
      i += 2; continue;
    }
    if (c == 0xC5 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0xAB || d == 0xAA) w += 'U';       // ū
      else if (d == 0xA1 || d == 0xA0) w += 'S';  // š
      else if (d == 0xBE || d == 0xBD) w += 'Z';  // ž
      else if (d == 0x86 || d == 0x85) w += 'N';  // ņ
      i += 2; continue;
    }
    ++i;
  }
  auto lv_vowel = [](char c) {
    return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'||c=='A'||c=='E'||c=='I'||c=='U';
  };
  struct LP { std::string ipa; bool vowel; };
  std::vector<LP> ph;
  size_t n = w.size();
  for (size_t i = 0; i < n;) {
    char c = w[i];
    char c1 = (i + 1 < n) ? w[i + 1] : '\0';
    if (c=='d' && c1=='z') { ph.push_back({"dz", false}); i += 2; continue; }
    if (c=='d' && c1=='Z') { ph.push_back({"dʒ", false}); i += 2; continue; }
    switch (c) {
      case 'a': ph.push_back({"a", true}); ++i; break;
      case 'A': ph.push_back({"aː", true}); ++i; break;
      case 'e': ph.push_back({"ɛ", true}); ++i; break;
      case 'E': ph.push_back({"ɛː", true}); ++i; break;
      case 'i': ph.push_back({"i", true}); ++i; break;
      case 'I': ph.push_back({"iː", true}); ++i; break;
      case 'o': ph.push_back({"uo", true}); ++i; break;
      case 'u': ph.push_back({"u", true}); ++i; break;
      case 'U': ph.push_back({"uː", true}); ++i; break;
      case 'b': ph.push_back({"b", false}); ++i; break;
      case 'c': ph.push_back({"ts", false}); ++i; break;
      case 'C': ph.push_back({"tʃ", false}); ++i; break;
      case 'd': ph.push_back({"d", false}); ++i; break;
      case 'f': ph.push_back({"f", false}); ++i; break;
      case 'g': ph.push_back({"ɡ", false}); ++i; break;
      case 'G': ph.push_back({"ɟ", false}); ++i; break;
      case 'h': ph.push_back({"x", false}); ++i; break;
      case 'j': ph.push_back({"j", false}); ++i; break;
      case 'k': ph.push_back({"k", false}); ++i; break;
      case 'K': ph.push_back({"c", false}); ++i; break;
      case 'l': ph.push_back({"l", false}); ++i; break;
      case 'L': ph.push_back({"ʎ", false}); ++i; break;
      case 'm': ph.push_back({"m", false}); ++i; break;
      case 'n': ph.push_back({"n", false}); ++i; break;
      case 'N': ph.push_back({"ɲ", false}); ++i; break;
      case 'p': ph.push_back({"p", false}); ++i; break;
      case 'r': ph.push_back({"r", false}); ++i; break;
      case 's': ph.push_back({"s", false}); ++i; break;
      case 'S': ph.push_back({"ʃ", false}); ++i; break;
      case 't': ph.push_back({"t", false}); ++i; break;
      case 'v': ph.push_back({"v", false}); ++i; break;
      case 'z': ph.push_back({"z", false}); ++i; break;
      case 'Z': ph.push_back({"ʒ", false}); ++i; break;
      default: ++i; break;
    }
    (void)lv_vowel;
  }
  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  bool placed = false;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel && !placed) { if (total > 1) out += "ˈ"; placed = true; }
    out += p.ipa;
  }
  return out;
}

// --- Welsh ------------------------------------------------------------------
// Regular: ll→ɬ, dd→ð, ff→f vs f→v, ch→x, th→θ, rh→r̥(→r), w as the vowel
// u, y→ə (ɨ in final syllables — approximated as ɨ word-finally), u→ɨ,
// si+vowel→ʃ. Stress: penultimate.

std::string phonemize_word_cy(const std::string& raw) {
  std::string w;
  for (size_t i = 0; i < raw.size();) {
    unsigned char c = raw[i];
    if (c < 128) { w += static_cast<char>(c); ++i; continue; }
    if (c == 0xC5 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0xB5 || d == 0xB4) w += 'w';  // ŵ
      else if (d == 0xB7 || d == 0xB6) w += 'y';  // ŷ
      i += 2; continue;
    }
    if (c == 0xC3 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      // â ê î ô û fold to plain vowels
      switch (d) {
        case 0xA2: w += 'a'; break; case 0xAA: w += 'e'; break;
        case 0xAE: w += 'i'; break; case 0xB4: w += 'o'; break;
        case 0xBB: w += 'u'; break;
      }
      i += 2; continue;
    }
    ++i;
  }
  auto cy_vowel = [](char c) {
    return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'||c=='w'||c=='y';
  };
  struct WP { std::string ipa; bool vowel; };
  std::vector<WP> ph;
  size_t n = w.size();
  for (size_t i = 0; i < n;) {
    char c = w[i];
    char c1 = (i + 1 < n) ? w[i + 1] : '\0';
    char c2 = (i + 2 < n) ? w[i + 2] : '\0';
    if (c=='l' && c1=='l') { ph.push_back({"ɬ", false}); i += 2; continue; }
    if (c=='d' && c1=='d') { ph.push_back({"ð", false}); i += 2; continue; }
    if (c=='f' && c1=='f') { ph.push_back({"f", false}); i += 2; continue; }
    if (c=='c' && c1=='h') { ph.push_back({"x", false}); i += 2; continue; }
    if (c=='t' && c1=='h') { ph.push_back({"θ", false}); i += 2; continue; }
    if (c=='r' && c1=='h') { ph.push_back({"r", false}); i += 2; continue; }
    if (c=='s' && c1=='i' && cy_vowel(c2)) { ph.push_back({"ʃ", false}); i += 2; continue; }
    if (c=='n' && c1=='g') { ph.push_back({"ŋ", false}); i += 2; continue; }
    switch (c) {
      case 'a': ph.push_back({"a", true}); ++i; break;
      case 'e': ph.push_back({"ɛ", true}); ++i; break;
      case 'i': ph.push_back({"i", true}); ++i; break;
      case 'o': ph.push_back({"ɔ", true}); ++i; break;
      case 'u': ph.push_back({"ɨ", true}); ++i; break;
      case 'w': ph.push_back({cy_vowel(c1) && c1 ? "w" : "u", !(cy_vowel(c1) && c1)}); ++i; break;
      case 'y': ph.push_back({(i + 1 >= n || !cy_vowel(c1)) && i + 2 >= n ? "ɨ" : "ə", true}); ++i; break;
      case 'b': ph.push_back({"b", false}); ++i; break;
      case 'c': ph.push_back({"k", false}); ++i; break;
      case 'd': ph.push_back({"d", false}); ++i; break;
      case 'f': ph.push_back({"v", false}); ++i; break;
      case 'g': ph.push_back({"ɡ", false}); ++i; break;
      case 'h': ph.push_back({"h", false}); ++i; break;
      case 'j': ph.push_back({"dʒ", false}); ++i; break;
      case 'l': ph.push_back({"l", false}); ++i; break;
      case 'm': ph.push_back({"m", false}); ++i; break;
      case 'n': ph.push_back({"n", false}); ++i; break;
      case 'p': ph.push_back({"p", false}); ++i; break;
      case 'r': ph.push_back({"r", false}); ++i; break;
      case 's': ph.push_back({"s", false}); ++i; break;
      case 't': ph.push_back({"t", false}); ++i; break;
      default: ++i; break;
    }
  }
  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  int target = (total > 1) ? total - 1 : -1;
  int seen = 0;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel) { ++seen; if (seen == target) out += "ˈ"; }
    out += p.ipa;
  }
  return out;
}

// --- Brahmic scripts (Devanagari / Bengali / Gurmukhi / Gujarati / Oriya /
// Tamil / Telugu / Kannada / Malayalam) ---------------------------------------
// The Unicode Indic blocks are ISCII-aligned: every script places the same
// letter at the same offset from its block base (ka = base+0x15, the matras
// at base+0x3E.., virama at base+0x4D). One decoder parameterized by block
// base therefore serves twelve language codes; per-language knobs are the
// inherent vowel (ə for Hindi, ɔ for Bengali, a for the Dravidian scripts),
// schwa deletion (Indo-Aryan only) and Tamil positional voicing. These
// scripts are near-phonemic — the hard part of e.g. Hindi G2P is exactly the
// schwa-deletion rule implemented below (delete word-finally, and medially
// in the VC_CV context applying right to left).
// Stress (espeak marks it for these languages, so the checkpoint saw it):
// Indo-Aryan takes the rightmost non-final heaviest syllable (weight = long
// vowel or closed syllable; word-final consonants are extrametrical, so
// kamal → kˈəməl but kitāb → kɪtˈaːb); Dravidian stress is a weak
// first-syllable default.

struct BrahmicCfg {
  unsigned int base;        // block base codepoint (Devanagari 0x0900, ...)
  const char* inherent;     // inherent vowel IPA
  bool schwa_deletion;      // Indo-Aryan final/medial inherent-vowel drop
  bool tamil_voicing;       // positional stop voicing (Tamil only)
  int stress;               // 0 none, 1 Indo-Aryan weight rule, 2 initial
};

// Offsets base+0x05..base+0x14: independent vowels.
static const char* kBrahmicVowels[16] = {
  "ə",   // 05 a (overridden by cfg.inherent)
  "aː",  // 06 ā
  "ɪ",   // 07 i
  "iː",  // 08 ī
  "ʊ",   // 09 u
  "uː",  // 0A ū
  "ri",  // 0B vocalic r
  "li",  // 0C vocalic l
  "æ",   // 0D candra e
  "e",   // 0E short e (Dravidian)
  "eː",  // 0F ē
  "ɛː",  // 10 ai (monophthongized as in Hindi)
  "ɒ",   // 11 candra o
  "o",   // 12 short o (Dravidian)
  "oː",  // 13 ō
  "ɔː",  // 14 au
};

// Offsets base+0x15..base+0x39: consonants.
static const char* kBrahmicCons[37] = {
  "k", "kʰ", "ɡ", "ɡʱ", "ŋ",        // 15-19 velars
  "tʃ", "tʃʰ", "dʒ", "dʒʱ", "ɲ",    // 1A-1E palatals
  "ʈ", "ʈʰ", "ɖ", "ɖʱ", "ɳ",        // 1F-23 retroflexes
  "t", "tʰ", "d", "dʱ", "n",        // 24-28 dentals
  "n",                              // 29 nnna (Tamil ன)
  "p", "pʰ", "b", "bʱ", "m",        // 2A-2E labials
  "j", "r", "r", "l", "ɭ", "ɻ",     // 2F-34 sonorants (ऴ/ழ → ɻ)
  "ʋ", "ʃ", "ʂ", "s", "ɦ",          // 35-39 glides/sibilants
};

// Devanagari nukta forms base+0x58..base+0x5F (Urdu/Persian loan sounds).
static const char* kBrahmicNukta[8] = {
  "q", "x", "ɣ", "z", "ɽ", "ɽʱ", "f", "j",
};

// Matras base+0x3E..base+0x4C map to the same vowel values as 06..14.
// (index = offset - 0x3E + 1 into kBrahmicVowels)

struct BrPhone {
  std::string ipa;
  bool vowel;
  bool inherent;  // an inherent vowel eligible for schwa deletion
};

void brahmic_word(std::vector<BrPhone>& ph, const BrahmicCfg& cfg, std::string* out) {
  if (ph.empty()) return;
  // Resolve anusvara sentinels: Bengali/Assamese anusvara IS the velar nasal;
  // elsewhere it assimilates to the following consonant's place, and a
  // word-final one surfaces as m (Dravidian -am endings; Hindi final anusvara
  // nasalizes the vowel, for which m is the closest representable segment).
  for (size_t i = 0; i < ph.size(); ++i) {
    if (ph[i].ipa != "\x01") continue;
    if (cfg.base == 0x0980) { ph[i].ipa = "ŋ"; continue; }
    if (i + 1 >= ph.size()) { ph[i].ipa = "m"; continue; }
    const std::string& nx = ph[i + 1].ipa;
    if (nx == "k" || nx == "kʰ" || nx == "ɡ" || nx == "ɡʱ") ph[i].ipa = "ŋ";
    else if (nx == "tʃ" || nx == "tʃʰ" || nx == "dʒ" || nx == "dʒʱ") ph[i].ipa = "ɲ";
    else if (nx == "ʈ" || nx == "ʈʰ" || nx == "ɖ" || nx == "ɖʱ") ph[i].ipa = "ɳ";
    else if (nx == "p" || nx == "pʰ" || nx == "b" || nx == "bʱ" || nx == "m") ph[i].ipa = "m";
    else ph[i].ipa = "n";
  }
  int nvowels = 0;
  for (const auto& p : ph) nvowels += p.vowel ? 1 : 0;
  if (cfg.schwa_deletion && nvowels > 1) {
    // Word-final inherent vowel deletes (राम → raːm) — but never a word's
    // only vowel (छ stays tʃʰə).
    if (ph.back().inherent) ph.pop_back();
    // Medial rule, right to left: delete an inherent schwa when flanked by
    // single consonants that are themselves vowel-adjacent (V C ə C V →
    // V C C V), e.g. कमला kə.mə.laː → kəm.laː.
    for (int i = static_cast<int>(ph.size()) - 1; i >= 0; --i) {
      if (!ph[i].inherent) continue;
      bool ok = i >= 2 && i + 2 < static_cast<int>(ph.size()) &&
                !ph[i - 1].vowel && ph[i - 2].vowel &&
                !ph[i + 1].vowel && ph[i + 2].vowel;
      if (ok) ph.erase(ph.begin() + i);
    }
  }
  if (cfg.tamil_voicing) {
    // Tamil stops voice intervocalically and after their homorganic nasal;
    // intervocalic ச is the fricative s.
    for (size_t i = 0; i < ph.size(); ++i) {
      bool after_v = i > 0 && ph[i - 1].vowel;
      bool after_nasal = i > 0 && !ph[i - 1].vowel &&
        (ph[i - 1].ipa == "m" || ph[i - 1].ipa == "n" || ph[i - 1].ipa == "ɳ" ||
         ph[i - 1].ipa == "ɲ" || ph[i - 1].ipa == "ŋ");
      bool before_v = i + 1 < ph.size() && ph[i + 1].vowel;
      if ((after_v && before_v) || after_nasal) {
        if (ph[i].ipa == "k") ph[i].ipa = after_nasal ? "ɡ" : "ɣ";
        else if (ph[i].ipa == "tʃ") ph[i].ipa = after_nasal ? "dʒ" : "s";
        else if (ph[i].ipa == "ʈ") ph[i].ipa = "ɖ";
        else if (ph[i].ipa == "t") ph[i].ipa = "d";
        else if (ph[i].ipa == "p") ph[i].ipa = "b";
      }
    }
  }
  // Stress assignment (post deletion/voicing, so weights see the surface
  // form). Syllable weight: 2 for a long vowel, +1 for a closed syllable —
  // a medial cluster of >=2 consonants closes the preceding syllable (single
  // medial consonants are onsets); word-final consonants are extrametrical.
  int surface_vowels = 0;
  for (const auto& p : ph) surface_vowels += p.vowel ? 1 : 0;
  int stress_at = -1;  // index into ph of the stressed vowel
  if (cfg.stress != 0 && surface_vowels > 1) {
    std::vector<int> vidx, weight;
    for (size_t i = 0; i < ph.size(); ++i)
      if (ph[i].vowel) vidx.push_back(static_cast<int>(i));
    for (size_t s = 0; s < vidx.size(); ++s) {
      int w = ph[vidx[s]].ipa.find("ː") != std::string::npos ? 2 : 1;
      if (s + 1 < vidx.size() && vidx[s + 1] - vidx[s] > 2) w += 1;
      weight.push_back(w);
    }
    if (cfg.stress == 2) {
      stress_at = vidx[0];
    } else {
      int maxw = 0;
      for (int w : weight) maxw = (w > maxw) ? w : maxw;
      // rightmost non-final syllable of maximal weight; a final syllable
      // only attracts stress when it is the sole heaviest
      for (size_t s = 0; s + 1 < vidx.size(); ++s)
        if (weight[s] == maxw) stress_at = vidx[s];
      if (stress_at < 0) stress_at = vidx.back();
    }
  }
  for (size_t i = 0; i < ph.size(); ++i) {
    if (static_cast<int>(i) == stress_at) *out += "ˈ";
    *out += ph[i].ipa;
  }
}

const char* phonemize_text_brahmic(const char* utf8_text, const BrahmicCfg& cfg) {
  if (!utf8_text) return nullptr;
  std::string text(utf8_text);
  std::string result;
  std::vector<BrPhone> word;
  auto flush = [&]() {
    if (!word.empty()) { brahmic_word(word, cfg, &result); word.clear(); }
  };
  auto push_inherent = [&]() {
    word.push_back({cfg.inherent, true, true});
  };
  bool pending_inherent = false;  // a consonant was emitted, vowel undecided
  auto settle = [&]() {
    if (pending_inherent) { push_inherent(); pending_inherent = false; }
  };
  size_t nbytes = text.size();
  for (size_t i = 0; i < nbytes;) {
    unsigned char c = text[i];
    unsigned int cp = 0; size_t len = 1;
    if (c < 0x80) { cp = c; }
    else if ((c >> 5) == 0x6 && i + 1 < nbytes) {
      cp = ((c & 0x1F) << 6) | (text[i+1] & 0x3F); len = 2;
    } else if ((c >> 4) == 0xE && i + 2 < nbytes) {
      cp = ((c & 0x0F) << 12) | ((text[i+1] & 0x3F) << 6) | (text[i+2] & 0x3F); len = 3;
    } else if ((c >> 3) == 0x1E && i + 3 < nbytes) { len = 4; }
    unsigned int off = cp - cfg.base;  // wraps for cp < base; range checks below
    if (cp >= cfg.base && off <= 0x7F) {
      if (off >= 0x05 && off <= 0x14) {            // independent vowel
        settle();
        word.push_back({off == 0x05 ? cfg.inherent : kBrahmicVowels[off - 0x05],
                        true, false});
      } else if (off >= 0x15 && off <= 0x39) {     // consonant
        settle();
        word.push_back({kBrahmicCons[off - 0x15], false, false});
        pending_inherent = true;
      } else if (off >= 0x58 && off <= 0x5F) {     // nukta forms (Devanagari)
        settle();
        word.push_back({kBrahmicNukta[off - 0x58], false, false});
        pending_inherent = true;
      } else if (off >= 0x3E && off <= 0x4C) {     // matra
        pending_inherent = false;
        word.push_back({kBrahmicVowels[off - 0x3E + 1], true, false});
      } else if (off == 0x4D) {                    // virama: kill the vowel
        pending_inherent = false;
      } else if (off == 0x02) {                    // anusvara: homorganic nasal
        settle();
        word.push_back({"\x01", false, false});    // sentinel, resolved per word
      } else if (off == 0x03) {                    // visarga
        settle();
        word.push_back({"h", false, false});
      } else if (off == 0x01) {                    // candrabindu: nasalization
        settle();                                  // (unrepresentable; dropped)
      } else if (off == 0x3C) {                    // nukta on previous consonant
        if (!word.empty() && !word.back().vowel) {
          std::string& p = word.back().ipa;
          if (p == "dʒ") p = "z";
          else if (p == "pʰ") p = "f";
          else if (p == "ɖ") p = "ɽ";
          else if (p == "ɖʱ") p = "ɽʱ";
          else if (p == "k") p = "q";
          else if (p == "kʰ") p = "x";
          else if (p == "ɡ") p = "ɣ";
        }
      } else if (off == 0x70 && cfg.base == 0x0A00) {  // Gurmukhi tippi
        settle();
        word.push_back({"\x01", false, false});
      } else if (off >= 0x7A && off <= 0x7F && cfg.base == 0x0D00) {
        // Malayalam chillu (bare final consonants)
        static const char* chillu[6] = {"n", "n", "r", "l", "ɭ", "k"};
        settle();
        word.push_back({chillu[off - 0x7A], false, false});
      }
      // zero-width joiners / signs / digits: ignored
      i += len;
      continue;
    }
    settle();
    flush();
    if (cp < 128 && cp && strchr(";:,.!?()\"- ", static_cast<int>(cp))) {
      char pc = static_cast<char>(cp);
      if (!(pc == ' ' && !result.empty() && result.back() == ' '))
        result += pc;
    } else if (cp == 0x0964 || cp == 0x0965) {  // danda / double danda
      result += '.';
    }
    i += len;
  }
  settle();
  flush();
  char* buf = static_cast<char*>(malloc(result.size() + 1));
  memcpy(buf, result.c_str(), result.size() + 1);
  return buf;
}

// --- Turkic Cyrillic (Kazakh / Kyrgyz / Tatar / Bashkir) ---------------------
// Unlike Russian, Turkic Cyrillic orthographies are essentially 1:1 — no
// vowel reduction, palatalization marked by dedicated letters (ә ө ү і),
// ы is the back unrounded ɯ. One shared base map + per-language extra
// letters; fixed final stress (Turkic default).

struct CyrT { unsigned int cp; const char* ipa; bool vowel; };

static const CyrT kCyrTurkicBase[] = {
  {0x0430, "a", true},  {0x0431, "b", false}, {0x0432, "v", false},
  {0x0433, "ɡ", false}, {0x0434, "d", false}, {0x0435, "e", true},
  {0x0451, "jo", true}, {0x0436, "ʒ", false}, {0x0437, "z", false},
  {0x0438, "i", true},  {0x0439, "j", false}, {0x043A, "k", false},
  {0x043B, "l", false}, {0x043C, "m", false}, {0x043D, "n", false},
  {0x043E, "o", true},  {0x043F, "p", false}, {0x0440, "r", false},
  {0x0441, "s", false}, {0x0442, "t", false}, {0x0443, "u", true},
  {0x0444, "f", false}, {0x0445, "x", false}, {0x0446, "ts", false},
  {0x0447, "tʃ", false},{0x0448, "ʃ", false}, {0x0449, "ʃtʃ", false},
  {0x044B, "ɯ", true},  {0x044D, "e", true},  {0x044E, "ju", true},
  {0x044F, "ja", true},
  // ъ/ь carry no sound here
  {0x044A, "", false},  {0x044C, "", false},
};

static const CyrT kKkExtra[] = {  // Kazakh
  {0x04D9, "æ", true},  {0x0493, "ʁ", false}, {0x049B, "q", false},
  {0x04A3, "ŋ", false}, {0x04E9, "ø", true},  {0x04B1, "ʊ", true},
  {0x04AF, "y", true},  {0x04BB, "h", false}, {0x0456, "ɪ", true},
};
static const CyrT kKyExtra[] = {  // Kyrgyz
  {0x04A3, "ŋ", false}, {0x04E9, "ø", true},  {0x04AF, "y", true},
};
static const CyrT kTtExtra[] = {  // Tatar
  {0x04D9, "æ", true},  {0x04E9, "ø", true},  {0x04AF, "y", true},
  {0x0497, "ʑ", false}, {0x04A3, "ŋ", false}, {0x04BB, "h", false},
};
static const CyrT kBaExtra[] = {  // Bashkir
  {0x04D9, "æ", true},  {0x0493, "ʁ", false}, {0x04A1, "q", false},
  {0x04A3, "ŋ", false}, {0x04E9, "ø", true},  {0x04AB, "θ", false},
  {0x04AF, "y", true},  {0x04BB, "h", false}, {0x0499, "ð", false},
};

struct CyrTCfg { const CyrT* extra; int nextra; };

const CyrT* cyrt_find(unsigned int cp, const CyrTCfg& cfg) {
  // uppercase → lowercase folding for the ranges involved
  if (cp >= 0x0410 && cp <= 0x042F) cp += 0x20;
  else if (cp == 0x0401) cp = 0x0451;
  else if (cp == 0x0406) cp = 0x0456;
  else if (cp >= 0x0490 && cp <= 0x04FF && (cp & 1) == 0) cp += 1;
  for (int i = 0; i < cfg.nextra; ++i)
    if (cfg.extra[i].cp == cp) return &cfg.extra[i];
  for (const auto& e : kCyrTurkicBase)
    if (e.cp == cp) return &e;
  return nullptr;
}

const char* phonemize_text_cyrillic_turkic(const char* utf8_text, const CyrTCfg& cfg) {
  if (!utf8_text) return nullptr;
  std::string text(utf8_text);
  std::string result;
  struct TP { std::string ipa; bool vowel; };
  std::vector<TP> word;
  auto flush = [&]() {
    if (word.empty()) return;
    int total = 0;
    for (const auto& p : word) total += p.vowel ? 1 : 0;
    int seen = 0;
    for (const auto& p : word) {
      if (p.vowel) { ++seen; if (seen == total && total > 1) result += "ˈ"; }
      result += p.ipa;
    }
    word.clear();
  };
  size_t nbytes = text.size();
  for (size_t i = 0; i < nbytes;) {
    unsigned char c = text[i];
    unsigned int cp = 0; size_t len = 1;
    if (c < 0x80) { cp = c; }
    else if ((c >> 5) == 0x6 && i + 1 < nbytes) {
      cp = ((c & 0x1F) << 6) | (text[i+1] & 0x3F); len = 2;
    } else if ((c >> 4) == 0xE && i + 2 < nbytes) {
      cp = ((c & 0x0F) << 12) | ((text[i+1] & 0x3F) << 6) | (text[i+2] & 0x3F); len = 3;
    } else if ((c >> 3) == 0x1E && i + 3 < nbytes) { len = 4; }
    const CyrT* e = cyrt_find(cp, cfg);
    if (e != nullptr) {
      if (e->ipa[0] != '\0') word.push_back({e->ipa, e->vowel});
      i += len;
      continue;
    }
    flush();
    if (cp < 128 && cp && strchr(";:,.!?()\"- ", static_cast<int>(cp))) {
      char pc = static_cast<char>(cp);
      if (!(pc == ' ' && !result.empty() && result.back() == ' '))
        result += pc;
    }
    i += len;
  }
  flush();
  char* buf = static_cast<char*>(malloc(result.size() + 1));
  memcpy(buf, result.c_str(), result.size() + 1);
  return buf;
}

// --- Amharic (Ethiopic syllabary) --------------------------------------------
// Ge'ez script is an abugida with algorithmic structure like hangul: each
// codepoint is consonant-row × vowel-order (base U+1200, 8 orders per row:
// ə u i a e ɨ o wa). One 48-row consonant table decodes the whole block;
// the 6th order (ɨ) doubles as the bare consonant and is dropped word-
// finally. Ejectives map to the IPA ejective mark ʼ (in the symbol table).

static const char* kEthiopicRows[] = {
  /*0x1200 ሀ*/ "h",  /*1208 ለ*/ "l",  /*1210 ሐ*/ "h",  /*1218 መ*/ "m",
  /*1220 ሠ*/ "s",  /*1228 ረ*/ "r",  /*1230 ሰ*/ "s",  /*1238 ሸ*/ "ʃ",
  /*1240 ቀ*/ "kʼ", /*1248 ቈ*/ "kʼw",/*1250 ቐ*/ "q",  /*1258 ቘ*/ "qw",
  /*1260 በ*/ "b",  /*1268 ቨ*/ "v",  /*1270 ተ*/ "t",  /*1278 ቸ*/ "tʃ",
  /*1280 ኀ*/ "h",  /*1288 ዀ?*/ "hw", /*1290 ነ*/ "n",  /*1298 ኘ*/ "ɲ",
  /*12A0 አ*/ "ʔ",  /*12A8 ከ*/ "k",  /*12B0 ኰ*/ "kw", /*12B8 ኸ*/ "x",
  /*12C0 ዀ*/ "xw", /*12C8 ወ*/ "w",  /*12D0 ዐ*/ "ʔ",  /*12D8 ዘ*/ "z",
  /*12E0 ዠ*/ "ʒ",  /*12E8 የ*/ "j",  /*12F0 ደ*/ "d",  /*12F8 ዸ*/ "d",
  /*1300 ጀ*/ "dʒ", /*1308 ገ*/ "ɡ",  /*1310 ጐ*/ "ɡw", /*1318 ጘ*/ "ŋ",
  /*1320 ጠ*/ "tʼ", /*1328 ጨ*/ "tʃʼ",/*1330 ጰ*/ "pʼ", /*1338 ጸ*/ "tsʼ",
  /*1340 ፀ*/ "tsʼ",/*1348 ፈ*/ "f",  /*1350 ፐ*/ "p",  /*1358 ፘ*/ "r",
};

static const char* kEthiopicOrders[8] = {"ə", "u", "i", "a", "e", "ɨ", "o", "wa"};

const char* phonemize_text_am(const char* utf8_text) {
  if (!utf8_text) return nullptr;
  std::string text(utf8_text);
  std::string result;
  struct AP { std::string ipa; bool optional; };  // optional = 6th-order ɨ
  std::vector<AP> word;
  auto flush = [&]() {
    if (word.empty()) return;
    // 6th-order ɨ is epenthetic: drop word-finally (bare consonant coda)
    // and before sonorants/vowels where the cluster is pronounceable.
    if (word.back().optional) word.pop_back();
    for (size_t k = 0; k < word.size(); ++k) {
      if (word[k].optional && k + 1 < word.size()) {
        const std::string& nx = word[k + 1].ipa;
        if (nx == "j" || nx == "w" || nx == "r" || nx == "l" ||
            nx == "a" || nx == "e" || nx == "i" || nx == "o" || nx == "u" ||
            nx == "ə")
          continue;  // skip emission
      }
      result += word[k].ipa;
    }
    word.clear();
  };
  size_t nbytes = text.size();
  for (size_t i = 0; i < nbytes;) {
    unsigned char c = text[i];
    unsigned int cp = 0; size_t len = 1;
    if (c < 0x80) { cp = c; }
    else if ((c >> 5) == 0x6 && i + 1 < nbytes) {
      cp = ((c & 0x1F) << 6) | (text[i+1] & 0x3F); len = 2;
    } else if ((c >> 4) == 0xE && i + 2 < nbytes) {
      cp = ((c & 0x0F) << 12) | ((text[i+1] & 0x3F) << 6) | (text[i+2] & 0x3F); len = 3;
    } else if ((c >> 3) == 0x1E && i + 3 < nbytes) { len = 4; }
    if (cp >= 0x1200 && cp <= 0x135F) {
      unsigned int row = (cp - 0x1200) / 8;
      unsigned int order = (cp - 0x1200) % 8;
      if (row < sizeof(kEthiopicRows)/sizeof(char*)) {
        word.push_back({kEthiopicRows[row], false});
        if (order != 5) word.push_back({kEthiopicOrders[order], false});
        else word.push_back({"ɨ", true});  // bare-consonant order
      }
      i += len;
      continue;
    }
    if (cp == 0x1361) { flush(); result += ' '; i += len; continue; }  // ፡ word sep
    if (cp == 0x1362) { flush(); result += '.'; i += len; continue; }  // ።
    if (cp == 0x1363) { flush(); result += ','; i += len; continue; }  // ፣
    flush();
    if (cp < 128 && cp && strchr(";:,.!?()\"- ", static_cast<int>(cp))) {
      char pc = static_cast<char>(cp);
      if (!(pc == ' ' && !result.empty() && result.back() == ' '))
        result += pc;
    }
    i += len;
  }
  flush();
  char* buf = static_cast<char*>(malloc(result.size() + 1));
  memcpy(buf, result.c_str(), result.size() + 1);
  return buf;
}

// --- Sinhala -----------------------------------------------------------------
// Sinhala is an abugida like the ISCII family but with its own block layout
// (U+0D80-0DFF: more vowels incl. æ, prenasalized stop letters, al-lakuna
// virama at 0DCA). Near-phonemic; aspirates merge with plain stops in
// speech (mahaprana letters read as their suddha counterparts). Inherent
// vowel ə (no deletion).

std::string si_cons(unsigned int cp) {
  switch (cp) {
    case 0x0D9A: case 0x0D9B: return "k";
    case 0x0D9C: case 0x0D9D: return "ɡ";
    case 0x0D9E: return "ŋ";
    case 0x0D9F: return "ŋɡ";   // prenasalized
    case 0x0DA0: case 0x0DA1: return "tʃ";
    case 0x0DA2: case 0x0DA3: return "dʒ";
    case 0x0DA4: return "ɲ";
    case 0x0DA5: return "ɡn";
    case 0x0DA6: return "ndʒ";
    case 0x0DA7: case 0x0DA8: return "ʈ";
    case 0x0DA9: case 0x0DAA: return "ɖ";
    case 0x0DAB: return "ɳ";
    case 0x0DAC: return "ɳɖ";   // prenasalized
    case 0x0DAD: case 0x0DAE: return "t";
    case 0x0DAF: case 0x0DB0: return "d";
    case 0x0DB1: return "n";
    case 0x0DB3: return "nd";   // prenasalized
    case 0x0DB4: case 0x0DB5: return "p";
    case 0x0DB6: case 0x0DB7: return "b";
    case 0x0DB8: return "m";
    case 0x0DB9: return "mb";   // prenasalized
    case 0x0DBA: return "j";
    case 0x0DBB: return "r";
    case 0x0DBD: return "l";
    case 0x0DC0: return "ʋ";
    case 0x0DC1: case 0x0DC2: return "ʃ";
    case 0x0DC3: return "s";
    case 0x0DC4: return "h";
    case 0x0DC5: return "ɭ";
    case 0x0DC6: return "f";
  }
  return "";
}

const char* si_vowel(unsigned int cp, bool independent) {
  if (independent) {
    switch (cp) {
      case 0x0D85: return "a";  case 0x0D86: return "aː";
      case 0x0D87: return "æ";  case 0x0D88: return "æː";
      case 0x0D89: return "i";  case 0x0D8A: return "iː";
      case 0x0D8B: return "u";  case 0x0D8C: return "uː";
      case 0x0D8D: return "ri";
      case 0x0D91: return "e";  case 0x0D92: return "eː";
      case 0x0D93: return "ai"; case 0x0D94: return "o";
      case 0x0D95: return "oː"; case 0x0D96: return "au";
    }
    return nullptr;
  }
  switch (cp) {
    case 0x0DCF: return "aː"; case 0x0DD0: return "æ"; case 0x0DD1: return "æː";
    case 0x0DD2: return "i";  case 0x0DD3: return "iː";
    case 0x0DD4: return "u";  case 0x0DD6: return "uː";
    case 0x0DD8: return "ru";
    case 0x0DD9: return "e";  case 0x0DDA: return "eː"; case 0x0DDB: return "ai";
    case 0x0DDC: return "o";  case 0x0DDD: return "oː"; case 0x0DDE: return "au";
    case 0x0DDF: return "u";
  }
  return nullptr;
}

const char* phonemize_text_si(const char* utf8_text) {
  if (!utf8_text) return nullptr;
  std::string text(utf8_text);
  std::string result;
  bool pending = false;  // consonant emitted, inherent vowel undecided
  auto settle = [&]() { if (pending) { result += "ə"; pending = false; } };
  size_t nbytes = text.size();
  for (size_t i = 0; i < nbytes;) {
    unsigned char c = text[i];
    unsigned int cp = 0; size_t len = 1;
    if (c < 0x80) { cp = c; }
    else if ((c >> 5) == 0x6 && i + 1 < nbytes) {
      cp = ((c & 0x1F) << 6) | (text[i+1] & 0x3F); len = 2;
    } else if ((c >> 4) == 0xE && i + 2 < nbytes) {
      cp = ((c & 0x0F) << 12) | ((text[i+1] & 0x3F) << 6) | (text[i+2] & 0x3F); len = 3;
    } else if ((c >> 3) == 0x1E && i + 3 < nbytes) { len = 4; }
    std::string cons = si_cons(cp);
    if (!cons.empty()) {
      settle();
      result += cons;
      pending = true;
      i += len;
      continue;
    }
    const char* iv = si_vowel(cp, true);
    if (iv != nullptr) { settle(); result += iv; i += len; continue; }
    const char* mv = si_vowel(cp, false);
    if (mv != nullptr) { pending = false; result += mv; i += len; continue; }
    if (cp == 0x0DCA) { pending = false; i += len; continue; }  // al-lakuna
    if (cp == 0x0D82) { settle(); result += "ŋ"; i += len; continue; }  // ං
    if (cp == 0x0D83) { settle(); result += "h"; i += len; continue; }  // ඃ
    settle();
    if (cp < 128 && cp && strchr(";:,.!?()\"- ", static_cast<int>(cp))) {
      char pc = static_cast<char>(cp);
      if (!(pc == ' ' && !result.empty() && result.back() == ' '))
        result += pc;
    }
    i += len;
  }
  settle();
  char* buf = static_cast<char*>(malloc(result.size() + 1));
  memcpy(buf, result.c_str(), result.size() + 1);
  return buf;
}

// --- Burmese / Shan (Myanmar script) -----------------------------------------
// Abugida with inherent a, medial signs (ja/ra/wa/ha) and the asat (\u1039\u103a)
// that turns a consonant into a coda. Burmese RHYMES are joint functions of
// the vowel-sign combination AND the coda: the same killed letter yields
// different vowels under different signs (MLC romanization -> IPA:
// -\u1000\u103a \u025bʔ, -\u1005\u103a \u026aʔ, -\u1010\u103a/-\u1015\u103a aʔ, -\u102d\u1010\u103a eiʔ, -\u102f\u1010\u103a ouʔ,
// -\u1031\u102c\u1000\u103a auʔ, -\u102d\u102f\u1000\u103a aiʔ; nasals -\u1004\u103a in, -\u1014\u103a/-\u1019\u103a an,
// -\u102d\u1014\u103a ein, -\u102f\u1014\u103a oun, -\u1031\u102c\u1004\u103a aun, -\u102d\u102f\u1004\u103a ain), and the sign
// combos \u1031+\u102c / \u102d+\u102f read \u0254\u02d0 / o\u02d0 as units, not letter-by-letter.
// Final stops all neutralize to the glottal stop; final nasals to a
// placeless nasal (emitted n). Tone marks are dropped (no tone letters in
// the model symbol table, as for Vietnamese). Shan shares the block with
// its own letters (U+1022, U+1075-1081), vowel signs (U+1083-1086) and the
// -\u1082\u103a a\u026f rhyme; \u101e reads s (not \u03b8) in Shan.

std::string my_cons(unsigned int cp, bool shan) {
  switch (cp) {
    case 0x1000: return "k";  case 0x1001: return "k\u02b0";
    case 0x1002: case 0x1003: return "\u0261";
    case 0x1004: return "\u014b";
    case 0x1005: return "s";  case 0x1006: return "s\u02b0";
    case 0x1007: case 0x1008: return "z";
    case 0x1009: case 0x100A: return "\u0272";
    case 0x100B: return "t";  case 0x100C: return "t\u02b0";
    case 0x100D: case 0x100E: return "d";
    case 0x100F: return "n";
    case 0x1010: return "t";  case 0x1011: return "t\u02b0";
    case 0x1012: case 0x1013: return "d";
    case 0x1014: return "n";
    case 0x1015: return "p";  case 0x1016: return "p\u02b0";
    case 0x1017: case 0x1018: return "b";
    case 0x1019: return "m";
    case 0x101A: return "j";
    case 0x101B: return shan ? "r" : "j";   // \u101b reads j in Burmese, r in Shan
    case 0x101C: return "l";
    case 0x101D: return "w";
    case 0x101E: return shan ? "s" : "\u03b8";
    case 0x101F: return "h";
    case 0x1020: return "l";
    case 0x1021: return "\u0294";
    case 0x103F: return "s";                // \u103f great sa
    // Shan letters
    case 0x1022: return "\u0294";          // \u1022 Shan a
    case 0x1075: return "k";  case 0x1076: return "k\u02b0";
    case 0x1077: return "\u0261";
    case 0x1078: return "ts"; case 0x1079: return "z";
    case 0x107A: return "\u0272";
    case 0x107B: return "d";  case 0x107C: return "n";
    case 0x107D: return "p\u02b0";
    case 0x107E: return "f";  case 0x107F: return "b";
    case 0x1080: return "t\u02b0";
    case 0x1081: return "h";
  }
  return "";
}

// Vowel-sign bits collected per syllable.
enum {
  MY_AA = 1, MY_I = 2, MY_II = 4, MY_U = 8, MY_UU = 16, MY_E = 32,
  MY_AI = 64, MY_ANU = 128, MY_SHE = 256, MY_SHY = 512, MY_AW = 1024,
};

const char* phonemize_text_my(const char* utf8_text, bool shan) {
  if (!utf8_text) return nullptr;
  std::string text(utf8_text);
  std::string result;
  std::string onset;      // consonant + medial glides, vowel undecided
  bool have_cons = false;
  bool med_w = false;     // medial wa seen (merges into -\u1010\u103a/-\u1014\u103a rhymes)
  unsigned v = 0;         // vowel-sign bits

  // Emit the pending syllable. coda_cp = 0 for an open syllable, otherwise
  // the codepoint of the asat-killed consonant (0x1036 anusvara arrives as
  // a pseudo m-coda).
  auto emit = [&](unsigned coda_cp) {
    if (!have_cons && !v && !coda_cp) { onset.clear(); med_w = false; return; }
    bool i = v & (MY_I | MY_II), u = v & (MY_U | MY_UU);
    bool e = v & MY_E, aa = v & MY_AA;
    if ((v & MY_ANU) && !coda_cp) coda_cp = 0x1019;  // \u1036 = nasal coda
    if (shan) {
      // Shan is a Tai language under the Myanmar script: unlike Burmese it
      // keeps PLACE in final consonants (m n \u014b p t k + w/j offglides)
      // and has no diphthongizing rhyme fusion \u2014 vowel quality comes from
      // the signs alone (externally validated on Tai cognates: \u1075\u102d\u107c\u103a kin
      // 'eat', \u107c\u1019\u103a\u1089 nam 'water', \u1019\u102d\u1030\u1004\u103a\u1038 m\u0264\u014b 'country', \u1075\u1030\u107c\u103a\u1038 kon
      // 'person', \u1019\u102d\u102f\u101d\u103a\u1038 m\u026f 'hand', \u1081\u102d\u1030\u107c\u103a\u1038 h\u0264n 'house').
      //   \u102d\u102f/\u102d\u1030 = \u0264 (closed);  \u102d\u102f\u101d\u103a = \u026f,  \u102d\u1030\u101d\u103a = \u0264 (the \u101d\u103a is vowel
      //   spelling, absorbed);  \u1030 = o before a coda (incl. \u1030\u101d\u103a), u open;
      //   \u103d = \u0254 (a VOWEL in Shan, not the Burmese medial wa).
      std::string vowel;
      bool w_coda = coda_cp == 0x101D;
      if (e && aa) { vowel = "\u0254\u02d0"; }
      else if (i && u) {
        if (w_coda && (v & MY_U)) { vowel = "\u026f"; coda_cp = 0; }
        else if (w_coda) { vowel = "\u0264"; coda_cp = 0; }
        else vowel = "\u0264";
      }
      else if (v & MY_SHE) vowel = "\u025b";
      else if (v & MY_AI) vowel = "\u025b";
      else if (v & MY_II) vowel = "i\u02d0";
      else if (i) vowel = "i";
      else if (v & MY_UU) {
        if (w_coda) { vowel = "o"; coda_cp = 0; }
        else vowel = coda_cp ? "o" : "u";
      }
      else if (u) vowel = "u";
      else if (e) vowel = "e";
      else if (v & MY_AW) vowel = "\u0254";
      else if (aa) vowel = "a\u02d0";
      else if (have_cons || coda_cp || (v & MY_SHY)) vowel = "a";
      // \u1086: /ai/ alone, an /i/ offglide after another vowel (\u101c\u103d\u1086 l\u0254i,
      // \u1076\u1062\u1086 k\u02b0a\u02d0i).
      if (v & MY_SHY) vowel = (vowel == "a") ? "ai" : vowel + "i";
      std::string coda;
      switch (coda_cp) {
        case 0: break;
        case 0x1004: coda = "\u014b"; break;
        case 0x1019: coda = "m"; break;
        case 0x1014: case 0x100F: case 0x107C:
        case 0x1009: case 0x100A: case 0x107A: coda = "n"; break;
        case 0x1000: case 0x1001: case 0x1002: case 0x1003:
        case 0x1075: case 0x1076: case 0x1077: coda = "k"; break;
        case 0x1015: case 0x1016: case 0x1017: case 0x1018:
        case 0x107D: case 0x107F: coda = "p"; break;
        case 0x101A: coda = "i"; break;            // -\u101a\u103a offglide
        case 0x101D: coda = "w"; break;            // -\u101d\u103a offglide (\u1001\u101d\u103a k\u02b0aw)
        default: coda = "t"; break;                // t-row / s-row / loans
      }
      result += onset;
      result += vowel;
      result += coda;
      onset.clear(); have_cons = false; med_w = false; v = 0;
      return;
    }
    std::string rhyme;
    bool merge_w = false;  // rhyme absorbed the medial wa
    if (coda_cp == 0x101A || coda_cp == 0x100A) {
      rhyme = "\u025b";                        // -\u101a\u103a / -\u100a\u103a
    } else if (coda_cp == 0x1009) {
      rhyme = "in";                             // -\u1009\u103a
    } else if (coda_cp) {
      bool nasal = coda_cp == 0x1004 || coda_cp == 0x100F || coda_cp == 0x1014 ||
                   coda_cp == 0x1019 || coda_cp == 0x107A || coda_cp == 0x107C;
      if (nasal) {
        if (e && aa) rhyme = "aun";
        else if (i && u) rhyme = "ain";
        else if (i) rhyme = "ein";
        else if (u) rhyme = "oun";
        else if (v & MY_SHE) rhyme = "\u025bn";
        else if (aa) rhyme = "a\u02d0n";       // Shan -\u1083\u107c\u103a
        else if (med_w && coda_cp != 0x1004) { rhyme = "un"; merge_w = true; }
        else rhyme = (coda_cp == 0x1004) ? "in" : "an";
      } else {
        if (e && aa) rhyme = "au\u0294";
        else if (i && u) rhyme = "ai\u0294";
        else if (i) rhyme = "ei\u0294";
        else if (u) rhyme = "ou\u0294";
        else if (med_w && (coda_cp >= 0x1010 && coda_cp <= 0x1018)) {
          rhyme = "u\u0294"; merge_w = true;   // -\u103d\u1010\u103a/-\u103d\u1015\u103a
        } else if (coda_cp >= 0x1000 && coda_cp <= 0x1003) rhyme = "\u025b\u0294";
        else if (coda_cp >= 0x1005 && coda_cp <= 0x1008) rhyme = "\u026a\u0294";
        else rhyme = "a\u0294";
      }
    } else {
      if (e && aa) rhyme = "\u0254\u02d0";    // \u1031\u102c
      else if (i && u) rhyme = "o\u02d0";      // \u102d\u102f
      else if (v & MY_SHY) rhyme = "ai";        // Shan \u1086
      else if (v & MY_SHE) rhyme = "\u025b";   // Shan \u1085
      else if (v & MY_II) rhyme = "i\u02d0";
      else if (i) rhyme = "i";
      else if (v & MY_UU) rhyme = "u\u02d0";
      else if (u) rhyme = "u";
      else if (e) rhyme = "e\u02d0";
      else if (v & MY_AI) rhyme = "\u025b\u02d0";
      else if (aa) rhyme = "a\u02d0";
      else if (have_cons) rhyme = "a";
    }
    if (merge_w && !onset.empty() && onset.back() == 'w')
      onset.pop_back();
    result += onset;
    result += rhyme;
    onset.clear(); have_cons = false; med_w = false; v = 0;
  };

  size_t nbytes = text.size();
  auto decode_at = [&](size_t pos, size_t& len) -> unsigned int {
    unsigned char c = text[pos];
    len = 1;
    if (c < 0x80) return c;
    if ((c >> 5) == 0x6 && pos + 1 < nbytes) {
      len = 2;
      return ((c & 0x1F) << 6) | (text[pos + 1] & 0x3F);
    }
    if ((c >> 4) == 0xE && pos + 2 < nbytes) {
      len = 3;
      return ((c & 0x0F) << 12) | ((text[pos + 1] & 0x3F) << 6) |
             (text[pos + 2] & 0x3F);
    }
    if ((c >> 3) == 0x1E && pos + 3 < nbytes) { len = 4; return 0; }
    return 0;
  };

  for (size_t i = 0; i < nbytes;) {
    size_t len = 1;
    unsigned int cp = decode_at(i, len);
    std::string cons = my_cons(cp, shan);
    if (!cons.empty()) {
      // Peek: is this consonant killed by asat (a coda)?
      size_t nlen = 1;
      unsigned int nxt = (i + len < nbytes) ? decode_at(i + len, nlen) : 0;
      if (nxt == 0x103A) {
        if (have_cons || v) {
          emit(cp);               // coda of the pending syllable
        } else {
          onset = cons;           // degenerate: killed letter with no base
          have_cons = true;
          emit(0);
        }
        i += len + nlen;
        continue;
      }
      emit(0);
      onset = cons;
      have_cons = true;
      i += len;
      continue;
    }
    switch (cp) {
      case 0x103B: case 0x103C: onset += "j"; i += len; continue;  // medial ja/ra
      case 0x103D:
        // Burmese: medial wa. Shan: the VOWEL ɔ (မွၵ်ႇ mɔk 'flower').
        if (shan) { v |= MY_AW; } else { onset += "w"; med_w = true; }
        i += len; continue;
      case 0x1082: onset += "w"; med_w = true; i += len; continue;
      case 0x103E: onset += "h"; i += len; continue;               // medial ha
      case 0x102B: case 0x102C: case 0x1083: v |= MY_AA; i += len; continue;
      case 0x1062: v |= MY_AA; i += len; continue;  // ၢ Shan aa (ဝၢၼ်ႈ waːn)
      case 0x102D: v |= MY_I;  i += len; continue;
      case 0x102E: v |= MY_II; i += len; continue;
      case 0x102F: v |= MY_U;  i += len; continue;
      case 0x1030: v |= MY_UU; i += len; continue;
      case 0x1031: case 0x1084: v |= MY_E; i += len; continue;
      case 0x1035: v |= MY_E; i += len; continue;  // ဵ Shan E (ႁဵၼ်း hen)
      case 0x1032: v |= MY_AI; i += len; continue;
      case 0x1085: v |= MY_SHE; i += len; continue;
      case 0x1086: v |= MY_SHY; i += len; continue;
      case 0x1036: v |= MY_ANU; i += len; continue;  // anusvara: nasal
      case 0x103A:
        // Standalone asat after a sign: -\u1031\u102c\u103a stays \u0254\u02d0 (just
        // consume); Shan -\u1082\u103a is the a\u026f rhyme.
        if (med_w && !v) {
          if (!onset.empty() && onset.back() == 'w') onset.pop_back();
          result += onset; result += "a\u026f";
          onset.clear(); have_cons = false; med_w = false; v = 0;
        }
        i += len; continue;
      case 0x1037: case 0x1038: i += len; continue;  // tone marks: dropped
      case 0x1039: i += len; continue;               // stacker (kinzi join)
      case 0x1087: case 0x1088: case 0x1089: case 0x108A: case 0x108B:
      case 0x108C: case 0x108D: i += len; continue;  // Shan tone marks
      // Independent vowels: their own syllables.
      case 0x1023: emit(0); result += "\u0294i";  i += len; continue;
      case 0x1024: emit(0); result += "\u0294i\u02d0"; i += len; continue;
      case 0x1025: emit(0); result += "\u0294u";  i += len; continue;
      case 0x1026: emit(0); result += "\u0294u\u02d0"; i += len; continue;
      case 0x1027: emit(0); result += "\u0294e\u02d0"; i += len; continue;
      case 0x1029: case 0x102A: emit(0); result += "\u0294\u0254\u02d0"; i += len; continue;
      case 0x104A: emit(0); result += ','; i += len; continue;
      case 0x104B: emit(0); result += '.'; i += len; continue;
    }
    emit(0);
    if (cp < 128 && cp && strchr(";:,.!?()\"- ", static_cast<int>(cp))) {
      char pc = static_cast<char>(cp);
      if (!(pc == ' ' && !result.empty() && result.back() == ' '))
        result += pc;
    }
    i += len;
  }
  emit(0);
  char* buf = static_cast<char*>(malloc(result.size() + 1));
  memcpy(buf, result.c_str(), result.size() + 1);
  return buf;
}

// --- Goidelic (Irish / Scottish Gaelic) --------------------------------------
// Irish orthography is rule-governed once two systems are understood:
// (1) every consonant is BROAD (plain/velarized) or SLENDER (palatalized),
// shown by the flanking vowel letters ("caol le caol agus leathan le
// leathan"); (2) the lenition digraphs (bh mh ch dh gh fh ph sh th) and
// word-initial eclipsis clusters (mb gc nd bhf dt bp ng) replace their
// base letters entirely. Short-vowel clusters mostly carry ONE spoken
// vowel — the rest are quality markers. Initial stress (Connacht/Ulster
// convention). Scottish Gaelic shares the machinery with different values
// for ao and broad bh/mh.

bool gd_slender_v(char c) { return c=='e' || c=='i' || c=='E' || c=='I'; }
bool gd_any_v(char c) {
  return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'||c=='A'||c=='E'||c=='I'||c=='O'||c=='U';
}

std::string phonemize_word_goidelic(const std::string& raw, bool scottish) {
  // Fold: á→A é→E í→I ó→O ú→U (fada marks length).
  std::string w;
  for (size_t i = 0; i < raw.size();) {
    unsigned char c = raw[i];
    if (c < 128) { w += static_cast<char>(tolower(c)); ++i; continue; }
    if (c == 0xC3 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      switch (d) {
        case 0xA1: case 0x81: w += 'A'; break;  // á
        case 0xA9: case 0x89: w += 'E'; break;  // é
        case 0xAD: case 0x8D: w += 'I'; break;  // í
        case 0xB3: case 0x93: w += 'O'; break;  // ó
        case 0xBA: case 0x9A: w += 'U'; break;  // ú
        case 0xA0: case 0x80: w += 'A'; break;  // à (gd)
        case 0xA8: case 0x88: w += 'E'; break;  // è (gd)
        case 0xAC: case 0x8C: w += 'I'; break;  // ì (gd)
        case 0xB2: case 0x92: w += 'O'; break;  // ò (gd)
        case 0xB9: case 0x99: w += 'U'; break;  // ù (gd)
      }
      i += 2; continue;
    }
    ++i;
  }
  size_t n = w.size();

  // Is the consonant at [i..j) slender? The FOLLOWING vowel decides; at
  // word end the PRECEDING one does (caol le caol symmetry).
  auto slender_at = [&](size_t i, size_t j) {
    if (j < n && gd_any_v(w[j])) return gd_slender_v(w[j]);
    if (i > 0 && gd_any_v(w[i - 1])) return gd_slender_v(w[i - 1]);
    return false;
  };

  struct GP { std::string ipa; bool vowel; };
  std::vector<GP> ph;

  size_t i = 0;
  // Word-initial eclipsis: the written base letter is silent.
  if (!scottish) {
    if (n >= 3 && w.compare(0, 3, "bhf") == 0) {
      ph.push_back({slender_at(0, 3) ? "vʲ" : "w", false}); i = 3;
    } else if (n >= 2 && w[1] != '\0') {
      static const struct { const char* cl; const char* ipa; } kEcl[] = {
        {"mb", "m"}, {"gc", "ɡ"}, {"nd", "n"}, {"ng", "ŋ"}, {"dt", "d"},
        {"bp", "b"}, {"ts", "t"},
      };
      for (const auto& e : kEcl) {
        if (w.compare(0, 2, e.cl) == 0 && n > 2 && !gd_any_v(w[1])) {
          ph.push_back({e.ipa, false}); i = 2; break;
        }
      }
    }
  }

  while (i < n) {
    char c = w[i];
    char c1 = (i + 1 < n) ? w[i + 1] : '\0';
    // --- lenition digraphs ---
    if (c1 == 'h') {
      bool sl = slender_at(i, i + 2);
      bool final_pos = i + 2 >= n;
      switch (c) {
        case 'b': case 'm':
          ph.push_back({sl ? "vʲ" : (scottish ? "v" : "w"), false}); i += 2; continue;
        case 'c': ph.push_back({sl ? "ç" : "x", false}); i += 2; continue;
        case 'd': case 'g':
          if (final_pos && i > 0 && gd_any_v(w[i - 1])) { i += 2; continue; }  // -adh/-igh: silent
          ph.push_back({sl ? "j" : "ɣ", false}); i += 2; continue;
        case 'f': i += 2; continue;  // fh silent
        case 'p': ph.push_back({"f", false}); i += 2; continue;
        case 's': case 't': ph.push_back({"h", false}); i += 2; continue;
      }
    }
    // --- vowel clusters (longest match; fada vowels dominate) ---
    if (gd_any_v(c)) {
      size_t j = i;
      std::string cluster;
      while (j < n && gd_any_v(w[j])) { cluster += w[j]; ++j; }
      std::string ipa;
      // Any fada vowel in the cluster wins.
      if (cluster.find('A') != std::string::npos) ipa = "ɑː";
      else if (cluster.find('E') != std::string::npos) ipa = "eː";
      else if (cluster.find('I') != std::string::npos) ipa = "iː";
      else if (cluster.find('O') != std::string::npos) ipa = "oː";
      else if (cluster.find('U') != std::string::npos) ipa = "uː";
      else if (cluster == "aoi") ipa = scottish ? "ɯː" : "iː";
      else if (cluster == "ao") ipa = scottish ? "ɯː" : "iː";
      else if (cluster == "eo") ipa = "oː";
      else if (cluster == "ea") ipa = "a";
      else if (cluster == "ai") ipa = "a";
      else if (cluster == "ei") ipa = "ɛ";
      else if (cluster == "io") ipa = "ɪ";
      else if (cluster == "iu") ipa = "ʊ";
      else if (cluster == "ui") ipa = "ɪ";
      else if (cluster == "ua") ipa = "uə";
      else if (cluster == "uai") ipa = "uə";
      else if (cluster == "ia") ipa = "iə";
      else if (cluster == "iai") ipa = "iə";
      else if (cluster == "eai") ipa = "a";
      else if (cluster == "aei") ipa = "eː";
      else if (cluster == "ae") ipa = "eː";
      else if (cluster == "oi") ipa = "ɔ";
      else if (cluster == "eoi") ipa = "oː";
      else if (cluster == "iui") ipa = "ʊ";
      else if (cluster == "ai" ) ipa = "a";
      else if (cluster.size() == 1) {
        switch (cluster[0]) {
          case 'a': ipa = "a"; break;
          case 'e': ipa = "ɛ"; break;
          case 'i': ipa = "ɪ"; break;
          case 'o': ipa = "ɔ"; break;
          case 'u': ipa = "ʊ"; break;
        }
      } else {
        // Unlisted cluster: first non-marker vowel.
        switch (cluster[0]) {
          case 'a': ipa = "a"; break;
          case 'e': ipa = "ɛ"; break;
          case 'i': ipa = "ɪ"; break;
          case 'o': ipa = "ɔ"; break;
          case 'u': ipa = "ʊ"; break;
          default: ipa = "ə"; break;
        }
      }
      ph.push_back({ipa, true});
      i = j;
      continue;
    }
    // --- consonants with broad/slender quality ---
    bool sl = slender_at(i, i + 1);
    switch (c) {
      case 'b': ph.push_back({sl ? "bʲ" : "b", false}); break;
      case 'c': ph.push_back({sl ? "c" : "k", false}); break;
      case 'd': ph.push_back({sl ? "dʲ" : "d", false}); break;
      case 'f': ph.push_back({sl ? "fʲ" : "f", false}); break;
      case 'g': ph.push_back({sl ? "ɟ" : "ɡ", false}); break;
      case 'h': ph.push_back({"h", false}); break;
      case 'l': ph.push_back({sl ? "ʎ" : "l", false}); break;
      case 'm': ph.push_back({sl ? "mʲ" : "m", false}); break;
      case 'n': ph.push_back({sl ? "ɲ" : "n", false}); break;
      case 'p': ph.push_back({sl ? "pʲ" : "p", false}); break;
      case 'r': ph.push_back({"ɾ", false}); break;
      case 's': ph.push_back({sl ? "ʃ" : "s", false}); break;
      case 't': ph.push_back({sl ? "tʲ" : "t", false}); break;
      case 'v': ph.push_back({"v", false}); break;
      default: break;
    }
    ++i;
  }

  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  bool placed = false;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel && !placed) { if (total > 1) out += "ˈ"; placed = true; }
    out += p.ipa;
  }
  return out;
}

const char* phonemize_text_goidelic(const char* utf8_text, bool scottish) {
  if (!utf8_text) return nullptr;
  std::string text(utf8_text);
  std::string result, word;
  auto flush = [&]() {
    if (!word.empty()) {
      result += phonemize_word_goidelic(word, scottish);
      word.clear();
    }
  };
  for (size_t i = 0; i < text.size();) {
    unsigned char c = text[i];
    if (c < 128) {
      if (isalpha(c) || c == '\'') { word += static_cast<char>(c); ++i; continue; }
      flush();
      if (strchr(";:,.!?()\"- ", c)) {
        if (!(c == ' ' && !result.empty() && result.back() == ' '))
          result += static_cast<char>(c);
      }
      ++i;
      continue;
    }
    size_t len = (c >> 5) == 0x6 ? 2 : (c >> 4) == 0xE ? 3 : 4;
    if (c == 0xC3) { word.append(text, i, len); i += len; continue; }
    flush();
    i += len;
  }
  flush();
  char* buf = static_cast<char*>(malloc(result.size() + 1));
  memcpy(buf, result.c_str(), result.size() + 1);
  return buf;
}

// --- Generic table-driven Latin engine ---------------------------------------
// The long tail of REGULAR Latin orthographies (Māori, Latin, Albanian,
// Maltese, Afrikaans, Icelandic, Catalan, Haitian, Papiamento, Guarani,
// Uzbek, Kurmanji, Setswana, Oromo, Interlingua, LFN, Lojban, Lithuanian,
// Greenlandic, Aragonese) differs only in a digraph/letter → IPA table and a
// stress default, not in algorithm. One longest-match engine + one table per
// language replaces twenty bespoke engines. Rule syntax:
//   seq starting with '^'  — only matches word-initially
//   seq ending with '$'    — only matches word-finally
//   seq ending with '+'    — only before a front vowel (e/i/y)
//   ipa may carry an inline ˈ (orthographic stress, e.g. Catalan accents);
//   the default stress pass is skipped when the word already has one.

struct LatRule { const char* seq; const char* ipa; };

enum class LatStress { NONE, FIRST, PENULT, FINAL };

struct LatCfg {
  const LatRule* rules;
  int nrules;
  LatStress stress;
};

// Lowercase-fold one UTF-8 string (ASCII + Latin-1 + Latin Extended-A).
std::string latin_fold(const std::string& in) {
  std::string out;
  for (size_t i = 0; i < in.size();) {
    unsigned char c = in[i];
    if (c < 0x80) { out += static_cast<char>(tolower(c)); ++i; continue; }
    if (c == 0xC3 && i + 1 < in.size()) {
      unsigned char d = in[i + 1];
      if (d >= 0x80 && d <= 0x9E && d != 0x97) d += 0x20;  // À-Þ → à-þ
      out += static_cast<char>(0xC3); out += static_cast<char>(d);
      i += 2; continue;
    }
    if ((c == 0xC4 || c == 0xC5) && i + 1 < in.size()) {
      unsigned char d = in[i + 1];
      // Latin Ext-A: uppercase is even, lowercase odd (with block quirks
      // that don't matter for our tables).
      unsigned int cp = ((c & 0x1F) << 6) | (d & 0x3F);
      if (cp >= 0x100 && cp <= 0x177 && (cp & 1) == 0) cp += 1;
      else if (cp >= 0x179 && cp <= 0x17E && (cp & 1) == 1) cp += 1;
      out += static_cast<char>(0xC0 | (cp >> 6));
      out += static_cast<char>(0x80 | (cp & 0x3F));
      i += 2; continue;
    }
    out += static_cast<char>(c); ++i;
  }
  return out;
}

bool lat_is_front(const std::string& w, size_t i) {
  if (i >= w.size()) return false;
  char c = w[i];
  if (c == 'e' || c == 'i' || c == 'y') return true;
  if (static_cast<unsigned char>(c) == 0xC3 && i + 1 < w.size()) {
    unsigned char d = w[i + 1];
    // è é ê ë ì í î ï
    return d >= 0xA8 && d <= 0xAF;
  }
  return false;
}

// Vowel test on an IPA chunk's first codepoint (for stress placement).
bool ipa_is_vowel(const std::string& s) {
  if (s.empty()) return false;
  size_t i = (s.compare(0, 2, "ˈ") == 0) ? 2 : 0;
  if (i >= s.size()) return false;
  unsigned char c = s[i];
  if (c < 0x80) return strchr("aeiouy", c) != nullptr;
  static const char* kV[] = {
    "æ","ɑ","ɒ","ɔ","ə","ɛ","ɜ","ɤ","ɨ","ɪ","ɯ","ʉ","ʊ","ʌ","ø","œ","ʏ","ɐ","ɚ",
  };
  for (const char* v : kV)
    if (s.compare(i, strlen(v), v) == 0) return true;
  return false;
}

std::string phonemize_word_latin(const std::string& raw, const LatCfg& cfg) {
  std::string w = latin_fold(raw);
  struct LP { std::string ipa; bool vowel; };
  std::vector<LP> ph;
  size_t n = w.size();
  bool has_inline_stress = false;
  for (size_t i = 0; i < n;) {
    const LatRule* best = nullptr;
    size_t best_len = 0;
    for (int r = 0; r < cfg.nrules; ++r) {
      const char* seq = cfg.rules[r].seq;
      bool initial = seq[0] == '^';
      if (initial) ++seq;
      size_t sl = strlen(seq);
      bool final_only = sl > 0 && seq[sl - 1] == '$';
      bool front_only = sl > 0 && seq[sl - 1] == '+';
      if (final_only || front_only) --sl;
      if (sl == 0 || sl > n - i) continue;
      if (initial && i != 0) continue;
      if (w.compare(i, sl, seq, sl) != 0) continue;
      if (final_only && i + sl != n) continue;
      if (front_only && !lat_is_front(w, i + sl)) continue;
      if (sl > best_len) { best = &cfg.rules[r]; best_len = sl; }
    }
    if (best != nullptr) {
      std::string ipa = best->ipa;
      if (!ipa.empty()) {
        if (ipa.compare(0, 2, "ˈ") == 0) has_inline_stress = true;
        ph.push_back({ipa, ipa_is_vowel(ipa)});
      }
      i += best_len;
      continue;
    }
    unsigned char c = w[i];
    if (c < 0x80 && isalpha(c)) {
      // identity default: letter passes through (a e i o u as themselves);
      // ASCII g is normalized to IPA ɡ so tables may omit it
      std::string one = (c == 'g') ? "ɡ" : std::string(1, static_cast<char>(c));
      ph.push_back({one, strchr("aeiou", c) != nullptr});
      ++i;
      continue;
    }
    // unknown non-ASCII byte: skip the whole UTF-8 char
    i += (c >> 5) == 0x6 ? 2 : (c >> 4) == 0xE ? 3 : (c >> 3) == 0x1E ? 4 : 1;
  }
  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  int target = -1;  // 1-indexed vowel that takes ˈ
  if (!has_inline_stress && total > 1) {
    switch (cfg.stress) {
      case LatStress::FIRST: target = 1; break;
      case LatStress::PENULT: target = total - 1; break;
      case LatStress::FINAL: target = total; break;
      case LatStress::NONE: break;
    }
  }
  int seen = 0;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel) { ++seen; if (seen == target) out += "ˈ"; }
    out += p.ipa;
  }
  return out;
}

const char* phonemize_text_latin(const char* utf8_text, const LatCfg& cfg) {
  if (!utf8_text) return nullptr;
  std::string text(utf8_text);
  std::string result, word;
  auto flush = [&]() {
    if (!word.empty()) { result += phonemize_word_latin(word, cfg); word.clear(); }
  };
  for (size_t i = 0; i < text.size();) {
    unsigned char c = text[i];
    if (c < 128) {
      if (isalpha(c) || c == '\'') { word += static_cast<char>(c); ++i; continue; }
      flush();
      if (strchr(";:,.!?()\"- ", c)) {
        if (!(c == ' ' && !result.empty() && result.back() == ' '))
          result += static_cast<char>(c);
      }
      ++i;
      continue;
    }
    // non-ASCII: letters (any Latin supplement/extended char) join the word
    size_t len = (c >> 5) == 0x6 ? 2 : (c >> 4) == 0xE ? 3 : (c >> 3) == 0x1E ? 4 : 1;
    if (c == 0xC2 || c == 0xE2) {  // punctuation planes (·, quotes, dashes)
      flush();
      i += len;
      continue;
    }
    word.append(text, i, len);
    i += len;
  }
  flush();
  char* buf = static_cast<char*>(malloc(result.size() + 1));
  memcpy(buf, result.c_str(), result.size() + 1);
  return buf;
}

// Per-language tables. Order within a table is irrelevant (longest match
// wins); identity letters may be omitted (ASCII letters default to
// themselves, vowels aeiou marked as vowels).

static const LatRule kMiRules[] = {   // Māori: fully regular, 10 consonants
  {"wh", "f"}, {"ng", "ŋ"}, {"r", "ɾ"},
  {"ā", "aː"}, {"ē", "eː"}, {"ī", "iː"}, {"ō", "oː"}, {"ū", "uː"},
};
static const LatRule kLaRules[] = {   // Latin (classical-lite values)
  {"ae", "ai"}, {"oe", "oi"}, {"c", "k"}, {"v", "w"}, {"qu", "kw"},
  {"ph", "f"}, {"th", "t"}, {"ch", "k"}, {"x", "ks"}, {"j", "j"},
  {"ā", "aː"}, {"ē", "eː"}, {"ī", "iː"}, {"ō", "oː"}, {"ū", "uː"},
};
static const LatRule kSqRules[] = {   // Albanian: one letter/digraph = one sound
  {"dh", "ð"}, {"gj", "ɟ"}, {"ll", "ɫ"}, {"nj", "ɲ"}, {"rr", "r"},
  {"sh", "ʃ"}, {"th", "θ"}, {"xh", "dʒ"}, {"zh", "ʒ"},
  {"ç", "tʃ"}, {"ë", "ə"}, {"c", "ts"}, {"q", "c"}, {"x", "dz"}, {"y", "y"},
  {"e$", "ə"},
};
static const LatRule kMtRules[] = {   // Maltese
  {"għ", ""}, {"ħ", "ħ"}, {"ie", "iː"}, {"ċ", "tʃ"}, {"ġ", "dʒ"},
  {"ż", "z"}, {"z", "ts"}, {"x", "ʃ"}, {"q", "ʔ"}, {"j", "j"}, {"w", "w"},
  {"h", ""}, {"c", "tʃ"},
};
static const LatRule kAfRules[] = {   // Afrikaans (Dutch-derived)
  {"oe", "u"}, {"ee", "eː"}, {"aa", "ɑː"}, {"oo", "oː"}, {"uu", "yː"},
  {"eu", "øː"}, {"ui", "œy"}, {"ou", "əu"}, {"ei", "əi"}, {"y", "əi"},
  {"tjie$", "ki"}, {"tj", "tʃ"}, {"dj", "dʒ"},
  {"g", "x"}, {"v", "f"}, {"w", "v"}, {"j", "j"}, {"sj", "ʃ"}, {"r", "r"},
  {"ê", "ɛː"}, {"ô", "ɔː"}, {"é", "ˈe"}, {"è", "ˈɛ"},
};
static const LatRule kIsRules[] = {   // Icelandic
  {"þ", "θ"}, {"ð", "ð"}, {"æ", "ai"}, {"au", "øy"}, {"ei", "ei"}, {"ey", "ei"},
  {"á", "au"}, {"é", "jɛ"}, {"í", "i"}, {"ó", "ou"}, {"ú", "u"}, {"ý", "i"},
  {"ö", "ø"}, {"ll", "tl"}, {"^hv", "kv"}, {"nn", "tn"}, {"x", "ks"},
  {"u", "ʏ"}, {"y", "ɪ"}, {"i", "ɪ"}, {"e", "ɛ"}, {"o", "ɔ"},
};
static const LatRule kCaRules[] = {   // Catalan (central values)
  {"ny", "ɲ"}, {"l·l", "l"}, {"ll", "ʎ"}, {"ss", "s"}, {"ix", "ʃ"},
  {"ig$", "tʃ"}, {"tx", "tʃ"}, {"tg+", "dʒ"}, {"tj", "dʒ"},
  {"qu+", "k"}, {"gu+", "ɡ"}, {"c+", "s"}, {"ç", "s"}, {"g+", "ʒ"},
  {"j", "ʒ"}, {"x", "ʃ"}, {"v", "b"}, {"r$", ""},
  {"à", "ˈa"}, {"é", "ˈe"}, {"è", "ˈɛ"}, {"í", "ˈi"}, {"ó", "ˈo"},
  {"ò", "ˈɔ"}, {"ú", "ˈu"}, {"ï", "i"},
};
static const LatRule kHtRules[] = {   // Haitian Creole (regular French base)
  {"ou", "u"}, {"è", "ɛ"}, {"é", "e"}, {"ch", "ʃ"}, {"j", "ʒ"},
  {"y", "j"}, {"ui", "ɥi"}, {"ò", "ɔ"}, {"g+", "ɡ"}, {"an", "an"},
  {"en", "en"}, {"on", "on"}, {"r", "ɣ"},
};
static const LatRule kPapRules[] = {  // Papiamento
  {"dj", "dʒ"}, {"zj", "ʒ"}, {"ñ", "ɲ"}, {"c+", "s"}, {"c", "k"},
  {"sh", "ʃ"}, {"y", "j"}, {"è", "ɛ"}, {"ò", "ɔ"}, {"ù", "u"},
};
static const LatRule kGnRules[] = {   // Guarani
  {"ch", "ʃ"}, {"mb", "mb"}, {"nd", "nd"}, {"ng", "ŋ"}, {"nt", "nt"},
  {"ñ", "ɲ"}, {"j", "dʒ"}, {"y", "ɨ"}, {"'", "ʔ"}, {"h", "h"},
  {"ã", "a"}, {"ẽ", "e"}, {"ĩ", "i"}, {"õ", "o"}, {"ũ", "u"}, {"ỹ", "ɨ"},
  {"á", "ˈa"}, {"é", "ˈe"}, {"í", "ˈi"}, {"ó", "ˈo"}, {"ú", "ˈu"},
};
static const LatRule kUzRules[] = {   // Uzbek (Latin 1995)
  {"o'", "oː"}, {"g'", "ɣ"}, {"sh", "ʃ"}, {"ch", "tʃ"}, {"ng", "ŋ"},
  {"x", "x"}, {"j", "dʒ"}, {"q", "q"}, {"o", "ɒ"}, {"u", "u"},
};
static const LatRule kKuRules[] = {   // Kurdish (Kurmanji Latin)
  {"ç", "tʃ"}, {"ş", "ʃ"}, {"ê", "eː"}, {"î", "iː"}, {"û", "uː"},
  {"c", "dʒ"}, {"j", "ʒ"}, {"x", "x"}, {"q", "q"}, {"e", "ɛ"}, {"i", "ɪ"},
};
static const LatRule kTnRules[] = {   // Setswana
  {"tlh", "tɬʰ"}, {"tl", "tɬ"}, {"th", "tʰ"}, {"ph", "pʰ"}, {"kh", "kʰ"},
  {"tsh", "tsʰ"}, {"ts", "ts"}, {"ng", "ŋ"}, {"ny", "ɲ"}, {"š", "ʃ"},
  {"g", "x"}, {"j", "dʒ"}, {"ê", "ɛ"}, {"ô", "ɔ"},
};
static const LatRule kOmRules[] = {   // Oromo (qubee)
  {"ch", "tʃ"}, {"dh", "ɗ"}, {"ny", "ɲ"}, {"ph", "pʼ"}, {"sh", "ʃ"},
  {"c", "tʃʼ"}, {"q", "kʼ"}, {"x", "tʼ"}, {"j", "dʒ"}, {"'", "ʔ"},
};
static const LatRule kIaRules[] = {   // Interlingua
  {"c+", "ts"}, {"ch", "k"}, {"g+", "ʒ"}, {"j", "ʒ"}, {"qu", "kw"},
  {"ph", "f"}, {"th", "t"}, {"y", "i"}, {"x", "ks"},
};
static const LatRule kLfnRules[] = {  // Lingua Franca Nova
  {"x", "ʃ"}, {"j", "ʒ"}, {"c", "k"}, {"y", "j"},
};
static const LatRule kJboRules[] = {  // Lojban: engineered 1:1
  {"c", "ʃ"}, {"j", "ʒ"}, {"x", "x"}, {"y", "ə"}, {"'", "h"}, {"g", "ɡ"},
};
static const LatRule kPyRules[] = {   // Pyash (conlang; engineered phonemic
  // Latin spelling — approximate near-1:1 reading, last code to leave the
  // grapheme tier)
  {"ng", "ŋ"}, {"sh", "ʃ"}, {"ch", "tʃ"}, {"zh", "ʒ"},
  {"c", "tʃ"}, {"j", "dʒ"}, {"x", "ʃ"}, {"y", "ɨ"}, {"'", "ʔ"},
  {"g", "ɡ"},
};
static const LatRule kLtRules[] = {   // Lithuanian
  {"ch", "x"}, {"č", "tʃ"}, {"š", "ʃ"}, {"ž", "ʒ"}, {"ė", "eː"},
  {"ą", "aː"}, {"ę", "ɛː"}, {"į", "iː"}, {"ų", "uː"}, {"ū", "uː"},
  {"uo", "uə"}, {"ie", "iə"}, {"y", "iː"}, {"e", "ɛ"},
};
static const LatRule kKlRules[] = {   // Greenlandic
  {"ll", "ɬ"}, {"rr", "χ"}, {"ng", "ŋ"}, {"q", "q"}, {"r", "ʁ"}, {"j", "j"},
};
static const LatRule kQucRules[] = {  // K'iche' (Mayan; ejectives via ')
  {"b'", "ɓ"}, {"ch'", "tʃʼ"}, {"ch", "tʃ"}, {"k'", "kʼ"}, {"q'", "qʼ"},
  {"t'", "tʼ"}, {"tz'", "tsʼ"}, {"tz", "ts"}, {"j", "x"}, {"q", "q"},
  {"x", "ʃ"}, {"w", "w"}, {"y", "j"}, {"'", "ʔ"}, {"ä", "ə"},
};
static const LatRule kNciRules[] = {  // Classical Nahuatl
  {"hu", "w"}, {"uh", "w"}, {"qu+", "k"}, {"cu", "kw"}, {"uc", "kw"},
  {"c+", "s"}, {"ch", "tʃ"}, {"tl", "tɬ"}, {"tz", "ts"}, {"x", "ʃ"},
  {"z", "s"}, {"ll", "l"}, {"c", "k"}, {"h", "ʔ"}, {"y", "j"},
};
static const LatRule kAnRules[] = {   // Aragonese (Spanish-adjacent)
  {"ny", "ɲ"}, {"ñ", "ɲ"}, {"ch", "tʃ"}, {"qu+", "k"}, {"gu+", "ɡ"},
  {"c+", "θ"}, {"z", "θ"}, {"j", "x"}, {"g+", "x"}, {"ll", "ʎ"}, {"v", "b"},
  {"á", "ˈa"}, {"é", "ˈe"}, {"í", "ˈi"}, {"ó", "ˈo"}, {"ú", "ˈu"},
};

// --- Perso-Arabic scripts (Persian / Urdu / Arabic) --------------------------
// Persian orthography is consonant-regular (each letter one sound, unlike
// Arabic's emphatics it merges ث/س/ص → s etc.) but omits the short vowels.
// Approach: map the consonant skeleton + long vowels exactly, honor
// diacritics when the text carries them (fatha/kasra/damma/shadda), and
// repair onset clusters with an epenthetic vowel (Persian syllables are
// (C)V(C)(C) — a word can never start with CC, so word-initial CC → CVC).
// Urdu adds the retroflex letters and do-chashmi-he aspiration; Arabic keeps
// the emphatic/interdental distinctions Persian merges.

struct PAPhone { std::string ipa; bool vowel; };

struct PACfg {
  int lang;  // 0 = fa, 1 = ur, 2 = ar
};

// Decode one codepoint to IPA; returns false if not a letter of the script.
bool pa_letter(unsigned int cp, const PACfg& cfg, std::vector<PAPhone>* word,
               bool word_initial) {
  bool fa = cfg.lang == 0, ur = cfg.lang == 1, ar = cfg.lang == 2;
  switch (cp) {
    case 0x0621: case 0x0654: word->push_back({"ʔ", false}); return true;  // hamza
    case 0x0624: case 0x0626:  // hamza seated on waw/ya: the glottal stop
      word->push_back({"ʔ", false}); return true;
    case 0x0622:  // alef madda آ
      word->push_back({fa ? "ɒː" : "aː", true}); return true;
    case 0x0623: case 0x0625:  // alef with hamza above/below
      if (word_initial) word->push_back({ar ? "ʔa" : (fa ? "æ" : "a"), true});
      else word->push_back({fa ? "ɒː" : "aː", true});
      return true;
    case 0x0627:  // alef ا
      if (word_initial) word->push_back({fa ? "æ" : "a", true});
      else word->push_back({fa ? "ɒː" : "aː", true});
      return true;
    case 0x0628: word->push_back({"b", false}); return true;   // ب
    case 0x067E: word->push_back({"p", false}); return true;   // پ (fa/ur)
    case 0x0629:  // ta marbuta ة (Arabic feminine ending)
      word->push_back({"a", true}); return true;
    case 0x062A: word->push_back({"t", false}); return true;   // ت
    case 0x062B: word->push_back({ar ? "θ" : "s", false}); return true;  // ث
    case 0x062C: word->push_back({"dʒ", false}); return true;  // ج
    case 0x0686: word->push_back({"tʃ", false}); return true;  // چ (fa/ur)
    case 0x062D: word->push_back({ar ? "ħ" : "h", false}); return true;  // ح
    case 0x062E: word->push_back({"x", false}); return true;   // خ
    case 0x062F: word->push_back({"d", false}); return true;   // د
    case 0x0630: word->push_back({ar ? "ð" : "z", false}); return true;  // ذ
    case 0x0631: word->push_back({"r", false}); return true;   // ر
    case 0x0632: word->push_back({"z", false}); return true;   // ز
    case 0x0698: word->push_back({"ʒ", false}); return true;   // ژ (fa/ur)
    case 0x0633: word->push_back({"s", false}); return true;   // س
    case 0x0634: word->push_back({"ʃ", false}); return true;   // ش
    case 0x0635: word->push_back({ar ? "sˤ" : "s", false}); return true;  // ص
    case 0x0636: word->push_back({ar ? "dˤ" : "z", false}); return true;  // ض
    case 0x0637: word->push_back({ar ? "tˤ" : "t", false}); return true;  // ط
    case 0x0638: word->push_back({ar ? "zˤ" : "z", false}); return true;  // ظ
    case 0x0639: word->push_back({ar ? "ʕ" : "ʔ", false}); return true;   // ع
    case 0x063A: word->push_back({"ɣ", false}); return true;   // غ
    case 0x0641: word->push_back({"f", false}); return true;   // ف
    case 0x0642: word->push_back({ar ? "q" : "ɣ", false}); return true;   // ق
    case 0x0643: case 0x06A9: word->push_back({"k", false}); return true; // ك ک
    case 0x06AF: word->push_back({"ɡ", false}); return true;   // گ (fa/ur)
    case 0x0644: word->push_back({"l", false}); return true;   // ل
    case 0x0645: word->push_back({"m", false}); return true;   // م
    case 0x0646: word->push_back({"n", false}); return true;   // ن
    case 0x06BA: word->push_back({"n", false}); return true;   // ں (ur nasal)
    case 0x0647: case 0x06C1:  // ه / ہ
      // Persian/Urdu final he is a vowel (خانه → xɒːne); else h.
      word->push_back({"h", false}); return true;  // finalized in pa_word
    case 0x06BE:  // ھ do-chashmi-he: aspirates the previous consonant (ur)
      if (!word->empty() && !word->back().vowel) word->back().ipa += "ʰ";
      else word->push_back({"h", false});
      return true;
    case 0x0648:  // و
      // word-initial → v/w; after a consonant → uː; after a vowel → v/w
      if (word_initial) word->push_back({ar ? "w" : "v", false});
      else if (!word->empty() && !word->back().vowel)
        word->push_back({"uː", true});
      else word->push_back({ar ? "w" : "v", false});
      return true;
    case 0x0649:  // alef maqsura ى
      word->push_back({"aː", true}); return true;
    case 0x064A: case 0x06CC:  // ي / ی
      if (word_initial) word->push_back({"j", false});
      else if (!word->empty() && !word->back().vowel)
        word->push_back({"iː", true});
      else word->push_back({"j", false});
      return true;
    case 0x06D2:  // ے (ur: bari ye, final eː)
      word->push_back({"eː", true}); return true;
    case 0x0679: word->push_back({"ʈ", false}); return true;   // ٹ (ur)
    // Sindhi letters (implosives + aspirated/retroflex series)
    case 0x067B: word->push_back({"ɓ", false}); return true;   // ٻ
    case 0x0684: word->push_back({"ʄ", false}); return true;   // ڄ
    case 0x06B3: word->push_back({"ɠ", false}); return true;   // ڳ
    case 0x06B1: word->push_back({"ŋ", false}); return true;   // ڱ
    case 0x06BB: word->push_back({"ɳ", false}); return true;   // ڻ
    case 0x068C: word->push_back({"dʱ", false}); return true;  // ڌ
    case 0x068F: word->push_back({"ɗ", false}); return true;   // ڏ
    case 0x068A: word->push_back({"ɖ", false}); return true;   // ڊ
    case 0x068D: word->push_back({"ɖʱ", false}); return true;  // ڍ
    case 0x067A: word->push_back({"ʈʰ", false}); return true;  // ٺ
    case 0x067D: word->push_back({"ʈ", false}); return true;   // ٽ
    case 0x067F: word->push_back({"tʰ", false}); return true;  // ٿ
    case 0x0680: word->push_back({"bʱ", false}); return true;  // ڀ
    case 0x06A6: word->push_back({"pʰ", false}); return true;  // ڦ
    case 0x0687: word->push_back({"tʃʰ", false}); return true; // ڇ
    case 0x0683: word->push_back({"ɲ", false}); return true;   // ڃ
    case 0x0688: word->push_back({"ɖ", false}); return true;   // ڈ (ur)
    case 0x0691: word->push_back({"ɽ", false}); return true;   // ڑ (ur)
    // harakat (written diacritics — honored exactly when present)
    case 0x064E: word->push_back({ar ? "a" : "æ", true}); return true;  // fatha
    case 0x0650: word->push_back({ar ? "i" : "e", true}); return true;  // kasra
    case 0x064F: word->push_back({ar ? "u" : "o", true}); return true;  // damma
    case 0x0651:  // shadda: geminate the previous consonant
      if (!word->empty() && !word->back().vowel)
        word->push_back({word->back().ipa, false});
      return true;
    case 0x0652: return true;  // sukun: explicit no-vowel — nothing to add
    case 0x064B: word->push_back({ar ? "an" : "æn", true}); return true; // tanwin fath
    case 0x0640: return true;  // tatweel (kashida)
    case 0x200C: return true;  // ZWNJ (Persian morpheme separator): transparent
  }
  return false;
}

void pa_word(std::vector<PAPhone>& ph, const PACfg& cfg, std::string* out) {
  if (ph.empty()) return;
  bool fa_ur = cfg.lang != 2;
  // Arabic definite article: ال + sun letter assimilates (الشمس → aʃ-ʃams):
  // the lam geminates into the following coronal consonant.
  if (cfg.lang == 2 && ph.size() >= 3 && ph[0].vowel &&
      (ph[0].ipa == "a" || ph[0].ipa == "ʔa") && ph[1].ipa == "l" &&
      !ph[2].vowel) {
    static const char* kSun[] = {"t", "θ", "d", "ð", "r", "z", "s", "ʃ",
                                 "sˤ", "dˤ", "tˤ", "zˤ", "l", "n"};
    for (const char* sl : kSun) {
      if (ph[2].ipa == sl) {
        ph[1].ipa = ph[2].ipa;  // l → geminate copy of the sun letter
        break;
      }
    }
  }
  // Persian/Urdu final he = vowel e (silent he): خانه → xɒːne
  if (fa_ur && ph.size() >= 2 && ph.back().ipa == "h" && !ph[ph.size() - 2].vowel)
    ph.back() = {"e", true};
  // A long iː/uː read off ی/و that turns out to precede a vowel was really
  // the glide (دنیا → donjɒː, not doniːɒː).
  for (size_t i = 0; i + 1 < ph.size(); ++i) {
    if (!ph[i + 1].vowel) continue;
    if (ph[i].ipa == "iː") ph[i] = {"j", false};
    else if (ph[i].ipa == "uː") ph[i] = {cfg.lang == 2 ? "w" : "v", false};
  }
  // Word-initial alef + ye before a consonant spells iː (ایران → iːrɒːn).
  if (ph.size() >= 3 && ph[0].vowel && (ph[0].ipa == "æ" || ph[0].ipa == "a") &&
      ph[1].ipa == "j" && !ph[2].vowel) {
    ph.erase(ph.begin());
    ph[0] = {"iː", true};
  }
  // Epenthesis: (C)V syllable repair. A word cannot begin with CC — insert
  // the default short vowel after the first consonant; likewise break
  // medial runs of 3+ consonants after their first member.
  const char* epv = (cfg.lang == 0) ? "æ" : "a";
  for (size_t i = 0; i + 1 < ph.size();) {
    bool cc = !ph[i].vowel && !ph[i + 1].vowel;
    bool initial_cc = cc && i == 0;
    bool triple = cc && i + 2 < ph.size() && !ph[i + 2].vowel;
    // A geminate (article assimilation, shadda) is one long consonant:
    // break AFTER it, never inside it.
    bool geminate = cc && ph[i].ipa == ph[i + 1].ipa;
    if ((initial_cc || triple) && !geminate) {
      ph.insert(ph.begin() + i + 1, {epv, true});
      i += 2;
    } else if (triple && geminate) {
      ph.insert(ph.begin() + i + 2, {epv, true});
      i += 3;
    } else {
      ++i;
    }
  }
  // Word-final CC after a long vowel is fine (dæst); but a fully vowel-less
  // residue (rare: all-consonant loan) still gets one nucleus.
  bool any_v = false;
  for (const auto& p : ph) any_v |= p.vowel;
  if (!any_v && ph.size() > 1) ph.insert(ph.begin() + 1, {epv, true});
  for (const auto& p : ph) *out += p.ipa;
}

// Vocalized lexicon for Modern Standard Arabic. Written Arabic omits the
// short vowels and the generic (C)V(C)(C) epenthesis guesses /a/ for all of
// them; for the highest-frequency words the true vocalization is lexical
// (من = min, not man), so this table supplies segments + stress for ~340
// function words and everyday vocabulary. Keys are the bare unvocalized
// spellings; input carrying its own harakat bypasses the lexicon (explicit
// vocalization outranks a lexicon guess). Where a spelling is ambiguous
// (من min "from" / man "who") the higher-frequency reading wins.
const std::map<std::string, const char*>& ar_lexicon() {
  static const std::map<std::string, const char*> kLex = {
      // demonstratives / relatives / pronouns
      {"هذا", "ˈhaːðaː"}, {"هذه", "ˈhaːðihi"}, {"ذلك", "ˈðaːlika"},
      {"الذي", "ʔalˈlaðiː"}, {"التي", "ʔalˈlatiː"},
      {"أنا", "ˈʔanaː"}, {"انا", "ˈʔanaː"}, {"أنت", "ˈʔanta"},
      {"هو", "ˈhuwa"}, {"هي", "ˈhija"}, {"نحن", "ˈnaħnu"}, {"هم", "hum"},
      // particles / prepositions / question words
      {"من", "min"}, {"عن", "ʕan"}, {"إلى", "ˈʔilaː"}, {"الى", "ˈʔilaː"},
      {"هل", "hal"}, {"لا", "laː"}, {"نعم", "ˈnaʕam"}, {"ما", "maː"},
      {"لم", "lam"}, {"لن", "lan"}, {"قد", "qad"}, {"ثم", "ˈθumma"},
      {"أو", "ʔaw"}, {"إذا", "ˈʔiðaː"}, {"حتى", "ˈħattaː"},
      {"ماذا", "ˈmaːðaː"}, {"لماذا", "liˈmaːðaː"}, {"كيف", "ˈkajfa"},
      {"أين", "ˈʔajna"}, {"متى", "ˈmataː"}, {"كل", "kull"},
      {"بعض", "baʕdˤ"}, {"عند", "ˈʕinda"}, {"عندما", "ˈʕindamaː"},
      {"بعد", "ˈbaʕda"}, {"قبل", "ˈqabla"}, {"تحت", "ˈtaħta"},
      {"فوق", "ˈfawqa"}, {"أمام", "ʔaˈmaːma"}, {"بين", "ˈbajna"},
      {"مع", "ˈmaʕa"}, {"لكن", "ˈlaːkin"}, {"أيضا", "ˈʔajdˤan"},
      {"جدا", "ˈdʒiddan"}, {"هنا", "ˈhunaː"}, {"هناك", "huˈnaːka"},
      // time
      {"الآن", "ʔalˈʔaːna"}, {"اليوم", "ʔalˈjawm"}, {"غدا", "ˈɣadan"},
      {"أمس", "ʔams"}, {"سوف", "ˈsawfa"}, {"سنة", "ˈsana"}, {"يوم", "jawm"},
      {"أيام", "ʔajˈjaːm"}, {"ليلة", "ˈlajla"}, {"صباح", "sˤaˈbaːħ"},
      {"مساء", "maˈsaːʔ"}, {"وقت", "waqt"},
      // people / things
      {"رجل", "ˈradʒul"}, {"امرأة", "ˈimraʔa"}, {"ولد", "ˈwalad"},
      {"بنت", "bint"}, {"ناس", "naːs"}, {"صديق", "sˤaˈdiːq"},
      {"بيت", "bajt"}, {"ماء", "maːʔ"}, {"مدينة", "maˈdiːna"},
      {"كتاب", "kiˈtaːb"}, {"مدرسة", "ˈmadrasa"}, {"عمل", "ˈʕamal"},
      {"شيء", "ʃajʔ"}, {"كلمة", "ˈkalima"}, {"لغة", "ˈluɣa"},
      {"عربية", "ʕaraˈbijja"}, {"الله", "ʔalˈlaːh"},
      // adjectives
      {"كبير", "kaˈbiːr"}, {"صغير", "sˤaˈɣiːr"}, {"جديد", "dʒaˈdiːd"},
      {"قديم", "qaˈdiːm"}, {"جميل", "dʒaˈmiːl"}, {"جيد", "ˈdʒajjid"},
      {"كثير", "kaˈθiːr"}, {"قليل", "qaˈliːl"}, {"خير", "xajr"},
      // verbs (common citation/conjugated forms)
      {"كان", "ˈkaːna"}, {"يكون", "jaˈkuːn"}, {"قال", "ˈqaːla"},
      {"يقول", "jaˈquːl"}, {"ذهب", "ˈðahaba"}, {"جاء", "ˈdʒaːʔa"},
      {"أريد", "ʔuˈriːd"}, {"يريد", "juˈriːd"},
      // greetings / formulae
      {"شكرا", "ˈʃukran"}, {"عفوا", "ˈʕafwan"}, {"مرحبا", "ˈmarħaban"},
      {"السلام", "ʔassaˈlaːm"}, {"سلام", "saˈlaːm"},
      {"عليكم", "ʕaˈlajkum"}, {"أهلا", "ˈʔahlan"}, {"وسهلا", "wa ˈsahlan"},
      // --- expansion batch 2: core vocabulary ---
      // particles / prepositions / conjunctions / quantifiers
      {"في", "fiː"}, {"على", "ˈʕalaː"}, {"كم", "kam"}, {"أي", "ʔajj"},
      {"لأن", "liˈʔanna"}, {"إن", "ˈʔinna"}, {"أن", "ˈʔanna"},
      {"كما", "kaˈmaː"}, {"إلا", "ˈʔillaː"}, {"غير", "ɣajr"}, {"بل", "bal"},
      {"فقط", "ˈfaqatˤ"}, {"ليس", "ˈlajsa"}, {"ليست", "ˈlajsat"},
      {"كانت", "ˈkaːnat"}, {"يوجد", "ˈjuːdʒad"}, {"أكثر", "ˈʔakθar"},
      {"أقل", "ˈʔaqall"}, {"جميع", "dʒaˈmiːʕ"}, {"نفس", "nafs"},
      {"حول", "ˈħawla"}, {"خلال", "xiˈlaːla"}, {"ضد", "dˤidd"},
      {"منذ", "ˈmunðu"}, {"عبر", "ˈʕabra"}, {"نحو", "ˈnaħwa"},
      {"لدى", "ˈladaː"}, {"حيث", "ˈħajθu"}, {"حسب", "ˈħasaba"},
      {"مثل", "ˈmiθla"}, {"أثناء", "ʔaθˈnaːʔa"}, {"أنتم", "ˈʔantum"},
      {"هما", "huˈmaː"}, {"هن", "ˈhunna"},
      // adverbs
      {"دائما", "ˈdaːʔiman"}, {"أحيانا", "ʔaħˈjaːnan"},
      {"كثيرا", "kaˈθiːran"}, {"قليلا", "qaˈliːlan"},
      {"ربما", "ˈrubbamaː"}, {"طبعا", "ˈtˤabʕan"}, {"فورا", "ˈfawran"},
      {"معا", "ˈmaʕan"}, {"حقا", "ˈħaqqan"}, {"أبدا", "ˈʔabadan"},
      {"هكذا", "ˈhaːkaðaː"}, {"جميعا", "dʒaˈmiːʕan"},
      // time
      {"ساعة", "ˈsaːʕa"}, {"دقيقة", "daˈqiːqa"}, {"ثانية", "ˈθaːnija"},
      {"أسبوع", "ʔusˈbuːʕ"}, {"شهر", "ʃahr"}, {"صيف", "sˤajf"},
      {"شتاء", "ʃiˈtaːʔ"}, {"ربيع", "raˈbiːʕ"}, {"خريف", "xaˈriːf"},
      {"ظهر", "ðˤuhr"}, {"عصر", "ʕasˤr"}, {"فجر", "fadʒr"},
      {"ليل", "lajl"}, {"نهار", "naˈhaːr"}, {"لحظة", "ˈlaħðˤa"},
      {"مستقبل", "musˈtaqbal"}, {"ماضي", "ˈmaːdˤiː"},
      {"حاضر", "ˈħaːdˤir"}, {"تاريخ", "taːˈriːx"},
      // numbers / ordinals
      {"واحد", "ˈwaːħid"}, {"اثنان", "iθˈnaːn"}, {"ثلاثة", "θaˈlaːθa"},
      {"أربعة", "ˈʔarbaʕa"}, {"خمسة", "ˈxamsa"}, {"ستة", "ˈsitta"},
      {"سبعة", "ˈsabʕa"}, {"ثمانية", "θaˈmaːnija"}, {"تسعة", "ˈtisʕa"},
      {"عشرة", "ˈʕaʃara"}, {"مئة", "ˈmiʔa"}, {"مائة", "ˈmiʔa"},
      {"ألف", "ʔalf"}, {"مليون", "milˈjuːn"}, {"أول", "ˈʔawwal"},
      {"ثاني", "ˈθaːniː"}, {"آخر", "ˈʔaːxir"}, {"نصف", "nisˤf"},
      {"ربع", "rubʕ"},
      // tens + teens (numwords.py emits these for digit input)
      {"عشرون", "ʕiʃˈruːn"}, {"ثلاثون", "θalaːˈθuːn"},
      {"أربعون", "ʔarbaˈʕuːn"}, {"خمسون", "xamˈsuːn"},
      {"ستون", "sitˈtuːn"}, {"سبعون", "sabˈʕuːn"},
      {"ثمانون", "θamaːˈnuːn"}, {"تسعون", "tisˈʕuːn"},
      {"عشر", "ˈʕaʃar"}, {"ألفان", "ʔalˈfaːn"}, {"آلاف", "ʔaːˈlaːf"},
      {"مئتان", "miʔaˈtaːn"},
      // hundreds compounds (numwords.py emits these single-word forms)
      {"ثلاثمئة", "θalaːθuˈmiʔa"}, {"أربعمئة", "ʔarbaʕuˈmiʔa"},
      {"خمسمئة", "xamsuˈmiʔa"}, {"ستمئة", "sittuˈmiʔa"},
      {"سبعمئة", "sabʕuˈmiʔa"}, {"ثمانمئة", "θamaːnuˈmiʔa"},
      {"تسعمئة", "tisʕuˈmiʔa"},
      // family / people / professions
      {"أب", "ʔab"}, {"أم", "ʔumm"}, {"ابن", "ibn"}, {"ابنة", "ˈibna"},
      {"أخ", "ʔax"}, {"أخت", "ʔuxt"}, {"جد", "dʒadd"}, {"جدة", "ˈdʒadda"},
      {"عائلة", "ˈʕaːʔila"}, {"أسرة", "ˈʔusra"}, {"زوج", "zawdʒ"},
      {"زوجة", "ˈzawdʒa"}, {"أطفال", "ʔatˤˈfaːl"}, {"طفل", "tˤifl"},
      {"شاب", "ʃaːbb"}, {"طالب", "ˈtˤaːlib"}, {"معلم", "muˈʕallim"},
      {"أستاذ", "ʔusˈtaːð"}, {"دكتور", "dukˈtuːr"}, {"طبيب", "tˤaˈbiːb"},
      {"مهندس", "muˈhandis"}, {"شرطة", "ˈʃurtˤa"}, {"جيش", "dʒajʃ"},
      {"عامل", "ˈʕaːmil"}, {"مدير", "muˈdiːr"},
      // body
      {"رأس", "raʔs"}, {"عين", "ʕajn"}, {"يد", "jad"}, {"قلب", "qalb"},
      {"وجه", "wadʒh"}, {"قدم", "ˈqadam"}, {"فم", "fam"},
      {"أذن", "ˈʔuðun"}, {"شعر", "ʃaʕr"}, {"دم", "dam"},
      // nature
      {"شمس", "ʃams"}, {"قمر", "ˈqamar"}, {"نجم", "nadʒm"},
      {"سماء", "saˈmaːʔ"}, {"أرض", "ʔardˤ"}, {"بحر", "baħr"},
      {"نهر", "nahr"}, {"جبل", "ˈdʒabal"}, {"شجرة", "ˈʃadʒara"},
      {"زهرة", "ˈzahra"}, {"حديقة", "ħaˈdiːqa"}, {"هواء", "haˈwaːʔ"},
      {"نار", "naːr"}, {"مطر", "ˈmatˤar"}, {"ثلج", "θaldʒ"},
      {"ريح", "riːħ"}, {"طقس", "tˤaqs"}, {"عالم", "ˈʕaːlam"},
      {"ضوء", "dˤawʔ"}, {"نبات", "naˈbaːt"}, {"نباتات", "nabaːˈtaːt"},
      {"مناخ", "muˈnaːx"}, {"يؤثر", "juˈʔaθθir"}, {"تؤثر", "tuˈʔaθθir"},
      {"ينمو", "ˈjanmuː"}, {"تنمو", "ˈtanmuː"},
      {"طبيعة", "tˤaˈbiːʕa"}, {"صحراء", "sˤaħˈraːʔ"}, {"غابة", "ˈɣaːba"},
      // animals
      {"قط", "qitˤtˤ"}, {"كلب", "kalb"}, {"حصان", "ħiˈsˤaːn"},
      {"طائر", "ˈtˤaːʔir"}, {"سمك", "ˈsamak"}, {"أسد", "ˈʔasad"},
      {"جمل", "ˈdʒamal"}, {"بقرة", "ˈbaqara"}, {"خروف", "xaˈruːf"},
      {"فيل", "fiːl"},
      // food
      {"طعام", "tˤaˈʕaːm"}, {"خبز", "xubz"}, {"لحم", "laħm"},
      {"حليب", "ħaˈliːb"}, {"قهوة", "ˈqahwa"}, {"شاي", "ʃaːj"},
      {"سكر", "ˈsukkar"}, {"ملح", "milħ"}, {"تفاح", "tufˈfaːħ"},
      {"برتقال", "burtuˈqaːl"}, {"عصير", "ʕaˈsˤiːr"},
      {"فطور", "fuˈtˤuːr"}, {"غداء", "ɣaˈdaːʔ"}, {"عشاء", "ʕaˈʃaːʔ"},
      // places / transport
      {"مكان", "maˈkaːn"}, {"بلد", "ˈbalad"}, {"دولة", "ˈdawla"},
      {"شارع", "ˈʃaːriʕ"}, {"سوق", "suːq"}, {"مطار", "maˈtˤaːr"},
      {"محطة", "maˈħatˤtˤa"}, {"فندق", "ˈfunduq"}, {"مطعم", "ˈmatˤʕam"},
      {"مستشفى", "musˈtaʃfaː"}, {"جامعة", "ˈdʒaːmiʕa"},
      {"مكتب", "ˈmaktab"}, {"مسجد", "ˈmasdʒid"}, {"متحف", "ˈmatħaf"},
      {"مكتبة", "ˈmaktaba"}, {"غرفة", "ˈɣurfa"}, {"باب", "baːb"},
      {"نافذة", "ˈnaːfiða"}, {"طريق", "tˤaˈriːq"}, {"سيارة", "sajˈjaːra"},
      {"قطار", "qiˈtˤaːr"}, {"طائرة", "ˈtˤaːʔira"}, {"حافلة", "ˈħaːfila"},
      {"سفينة", "saˈfiːna"}, {"دراجة", "darˈraːdʒa"},
      // abstract / society
      {"حياة", "ħaˈjaːt"}, {"موت", "mawt"}, {"حب", "ħubb"},
      {"حرب", "ħarb"}, {"علم", "ʕilm"}, {"فكرة", "ˈfikra"},
      {"سؤال", "suˈʔaːl"}, {"جواب", "dʒaˈwaːb"}, {"مشكلة", "ˈmuʃkila"},
      {"حل", "ħall"}, {"خبر", "ˈxabar"}, {"أخبار", "ʔaxˈbaːr"},
      {"قصة", "ˈqisˤsˤa"}, {"موسيقى", "muːˈsiːqaː"}, {"فن", "fann"},
      {"رياضة", "riˈjaːdˤa"}, {"لعبة", "ˈluʕba"}, {"فيلم", "film"},
      {"صورة", "ˈsˤuːra"}, {"اسم", "ism"}, {"رقم", "raqm"},
      {"سعر", "siʕr"}, {"مال", "maːl"}, {"نقود", "nuˈquːd"},
      {"حق", "ħaqq"}, {"قانون", "qaːˈnuːn"}, {"حكومة", "ħuˈkuːma"},
      {"رئيس", "raˈʔiːs"}, {"ملك", "ˈmalik"}, {"شركة", "ˈʃarika"},
      {"درس", "dars"},
      // objects
      {"هاتف", "ˈhaːtif"}, {"حاسوب", "ħaːˈsuːb"}, {"تلفاز", "tilˈfaːz"},
      {"رسالة", "riˈsaːla"}, {"بريد", "baˈriːd"}, {"ورقة", "ˈwaraqa"},
      {"قلم", "ˈqalam"}, {"كرسي", "ˈkursijj"}, {"طاولة", "ˈtˤaːwila"},
      {"سرير", "saˈriːr"}, {"مفتاح", "mifˈtaːħ"}, {"حقيبة", "ħaˈqiːba"},
      {"ملابس", "maˈlaːbis"}, {"قميص", "qaˈmiːsˤ"}, {"حذاء", "ħiˈðaːʔ"},
      // verbs (perfect + imperfect of the everyday set)
      {"يذهب", "ˈjaðhab"}, {"رأى", "ˈraʔaː"}, {"يرى", "ˈjaraː"},
      {"عرف", "ˈʕarafa"}, {"يعرف", "ˈjaʕrif"}, {"أكل", "ˈʔakala"},
      {"يأكل", "ˈjaʔkul"}, {"شرب", "ˈʃariba"}, {"يشرب", "ˈjaʃrab"},
      {"كتب", "ˈkataba"}, {"يكتب", "ˈjaktub"}, {"قرأ", "ˈqaraʔa"},
      {"يقرأ", "ˈjaqraʔ"}, {"سمع", "ˈsamiʕa"}, {"يسمع", "ˈjasmaʕ"},
      {"فعل", "ˈfaʕala"}, {"يفعل", "ˈjafʕal"}, {"وجد", "ˈwadʒada"},
      {"يجد", "ˈjadʒid"}, {"أخذ", "ˈʔaxaða"}, {"يأخذ", "ˈjaʔxuð"},
      {"أعطى", "ˈʔaʕtˤaː"}, {"يعطي", "ˈjuʕtˤiː"}, {"يعمل", "ˈjaʕmal"},
      {"دخل", "ˈdaxala"}, {"يدخل", "ˈjadxul"}, {"خرج", "ˈxaradʒa"},
      {"يخرج", "ˈjaxrudʒ"}, {"رجع", "ˈradʒaʕa"}, {"وصل", "ˈwasˤala"},
      {"يصل", "ˈjasˤil"}, {"بدأ", "ˈbadaʔa"}, {"يبدأ", "ˈjabdaʔ"},
      {"فهم", "ˈfahima"}, {"يفهم", "ˈjafham"}, {"تكلم", "taˈkallama"},
      {"يتكلم", "jataˈkallam"}, {"أحب", "ʔaˈħabba"}, {"يحب", "juˈħibb"},
      {"ساعد", "ˈsaːʕada"}, {"يساعد", "juˈsaːʕid"}, {"جلس", "ˈdʒalasa"},
      {"يجلس", "ˈjadʒlis"}, {"نام", "ˈnaːma"}, {"ينام", "jaˈnaːm"},
      {"عاش", "ˈʕaːʃa"}, {"يعيش", "jaˈʕiːʃ"}, {"مات", "ˈmaːta"},
      {"يموت", "jaˈmuːt"}, {"فتح", "ˈfataħa"}, {"يفتح", "ˈjaftaħ"},
      {"وضع", "ˈwadˤaʕa"}, {"يضع", "ˈjadˤaʕ"}, {"طلب", "ˈtˤalaba"},
      {"يطلب", "ˈjatˤlub"}, {"سأل", "ˈsaʔala"}, {"يسأل", "ˈjasʔal"},
      {"يدرس", "ˈjadrus"}, {"اشترى", "iʃˈtaraː"}, {"يشتري", "jaʃˈtariː"},
      {"باع", "ˈbaːʕa"}, {"يبيع", "jaˈbiːʕ"}, {"دفع", "ˈdafaʕa"},
      {"مشى", "ˈmaʃaː"}, {"يمشي", "ˈjamʃiː"}, {"جرى", "ˈdʒaraː"},
      {"يجري", "ˈjadʒriː"}, {"لعب", "ˈlaʕiba"}, {"يلعب", "ˈjalʕab"},
      {"ضحك", "ˈdˤaħika"}, {"يضحك", "ˈjadˤħak"}, {"بكى", "ˈbakaː"},
      {"يبكي", "ˈjabkiː"}, {"خاف", "ˈxaːfa"}, {"يخاف", "jaˈxaːf"},
      {"نسي", "ˈnasija"}, {"ينسى", "ˈjansaː"}, {"يشعر", "ˈjaʃʕur"},
      {"بقي", "ˈbaqija"}, {"يبقى", "ˈjabqaː"}, {"صار", "ˈsˤaːra"},
      {"أصبح", "ˈʔasˤbaħa"}, {"استطاع", "istaˈtˤaːʕa"},
      {"يستطيع", "jastaˈtˤiːʕ"}, {"يجب", "ˈjadʒib"}, {"يمكن", "ˈjumkin"},
      // adjectives
      {"طويل", "tˤaˈwiːl"}, {"قصير", "qaˈsˤiːr"}, {"واسع", "ˈwaːsiʕ"},
      {"ضيق", "ˈdˤajjiq"}, {"ثقيل", "θaˈqiːl"}, {"خفيف", "xaˈfiːf"},
      {"سريع", "saˈriːʕ"}, {"بطيء", "baˈtˤiːʔ"}, {"سهل", "sahl"},
      {"صعب", "sˤaʕb"}, {"قوي", "qaˈwijj"}, {"ضعيف", "dˤaˈʕiːf"},
      {"حار", "ħaːrr"}, {"بارد", "ˈbaːrid"}, {"نظيف", "naˈðˤiːf"},
      {"جائع", "ˈdʒaːʔiʕ"}, {"عطشان", "ʕatˤˈʃaːn"}, {"سعيد", "saˈʕiːd"},
      {"حزين", "ħaˈziːn"}, {"غاضب", "ˈɣaːdˤib"}, {"مريض", "maˈriːdˤ"},
      {"صحيح", "sˤaˈħiːħ"}, {"خطأ", "ˈxatˤaʔ"}, {"مهم", "muˈhimm"},
      {"ممكن", "ˈmumkin"}, {"مستحيل", "mustaˈħiːl"}, {"مشهور", "maʃˈhuːr"},
      {"غني", "ɣaˈnijj"}, {"فقير", "faˈqiːr"}, {"ذكي", "ðaˈkijj"},
      {"لطيف", "laˈtˤiːf"}, {"رخيص", "raˈxiːsˤ"}, {"غالي", "ˈɣaːliː"},
      {"مفتوح", "mafˈtuːħ"}, {"مغلق", "ˈmuɣlaq"}, {"فارغ", "ˈfaːriɣ"},
      {"أبيض", "ˈʔabjadˤ"}, {"أسود", "ˈʔaswad"}, {"أحمر", "ˈʔaħmar"},
      {"أخضر", "ˈʔaxdˤar"}, {"أزرق", "ˈʔazraq"}, {"أصفر", "ˈʔasˤfar"},
      {"كبيرة", "kaˈbiːra"}, {"جميلة", "dʒaˈmiːla"},
  };
  return kLex;
}

// Article prefix for a lexicon word: "ʔal", or before a sun letter "ʔa" +
// a geminating copy of the word's first consonant (ʔal + ʃams → ʔaʃʃams).
std::string ar_article_prefix(const char* ipa) {
  std::string v(ipa);
  size_t p = 0;
  if (v.size() >= 2 && v.compare(0, 2, "\xCB\x88") == 0) p = 2;  // skip ˈ
  if (p >= v.size()) return "\xCA\x94\x61l";                      // "ʔal"
  size_t l = 1;
  unsigned char c = v[p];
  if ((c >> 5) == 0x6) l = 2;
  else if ((c >> 4) == 0xE) l = 3;
  std::string cons = v.substr(p, l);
  if (p + l + 2 <= v.size()) {
    std::string nxt = v.substr(p + l, 2);
    if ((cons == "t" || cons == "d") && (nxt == "ʃ" || nxt == "ʒ"))
      cons += nxt;                       // affricate: dʒ/tʃ is one segment
    else if (nxt == "\xCB\xA4") cons += nxt;  // emphatic ˤ (U+02E4)
  }
  static const char* kSunIpa[] = {"t", "θ", "d", "ð", "r", "z", "s", "ʃ",
                                  "sˤ", "dˤ", "tˤ", "zˤ", "l", "n"};
  for (const char* sl : kSunIpa)
    if (cons == sl) return std::string("\xCA\x94\x61") + cons;  // ʔa + geminate
  return "\xCA\x94\x61l";
}

// --- Arabic morphological vocalization (pattern guesser) ---------------------
// Written MSA omits short vowels; beyond the vocalized lexicon the old
// fallback filled every cluster with /a/ via generic epenthesis. Arabic
// morphology is templatic: the consonant skeleton's SHAPE plus a small set
// of affix letters (م/ت/ا/است/أ + imperfect ي/ت/ن) identifies the vowel
// pattern with useful accuracy — maCCaC place nouns, CaːCiC participles,
// CiCaːC/CuCuːC/CaCiːC nouns, taCCiːC / iCtiCaːC / inCiCaːC / istiCCaːC
// masdars, muCaCCiC-family participles, broken plurals maCaːCiC/CuCaCaːʔ,
// imperfect verbs, and the nisba feminine -iyya. A matched pattern yields
// fully vocalized, stress-marked IPA; unmatched words keep the epenthesis
// fallback. (The reference delegates ar entirely to espeak-ng —
// reference zonos/conditioning.py:525-536.)

// Classify one codepoint for pattern matching: C = consonant (ipa filled),
// A = alif (aː), W = waw, Y = ya, T = ta marbuta, Q = alif-hamza.
static bool ar_cls(unsigned cp, char* cls, std::string* ipa) {
  switch (cp) {
    case 0x0627: case 0x0622: case 0x0649: *cls = 'A'; return true;
    case 0x0648: *cls = 'W'; return true;
    case 0x064A: case 0x06CC: *cls = 'Y'; return true;
    case 0x0629: *cls = 'T'; return true;
    case 0x0623: case 0x0625: *cls = 'Q'; return true;
    case 0x0621: case 0x0624: case 0x0626:
      *cls = 'C'; *ipa = "ʔ"; return true;
  }
  static const PACfg kArC{2};
  std::vector<PAPhone> tmp;
  tmp.push_back({"a", true});  // fake preceding vowel: و/ي decode as glides
  if (!pa_letter(cp, kArC, &tmp, false)) return false;
  if (tmp.size() != 2 || tmp[1].vowel) return false;
  *cls = 'C'; *ipa = tmp[1].ipa;
  return true;
}

static bool ar_morph(const std::vector<unsigned>& cps, std::string* out) {
  size_t n = cps.size();
  if (n < 3 || n > 7) return false;
  std::string sig;
  std::vector<std::string> c;  // consonant IPA, in order
  for (size_t i = 0; i < n; ++i) {
    char cl = 0; std::string ipa;
    if (!ar_cls(cps[i], &cl, &ipa)) return false;
    if (cl == 'T' && i + 1 != n) return false;  // ta marbuta is final-only
    if (cl == 'Q' && i != 0) return false;      // mid-word hamza seats: bail
    if (i == 0 && (cl == 'W' || cl == 'Y')) {   // word-initial و/ي are glides
      ipa = (cl == 'W') ? "w" : "j";
      cl = 'C';
    }
    sig += cl;
    if (cl == 'C') c.push_back(ipa);
  }
  unsigned p0 = cps[0];
  bool m0 = p0 == 0x0645, t0 = p0 == 0x062A;
  bool impf = p0 == 0x064A || p0 == 0x062A || p0 == 0x0646;
  const char* vp = (p0 == 0x064A) ? "ja" : (p0 == 0x062A) ? "ta" : "na";

  // Nisba feminine ‑iyya (حكومية → ħukuːmˈijja): vocalize the stem, then
  // suffix — only when the stem itself matches a pattern.
  if (n >= 6 && sig.compare(n - 2, 2, "YT") == 0) {
    std::vector<unsigned> stem(cps.begin(), cps.end() - 2);
    std::string s2;
    if (ar_morph(stem, &s2)) {
      std::string flat;  // stress moves to the suffix
      for (size_t i = 0; i < s2.size();) {
        if (s2.compare(i, 2, "\xCB\x88") == 0) { i += 2; continue; }
        flat += s2[i++];
      }
      *out += flat; *out += "ˈijja";
      return true;
    }
  }

  auto put = [&](std::initializer_list<const char*> parts) {
    for (const char* p : parts) *out += p;
    return true;
  };
  const char* S = "ˈ";  // primary stress, before the syllable onset

  // --- derived-form masdars -------------------------------------------------
  if (sig == "ACCCCAC" && cps[1] == 0x0633 && cps[2] == 0x062A)  // استCCاC
    return put({"isti", c[2].c_str(), S, c[3].c_str(), "aː", c[4].c_str()});
  if (sig == "ACCCAC" && cps[1] == 0x0646)                        // انCCاC
    return put({"in", c[1].c_str(), "i", S, c[2].c_str(), "aː", c[3].c_str()});
  if (sig == "ACCCAC" && cps[2] == 0x062A)                        // اCتCاC
    return put({"i", c[0].c_str(), "ti", S, c[2].c_str(), "aː", c[3].c_str()});
  if (sig == "ACCCC" && cps[2] == 0x062A)                         // اCتCC verb
    return put({S, "i", c[0].c_str(), "ta", c[2].c_str(), "a", c[3].c_str()});
  if (sig == "ACCAC")                                             // اCCاC
    return put({"ʔi", c[0].c_str(), S, c[1].c_str(), "aː", c[2].c_str()});
  if (sig == "QCCAC")                                             // أ/إ + CCاC
    return put({(p0 == 0x0625) ? "ʔi" : "ʔa", c[0].c_str(), S,
                c[1].c_str(), "aː", c[2].c_str()});
  if (sig == "QCCC")                                              // أCCC elative
    return put({S, (p0 == 0x0625) ? "ʔi" : "ʔa", c[0].c_str(), c[1].c_str(),
                "a", c[2].c_str()});

  // --- م-prefixed nominals ---------------------------------------------------
  if (m0 && sig == "CCCC")                                        // مCCC place
    return put({S, "ma", c[1].c_str(), c[2].c_str(), "a", c[3].c_str()});
  if (m0 && sig == "CCCCT")                                       // مCCCة
    return put({S, "ma", c[1].c_str(), c[2].c_str(), "a", c[3].c_str(), "a"});
  if (m0 && sig == "CCCWC")                                       // مCCوC passive pt
    return put({"ma", c[1].c_str(), S, c[2].c_str(), "uː", c[3].c_str()});
  if (m0 && sig == "CCACC")                                       // مCاCC plural
    return put({"ma", S, c[1].c_str(), "aː", c[2].c_str(), "i", c[3].c_str()});
  if (m0 && sig == "CCCAC")                                       // مCCاC tool
    return put({"mi", c[1].c_str(), S, c[2].c_str(), "aː", c[3].c_str()});
  if (m0 && sig == "CCCYC")                                       // مCCيC
    return put({"mi", c[1].c_str(), S, c[2].c_str(), "iː", c[3].c_str()});
  if (m0 && sig == "CCACCT")                                      // مCاCCة form-III masdar
    return put({"mu", S, c[1].c_str(), "aː", c[2].c_str(), "a", c[3].c_str(), "a"});
  if (m0 && sig == "CCCCC" && cps[1] == 0x062A)                   // متCCC participle
    return put({"muta", S, c[2].c_str(), "a", c[3].c_str(), "i", c[4].c_str()});
  if (m0 && sig == "CCCCYC")                                      // مCCCيC participle pl.
    return put({"mu", c[1].c_str(), "a", c[2].c_str(), "i", S,
                c[3].c_str(), "iː", c[4].c_str()});

  // --- ت-prefixed masdars / imperfect verbs ----------------------------------
  if (t0 && sig == "CCCYC")                                       // تCCيC form-II masdar
    return put({"ta", c[1].c_str(), S, c[2].c_str(), "iː", c[3].c_str()});
  if (impf && sig == "CCCC")                                      // يCCC imperfect
    return put({S, vp, c[1].c_str(), c[2].c_str(), "i", c[3].c_str()});
  if (impf && sig == "CCCCC" && cps[2] == 0x062A)                 // يCتCC form VIII
    return put({S, vp, c[1].c_str(), "ta", c[3].c_str(), "i", c[4].c_str()});
  if (impf && sig == "CCACC")                                     // يCاCC form III (uCaːCiC)
    return put({(p0 == 0x064A) ? "ju" : (p0 == 0x062A) ? "tu" : "nu", S,
                c[1].c_str(), "aː", c[2].c_str(), "i", c[3].c_str()});

  // --- bare-skeleton nominal patterns ----------------------------------------
  if (sig == "CACC")                                              // CاCC participle
    return put({S, c[0].c_str(), "aː", c[1].c_str(), "i", c[2].c_str()});
  if (sig == "CACCT")                                             // CاCCة
    return put({S, c[0].c_str(), "aː", c[1].c_str(), "i", c[2].c_str(), "a"});
  if (sig == "CCAC")                                              // CCاC noun
    return put({c[0].c_str(), "i", S, c[1].c_str(), "aː", c[2].c_str()});
  if (sig == "CCWC")                                              // CCوC plural
    return put({c[0].c_str(), "u", S, c[1].c_str(), "uː", c[2].c_str()});
  if (sig == "CCYC")                                              // CCيC adjective
    return put({c[0].c_str(), "a", S, c[1].c_str(), "iː", c[2].c_str()});
  if (sig == "CCACT")                                             // CCاCة
    return put({c[0].c_str(), "i", S, c[1].c_str(), "aː", c[2].c_str(), "a"});
  if (sig == "CCWCT")                                             // CCوCة
    return put({c[0].c_str(), "u", S, c[1].c_str(), "uː", c[2].c_str(), "a"});
  if (sig == "CCYCT")                                             // CCيCة
    return put({c[0].c_str(), "a", S, c[1].c_str(), "iː", c[2].c_str(), "a"});
  if (sig == "CCAYT")                                             // CCاية
    return put({c[0].c_str(), "i", S, c[1].c_str(), "aː", "ja"});
  if (sig == "CCCAC")                                             // CCCاC broken pl.
    return put({c[0].c_str(), "u", c[1].c_str(), "a", S, c[2].c_str(), "aː",
                c[3].c_str()});
  if (sig == "CCCY")                                              // CCCي masc. nisba
    return put({S, c[0].c_str(), "a", c[1].c_str(), c[2].c_str(), "ij"});
  if (sig == "CCC")                                               // CCC default CaCaC
    return put({S, c[0].c_str(), "a", c[1].c_str(), "a", c[2].c_str()});
  if (sig == "CCCT")                                              // CCCة
    return put({S, c[0].c_str(), "a", c[1].c_str(), c[2].c_str(), "a"});
  if (sig == "CCCC")                                              // CCCC quadriliteral
    return put({S, c[0].c_str(), "a", c[1].c_str(), c[2].c_str(), "a",
                c[3].c_str()});
  return false;
}

static std::vector<unsigned> ar_decode_cps(const std::string& s) {
  std::vector<unsigned> cps;
  for (size_t i = 0; i < s.size();) {
    unsigned char ch = s[i];
    unsigned cp = ch; size_t len = 1;
    if ((ch >> 5) == 0x6 && i + 1 < s.size()) {
      cp = ((ch & 0x1F) << 6) | (s[i + 1] & 0x3F); len = 2;
    } else if ((ch >> 4) == 0xE && i + 2 < s.size()) {
      cp = ((ch & 0x0F) << 12) | ((s[i + 1] & 0x3F) << 6) | (s[i + 2] & 0x3F);
      len = 3;
    } else if ((ch >> 3) == 0x1E) { len = 4; cp = 0; }
    cps.push_back(cp);
    i += len;
  }
  return cps;
}

// Morph guess with the same clitic stripping the lexicon gets:
// exact → ال → و(+ال) → ب/ل/ف(+ال) → لل.
static bool ar_morph_word(const std::string& raw, std::string* pre,
                          std::string* out) {
  std::vector<unsigned> cps = ar_decode_cps(raw);
  auto resolve = [&](const std::vector<unsigned>& key) -> bool {
    if (ar_morph(key, out)) return true;
    if (key.size() > 4 && key[0] == 0x0627 && key[1] == 0x0644) {
      std::vector<unsigned> rest(key.begin() + 2, key.end());
      std::string stem;
      if (ar_morph(rest, &stem)) {
        std::string art = ar_article_prefix(stem.c_str());
        if (!pre->empty() && art.compare(0, 3, "\xCA\x94\x61") == 0)
          art = art.substr(3);  // hamzat wasl elides after a clitic vowel
        *pre += art;
        *out = stem;
        return true;
      }
    }
    return false;
  };
  if (resolve(cps)) return true;
  if (cps.size() > 3 && cps[0] == 0x0648) {  // و "and"
    *pre = "wa";
    std::vector<unsigned> rest(cps.begin() + 1, cps.end());
    if (resolve(rest)) return true;
    pre->clear();
  }
  if (cps.size() > 4 && cps[0] == 0x0644 && cps[1] == 0x0644) {  // لل = li+al
    std::vector<unsigned> rest(cps.begin() + 2, cps.end());
    std::string stem;
    if (ar_morph(rest, &stem)) {
      std::string art = ar_article_prefix(stem.c_str());
      if (art.compare(0, 3, "\xCA\x94\x61") == 0) art = art.substr(3);
      *pre = std::string("li") + art;
      *out = stem;
      return true;
    }
  }
  if (cps.size() > 3) {  // bi-/li-/fa- proclitics
    static const struct { unsigned cp; const char* ipa; } kCl[] = {
        {0x0628, "bi"}, {0x0644, "li"}, {0x0641, "fa"}};
    for (const auto& cl : kCl) {
      if (cps[0] != cl.cp) continue;
      *pre = cl.ipa;
      std::vector<unsigned> rest(cps.begin() + 1, cps.end());
      if (resolve(rest)) return true;
      pre->clear();
    }
  }
  return false;
}

// Vocalized lexicon for Persian. Written Persian omits short vowels the
// same way Arabic does; the epenthesis guesser fills æ everywhere, which is
// wrong for o/e-vowelled high-frequency words (شما = shomā not shæmā).
// Keys are bare spellings (ZWNJ already stripped by the reader); the می/نمی
// verb prefixes are peeled below so joined forms resolve too.
const std::map<std::string, const char*>& fa_lexicon() {
  static const std::map<std::string, const char*> kLex = {
      // pronouns / determiners / particles
      {"من", "mæn"}, {"تو", "to"}, {"او", "u"}, {"ما", "mɒː"},
      {"شما", "ʃomɒː"}, {"آنها", "ɒːnhɒː"}, {"این", "in"}, {"آن", "ɒːn"},
      {"که", "ke"}, {"را", "rɒː"}, {"از", "æz"}, {"به", "be"},
      {"با", "bɒː"}, {"در", "dær"}, {"بر", "bær"}, {"تا", "tɒː"},
      {"و", "væ"}, {"یا", "jɒː"}, {"هم", "hæm"}, {"نه", "næ"},
      {"بله", "bæle"}, {"آره", "ɒːre"},
      // question words
      {"چه", "tʃe"}, {"چی", "tʃi"}, {"کی", "ki"}, {"کجا", "kodʒɒː"},
      {"چرا", "tʃerɒː"}, {"چطور", "tʃetor"}, {"چگونه", "tʃeɡune"},
      {"کدام", "kodɒːm"}, {"چند", "tʃænd"},
      // verbs (high-frequency forms)
      {"است", "æst"}, {"هست", "hæst"}, {"هستم", "hæstæm"},
      {"هستید", "hæstid"}, {"نیست", "nist"}, {"بود", "bud"},
      {"باشد", "bɒːʃæd"}, {"کنم", "konæm"}, {"کند", "konæd"},
      {"کنید", "konid"}, {"کردن", "kærdæn"}, {"کرد", "kærd"},
      {"کرده", "kærde"}, {"شد", "ʃod"}, {"شده", "ʃode"},
      {"شدن", "ʃodæn"}, {"دارم", "dɒːræm"}, {"دارد", "dɒːræd"},
      {"دارید", "dɒːrid"}, {"داشت", "dɒːʃt"}, {"داد", "dɒːd"},
      {"دهد", "dæhæd"}, {"رفت", "ræft"}, {"رفتن", "ræftæn"},
      {"آمد", "ɒːmæd"}, {"گفت", "ɡoft"}, {"گفتن", "ɡoftæn"},
      {"گوید", "ɡujæd"}, {"دید", "did"}, {"دیدن", "didæn"},
      {"خورد", "xord"}, {"خوردن", "xordæn"}, {"دانم", "dɒːnæm"},
      {"داند", "dɒːnæd"}, {"توانم", "tævɒːnæm"}, {"تواند", "tævɒːnæd"},
      {"باید", "bɒːjæd"}, {"شاید", "ʃɒːjæd"}, {"خواهم", "xɒːhæm"},
      {"خواهد", "xɒːhæd"},
      // adjectives / adverbs
      {"خوب", "xub"}, {"بد", "bæd"}, {"بزرگ", "bozorɡ"},
      {"کوچک", "kutʃæk"}, {"زیبا", "zibɒː"}, {"جدید", "dʒædid"},
      {"خیلی", "xejli"}, {"بسیار", "besjɒːr"}, {"کم", "kæm"},
      {"زیاد", "zijɒːd"}, {"فقط", "fæɣæt"}, {"هنوز", "hænuz"},
      {"دیگر", "diɡær"}, {"دوباره", "dobɒːre"}, {"البته", "ælbætte"},
      {"همیشه", "hæmiʃe"}, {"هرگز", "hærɡez"}, {"اکنون", "æknun"},
      {"الان", "ælɒːn"},
      // nouns / formulae
      {"خانه", "xɒːne"}, {"کتاب", "ketɒːb"}, {"آب", "ɒːb"},
      {"نان", "nɒːn"}, {"شهر", "ʃæhr"}, {"کشور", "keʃvær"},
      {"ایران", "iːrɒːn"}, {"تهران", "tehrɒːn"}, {"فارسی", "fɒːrsi"},
      {"زبان", "zæbɒːn"}, {"روز", "ruz"}, {"شب", "ʃæb"},
      {"صبح", "sobh"}, {"امروز", "emruz"}, {"دیروز", "diruz"},
      {"فردا", "færdɒː"}, {"سال", "sɒːl"}, {"ماه", "mɒːh"},
      {"هفته", "hæfte"}, {"ساعت", "sɒːæt"}, {"وقت", "væɣt"},
      {"زمان", "zæmɒːn"}, {"اینجا", "indʒɒː"}, {"آنجا", "ɒːndʒɒː"},
      {"لطفا", "lotfæn"}, {"ممنون", "mæmnun"},
      {"متشکرم", "moteʃækkeræm"}, {"خداحافظ", "xodɒːhɒːfez"},
      {"دوست", "dust"}, {"عشق", "eʃɣ"}, {"دل", "del"}, {"سر", "sær"},
      {"دست", "dæst"}, {"پا", "pɒː"}, {"چشم", "tʃeʃm"},
      {"مادر", "mɒːdær"}, {"پدر", "pedær"}, {"برادر", "bærɒːdær"},
      {"خواهر", "xɒːhær"}, {"مرد", "mærd"}, {"زن", "zæn"},
      {"مردم", "mærdom"}, {"نام", "nɒːm"}, {"اسم", "esm"},
      {"چیز", "tʃiz"}, {"کار", "kɒːr"}, {"راه", "rɒːh"},
      {"خانم", "xɒːnom"}, {"آقا", "ɒːɣɒː"}, {"صحبت", "sohbæt"},
      {"سخن", "soxæn"}, {"حرف", "hærf"},
  };
  return kLex;
}

const char* phonemize_text_perso_arabic(const char* utf8_text, const PACfg& cfg) {
  if (!utf8_text) return nullptr;
  std::string text(utf8_text);
  std::string result;
  std::vector<PAPhone> word;
  std::string raw;          // bare letters of the current word (no harakat)
  bool harakat = false;     // word carried explicit vocalization
  auto flush = [&]() {
    if (!word.empty()) {
      const char* lex = nullptr;
      std::string pre;
      if (cfg.lang == 0 && !harakat) {
        const auto& L = fa_lexicon();
        auto it = L.find(raw);
        if (it != L.end()) lex = it->second;
        if (!lex && raw.size() > 4) {
          // می/نمی verb prefixes (ZWNJ-joined forms arrive fused).
          static const struct { const char* u8; size_t n; const char* ipa; }
              kPre[] = {{"\xD9\x86\xD9\x85\xDB\x8C", 6, "nemi"},
                        {"\xD9\x85\xDB\x8C", 4, "mi"}};
          for (const auto& pr : kPre) {
            if (raw.size() > pr.n && raw.compare(0, pr.n, pr.u8) == 0) {
              auto it2 = L.find(raw.substr(pr.n));
              if (it2 != L.end()) { pre = pr.ipa; lex = it2->second; break; }
            }
          }
        }
      }
      if (cfg.lang == 2 && !harakat) {
        const auto& L = ar_lexicon();
        // Lookup with clitic stripping: exact → [wa-] → [al-] → [wa-al-].
        auto lookup = [&L](const std::string& key, std::string* prefix)
            -> const char* {
          auto it = L.find(key);
          if (it != L.end()) return it->second;
          // ال definite article: strip; sun letter geminates the lam.
          if (key.size() > 4 && key.compare(0, 4, "\xD8\xA7\xD9\x84") == 0) {
            it = L.find(key.substr(4));
            if (it != L.end()) {
              std::string art = ar_article_prefix(it->second);
              // Hamzat wasl elides after a clitic vowel: wa+al -> wal,
              // bi+al -> bil (not *biʔal).
              if (!prefix->empty() && art.compare(0, 3, "\xCA\x94\x61") == 0)
                art = art.substr(3);
              *prefix += art;
              return it->second;
            }
          }
          return nullptr;
        };
        lex = lookup(raw, &pre);
        if (!lex && raw.size() > 2 && raw.compare(0, 2, "\xD9\x88") == 0) {
          // wa- clitic (و "and" welded to the word): strip and retry.
          pre = "wa";
          lex = lookup(raw.substr(2), &pre);
          if (!lex) pre.clear();
        }
        if (!lex && raw.size() > 4 && raw.compare(0, 4, "\xD9\x84\xD9\x84") == 0) {
          // li+al contraction, written لل: lil- (moon) / liCC- (sun).
          const auto& L2 = ar_lexicon();
          auto it2 = L2.find(raw.substr(4));
          if (it2 != L2.end()) {
            std::string art = ar_article_prefix(it2->second);
            if (art.compare(0, 3, "\xCA\x94\x61") == 0) art = art.substr(3);
            pre = std::string("li") + art;
            lex = it2->second;
          }
        }
        if (!lex && raw.size() > 2) {
          // bi-/li-/fa- proclitics (ب/ل/ف welded to the word).
          static const struct { const char* u8; const char* ipa; }
              kClitics[] = {{"\xD8\xA8", "bi"}, {"\xD9\x84", "li"},
                            {"\xD9\x81", "fa"}};
          for (const auto& cl : kClitics) {
            if (raw.compare(0, 2, cl.u8) == 0) {
              pre = cl.ipa;
              lex = lookup(raw.substr(2), &pre);
              if (lex) break;
              pre.clear();
            }
          }
        }
      }
      bool emitted = false;
      if (!lex && cfg.lang == 2 && !harakat) {
        // Morphological vocalization layer: unlexiconed MSA words whose
        // skeleton matches a templatic pattern get real short vowels +
        // stress instead of uniform epenthesis (ar_morph above).
        std::string mpre, m;
        if (ar_morph_word(raw, &mpre, &m)) {
          result += mpre;
          result += m;
          emitted = true;
        }
      }
      if (!emitted) {
        if (lex) { result += pre; result += lex; }
        else pa_word(word, cfg, &result);
      }
      word.clear();
    }
    raw.clear();
    harakat = false;
  };
  size_t nbytes = text.size();
  for (size_t i = 0; i < nbytes;) {
    unsigned char c = text[i];
    unsigned int cp = 0; size_t len = 1;
    if (c < 0x80) { cp = c; }
    else if ((c >> 5) == 0x6 && i + 1 < nbytes) {
      cp = ((c & 0x1F) << 6) | (text[i+1] & 0x3F); len = 2;
    } else if ((c >> 4) == 0xE && i + 2 < nbytes) {
      cp = ((c & 0x0F) << 12) | ((text[i+1] & 0x3F) << 6) | (text[i+2] & 0x3F); len = 3;
    } else if ((c >> 3) == 0x1E && i + 3 < nbytes) { len = 4; }
    if (pa_letter(cp, cfg, &word, word.empty())) {
      if (cp >= 0x064B && cp <= 0x0652) harakat = true;                // diacritic
      else if (cp != 0x0640 && cp != 0x200C) raw.append(text, i, len); // skip kashida/ZWNJ
      i += len;
      continue;
    }
    flush();
    if (cp == 0x060C) result += ',';        // ،
    else if (cp == 0x061F) result += '?';   // ؟
    else if (cp == 0x061B) result += ';';   // ؛
    else if (cp == 0x06D4) result += '.';   // ۔ (ur full stop)
    else if (cp < 128 && cp && strchr(";:,.!?()\"- ", static_cast<int>(cp))) {
      char pc = static_cast<char>(cp);
      if (!(pc == ' ' && !result.empty() && result.back() == ' '))
        result += pc;
    }
    i += len;
  }
  flush();
  char* buf = static_cast<char*>(malloc(result.size() + 1));
  memcpy(buf, result.c_str(), result.size() + 1);
  return buf;
}

// --- Persian romanization ("fa-latn" / Fingilish) ----------------------------
std::string phonemize_word_falatn(const std::string& raw) {
  std::string w;
  for (char c : raw) w += static_cast<char>(tolower(c));
  struct FP { std::string ipa; bool vowel; };
  std::vector<FP> ph;
  size_t n = w.size();
  for (size_t i = 0; i < n;) {
    char c = w[i];
    char c1 = (i + 1 < n) ? w[i + 1] : '\0';
    if (c=='k' && c1=='h') { ph.push_back({"x", false}); i += 2; continue; }
    if (c=='g' && c1=='h') { ph.push_back({"ɣ", false}); i += 2; continue; }
    if (c=='s' && c1=='h') { ph.push_back({"ʃ", false}); i += 2; continue; }
    if (c=='c' && c1=='h') { ph.push_back({"tʃ", false}); i += 2; continue; }
    if (c=='z' && c1=='h') { ph.push_back({"ʒ", false}); i += 2; continue; }
    if (c=='a' && c1=='a') { ph.push_back({"ɒː", true}); i += 2; continue; }
    if (c=='e' && c1=='e') { ph.push_back({"iː", true}); i += 2; continue; }
    if (c=='o' && c1=='o') { ph.push_back({"uː", true}); i += 2; continue; }
    switch (c) {
      case 'a': ph.push_back({"æ", true}); break;
      case 'e': ph.push_back({"e", true}); break;
      case 'i': ph.push_back({"i", true}); break;
      case 'o': ph.push_back({"o", true}); break;
      case 'u': ph.push_back({"u", true}); break;
      case 'b': ph.push_back({"b", false}); break;
      case 'c': ph.push_back({"s", false}); break;
      case 'd': ph.push_back({"d", false}); break;
      case 'f': ph.push_back({"f", false}); break;
      case 'g': ph.push_back({"ɡ", false}); break;
      case 'h': ph.push_back({"h", false}); break;
      case 'j': ph.push_back({"dʒ", false}); break;
      case 'k': ph.push_back({"k", false}); break;
      case 'l': ph.push_back({"l", false}); break;
      case 'm': ph.push_back({"m", false}); break;
      case 'n': ph.push_back({"n", false}); break;
      case 'p': ph.push_back({"p", false}); break;
      case 'q': ph.push_back({"ɣ", false}); break;
      case 'r': ph.push_back({"r", false}); break;
      case 's': ph.push_back({"s", false}); break;
      case 't': ph.push_back({"t", false}); break;
      case 'v': case 'w': ph.push_back({"v", false}); break;
      case 'x': ph.push_back({"x", false}); break;
      case 'y': ph.push_back({"j", false}); break;
      case 'z': ph.push_back({"z", false}); break;
      case '\'': ph.push_back({"ʔ", false}); break;
      default: break;
    }
    ++i;
  }
  std::string out;
  for (const auto& p : ph) out += p.ipa;
  return out;
}

const char* phonemize_text_falatn(const char* utf8_text) {
  if (!utf8_text) return nullptr;
  std::string text(utf8_text);
  std::string result, word;
  auto flush = [&]() {
    if (!word.empty()) { result += phonemize_word_falatn(word); word.clear(); }
  };
  for (size_t i = 0; i < text.size(); ++i) {
    unsigned char c = text[i];
    if (c < 128 && (isalpha(c) || c == '\'')) { word += static_cast<char>(c); continue; }
    flush();
    if (c < 128 && strchr(";:,.!?()\"- ", c)) {
      if (!(c == ' ' && !result.empty() && result.back() == ' '))
        result += static_cast<char>(c);
    }
  }
  flush();
  char* buf = static_cast<char*>(malloc(result.size() + 1));
  memcpy(buf, result.c_str(), result.size() + 1);
  return buf;
}

// --- Vietnamese -------------------------------------------------------------
// Quốc ngữ is a regular Latin orthography once the diacritics are decoded:
// vowel-quality diacritics (ă â ê ô ơ ư) are kept, and the tone mark
// (ngang/sắc/huyền/hỏi/ngã/nặng) is emitted AFTER each syllable as Chao
// tone letters (Hanoi contours: ˧ ˧˥ ˨˩ ˧˩˧ ˧ˀ˥ ˨˩ˀ) — the same convention
// eSpeak NG's IPA output uses, which is what the reference feeds the
// tokenizer. The model's phoneme table has no tone letters, so these map to
// the UNK id exactly as they do in the reference
// (/root/reference/zonos/conditioning.py:240-241 `_symbol_to_id.get(s, 1)`):
// the checkpoint was trained seeing a tone-dependent run of UNK tokens after
// every syllable, and omitting them would shift the token-stream shape.
// Segment mapping follows a composite literary standard (retroflex s/tr kept
// distinct, d/gi/r → z as in the north). Each syllable = onset + nucleus +
// coda; no stress marks (Vietnamese has none).
//
// Internal markers after decoding: 1=ă 2=â 3=ê 4=ô 5=ơ 6=ư 7=đ.

// Map one codepoint to its tone-stripped marker char; 0 if not Vietnamese.
char vi_fold(unsigned int cp) {
  if (cp < 128) {
    char c = (char)tolower((int)cp);
    if (c >= 'a' && c <= 'z') return c;
    return 0;
  }
  if (cp >= 0x41 && cp <= 0x5A) return (char)(cp + 0x20);
  // Latin-1 precomposed (tone on plain vowels + â ê ô)
  if (cp >= 0xC0 && cp <= 0xDD) cp += 0x20;  // uppercase → lowercase
  switch (cp) {
    case 0xE0: case 0xE1: case 0xE3: return 'a';   // à á ã
    case 0xE2: return '2';                         // â
    case 0xE8: case 0xE9: return 'e';              // è é
    case 0xEA: return '3';                         // ê
    case 0xEC: case 0xED: return 'i';              // ì í
    case 0xF2: case 0xF3: case 0xF5: return 'o';   // ò ó õ
    case 0xF4: return '4';                         // ô
    case 0xF9: case 0xFA: return 'u';              // ù ú
    case 0xFD: return 'y';                         // ý
  }
  switch (cp) {
    case 0x102: case 0x103: return '1';  // Ă ă
    case 0x110: case 0x111: return '7';  // Đ đ
    case 0x128: case 0x129: return 'i';  // Ĩ ĩ
    case 0x168: case 0x169: return 'u';  // Ũ ũ
    case 0x1A0: case 0x1A1: return '5';  // Ơ ơ
    case 0x1AF: case 0x1B0: return '6';  // Ư ư
    case 0x1EF8: case 0x1EF9: return 'y';  // Ỹ ỹ (handled below too)
  }
  if (cp >= 0x1EA0 && cp <= 0x1EF9) {
    if ((cp & 1) == 0) ++cp;  // uppercase → lowercase (Ạ=1EA0, ạ=1EA1, ...)
    if (cp <= 0x1EA3) return 'a';              // ạ ả
    if (cp <= 0x1EAD) return '2';              // ấ ầ ẩ ẫ ậ
    if (cp <= 0x1EB7) return '1';              // ắ ằ ẳ ẵ ặ
    if (cp <= 0x1EBD) return 'e';              // ẹ ẻ ẽ
    if (cp <= 0x1EC7) return '3';              // ế ề ể ễ ệ
    if (cp <= 0x1ECB) return 'i';              // ỉ ị
    if (cp <= 0x1ECF) return 'o';              // ọ ỏ
    if (cp <= 0x1ED9) return '4';              // ố ồ ổ ỗ ộ
    if (cp <= 0x1EE3) return '5';              // ớ ờ ở ỡ ợ
    if (cp <= 0x1EE7) return 'u';              // ụ ủ
    if (cp <= 0x1EF1) return '6';              // ứ ừ ử ữ ự
    return 'y';                                // ỳ ỵ ỷ ỹ
  }
  return 0;
}

// Tone class of one codepoint: 0 ngang/none, 1 sắc, 2 huyền, 3 hỏi,
// 4 ngã, 5 nặng. Covers precomposed letters (NFC) and the bare combining
// marks (NFD input: a + U+0300 etc.).
int vi_tone(unsigned int cp) {
  if (cp >= 0xC0 && cp <= 0xDD) cp += 0x20;
  switch (cp) {
    case 0xE1: case 0xE9: case 0xED: case 0xF3: case 0xFA: case 0xFD:
      return 1;                                  // á é í ó ú ý
    case 0xE0: case 0xE8: case 0xEC: case 0xF2: case 0xF9:
      return 2;                                  // à è ì ò ù
    case 0xE3: case 0xF5: case 0x129: case 0x169:
      return 4;                                  // ã õ ĩ ũ
    case 0x300: return 2; case 0x301: return 1; case 0x303: return 4;
    case 0x309: return 3; case 0x323: return 5;  // combining marks
  }
  if (cp >= 0x1EA0 && cp <= 0x1EF9) {
    if ((cp & 1) == 0) ++cp;  // uppercase → lowercase
    switch (cp) {
      case 0x1EA1: case 0x1EB9: case 0x1ECB: case 0x1ECD: case 0x1EE5:
      case 0x1EF5: return 5;                     // ạ ẹ ị ọ ụ ỵ
      case 0x1EA3: case 0x1EBB: case 0x1EC9: case 0x1ECF: case 0x1EE7:
      case 0x1EF7: return 3;                     // ả ẻ ỉ ỏ ủ ỷ
      case 0x1EBD: case 0x1EF9: return 4;        // ẽ ỹ
      case 0x1EF3: return 2;                     // ỳ
    }
    // Full five-tone series on the quality-marked vowels â ă ê ô ơ ư,
    // laid out sắc/huyền/hỏi/ngã/nặng at consecutive odd codepoints.
    static const unsigned int kSeries[] = {0x1EA5, 0x1EAF, 0x1EBF,
                                           0x1ED1, 0x1EDB, 0x1EE9};
    for (unsigned int b : kSeries)
      if (cp >= b && cp <= b + 8) return (int)((cp - b) / 2) + 1;
  }
  return 0;
}

// Chao tone letters appended after the syllable (index = vi_tone class).
const char* vi_tone_ipa(int tone) {
  static const char* kChao[6] = {
      "\xCB\xA7",                          // ngang ˧
      "\xCB\xA7\xCB\xA5",                  // sắc ˧˥
      "\xCB\xA8\xCB\xA9",                  // huyền ˨˩
      "\xCB\xA7\xCB\xA9\xCB\xA7",          // hỏi ˧˩˧
      "\xCB\xA7\xCB\x80\xCB\xA5",          // ngã ˧ˀ˥ (glottalized rise)
      "\xCB\xA8\xCB\xA9\xCB\x80",          // nặng ˨˩ˀ (glottalized drop)
  };
  return kChao[tone >= 0 && tone <= 5 ? tone : 0];
}

bool vi_is_vowel_marker(char c) {
  return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'||c=='y'||
         c=='1'||c=='2'||c=='3'||c=='4'||c=='5'||c=='6';
}

// One syllable (folded markers) → IPA.
std::string phonemize_syllable_vi(const std::string& w) {
  size_t n = w.size(), i = 0;
  std::string out;
  auto at = [&](size_t k) { return k < n ? w[k] : '\0'; };

  // --- onset (longest match first) ---
  char c0 = at(0), c1 = at(1), c2 = at(2);
  if (c0=='n' && c1=='g' && c2=='h') { out += "\xc5\x8b"; i = 3; }          // ngh → ŋ
  else if (c0=='n' && c1=='g') { out += "\xc5\x8b"; i = 2; }                  // ng → ŋ
  else if (c0=='g' && c1=='h') { out += "\xc9\xa3"; i = 2; }                  // gh → ɣ
  else if (c0=='g' && c1=='i') {
    // gi- = /z/: "gi"+vowel consumes the i (gia → za); bare "gi(n)" keeps
    // the i as nucleus (gì → zi).
    out += "z";
    i = (n > 2 && vi_is_vowel_marker(c2)) ? 2 : 1;
  }
  else if (c0=='k' && c1=='h') { out += "x"; i = 2; }                          // kh
  else if (c0=='p' && c1=='h') { out += "f"; i = 2; }                          // ph
  else if (c0=='t' && c1=='h') { out += "t\xca\xb0"; i = 2; }                // th → tʰ
  else if (c0=='t' && c1=='r') { out += "\xca\x88\xca\x82"; i = 2; }       // tr → ʈʂ
  else if (c0=='c' && c1=='h') { out += "t\xc9\x95"; i = 2; }                // ch → tɕ
  else if (c0=='n' && c1=='h') { out += "\xc9\xb2"; i = 2; }                 // nh → ɲ
  else if (c0=='q' && c1=='u') { out += "kw"; i = 2; }                         // qu → kw
  else if (c0=='b') { out += "\xc9\x93"; i = 1; }                               // b → ɓ
  else if (c0=='7') { out += "\xc9\x97"; i = 1; }                               // đ → ɗ
  else if (c0=='d') { out += "z"; i = 1; }                                        // d → z
  else if (c0=='r') { out += "z"; i = 1; }                                        // r → z
  else if (c0=='x') { out += "s"; i = 1; }                                        // x → s
  else if (c0=='s') { out += "\xca\x82"; i = 1; }                               // s → ʂ
  else if (c0=='c' || c0=='k' || c0=='q') { out += "k"; i = 1; }
  else if (c0=='g') { out += "\xc9\xa3"; i = 1; }                               // g → ɣ
  else if (c0=='v') { out += "v"; i = 1; }
  else if (c0=='l') { out += "l"; i = 1; }
  else if (c0=='m') { out += "m"; i = 1; }
  else if (c0=='n') { out += "n"; i = 1; }
  else if (c0=='h') { out += "h"; i = 1; }
  else if (c0=='t') { out += "t"; i = 1; }
  else if (c0=='p') { out += "p"; i = 1; }
  else if (c0=='f') { out += "f"; i = 1; }  // loanwords
  else if (c0=='w') { out += "w"; i = 1; }
  else if (c0=='j') { out += "z"; i = 1; }

  // --- nucleus: collect vowel markers ---
  std::string nuc;
  while (i < n && vi_is_vowel_marker(w[i])) { nuc += w[i]; ++i; }

  // --- coda ---
  std::string coda;
  char f0 = at(i), f1 = at(i + 1);
  if (f0=='n' && f1=='g') coda = "\xc5\x8b";        // -ng → ŋ
  else if (f0=='n' && f1=='h') coda = "\xc9\xb2";   // -nh → ɲ
  else if (f0=='c' && f1=='h') coda = "k";            // -ch → k
  else if (f0=='c') coda = "k";
  else if (f0=='m') coda = "m";
  else if (f0=='n') coda = "n";
  else if (f0=='p') coda = "p";
  else if (f0=='t') coda = "t";

  // Off-glide vowels at the end of the nucleus become j/w codas.
  std::string glide;
  if (coda.empty() && nuc.size() >= 2) {
    char last = nuc.back();
    if (last=='i' || last=='y') { glide = "j"; nuc.pop_back(); }
    else if (last=='u' || last=='o') { glide = "w"; nuc.pop_back(); }
  }

  // --- nucleus mapping (diphthongs first) ---
  auto one = [&](char c) -> const char* {
    switch (c) {
      case 'a': return "a";
      case '1': return "a";            // ă (short a)
      case '2': return "\xc9\x99";    // â → ə
      case 'e': return "\xc9\x9b";    // e → ɛ
      case '3': return "e";            // ê → e
      case 'i': case 'y': return "i";
      case 'o': return "\xc9\x94";    // o → ɔ
      case '4': return "o";            // ô → o
      case '5': return "\xc9\xa4";    // ơ → ɤ
      case 'u': return "u";
      case '6': return "\xc9\xaf";    // ư → ɯ
    }
    return "";
  };
  std::string nipa;
  if (nuc == "i3" || nuc == "ia" || nuc == "y3") nipa = "i\xc9\x99";        // iê/ia → iə
  else if (nuc == "65" || nuc == "6a") nipa = "\xc9\xaf\xc9\x99";         // ươ/ưa → ɯə
  else if (nuc == "u4" || nuc == "ua") nipa = "u\xc9\x99";                  // uô/ua → uə
  else {
    for (size_t k = 0; k < nuc.size(); ++k) {
      // medial o/u before a main vowel = /w/ on-glide (hoa → hwa, huy → hwi)
      if (k + 1 < nuc.size() && (nuc[k]=='o' || nuc[k]=='u')) nipa += "w";
      else nipa += one(nuc[k]);
    }
  }
  out += nipa + glide + coda;
  return out;
}

const char* phonemize_text_vi(const char* utf8_text) {
  if (!utf8_text) return nullptr;
  std::string text(utf8_text);
  std::string result, word;
  int tone = 0;
  auto flush = [&]() {
    if (!word.empty()) {
      result += phonemize_syllable_vi(word);
      result += vi_tone_ipa(tone);
      word.clear();
    }
    tone = 0;
  };
  for (size_t i = 0; i < text.size();) {
    unsigned char c = text[i];
    unsigned int cp = 0; size_t len = 1;
    if (c < 0x80) { cp = c; }
    else if ((c >> 5) == 0x6 && i + 1 < text.size()) {
      cp = ((c & 0x1F) << 6) | (text[i+1] & 0x3F); len = 2;
    } else if ((c >> 4) == 0xE && i + 2 < text.size()) {
      cp = ((c & 0x0F) << 12) | ((text[i+1] & 0x3F) << 6) | (text[i+2] & 0x3F); len = 3;
    } else if ((c >> 3) == 0x1E && i + 3 < text.size()) { len = 4; }
    char m = cp ? vi_fold(cp) : 0;
    if (m) {
      int t = vi_tone(cp);
      if (t) tone = t;
      word += m;
      i += len;
      continue;
    }
    if (cp && vi_tone(cp) && !word.empty()) {  // NFD combining tone mark
      tone = vi_tone(cp);
      i += len;
      continue;
    }
    flush();
    if (cp < 128 && cp && strchr(";:,.!?()\"- ", (int)cp)) {
      if (!((char)cp == ' ' && !result.empty() && result.back() == ' '))
        result += (char)cp;
    }
    i += len;
  }
  flush();
  char* buf = static_cast<char*>(malloc(result.size() + 1));
  memcpy(buf, result.c_str(), result.size() + 1);
  return buf;
}

// --- Swedish ----------------------------------------------------------------
// Orthography with regular front/back alternations: k/sk/g soften before
// front vowels (e i y ä ö), sj/skj/stj/sch → ɧ (the sje-sound — the symbol
// table carries ɧ), tj/kj → ɕ, retroflexion of r+dental clusters (rs→ʂ
// rt→ʈ rd→ɖ rn→ɳ rl→ɭ), o→u shift, u→ʉ. Pitch accent is lexical; neutral
// first-syllable stress. Markers: A=å E=ä O=ö.

bool sv_front(char c) { return c=='e'||c=='i'||c=='y'||c=='E'||c=='O'; }

// Swedish/Norwegian vowel length from orthography: a vowel before a doubled
// consonant or a 2+-consonant cluster is short (komma/Norge → ɔ); before a
// single consonant or word-finally it is long (bo/stor → u). The retroflex
// digraphs rd/rt/rn/rl merge into ONE sound and do not close the syllable
// (bord → buːɖ, hvordan → vuɖɑn) — rs does (fors → fɔʂ, norsk → nɔʂk).
bool scand_short_vowel(const std::string& w, size_t i) {
  auto vw = [](char c) {
    return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'||c=='y'||c=='A'||c=='E'||c=='O';
  };
  int count = 0;
  for (size_t j = i + 1; j < w.size() && !vw(w[j]); ) {
    if (w[j] == 'r' && j + 1 < w.size() &&
        (w[j+1]=='d' || w[j+1]=='t' || w[j+1]=='n' || w[j+1]=='l')) {
      count += 1; j += 2; continue;
    }
    count += 1; ++j;
  }
  return count >= 2;
}

std::string phonemize_word_sv(const std::string& raw) {
  if (raw == "och") return "ɔk";
  if (raw == "det") return "deː";
  if (raw == "jag") return "jɑː";
  // Irregulars the rules cannot reach: Sverige softens its medial g
  // (svˈɛrjɛ), människa has the lexical sje-sound (mˈɛnɪɧa), dom is the
  // spoken form of de/dem.
  if (raw == "sverige") return "svˈɛrjɛ";
  if (raw == "m\xC3\xA4nniska") return "mˈɛnɪɧa";
  if (raw == "de" || raw == "dem" || raw == "dom") return "dɔm";
  if (raw == "som") return "sɔm";
  if (raw == "om") return "ɔm";
  if (raw == "kom") return "kɔm";
  std::string w;
  for (size_t i = 0; i < raw.size();) {
    unsigned char c = raw[i];
    if (c < 128) { w += static_cast<char>(tolower(c)); ++i; continue; }
    if (c == 0xC3 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0xA5 || d == 0x85) w += 'A';       // å
      else if (d == 0xA4 || d == 0x84) w += 'E';  // ä
      else if (d == 0xB6 || d == 0x96) w += 'O';  // ö
      i += 2; continue;
    }
    ++i;
  }
  auto vow = [](char c) { return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'||c=='y'||c=='A'||c=='E'||c=='O'; };
  struct SVP { std::string ipa; bool vowel; };
  std::vector<SVP> ph;
  size_t n = w.size();
  for (size_t i = 0; i < n;) {
    char c = w[i];
    char c1 = (i + 1 < n) ? w[i + 1] : '\0';
    char c2 = (i + 2 < n) ? w[i + 2] : '\0';
    // sje-sound clusters
    if (c=='s' && c1=='t' && c2=='j') { ph.push_back({"ɧ", false}); i += 3; continue; }
    if (c=='s' && c1=='k' && c2=='j') { ph.push_back({"ɧ", false}); i += 3; continue; }
    if (c=='s' && c1=='c' && c2=='h') { ph.push_back({"ɧ", false}); i += 3; continue; }
    if (c=='s' && c1=='j') { ph.push_back({"ɧ", false}); i += 2; continue; }
    if (c=='s' && c1=='k' && sv_front(c2)) { ph.push_back({"ɧ", false}); i += 2; continue; }
    // tje-sound
    if ((c=='t' || c=='k') && c1=='j') { ph.push_back({"ɕ", false}); i += 2; continue; }
    if (c=='k' && sv_front(c1) && i == 0) { ph.push_back({"ɕ", false}); ++i; continue; }
    // silent-j onsets
    if (i == 0 && (c=='d' || c=='g' || c=='h' || c=='l') && c1=='j') {
      ph.push_back({"j", false}); i += 2; continue;
    }
    if (c=='g' && i == 0 && sv_front(c1)) { ph.push_back({"j", false}); ++i; continue; }
    // final -g after l/r → j (berg, älg)
    if (c=='g' && i + 1 == n && i > 0 && (w[i-1]=='l' || w[i-1]=='r')) {
      ph.push_back({"j", false}); ++i; continue;
    }
    // retroflexion
    if (c=='r' && c1=='s') { ph.push_back({"ʂ", false}); i += 2; continue; }
    if (c=='r' && c1=='t') { ph.push_back({"ʈ", false}); i += 2; continue; }
    if (c=='r' && c1=='d') { ph.push_back({"ɖ", false}); i += 2; continue; }
    if (c=='r' && c1=='n') { ph.push_back({"ɳ", false}); i += 2; continue; }
    if (c=='r' && c1=='l') { ph.push_back({"ɭ", false}); i += 2; continue; }
    if (c=='c' && c1=='k') { ph.push_back({"k", false}); i += 2; continue; }
    // double letters: fold
    if (c == c1 && c != '\0') {
      // long consonant — emit once; vowel length handled below
      if (!vow(c)) { w.erase(i + 1, 1); n = w.size(); continue; }
    }
    switch (c) {
      case 'a': ph.push_back({"a", true}); ++i; break;
      case 'A': ph.push_back({"oː", true}); ++i; break;  // å
      case 'e': ph.push_back({"ɛ", true}); ++i; break;
      case 'E': ph.push_back({"ɛ", true}); ++i; break;   // ä
      case 'i': ph.push_back({"i", true}); ++i; break;
      case 'o':  // o → u shift when long; short o stays ɔ (komma, borg)
        ph.push_back({scand_short_vowel(w, i) ? "ɔ" : "u", true}); ++i; break;
      case 'O': ph.push_back({"ø", true}); ++i; break;   // ö
      case 'u': ph.push_back({"ʉ", true}); ++i; break;
      case 'y': ph.push_back({"ʏ", true}); ++i; break;
      case 'b': ph.push_back({"b", false}); ++i; break;
      case 'c': ph.push_back({sv_front(c1) ? "s" : "k", false}); ++i; break;
      case 'd': ph.push_back({"d", false}); ++i; break;
      case 'f': ph.push_back({"f", false}); ++i; break;
      case 'g': ph.push_back({"ɡ", false}); ++i; break;
      case 'h': ph.push_back({"h", false}); ++i; break;
      case 'j': ph.push_back({"j", false}); ++i; break;
      case 'k': ph.push_back({"k", false}); ++i; break;
      case 'l': ph.push_back({"l", false}); ++i; break;
      case 'm': ph.push_back({"m", false}); ++i; break;
      case 'n': ph.push_back({"n", false}); ++i; break;
      case 'p': ph.push_back({"p", false}); ++i; break;
      case 'q': ph.push_back({"k", false}); ++i; break;
      case 'r': ph.push_back({"r", false}); ++i; break;
      case 's': ph.push_back({"s", false}); ++i; break;
      case 't': ph.push_back({"t", false}); ++i; break;
      case 'v': case 'w': ph.push_back({"v", false}); ++i; break;
      case 'x': ph.push_back({"ks", false}); ++i; break;
      case 'z': ph.push_back({"s", false}); ++i; break;
      default: ++i; break;
    }
  }
  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  bool placed = false;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel && !placed) { if (total > 1) out += "ˈ"; placed = true; }
    out += p.ipa;
  }
  return out;
}

// --- Norwegian (Bokmål) -----------------------------------------------------
// East-Norwegian conventions: kj/k+front → ç, skj/sj/sk+front → ʃ, gj/hj → j,
// g before i/y → j, hv → v, o → u shift, u → ʉ, retroflex r-clusters as in
// Swedish, final -ig drops the g. Markers: A=å E=æ O=ø.

bool nb_front(char c) { return c=='e'||c=='i'||c=='y'||c=='E'||c=='O'; }

std::string phonemize_word_nb(const std::string& raw) {
  if (raw == "jeg") return "jæj";
  if (raw == "det") return "de";
  if (raw == "og") return "ɔ";
  if (raw == "ogs\xC3\xA5") return "ˈɔsɔ";  // også: g silent
  std::string w;
  for (size_t i = 0; i < raw.size();) {
    unsigned char c = raw[i];
    if (c < 128) { w += static_cast<char>(tolower(c)); ++i; continue; }
    if (c == 0xC3 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0xA5 || d == 0x85) w += 'A';       // å
      else if (d == 0xA6 || d == 0x86) w += 'E';  // æ
      else if (d == 0xB8 || d == 0x98) w += 'O';  // ø
      i += 2; continue;
    }
    ++i;
  }
  auto vow = [](char c) { return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'||c=='y'||c=='A'||c=='E'||c=='O'; };
  struct NBP { std::string ipa; bool vowel; };
  std::vector<NBP> ph;
  size_t n = w.size();
  // final -ig: g is silent (viktig → viktii → fold below)
  if (n >= 2 && w[n-1]=='g' && w[n-2]=='i') { w.erase(n - 1, 1); n = w.size(); }
  for (size_t i = 0; i < n;) {
    char c = w[i];
    char c1 = (i + 1 < n) ? w[i + 1] : '\0';
    char c2 = (i + 2 < n) ? w[i + 2] : '\0';
    if (c=='s' && c1=='k' && c2=='j') { ph.push_back({"ʃ", false}); i += 3; continue; }
    if (c=='s' && c1=='j') { ph.push_back({"ʃ", false}); i += 2; continue; }
    if (c=='s' && c1=='k' && (c2=='i' || c2=='y')) { ph.push_back({"ʃ", false}); i += 2; continue; }
    if (c=='k' && c1=='j') { ph.push_back({"ç", false}); i += 2; continue; }
    if (c=='k' && i == 0 && (c1=='i' || c1=='y')) { ph.push_back({"ç", false}); ++i; continue; }
    if ((c=='g' || c=='h') && c1=='j') { ph.push_back({"j", false}); i += 2; continue; }
    if (c=='g' && i == 0 && (c1=='i' || c1=='y')) { ph.push_back({"j", false}); ++i; continue; }
    if (c=='h' && c1=='v') { ph.push_back({"v", false}); i += 2; continue; }
    if (c=='r' && c1=='s') { ph.push_back({"ʂ", false}); i += 2; continue; }
    if (c=='r' && c1=='t') { ph.push_back({"ʈ", false}); i += 2; continue; }
    if (c=='r' && c1=='d') { ph.push_back({"ɖ", false}); i += 2; continue; }
    if (c=='r' && c1=='n') { ph.push_back({"ɳ", false}); i += 2; continue; }
    if (c=='r' && c1=='l') { ph.push_back({"ɭ", false}); i += 2; continue; }
    if (c=='c' && c1=='k') { ph.push_back({"k", false}); i += 2; continue; }
    if (c=='d' && c1=='t') { ph.push_back({"t", false}); i += 2; continue; }  // godt → ɡɔt
    if (c == c1 && !vow(c) && c != '\0') { w.erase(i + 1, 1); n = w.size(); continue; }
    switch (c) {
      case 'a': ph.push_back({"ɑ", true}); ++i; break;
      case 'A': ph.push_back({"ɔ", true}); ++i; break;   // å
      case 'e': ph.push_back({(i + 1 >= n && n > 2) ? "ə" : "e", true}); ++i; break;
      case 'E': ph.push_back({"æ", true}); ++i; break;   // æ
      case 'i': ph.push_back({"i", true}); ++i; break;
      case 'o':  // o → u shift when long; short o stays ɔ (komme, Norge)
        ph.push_back({scand_short_vowel(w, i) ? "ɔ" : "u", true}); ++i; break;
      case 'O': ph.push_back({"ø", true}); ++i; break;   // ø
      case 'u': ph.push_back({"ʉ", true}); ++i; break;
      case 'y': ph.push_back({"ʏ", true}); ++i; break;
      case 'b': ph.push_back({"b", false}); ++i; break;
      case 'c': ph.push_back({nb_front(c1) ? "s" : "k", false}); ++i; break;
      case 'd': ph.push_back({"d", false}); ++i; break;
      case 'f': ph.push_back({"f", false}); ++i; break;
      case 'g': ph.push_back({"ɡ", false}); ++i; break;
      case 'h': ph.push_back({"h", false}); ++i; break;
      case 'j': ph.push_back({"j", false}); ++i; break;
      case 'k': ph.push_back({"k", false}); ++i; break;
      case 'l': ph.push_back({"l", false}); ++i; break;
      case 'm': ph.push_back({"m", false}); ++i; break;
      case 'n': ph.push_back({"n", false}); ++i; break;
      case 'p': ph.push_back({"p", false}); ++i; break;
      case 'q': ph.push_back({"k", false}); ++i; break;
      case 'r': ph.push_back({"r", false}); ++i; break;
      case 's': ph.push_back({"s", false}); ++i; break;
      case 't': ph.push_back({"t", false}); ++i; break;
      case 'v': case 'w': ph.push_back({"v", false}); ++i; break;
      case 'x': ph.push_back({"ks", false}); ++i; break;
      case 'z': ph.push_back({"s", false}); ++i; break;
      default: ++i; break;
    }
  }
  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  bool placed = false;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel && !placed) { if (total > 1) out += "ˈ"; placed = true; }
    out += p.ipa;
  }
  return out;
}

// --- Danish -----------------------------------------------------------------
// The most reduced Scandinavian orthography-to-sound mapping; approximations:
// soft d (post-vocalic) → ð, post-vocalic g → j (kage) or dropped after
// rounded vowels, r → ʁ (uvular) with coda vocalization to ɐ, final -e → ə,
// hv → v, hj → j, af/av coda v → w. Stød is not representable and is
// dropped. Markers: A=å E=æ O=ø.

std::string phonemize_word_da(const std::string& raw) {
  if (raw == "jeg") return "jɑj";
  if (raw == "det") return "de";
  if (raw == "og") return "ɔw";
  // Common irregulars (Danish sound change outruns its spelling):
  if (raw == "ikke") return "ˈeɡə";
  if (raw == "lidt") return "let";
  if (raw == "meget") return "mˈɑjəð";
  if (raw == "er") return "ɛɐ";
  std::string w;
  for (size_t i = 0; i < raw.size();) {
    unsigned char c = raw[i];
    if (c < 128) { w += static_cast<char>(tolower(c)); ++i; continue; }
    if (c == 0xC3 && i + 1 < raw.size()) {
      unsigned char d = raw[i + 1];
      if (d == 0xA5 || d == 0x85) w += 'A';       // å
      else if (d == 0xA6 || d == 0x86) w += 'E';  // æ
      else if (d == 0xB8 || d == 0x98) w += 'O';  // ø
      i += 2; continue;
    }
    ++i;
  }
  auto vow = [](char c) { return c=='a'||c=='e'||c=='i'||c=='o'||c=='u'||c=='y'||c=='A'||c=='E'||c=='O'; };
  struct DAP { std::string ipa; bool vowel; };
  std::vector<DAP> ph;
  size_t n = w.size();
  for (size_t i = 0; i < n;) {
    char c = w[i];
    char c1 = (i + 1 < n) ? w[i + 1] : '\0';
    bool after_vowel = (i > 0) && vow(w[i - 1]);
    if (c=='h' && c1=='v') { ph.push_back({"v", false}); i += 2; continue; }
    if (c=='h' && c1=='j') { ph.push_back({"j", false}); i += 2; continue; }
    if (c=='c' && c1=='k') { ph.push_back({"k", false}); i += 2; continue; }
    if (c=='s' && c1=='j') { ph.push_back({"ɕ", false}); i += 2; continue; }
    if (c=='d' && c1=='t') { ph.push_back({"t", false}); i += 2; continue; }  // godt → ɡɔt
    // Final -et (neuter/definite suffix) is [əð]: huset → huːsəð
    if (c=='e' && c1=='t' && i + 2 == n && n > 3) {
      ph.push_back({"ə", true});
      ph.push_back({"ð", false});
      i += 2; continue;
    }
    if (c == c1 && !vow(c) && c != '\0') { w.erase(i + 1, 1); n = w.size(); continue; }
    switch (c) {
      case 'a': ph.push_back({"æ", true}); ++i; break;
      case 'A': ph.push_back({"ɔ", true}); ++i; break;   // å
      case 'e': ph.push_back({(i + 1 >= n && n > 2) ? "ə" : "e", true}); ++i; break;
      case 'E': ph.push_back({"ɛ", true}); ++i; break;   // æ
      case 'i': ph.push_back({"i", true}); ++i; break;
      case 'o': ph.push_back({"ɔ", true}); ++i; break;
      case 'O': ph.push_back({"ø", true}); ++i; break;   // ø
      case 'u': ph.push_back({"u", true}); ++i; break;
      case 'y': ph.push_back({"y", true}); ++i; break;
      case 'b': ph.push_back({"b", false}); ++i; break;
      case 'c': ph.push_back({(c1=='e'||c1=='i'||c1=='y'||c1=='E') ? "s" : "k", false}); ++i; break;
      case 'd':
        // soft d: post-vocalic, not followed by another consonant
        if (after_vowel && (c1=='\0' || vow(c1) || c1=='e'))
          ph.push_back({"ð", false});
        else ph.push_back({"d", false});
        ++i; break;
      case 'f': ph.push_back({"f", false}); ++i; break;
      case 'g':
        if (after_vowel && (c1=='\0' || vow(c1))) ph.push_back({"j", false});
        else ph.push_back({"ɡ", false});
        ++i; break;
      case 'h': ph.push_back({"h", false}); ++i; break;
      case 'j': ph.push_back({"j", false}); ++i; break;
      case 'k': ph.push_back({"k", false}); ++i; break;
      case 'l': ph.push_back({"l", false}); ++i; break;
      case 'm': ph.push_back({"m", false}); ++i; break;
      case 'n': ph.push_back({"n", false}); ++i; break;
      case 'p': ph.push_back({"p", false}); ++i; break;
      case 'q': ph.push_back({"k", false}); ++i; break;
      case 'r':
        // coda r vocalizes to ɐ; onset r is uvular ʁ
        if (after_vowel && (c1=='\0' || !vow(c1))) ph.push_back({"ɐ", true});
        else ph.push_back({"ʁ", false});
        ++i; break;
      case 's': ph.push_back({"s", false}); ++i; break;
      case 't': ph.push_back({"t", false}); ++i; break;
      case 'v':
        if (after_vowel && (c1=='\0' || !vow(c1))) ph.push_back({"w", false});
        else ph.push_back({"v", false});
        ++i; break;
      case 'w': ph.push_back({"v", false}); ++i; break;
      case 'x': ph.push_back({"ks", false}); ++i; break;
      case 'z': ph.push_back({"s", false}); ++i; break;
      default: ++i; break;
    }
  }
  int total = 0;
  for (const auto& p : ph) total += p.vowel ? 1 : 0;
  bool placed = false;
  std::string out;
  for (const auto& p : ph) {
    if (p.vowel && !placed) { if (total > 1) out += "ˈ"; placed = true; }
    out += p.ipa;
  }
  return out;
}

}  // namespace

namespace {

enum class Lang { EN, ES, DE, IT, FR, PT, TR, PL, NL, CS, RO, FI, HU, ID, SW, HR, EO, EU, LV, CY, SV, NB, DA };

// True when the bytes at text[i] are a letter this language's engine keeps.
// Writes the (lowercased) bytes to `word` and returns bytes consumed, or 0.
size_t take_letter(const std::string& text, size_t i, Lang lang, std::string* word) {
  unsigned char c = text[i];
  if (c < 128 && isalpha(c)) {
    *word += static_cast<char>(tolower(c));
    return 1;
  }
  if (c == '\'' && (lang == Lang::EN || lang == Lang::SW)) {
    *word += static_cast<char>(c);  // keep apostrophes inside words (don't)
    return 1;
  }
  if (lang == Lang::FR && i + 1 < text.size() && (c == 0xC3 || c == 0xC5)) {
    unsigned char d = text[i + 1];
    // accented vowels / ç / œ pass through; phonemize_word_fr folds them.
    if ((c == 0xC3 && ((d >= 0x80 && d <= 0xBC))) ||
        (c == 0xC5 && (d == 0x92 || d == 0x93))) {
      *word += static_cast<char>(c);
      *word += static_cast<char>(d);
      return 2;
    }
  }
  if (lang == Lang::FI && c == 0xC3 && i + 1 < text.size()) {
    unsigned char d = text[i + 1];
    if (d == 0xA4 || d == 0x84 || d == 0xB6 || d == 0x96 || d == 0xA5 || d == 0x85 ||
        d == 0xB5 || d == 0x95 || d == 0xBC || d == 0x9C) {
      *word += static_cast<char>(0xC3);
      *word += static_cast<char>(d);
      return 2;
    }
  }
  if (lang == Lang::HU && i + 1 < text.size() && (c == 0xC3 || c == 0xC5)) {
    unsigned char d = text[i + 1];
    bool ok = (c == 0xC3 && (d == 0xA1 || d == 0x81 || d == 0xA9 || d == 0x89 ||
                             d == 0xAD || d == 0x8D || d == 0xB3 || d == 0x93 ||
                             d == 0xBA || d == 0x9A || d == 0xB6 || d == 0x96 ||
                             d == 0xBC || d == 0x9C)) ||
              (c == 0xC5 && (d == 0x91 || d == 0x90 || d == 0xB1 || d == 0xB0));
    if (ok) {
      *word += static_cast<char>(c);
      *word += static_cast<char>(d);
      return 2;
    }
  }
  if (lang == Lang::LV && i + 1 < text.size() && (c == 0xC4 || c == 0xC5)) {
    unsigned char d = text[i + 1];
    bool ok = (c == 0xC4 && (d == 0x81 || d == 0x80 || d == 0x93 || d == 0x92 ||
                             d == 0xAB || d == 0xAA || d == 0x8D || d == 0x8C ||
                             d == 0xB7 || d == 0xB6 || d == 0xA3 || d == 0xA2 ||
                             d == 0xBC || d == 0xBB)) ||
              (c == 0xC5 && (d == 0xAB || d == 0xAA || d == 0xA1 || d == 0xA0 ||
                             d == 0xBE || d == 0xBD || d == 0x86 || d == 0x85));
    if (ok) {
      *word += static_cast<char>(c);
      *word += static_cast<char>(d);
      return 2;
    }
  }
  if (lang == Lang::CY && i + 1 < text.size() && (c == 0xC3 || c == 0xC5)) {
    unsigned char d = text[i + 1];
    bool ok = (c == 0xC5 && (d == 0xB5 || d == 0xB4 || d == 0xB7 || d == 0xB6)) ||
              (c == 0xC3 && (d == 0xA2 || d == 0xAA || d == 0xAE || d == 0xB4 || d == 0xBB));
    if (ok) {
      *word += static_cast<char>(c);
      *word += static_cast<char>(d);
      return 2;
    }
  }
  if ((lang == Lang::SV || lang == Lang::NB || lang == Lang::DA) &&
      c == 0xC3 && i + 1 < text.size()) {
    unsigned char d = text[i + 1];
    // å ä ö æ ø (+ uppercase forms); the word engines fold them to markers.
    if (d == 0xA5 || d == 0x85 || d == 0xA4 || d == 0x84 || d == 0xB6 ||
        d == 0x96 || d == 0xA6 || d == 0x86 || d == 0xB8 || d == 0x98 ||
        d == 0xA9 || d == 0x89) {  // é loanwords
      *word += static_cast<char>(0xC3);
      *word += static_cast<char>(d);
      return 2;
    }
  }
  if (lang == Lang::EU && c == 0xC3 && i + 1 < text.size()) {
    unsigned char d = text[i + 1];
    if (d == 0xB1 || d == 0x91) {
      *word += static_cast<char>(0xC3);
      *word += static_cast<char>(d);
      return 2;
    }
  }
  if (lang == Lang::EO && i + 1 < text.size() && (c == 0xC4 || c == 0xC5)) {
    unsigned char d = text[i + 1];
    bool ok = (c == 0xC4 && (d == 0x89 || d == 0x88 || d == 0x9D || d == 0x9C ||
                             d == 0xA5 || d == 0xA4 || d == 0xB5 || d == 0xB4)) ||
              (c == 0xC5 && (d == 0x9D || d == 0x9C || d == 0xAD || d == 0xAC));
    if (ok) {
      *word += static_cast<char>(c);
      *word += static_cast<char>(d);
      return 2;
    }
  }
  if (lang == Lang::HR && i + 1 < text.size() && (c == 0xC4 || c == 0xC5)) {
    unsigned char d = text[i + 1];
    bool ok = (c == 0xC4 && (d == 0x8D || d == 0x8C || d == 0x87 || d == 0x86 ||
                             d == 0x91 || d == 0x90)) ||
              (c == 0xC5 && (d == 0xA1 || d == 0xA0 || d == 0xBE || d == 0xBD));
    if (ok) {
      *word += static_cast<char>(c);
      *word += static_cast<char>(d);
      return 2;
    }
  }
  if (lang == Lang::CS && i + 1 < text.size() &&
      (c == 0xC3 || c == 0xC4 || c == 0xC5)) {
    unsigned char d = text[i + 1];
    bool ok = (c == 0xC3) || (c == 0xC4 && (d == 0x8D || d == 0x8C || d == 0x8F ||
                                            d == 0x8E || d == 0x9B || d == 0x9A ||
                                            d == 0xBE || d == 0xBD || d == 0xBA ||
                                            d == 0xB9)) ||
              (c == 0xC5 && (d == 0xA1 || d == 0xA0 || d == 0xBE || d == 0xBD ||
                             d == 0x99 || d == 0x98 || d == 0xA5 || d == 0xA4 ||
                             d == 0x88 || d == 0x87 || d == 0xAF || d == 0xAE));
    if (ok) {
      *word += static_cast<char>(c);
      *word += static_cast<char>(d);
      return 2;
    }
  }
  if (lang == Lang::RO && i + 1 < text.size() &&
      (c == 0xC3 || c == 0xC4 || c == 0xC5 || c == 0xC8)) {
    unsigned char d = text[i + 1];
    bool ok = (c == 0xC4 && (d == 0x83 || d == 0x82)) ||
              (c == 0xC3 && (d == 0xA2 || d == 0x82 || d == 0xAE || d == 0x8E)) ||
              (c == 0xC8 && (d == 0x99 || d == 0x98 || d == 0x9B || d == 0x9A)) ||
              (c == 0xC5 && (d == 0x9F || d == 0x9E || d == 0xA3 || d == 0xA2));
    if (ok) {
      *word += static_cast<char>(c);
      *word += static_cast<char>(d);
      return 2;
    }
  }
  if (lang == Lang::NL && c == 0xC3 && i + 1 < text.size()) {
    unsigned char d = text[i + 1];
    if (d == 0xAB || d == 0xAF || d == 0xA9 || d == 0xA8 || d == 0xB6 || d == 0xBC) {
      *word += static_cast<char>(0xC3);
      *word += static_cast<char>(d);
      return 2;
    }
  }
  if (lang == Lang::PL && i + 1 < text.size() &&
      (c == 0xC3 || c == 0xC4 || c == 0xC5)) {
    unsigned char d = text[i + 1];
    bool ok = (c == 0xC4 && (d == 0x85 || d == 0x84 || d == 0x87 || d == 0x86 ||
                             d == 0x99 || d == 0x98)) ||
              (c == 0xC5 && (d == 0x82 || d == 0x81 || d == 0x84 || d == 0x83 ||
                             d == 0x9B || d == 0x9A || d == 0xBA || d == 0xB9 ||
                             d == 0xBC || d == 0xBB)) ||
              (c == 0xC3 && (d == 0xB3 || d == 0x93));
    if (ok) {
      *word += static_cast<char>(c);
      *word += static_cast<char>(d);
      return 2;
    }
  }
  if (lang == Lang::TR && i + 1 < text.size() &&
      (c == 0xC3 || c == 0xC4 || c == 0xC5 || c == 0xC9 || c == 0xC6)) {
    unsigned char d = text[i + 1];
    bool ok = (c == 0xC4 && (d == 0xB0 || d == 0xB1 || d == 0x9E || d == 0x9F)) ||
              (c == 0xC5 && (d == 0x9E || d == 0x9F)) ||
              (c == 0xC9 && d == 0x99) || (c == 0xC6 && d == 0x8F) ||
              (c == 0xC3 && (d == 0xA7 || d == 0x87 || d == 0xB6 || d == 0x96 ||
                             d == 0xBC || d == 0x9C || d == 0xA2 || d == 0xAE || d == 0xBB));
    if (ok) {
      *word += static_cast<char>(c);
      *word += static_cast<char>(d);
      return 2;
    }
  }
  if (lang == Lang::PT && c == 0xC3 && i + 1 < text.size()) {
    unsigned char d = text[i + 1];
    if (d >= 0x80 && d <= 0xBC) {
      *word += static_cast<char>(0xC3);
      *word += static_cast<char>(d);
      return 2;
    }
  }
  if (lang == Lang::IT && c == 0xC3 && i + 1 < text.size()) {
    unsigned char d = text[i + 1];
    // accented vowels pass through; phonemize_word_it folds them.
    if ((d >= 0x80 && d <= 0xBA)) {
      *word += static_cast<char>(0xC3);
      *word += static_cast<char>(d);
      return 2;
    }
  }
  if (lang == Lang::DE && c == 0xC3 && i + 1 < text.size()) {
    unsigned char d = text[i + 1];
    // ä ö ü ß (uppercase folded); phonemize_word_de consumes the raw bytes.
    switch (d) {
      case 0x84: d = 0xA4; break;  // Ä→ä
      case 0x96: d = 0xB6; break;  // Ö→ö
      case 0x9C: d = 0xBC; break;  // Ü→ü
    }
    if (d == 0xA4 || d == 0xB6 || d == 0xBC || d == 0x9F) {
      *word += static_cast<char>(0xC3);
      *word += static_cast<char>(d);
      return 2;
    }
  }
  if (lang == Lang::ES && c == 0xC3 && i + 1 < text.size()) {
    unsigned char d = text[i + 1];
    // á é í ó ú ü ñ (plus uppercase forms folded to lowercase)
    switch (d) {
      case 0x81: d = 0xA1; break;  // Á→á
      case 0x89: d = 0xA9; break;  // É→é
      case 0x8D: d = 0xAD; break;  // Í→í
      case 0x93: d = 0xB3; break;  // Ó→ó
      case 0x9A: d = 0xBA; break;  // Ú→ú
      case 0x9C: d = 0xBC; break;  // Ü→ü
      case 0x91: d = 0xB1; break;  // Ñ→ñ
    }
    if (d == 0xA1 || d == 0xA9 || d == 0xAD || d == 0xB3 || d == 0xBA ||
        d == 0xBC || d == 0xB1) {
      *word += static_cast<char>(0xC3);
      *word += static_cast<char>(d);
      return 2;
    }
  }
  return 0;
}

const char* phonemize_text(const char* utf8_text, Lang lang) {
  if (!utf8_text) return nullptr;
  std::string text(utf8_text);
  std::string result;
  std::string word;

  auto flush = [&]() {
    if (!word.empty()) {
      switch (lang) {
        case Lang::ES: result += phonemize_word_es(word); break;
        case Lang::DE: result += phonemize_word_de(word); break;
        case Lang::IT: result += phonemize_word_it(word); break;
        case Lang::FR: result += phonemize_word_fr(word); break;
        case Lang::PT: result += phonemize_word_pt(word); break;
        case Lang::TR: result += phonemize_word_tr(word); break;
        case Lang::PL: result += phonemize_word_pl(word); break;
        case Lang::NL: result += phonemize_word_nl(word); break;
        case Lang::CS: result += phonemize_word_cs(word); break;
        case Lang::RO: result += phonemize_word_ro(word); break;
        case Lang::FI: result += phonemize_word_fi(word); break;
        case Lang::HU: result += phonemize_word_hu(word); break;
        case Lang::ID: result += phonemize_word_id(word); break;
        case Lang::SW: result += phonemize_word_sw(word); break;
        case Lang::HR: result += phonemize_word_hr(word); break;
        case Lang::EO: result += phonemize_word_eo(word); break;
        case Lang::EU: result += phonemize_word_eu(word); break;
        case Lang::LV: result += phonemize_word_lv(word); break;
        case Lang::CY: result += phonemize_word_cy(word); break;
        case Lang::SV: result += phonemize_word_sv(word); break;
        case Lang::NB: result += phonemize_word_nb(word); break;
        case Lang::DA: result += phonemize_word_da(word); break;
        default: result += phonemize_word(word); break;
      }
      word.clear();
    }
  };

  for (size_t i = 0; i < text.size();) {
    size_t n = take_letter(text, i, lang, &word);
    if (n) { i += n; continue; }
    unsigned char c = text[i];
    flush();
    if (strchr(";:,.!?()\"- ", c)) {
      if (!(c == ' ' && !result.empty() && result.back() == ' '))
        result += static_cast<char>(c);
    }
    // other bytes dropped (digits are expanded to words by the Python
    // normalizer before reaching this library)
    ++i;
  }
  flush();

  char* buf = static_cast<char*>(malloc(result.size() + 1));
  memcpy(buf, result.c_str(), result.size() + 1);
  return buf;
}

}  // namespace

extern "C" {

int ztx_version() { return 21; }

// Phonemize UTF-8 text in the given language ("en", "en-us", "es", ...).
// Returns nullptr for unsupported languages (caller falls back). Returned
// buffer is malloc'd; free with ztx_free.

// Polytonic Greek (U+1F00-1FFF) → monotonic with tonos. Each Greek-Extended
// block is one base vowel; breathings/iota-subscript drop, any of
// oxia/varia/perispomeni marks the accented syllable (tonos form).
std::string fold_polytonic(const char* utf8_text) {
  std::string in(utf8_text), out;
  auto put_cp = [&](unsigned int cp) {
    if (cp < 0x80) { out += static_cast<char>(cp); return; }
    if (cp < 0x800) {
      out += static_cast<char>(0xC0 | (cp >> 6));
      out += static_cast<char>(0x80 | (cp & 0x3F));
      return;
    }
    out += static_cast<char>(0xE0 | (cp >> 12));
    out += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
    out += static_cast<char>(0x80 | (cp & 0x3F));
  };
  // (plain lowercase, tonos lowercase) per vowel.
  static const unsigned int kVow[7][2] = {
    {0x03B1, 0x03AC},  // α ά
    {0x03B5, 0x03AD},  // ε έ
    {0x03B7, 0x03AE},  // η ή
    {0x03B9, 0x03AF},  // ι ί
    {0x03BF, 0x03CC},  // ο ό
    {0x03C5, 0x03CD},  // υ ύ
    {0x03C9, 0x03CE},  // ω ώ
  };
  for (size_t i = 0; i < in.size();) {
    unsigned char c = in[i];
    unsigned int cp = 0; size_t len = 1;
    if (c < 0x80) { cp = c; }
    else if ((c >> 5) == 0x6 && i + 1 < in.size()) {
      cp = ((c & 0x1F) << 6) | (in[i+1] & 0x3F); len = 2;
    } else if ((c >> 4) == 0xE && i + 2 < in.size()) {
      cp = ((c & 0x0F) << 12) | ((in[i+1] & 0x3F) << 6) | (in[i+2] & 0x3F); len = 3;
    } else if ((c >> 3) == 0x1E && i + 3 < in.size()) { len = 4; }
    if (cp >= 0x1F00 && cp <= 0x1FFF) {
      unsigned int off = cp - 0x1F00;
      int vowel = -1; bool accented = false;
      if (off < 0x70) {
        // blocks of 16 (lower 8 + capital 8): α ε η ι ο υ ω
        vowel = off / 16;
        accented = (off & 7) >= 4;  // oxia or perispomeni forms
      } else if (off < 0x7E) {
        // bare accent pairs ὰά ὲέ ὴή ὶί ὸό ὺύ ὼώ (1F7E/1F7F unassigned)
        vowel = (off - 0x70) / 2;
        accented = true;
      } else if (off < 0x80) {
        // unassigned codepoints: drop
      } else if (off < 0xB0) {
        // iota-subscript series: α(80-8F) η(90-9F) ω(A0-AF)
        vowel = (off < 0x90) ? 0 : (off < 0xA0) ? 2 : 6;
        accented = (off & 7) >= 4;
      } else {
        switch (cp) {
          case 0x1FB0: case 0x1FB1: case 0x1FB3: vowel = 0; break;
          case 0x1FB2: case 0x1FB4: case 0x1FB6: case 0x1FB7: vowel = 0; accented = true; break;
          case 0x1FC3: vowel = 2; break;
          case 0x1FC2: case 0x1FC4: case 0x1FC6: case 0x1FC7: vowel = 2; accented = true; break;
          case 0x1FD0: case 0x1FD1: vowel = 3; break;
          case 0x1FD2: case 0x1FD3: case 0x1FD6: case 0x1FD7: vowel = 3; accented = true; break;
          case 0x1FE0: case 0x1FE1: vowel = 5; break;
          case 0x1FE2: case 0x1FE3: case 0x1FE6: case 0x1FE7: vowel = 5; accented = true; break;
          case 0x1FE4: case 0x1FE5: put_cp(0x03C1); i += len; continue;  // ῤ ῥ → ρ
          case 0x1FEC: put_cp(0x03C1); i += len; continue;               // Ῥ
          case 0x1FF3: vowel = 6; break;
          case 0x1FF2: case 0x1FF4: case 0x1FF6: case 0x1FF7: vowel = 6; accented = true; break;
          // capital bare-accent forms and stray marks: best-effort bases
          case 0x1FBA: case 0x1FBB: vowel = 0; accented = true; break;
          case 0x1FC8: case 0x1FC9: vowel = 1; accented = true; break;
          case 0x1FCA: case 0x1FCB: vowel = 2; accented = true; break;
          case 0x1FDA: case 0x1FDB: vowel = 3; accented = true; break;
          case 0x1FF8: case 0x1FF9: vowel = 4; accented = true; break;
          case 0x1FEA: case 0x1FEB: vowel = 5; accented = true; break;
          case 0x1FFA: case 0x1FFB: vowel = 6; accented = true; break;
          default: break;  // breathing/accent spacing marks: dropped
        }
      }
      if (vowel >= 0) put_cp(kVow[vowel][accented ? 1 : 0]);
      i += len;
      continue;
    }
    out.append(in, i, len);
    i += len;
  }
  return out;
}

const char* ztx_phonemize_lang(const char* utf8_text, const char* lang) {
  if (!lang) return nullptr;
  if (strncmp(lang, "en", 2) == 0) return phonemize_text(utf8_text, Lang::EN);
  if (strncmp(lang, "es", 2) == 0) return phonemize_text(utf8_text, Lang::ES);
  if (strncmp(lang, "de", 2) == 0) return phonemize_text(utf8_text, Lang::DE);
  if (strncmp(lang, "it", 2) == 0) return phonemize_text(utf8_text, Lang::IT);
  if (strncmp(lang, "fr", 2) == 0) return phonemize_text(utf8_text, Lang::FR);
  if (strncmp(lang, "pt", 2) == 0) return phonemize_text(utf8_text, Lang::PT);
  if (strncmp(lang, "ru", 2) == 0) return phonemize_text_ru(utf8_text);
  if (strncmp(lang, "tr", 2) == 0) return phonemize_text(utf8_text, Lang::TR);
  if (strncmp(lang, "pl", 2) == 0) return phonemize_text(utf8_text, Lang::PL);
  if (strncmp(lang, "nl", 2) == 0) return phonemize_text(utf8_text, Lang::NL);
  if (strncmp(lang, "cs", 2) == 0) return phonemize_text(utf8_text, Lang::CS);
  if (strncmp(lang, "ro", 2) == 0) return phonemize_text(utf8_text, Lang::RO);
  if (strncmp(lang, "fi", 2) == 0) return phonemize_text(utf8_text, Lang::FI);
  if (strncmp(lang, "hu", 2) == 0) return phonemize_text(utf8_text, Lang::HU);
  if (strncmp(lang, "grc", 3) == 0) {
    // Ancient Greek: fold polytonic accents to monotonic (oxia/perispomeni
    // → tonos, so the el engine still gets EXACT stress), then read with
    // the standard modern-Greek values.
    std::string folded = fold_polytonic(utf8_text);
    return phonemize_text_el(folded.c_str());
  }
  if (strncmp(lang, "el", 2) == 0) return phonemize_text_el(utf8_text);
  if (strncmp(lang, "kok", 3) == 0) {
    // Konkani (Devanagari) — must match BEFORE the bare "ko" Korean check.
    static const BrahmicCfg kKok = {0x0900, "ə", true, false, 1};
    return phonemize_text_brahmic(utf8_text, kKok);
  }
  if (strncmp(lang, "ko", 2) == 0) return phonemize_text_ko(utf8_text);
  if (strncmp(lang, "id", 2) == 0 || strncmp(lang, "ms", 2) == 0)
    return phonemize_text(utf8_text, Lang::ID);
  if (strncmp(lang, "sw", 2) == 0) return phonemize_text(utf8_text, Lang::SW);
  if (strncmp(lang, "uk", 2) == 0) return phonemize_text_cyrillic(utf8_text, 0);
  if (strncmp(lang, "bg", 2) == 0) return phonemize_text_cyrillic(utf8_text, 1);
  if (strncmp(lang, "sr", 2) == 0) {
    // Serbian is digraphic: route by the script actually present.
    for (const unsigned char* p = (const unsigned char*)utf8_text; p && *p; ++p)
      if (*p >= 0xD0 && *p <= 0xD3)
        return phonemize_text_cyrillic(utf8_text, 3);
    return phonemize_text(utf8_text, Lang::HR);
  }
  if (strncmp(lang, "hr", 2) == 0 || strncmp(lang, "bs", 2) == 0 ||
      strncmp(lang, "sl", 2) == 0)
    return phonemize_text(utf8_text, Lang::HR);
  if (strncmp(lang, "sk", 2) == 0) return phonemize_text(utf8_text, Lang::CS);
  if (strncmp(lang, "et", 2) == 0) return phonemize_text(utf8_text, Lang::FI);
  if (strncmp(lang, "az", 2) == 0) return phonemize_text(utf8_text, Lang::TR);
  if (strncmp(lang, "eo", 2) == 0) return phonemize_text(utf8_text, Lang::EO);
  if (strncmp(lang, "eu", 2) == 0) return phonemize_text(utf8_text, Lang::EU);
  if (strncmp(lang, "mk", 2) == 0) return phonemize_text_cyrillic(utf8_text, 2);
  if (strncmp(lang, "ka", 2) == 0) return phonemize_text_ka(utf8_text);
  if (strncmp(lang, "hy", 2) == 0) return phonemize_text_hy(utf8_text);
  if (strncmp(lang, "lv", 2) == 0) return phonemize_text(utf8_text, Lang::LV);
  if (strncmp(lang, "vi", 2) == 0) return phonemize_text_vi(utf8_text);
  if (strncmp(lang, "sv", 2) == 0) return phonemize_text(utf8_text, Lang::SV);
  if (strncmp(lang, "nb", 2) == 0 || strncmp(lang, "nn", 2) == 0 ||
      strncmp(lang, "no", 2) == 0)
    return phonemize_text(utf8_text, Lang::NB);
  if (strncmp(lang, "da", 2) == 0) return phonemize_text(utf8_text, Lang::DA);
  {
    // Table-driven Latin engines (generic longest-match rule machine).
    struct LatEntry { const char* code; LatCfg cfg; };
    static const LatEntry kLatin[] = {
      {"mi",  {kMiRules,  sizeof(kMiRules)/sizeof(LatRule),  LatStress::PENULT}},
      {"la",  {kLaRules,  sizeof(kLaRules)/sizeof(LatRule),  LatStress::PENULT}},
      {"sq",  {kSqRules,  sizeof(kSqRules)/sizeof(LatRule),  LatStress::PENULT}},
      {"mt",  {kMtRules,  sizeof(kMtRules)/sizeof(LatRule),  LatStress::PENULT}},
      {"af",  {kAfRules,  sizeof(kAfRules)/sizeof(LatRule),  LatStress::FIRST}},
      {"is",  {kIsRules,  sizeof(kIsRules)/sizeof(LatRule),  LatStress::FIRST}},
      {"ca",  {kCaRules,  sizeof(kCaRules)/sizeof(LatRule),  LatStress::PENULT}},
      {"ht",  {kHtRules,  sizeof(kHtRules)/sizeof(LatRule),  LatStress::FINAL}},
      {"pap", {kPapRules, sizeof(kPapRules)/sizeof(LatRule), LatStress::PENULT}},
      {"gn",  {kGnRules,  sizeof(kGnRules)/sizeof(LatRule),  LatStress::FINAL}},
      {"uz",  {kUzRules,  sizeof(kUzRules)/sizeof(LatRule),  LatStress::FINAL}},
      {"ku",  {kKuRules,  sizeof(kKuRules)/sizeof(LatRule),  LatStress::FINAL}},
      {"tn",  {kTnRules,  sizeof(kTnRules)/sizeof(LatRule),  LatStress::PENULT}},
      {"om",  {kOmRules,  sizeof(kOmRules)/sizeof(LatRule),  LatStress::PENULT}},
      {"ia",  {kIaRules,  sizeof(kIaRules)/sizeof(LatRule),  LatStress::PENULT}},
      {"lfn", {kLfnRules, sizeof(kLfnRules)/sizeof(LatRule), LatStress::PENULT}},
      {"jbo", {kJboRules, sizeof(kJboRules)/sizeof(LatRule), LatStress::PENULT}},
      {"lt",  {kLtRules,  sizeof(kLtRules)/sizeof(LatRule),  LatStress::PENULT}},
      {"kl",  {kKlRules,  sizeof(kKlRules)/sizeof(LatRule),  LatStress::FIRST}},
      {"an",  {kAnRules,  sizeof(kAnRules)/sizeof(LatRule),  LatStress::PENULT}},
      {"quc", {kQucRules, sizeof(kQucRules)/sizeof(LatRule), LatStress::FINAL}},
      {"nci", {kNciRules, sizeof(kNciRules)/sizeof(LatRule), LatStress::PENULT}},
      {"py",  {kPyRules,  sizeof(kPyRules)/sizeof(LatRule),  LatStress::PENULT}},
    };
    for (const auto& e : kLatin) {
      size_t cl = strlen(e.code);
      if (strncmp(lang, e.code, cl) == 0 &&
          (lang[cl] == '\0' || lang[cl] == '-'))
        return phonemize_text_latin(utf8_text, e.cfg);
    }
  }
  {
    struct TE { const char* code; CyrTCfg cfg; };
    static const TE kTurkic[] = {
      {"kk", {kKkExtra, sizeof(kKkExtra)/sizeof(CyrT)}},
      {"ky", {kKyExtra, sizeof(kKyExtra)/sizeof(CyrT)}},
      {"tt", {kTtExtra, sizeof(kTtExtra)/sizeof(CyrT)}},
      {"ba", {kBaExtra, sizeof(kBaExtra)/sizeof(CyrT)}},
    };
    for (const auto& e : kTurkic)
      if (strncmp(lang, e.code, 2) == 0 && (lang[2] == '\0' || lang[2] == '-'))
        return phonemize_text_cyrillic_turkic(utf8_text, e.cfg);
  }
  if (strncmp(lang, "am", 2) == 0) return phonemize_text_am(utf8_text);
  if (strncmp(lang, "ga", 2) == 0) return phonemize_text_goidelic(utf8_text, false);
  if (strncmp(lang, "gd", 2) == 0) return phonemize_text_goidelic(utf8_text, true);
  if (strncmp(lang, "si", 2) == 0) return phonemize_text_si(utf8_text);
  if (strncmp(lang, "my", 2) == 0 || strncmp(lang, "shn", 3) == 0)
    return phonemize_text_my(utf8_text, strncmp(lang, "shn", 3) == 0);
  if (strncmp(lang, "fa-latn", 7) == 0) return phonemize_text_falatn(utf8_text);
  if (strncmp(lang, "fa", 2) == 0) {
    static const PACfg kFa = {0};
    return phonemize_text_perso_arabic(utf8_text, kFa);
  }
  if (strncmp(lang, "ur", 2) == 0 || strncmp(lang, "sd", 2) == 0) {
    // Sindhi shares the Urdu letter values (its implosive-specific letters
    // decode through the shared consonant skeleton).
    static const PACfg kUr = {1};
    return phonemize_text_perso_arabic(utf8_text, kUr);
  }
  if (strncmp(lang, "ar", 2) == 0) {
    static const PACfg kAr = {2};
    return phonemize_text_perso_arabic(utf8_text, kAr);
  }
  {
    // Brahmic family: one ISCII-aligned decoder per Unicode block.
    static const struct { const char* code; BrahmicCfg cfg; } kBrahmic[] = {
      {"hi", {0x0900, "\u0259", true,  false, 1}},  // Hindi (Devanagari, schwa del.)
      {"mr", {0x0900, "\u0259", true,  false, 1}},  // Marathi
      {"ne", {0x0900, "\u0259", true,  false, 1}},  // Nepali
      {"bn", {0x0980, "\u0254", true,  false, 2}},  // Bengali (fixed initial stress)
      {"bpy", {0x0980, "\u0254", true, false, 2}},  // Bishnupriya (Bengali script)
      {"as", {0x0980, "\u0254", true,  false, 2}},  // Assamese (Bengali script)
      {"pa", {0x0A00, "\u0259", true,  false, 1}},  // Punjabi (Gurmukhi)
      {"gu", {0x0A80, "\u0259", true,  false, 1}},  // Gujarati
      {"or", {0x0B00, "\u0254", false, false, 2}},  // Odia (initial stress, keeps inherent vowel)
      {"ta", {0x0B80, "a", false, true,  2}},        // Tamil (positional voicing)
      {"te", {0x0C00, "a", false, false, 2}},        // Telugu
      {"kn", {0x0C80, "a", false, false, 2}},        // Kannada
      {"ml", {0x0D00, "a", false, false, 2}},        // Malayalam
    };
    for (const auto& e : kBrahmic)
      if (strncmp(lang, e.code, 2) == 0)
        return phonemize_text_brahmic(utf8_text, e.cfg);
  }
  if (strncmp(lang, "cy", 2) == 0) return phonemize_text(utf8_text, Lang::CY);
  return nullptr;
}

// Back-compat: English.
const char* ztx_phonemize(const char* utf8_text) {
  return phonemize_text(utf8_text, Lang::EN);
}

void ztx_free(const char* p) { free(const_cast<char*>(p)); }

}  // extern "C"

#ifdef ZTX_FUZZ_MAIN
// Sanitizer fuzz driver (not part of the library build):
//   g++ -O1 -g -fsanitize=address,undefined -DZTX_FUZZ_MAIN g2p.cpp -o fuzz
//   ./fuzz < corpus.txt    (one input per line, run against every language)
#include <cstdio>
#include <ctime>

int main() {
  static const char* kCodes[] = {
    "en", "es", "de", "it", "fr", "pt", "ru", "tr", "pl", "nl", "cs", "ro",
    "fi", "hu", "el", "ko", "id", "sw", "uk", "bg", "hr", "sr", "sk", "et",
    "az", "eo", "eu", "mk", "ka", "hy", "lv", "cy", "vi", "sv", "nb", "da",
    "hi", "mr", "ne", "bn", "as", "pa", "gu", "or", "ta", "te", "kn", "ml",
    "fa", "fa-latn", "ur", "ar", "mi", "la", "sq", "mt", "af", "is", "ca",
    "ht", "pap", "gn", "uz", "ku", "tn", "om", "ia", "lfn", "jbo", "lt",
    "kl", "an", "kk", "ky", "tt", "ba", "am", "kok", "bpy", "sd", "grc",
    "quc", "nci", "ga", "gd", "si", "my", "shn",
  };
  char line[1 << 16];
  unsigned long n = 0;
  while (fgets(line, sizeof(line), stdin)) {
    for (const char* code : kCodes) {
      const char* out = ztx_phonemize_lang(line, code);
      if (out) ztx_free(out);
      ++n;
    }
  }
  // Random byte soup rounds (deterministic LCG).
  unsigned long seed = 12345;
  for (int round = 0; round < 200; ++round) {
    char buf[257];
    for (int i = 0; i < 256; ++i) {
      seed = seed * 6364136223846793005ULL + 1442695040888963407ULL;
      buf[i] = static_cast<char>((seed >> 33) | 1);  // avoid NUL
    }
    buf[256] = 0;
    for (const char* code : kCodes) {
      const char* out = ztx_phonemize_lang(buf, code);
      if (out) ztx_free(out);
      ++n;
    }
  }
  printf("fuzz ok: %lu invocations\n", n);
  return 0;
}
#endif  // ZTX_FUZZ_MAIN
