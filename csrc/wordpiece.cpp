// Native WordPiece tokenizer for bert_tpu.
//
// Host-side tokenization is the only part of the serving path that does not
// run on the TPU; at high request rates the Python tokenizer (~15 us/sent)
// caps throughput, so this C++ core (~1 us/sent) is used by
// bert_tpu/native.py via ctypes when built (csrc/Makefile), with the Python
// implementation as a always-available fallback.
//
// Semantics are IDENTICAL to bert_tpu/tokenizer.py (itself matching the
// reference bert.cpp:196-325 behavior, validated by shared golden + fuzz
// tests):
//   * accent fold over the fixed Latin-1 table, ASCII lowercase;
//   * word split into {single punct char | alpha run | digit run}, ASCII
//     only — other bytes are dropped;
//   * greedy longest-match, whole-word map for the first piece of a word,
//     ##-subword map afterwards (also after a skipped unknown char);
//   * unknown characters dropped (no [UNK]);
//   * emission stops at n_max_tokens-1, [SEP] always appended.
//
// Implementation notes (why this is not a translation): the splitter is a
// single-pass scanner over bytes (no <regex>), the matcher walks an
// unordered_map with string_view keys (no substr allocations), and the
// vocab is loaded once from a length-prefixed buffer handed over by Python
// in one call (no per-token FFI chatter).

#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
  std::unordered_map<std::string, int32_t> whole;
  std::unordered_map<std::string, int32_t> sub;
  int32_t cls_id = 101;
  int32_t sep_id = 102;
  size_t max_token_len = 1;
};

inline bool is_ascii_alpha(unsigned char c) {
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z');
}
inline bool is_ascii_digit(unsigned char c) { return c >= '0' && c <= '9'; }
inline bool is_ascii_punct(unsigned char c) {
  // printable, non-alnum, non-space ASCII (POSIX punct, C locale)
  return (c >= 0x21 && c <= 0x2F) || (c >= 0x3A && c <= 0x40) ||
         (c >= 0x5B && c <= 0x60) || (c >= 0x7B && c <= 0x7E);
}

// Latin-1 accent fold table: maps the UTF-8 two-byte sequences the
// reference folds (bert.cpp:209-219) to their ASCII base letter.
// Keyed by the second byte for lead bytes 0xC3 (and 0xC3 only — all table
// entries are U+00C0..U+00FF).
char accent_fold(unsigned char b2) {
  // U+00C0..U+00C5 À Á Â Ã Ä Å → A ; U+00E0..E5 → a
  static const struct { unsigned char lo, hi; char out; } ranges[] = {
      {0x80, 0x85, 'A'}, {0xA0, 0xA5, 'a'},  // À-Å à-å
      {0x88, 0x8B, 'E'}, {0xA8, 0xAB, 'e'},  // È-Ë è-ë
      {0x8C, 0x8F, 'I'}, {0xAC, 0xAF, 'i'},  // Ì-Ï ì-ï
      {0x92, 0x96, 'O'}, {0xB2, 0xB6, 'o'},  // Ò-Ö ò-ö
      {0x99, 0x9C, 'U'}, {0xB9, 0xBC, 'u'},  // Ù-Ü ù-ü
      {0x9D, 0x9D, 'Y'}, {0xBD, 0xBD, 'y'},  // Ý ý
      {0x87, 0x87, 'C'}, {0xA7, 0xA7, 'c'},  // Ç ç
      {0x91, 0x91, 'N'}, {0xB1, 0xB1, 'n'},  // Ñ ñ
  };
  for (const auto& r : ranges)
    if (b2 >= r.lo && b2 <= r.hi) return r.out;
  return 0;
}

inline size_t utf8_seq_len(unsigned char c) {
  if (c < 0x80) return 1;
  if (c < 0xE0) return 2;  // covers the 0xC0-0xDF lead range
  if (c < 0xF0) return 3;
  return 4;
}

// normalize: accent fold + ASCII lowercase. Non-foldable multi-byte chars
// are copied through (and later dropped by the splitter).
void normalize(std::string_view in, std::string& out) {
  out.clear();
  out.reserve(in.size());
  size_t i = 0;
  while (i < in.size()) {
    unsigned char c = in[i];
    size_t len = utf8_seq_len(c);
    if (len == 2 && c == 0xC3 && i + 1 < in.size()) {
      char folded = accent_fold((unsigned char)in[i + 1]);
      if (folded) {
        out.push_back(folded >= 'A' && folded <= 'Z' ? folded - 'A' + 'a'
                                                     : folded);
        i += 2;
        continue;
      }
    }
    if (len == 1) {
      out.push_back(c >= 'A' && c <= 'Z' ? c - 'A' + 'a' : c);
      i += 1;
    } else {
      size_t take = std::min(len, in.size() - i);
      out.append(in.substr(i, take));
      i += take;
    }
  }
}

int32_t lookup(const std::unordered_map<std::string, int32_t>& m,
               std::string_view key) {
  // reuse one thread-local key buffer: after warmup its capacity covers
  // every probe, so the hot greedy-match loop does no heap allocation
  thread_local std::string buf;
  buf.assign(key.data(), key.size());
  auto it = m.find(buf);
  return it == m.end() ? -1 : it->second;
}

// greedy longest-match over one word; appends to out, returns new count.
int match_word(const Vocab& v, std::string_view word, int32_t* out, int t,
               int cap) {
  size_t i = 0, n = word.size();
  const auto* map = &v.whole;
  while (i < n) {
    if (t >= cap - 1) break;
    size_t jmax = std::min(n, i + v.max_token_len);
    bool matched = false;
    for (size_t j = jmax; j > i; --j) {
      int32_t id = lookup(*map, word.substr(i, j - i));
      if (id >= 0) {
        out[t++] = id;
        i = j;
        map = &v.sub;
        matched = true;
        break;
      }
    }
    if (!matched) {
      map = &v.sub;  // unknown char: drop, switch to subword map
      ++i;
    }
  }
  return t;
}

}  // namespace

extern "C" {

// Vocab from one contiguous buffer: n entries of (uint32 len, bytes),
// id = entry index — the same framing as the ggml-bin vocab section.
void* wp_vocab_create(const uint8_t* buf, int64_t buf_len, int32_t n_tokens,
                      int32_t cls_id, int32_t sep_id) {
  auto* v = new Vocab;
  v->cls_id = cls_id;
  v->sep_id = sep_id;
  int64_t off = 0;
  for (int32_t i = 0; i < n_tokens; ++i) {
    if (off + 4 > buf_len) { delete v; return nullptr; }
    uint32_t len;
    std::memcpy(&len, buf + off, 4);
    off += 4;
    if (off + len > buf_len) { delete v; return nullptr; }
    std::string tok((const char*)(buf + off), len);
    off += len;
    if (tok.size() > v->max_token_len) v->max_token_len = tok.size();
    if (tok.size() > 2 && tok[0] == '#' && tok[1] == '#')
      v->sub.emplace(tok.substr(2), i);
    v->whole.emplace(tok, i);  // emplace keeps the first id (bert.cpp:397)
  }
  return v;
}

void wp_vocab_free(void* vocab) { delete (Vocab*)vocab; }

// text → token ids ([CLS] ... [SEP]); returns count (≤ n_max_tokens).
int32_t wp_tokenize(void* vocab, const char* text, int64_t text_len,
                    int32_t* out, int32_t n_max_tokens) {
  const Vocab& v = *(const Vocab*)vocab;
  if (n_max_tokens <= 0) return 0;
  if (n_max_tokens == 1) {  // degenerate cap: [CLS] only, never overflow
    out[0] = v.cls_id;
    return 1;
  }
  thread_local std::string norm;
  normalize(std::string_view(text, text_len), norm);

  int t = 0;
  out[t++] = v.cls_id;

  size_t i = 0, n = norm.size();
  while (i < n) {
    unsigned char c = norm[i];
    if (is_ascii_alpha(c)) {
      size_t j = i + 1;
      while (j < n && is_ascii_alpha((unsigned char)norm[j])) ++j;
      t = match_word(v, std::string_view(norm).substr(i, j - i), out, t,
                     n_max_tokens);
      i = j;
    } else if (is_ascii_digit(c)) {
      size_t j = i + 1;
      while (j < n && is_ascii_digit((unsigned char)norm[j])) ++j;
      t = match_word(v, std::string_view(norm).substr(i, j - i), out, t,
                     n_max_tokens);
      i = j;
    } else if (is_ascii_punct(c)) {
      t = match_word(v, std::string_view(norm).substr(i, 1), out, t,
                     n_max_tokens);
      i += 1;
    } else {
      i += 1;  // whitespace / non-ASCII byte: dropped
    }
  }
  out[t++] = v.sep_id;
  return t;
}

// batch API: texts as length-prefixed buffer, outputs into a flat
// [n, n_max_tokens] int32 array; lengths into out_lens.
void wp_tokenize_batch(void* vocab, const uint8_t* texts, int64_t texts_len,
                       int32_t n_texts, int32_t* out, int32_t* out_lens,
                       int32_t n_max_tokens) {
  int64_t off = 0;
  for (int32_t i = 0; i < n_texts; ++i) {
    uint32_t len = 0;
    if (off + 4 <= texts_len) {
      std::memcpy(&len, texts + off, 4);
      off += 4;
    }
    if (off + len > texts_len) len = (uint32_t)(texts_len - off);
    out_lens[i] = wp_tokenize(vocab, (const char*)(texts + off), len,
                              out + (int64_t)i * n_max_tokens, n_max_tokens);
    off += len;
  }
}

}  // extern "C"
