// pgasr_bpe — native BPE segmentation for the host-side text pipeline.
//
// The Python tokenizer (pg_asr_tpu/data/bpe.py) replays the learned merge
// list per word; correct but interpreter-bound when encoding large corpora
// every epoch. This library implements the EXACT same semantics in C++
// (UTF-8 code-point splitting, in-order merge replay, unknown-token
// char fallback with unknown chars dropped) with a thread pool over
// sentences and a per-thread word->ids memo cache.
//
// Exposed C ABI:
//   pgasr_bpe_create(tokens[], n_tokens, left[], right[], n_merges) -> handle
//   pgasr_bpe_free(handle)
//   pgasr_bpe_encode_batch(handle, sentences[], n, out, stride, lens[],
//                          n_threads)                    -> 0 | -err
//
// out is an int32 (n, stride) row-major buffer; lens[i] holds the id count
// (truncated at stride). Sentences are whitespace-tokenized exactly like
// Python str.split().

#include <atomic>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr const char* kMarker = "\xE2\x96\x81";  // '▁' (U+2581)

struct Model {
  std::unordered_map<std::string, int> token_to_id;
  std::vector<std::pair<std::string, std::string>> merges;
};

// Split UTF-8 into code points (mirrors Python list(word)).
std::vector<std::string> utf8_chars(const std::string& s) {
  std::vector<std::string> out;
  size_t i = 0;
  while (i < s.size()) {
    unsigned char c = s[i];
    size_t n = (c < 0x80) ? 1 : (c < 0xE0) ? 2 : (c < 0xF0) ? 3 : 4;
    if (i + n > s.size()) n = 1;  // malformed tail: take the byte
    out.emplace_back(s.substr(i, n));
    i += n;
  }
  return out;
}

void merge_word(std::vector<std::string>& syms, const std::string& a,
                const std::string& b, const std::string& ab) {
  size_t w = 0;
  for (size_t i = 0; i < syms.size();) {
    if (i + 1 < syms.size() && syms[i] == a && syms[i + 1] == b) {
      syms[w++] = ab;
      i += 2;
    } else {
      if (w != i) syms[w] = std::move(syms[i]);
      ++w;
      ++i;
    }
  }
  syms.resize(w);
}

void encode_word(const Model& m, const std::string& word,
                 std::vector<int>* ids) {
  std::vector<std::string> syms;
  syms.emplace_back(kMarker);
  for (auto& ch : utf8_chars(word)) syms.emplace_back(ch);
  for (auto& pr : m.merges) {
    if (syms.size() < 2) break;
    merge_word(syms, pr.first, pr.second, pr.first + pr.second);
  }
  for (auto& tok : syms) {
    auto it = m.token_to_id.find(tok);
    if (it != m.token_to_id.end()) {
      ids->push_back(it->second);
    } else {  // unknown token: known chars kept, unknown chars dropped
      for (auto& ch : utf8_chars(tok)) {
        auto ci = m.token_to_id.find(ch);
        if (ci != m.token_to_id.end()) ids->push_back(ci->second);
      }
    }
  }
}

void encode_sentence(const Model& m, const char* sentence,
                     std::unordered_map<std::string, std::vector<int>>* cache,
                     int32_t* out, int stride, int32_t* len) {
  int n = 0;
  const char* p = sentence;
  std::string word;
  auto flush = [&]() {
    if (word.empty()) return;
    auto it = cache->find(word);
    if (it == cache->end()) {
      std::vector<int> ids;
      encode_word(m, word, &ids);
      it = cache->emplace(word, std::move(ids)).first;
    }
    for (int id : it->second)
      if (n < stride) out[n++] = id;
    word.clear();
  };
  for (; *p; ++p) {
    unsigned char c = *p;
    // Python str.split(): any ASCII whitespace separates words (the
    // normalizer collapses exotic whitespace to ' ' long before here)
    if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
        c == '\v') {
      flush();
    } else {
      word.push_back(*p);
    }
  }
  flush();
  *len = n;
}

}  // namespace

extern "C" {

void* pgasr_bpe_create(const char** tokens, int n_tokens,
                       const char** merge_left, const char** merge_right,
                       int n_merges) {
  auto* m = new Model();
  for (int i = 0; i < n_tokens; ++i) m->token_to_id[tokens[i]] = i;
  m->merges.reserve(n_merges);
  for (int i = 0; i < n_merges; ++i)
    m->merges.emplace_back(merge_left[i], merge_right[i]);
  return m;
}

void pgasr_bpe_free(void* h) { delete static_cast<Model*>(h); }

int pgasr_bpe_encode_batch(void* h, const char** sentences, int n,
                           int32_t* out, int stride, int32_t* lens,
                           int n_threads) {
  if (h == nullptr || n < 0 || stride <= 0) return -1;
  const Model& m = *static_cast<Model*>(h);
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n > 0 ? n : 1;
  std::atomic<int> next(0);
  auto worker = [&]() {
    std::unordered_map<std::string, std::vector<int>> cache;
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1))
      encode_sentence(m, sentences[i], &cache, out + size_t(i) * stride,
                      stride, lens + i);
  };
  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> ts;
    for (int t = 0; t < n_threads; ++t) ts.emplace_back(worker);
    for (auto& t : ts) t.join();
  }
  return 0;
}

}  // extern "C"
