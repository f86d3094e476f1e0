// Fast WordPiece tokenizer — the host-side data loader for the TPU
// embed path.
//
// The reference's tokenization runs inside sentence-transformers, one
// torch worker process per core (generate_embeddings_parallel.py:40-74).
// Here a single C++ encoder saturates the host: UTF-8 aware basic
// tokenization (clean → whitespace → punctuation/CJK split → lowercase
// + Latin accent folding) followed by greedy longest-match WordPiece,
// multithreaded across batch rows. Exposed as a C ABI for ctypes.
//
// Semantics parity target: arxiv_rag_tpu/tokenize/wordpiece.py
// (tested in tests/test_native_tokenizer.py over ASCII, accents,
// punctuation, CJK, long-word-overflow cases).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <string_view>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
    std::unordered_map<std::string, int32_t> map;
    int32_t cls_id = -1, sep_id = -1, pad_id = -1, unk_id = -1;
    bool lowercase = true;
    int max_chars_per_word = 100;
};

// ---- UTF-8 ----------------------------------------------------------------

// Decode one codepoint; advances i. Invalid bytes decode as U+FFFD.
inline uint32_t decode_utf8(const std::string_view s, size_t& i) {
    const unsigned char c = s[i];
    if (c < 0x80) { i += 1; return c; }
    if ((c >> 5) == 0x6 && i + 1 < s.size()) {
        uint32_t cp = ((c & 0x1F) << 6) | (s[i + 1] & 0x3F);
        i += 2; return cp;
    }
    if ((c >> 4) == 0xE && i + 2 < s.size()) {
        uint32_t cp = ((c & 0x0F) << 12) | ((s[i + 1] & 0x3F) << 6) | (s[i + 2] & 0x3F);
        i += 3; return cp;
    }
    if ((c >> 3) == 0x1E && i + 3 < s.size()) {
        uint32_t cp = ((c & 0x07) << 18) | ((s[i + 1] & 0x3F) << 12) |
                      ((s[i + 2] & 0x3F) << 6) | (s[i + 3] & 0x3F);
        i += 4; return cp;
    }
    i += 1; return 0xFFFD;
}

inline void append_utf8(std::string& out, uint32_t cp) {
    if (cp < 0x80) out.push_back(static_cast<char>(cp));
    else if (cp < 0x800) {
        out.push_back(static_cast<char>(0xC0 | (cp >> 6)));
        out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
    } else if (cp < 0x10000) {
        out.push_back(static_cast<char>(0xE0 | (cp >> 12)));
        out.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
        out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
    } else {
        out.push_back(static_cast<char>(0xF0 | (cp >> 18)));
        out.push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3F)));
        out.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
        out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
    }
}

// ---- character classes -----------------------------------------------------

inline bool is_ws(uint32_t cp) {
    return cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' ||
           cp == 0x00A0 || cp == 0x2000 || (cp >= 0x2000 && cp <= 0x200A) ||
           cp == 0x202F || cp == 0x205F || cp == 0x3000;
}

inline bool is_control(uint32_t cp) {
    if (cp == '\t' || cp == '\n' || cp == '\r') return false;
    return cp < 0x20 || cp == 0x7F || (cp >= 0x80 && cp <= 0x9F) ||
           (cp >= 0x200B && cp <= 0x200F) || cp == 0xFEFF;
}

inline bool is_punct(uint32_t cp) {
    if ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
        (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)) return true;
    // general punctuation, CJK punctuation, fullwidth forms
    return (cp >= 0x2010 && cp <= 0x2027) || (cp >= 0x2030 && cp <= 0x205E) ||
           (cp >= 0x3001 && cp <= 0x303F) || (cp >= 0xFF01 && cp <= 0xFF0F) ||
           (cp >= 0xFF1A && cp <= 0xFF20) || (cp >= 0xFF3B && cp <= 0xFF40) ||
           (cp >= 0xFF5B && cp <= 0xFF65) || cp == 0x00A1 || cp == 0x00BF ||
           cp == 0x00AB || cp == 0x00BB;
}

inline bool is_cjk(uint32_t cp) {
    return (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
           (cp >= 0x20000 && cp <= 0x2A6DF) || (cp >= 0x2A700 && cp <= 0x2B73F) ||
           (cp >= 0x2B740 && cp <= 0x2B81F) || (cp >= 0x2B820 && cp <= 0x2CEAF) ||
           (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x2F800 && cp <= 0x2FA1F);
}

// Latin-1 / Latin-Extended-A accent folding + lowercase for the common
// scientific-text alphabet. Returns 0 to drop (combining marks).
inline uint32_t fold(uint32_t cp, bool lowercase) {
    if (cp < 0x80) return lowercase && cp >= 'A' && cp <= 'Z' ? cp + 32 : cp;
    if (cp >= 0x0300 && cp <= 0x036F) return 0;  // combining marks
    // Latin-1 supplement accents
    static const struct { uint32_t lo, hi; char base; } kRanges[] = {
        {0xC0, 0xC5, 'a'}, {0xC8, 0xCB, 'e'}, {0xCC, 0xCF, 'i'},
        {0xD2, 0xD6, 'o'}, {0xD9, 0xDC, 'u'},
        {0xE0, 0xE5, 'a'}, {0xE8, 0xEB, 'e'}, {0xEC, 0xEF, 'i'},
        {0xF2, 0xF6, 'o'}, {0xF9, 0xFC, 'u'},
    };
    for (const auto& r : kRanges)
        if (cp >= r.lo && cp <= r.hi) return static_cast<uint32_t>(r.base);
    switch (cp) {
        case 0xC7: case 0xE7: return 'c';
        case 0xD1: case 0xF1: return 'n';
        case 0xDD: case 0xFD: case 0xFF: return 'y';
    }
    // Latin Extended-A: strip to ASCII base letter (pairs: upper, lower)
    if (cp >= 0x100 && cp <= 0x17F) {
        static const char* bases =
            "aaaaaaccccccccddddeeeeeeeeeegggggggghhhhiiiiiiiiiijjkkklllllllll"
            "lnnnnnnnnnoooooooorrrrrrssssssssttttttuuuuuuuuuuuuwwyyyzzzzzzs";
        size_t idx = cp - 0x100;
        if (idx < std::strlen(bases)) return static_cast<uint32_t>(bases[idx]);
    }
    if (lowercase && cp >= 0x391 && cp <= 0x3A9) return cp + 32;  // Greek upper
    return cp;
}

// ---- tokenization ----------------------------------------------------------

void basic_tokenize(const Vocab& v, std::string_view text,
                    std::vector<std::string>& words) {
    std::string word;
    size_t i = 0;
    auto flush = [&]() {
        if (!word.empty()) { words.push_back(word); word.clear(); }
    };
    while (i < text.size()) {
        uint32_t cp = decode_utf8(text, i);
        if (cp == 0 || cp == 0xFFFD || is_control(cp)) continue;
        if (is_ws(cp)) { flush(); continue; }
        cp = fold(cp, v.lowercase);
        if (cp == 0) continue;
        if (is_cjk(cp) || is_punct(cp)) {
            flush();
            std::string one;
            append_utf8(one, cp);
            words.push_back(std::move(one));
            continue;
        }
        append_utf8(word, cp);
    }
    flush();
}

void wordpiece(const Vocab& v, const std::string& word,
               std::vector<int32_t>& ids) {
    // count codepoints for the max-chars guard
    size_t ncp = 0;
    for (size_t i = 0; i < word.size();) { decode_utf8(word, i); ncp++; }
    if (ncp > static_cast<size_t>(v.max_chars_per_word)) {
        ids.push_back(v.unk_id);
        return;
    }
    size_t start = 0;
    std::string candidate;
    std::vector<int32_t> pieces;
    while (start < word.size()) {
        size_t end = word.size();
        int32_t found = -1;
        size_t found_end = 0;
        while (end > start) {
            candidate.clear();
            if (start > 0) candidate = "##";
            candidate.append(word, start, end - start);
            auto it = v.map.find(candidate);
            if (it != v.map.end()) { found = it->second; found_end = end; break; }
            // step back one UTF-8 codepoint
            do { end--; } while (end > start && (word[end] & 0xC0) == 0x80);
        }
        if (found < 0) { ids.push_back(v.unk_id); return; }  // whole word -> UNK
        pieces.push_back(found);
        start = found_end;
    }
    ids.insert(ids.end(), pieces.begin(), pieces.end());
}

void encode_one(const Vocab& v, std::string_view text, int max_len,
                int pad_to, int32_t* ids_row, int32_t* mask_row) {
    std::vector<std::string> words;
    basic_tokenize(v, text, words);
    std::vector<int32_t> ids;
    ids.reserve(max_len);
    ids.push_back(v.cls_id);
    for (const auto& w : words) {
        if (static_cast<int>(ids.size()) >= max_len - 1) break;
        wordpiece(v, w, ids);
    }
    if (static_cast<int>(ids.size()) > max_len - 1) ids.resize(max_len - 1);
    ids.push_back(v.sep_id);
    const int n = static_cast<int>(ids.size());
    for (int j = 0; j < pad_to; ++j) {
        ids_row[j] = j < n ? ids[j] : v.pad_id;
        mask_row[j] = j < n ? 1 : 0;
    }
}

}  // namespace

extern "C" {

void* wp_create(const char* vocab_path, const char* cls_tok, const char* sep_tok,
                const char* pad_tok, const char* unk_tok, int lowercase) {
    auto* v = new Vocab;
    v->lowercase = lowercase != 0;
    std::ifstream f(vocab_path);
    if (!f) { delete v; return nullptr; }
    std::string line;
    int32_t idx = 0;
    while (std::getline(f, line)) {
        if (!line.empty() && line.back() == '\r') line.pop_back();
        v->map.emplace(line, idx++);
    }
    auto get = [&](const char* t) -> int32_t {
        auto it = v->map.find(t);
        return it == v->map.end() ? -1 : it->second;
    };
    v->cls_id = get(cls_tok); v->sep_id = get(sep_tok);
    v->pad_id = get(pad_tok); v->unk_id = get(unk_tok);
    if (v->cls_id < 0 || v->sep_id < 0 || v->pad_id < 0 || v->unk_id < 0) {
        delete v; return nullptr;
    }
    return v;
}

void wp_destroy(void* handle) { delete static_cast<Vocab*>(handle); }

int wp_vocab_size(void* handle) {
    return static_cast<int>(static_cast<Vocab*>(handle)->map.size());
}

// texts: n UTF-8 strings with lengths; outputs are row-major [n, pad_to].
// n_threads <= 0 -> hardware_concurrency.
void wp_encode_batch(void* handle, const char** texts, const int64_t* lengths,
                     int n, int max_len, int pad_to, int n_threads,
                     int32_t* out_ids, int32_t* out_mask) {
    const auto& v = *static_cast<Vocab*>(handle);
    if (n_threads <= 0) {
        n_threads = static_cast<int>(std::thread::hardware_concurrency());
        if (n_threads <= 0) n_threads = 1;
    }
    n_threads = std::min(n_threads, n > 0 ? n : 1);
    auto work = [&](int t) {
        for (int r = t; r < n; r += n_threads) {
            encode_one(v, std::string_view(texts[r], static_cast<size_t>(lengths[r])),
                       max_len, pad_to,
                       out_ids + static_cast<int64_t>(r) * pad_to,
                       out_mask + static_cast<int64_t>(r) * pad_to);
        }
    };
    if (n_threads == 1) { work(0); return; }
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(work, t);
    for (auto& th : threads) th.join();
}

}  // extern "C"
