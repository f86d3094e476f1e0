// BM25 inverted-index builder — the native half of hybrid retrieval.
//
// The Python builder (arxiv_rag_tpu/search/bm25.py::BM25Index.build)
// walks every token through nested dicts: ~360M interpreter-level dict
// operations at the 2M-chunk target corpus (~180 tokens/chunk), minutes
// of build time on one core. This builder does the same construction in
// C++ over one concatenated UTF-8 buffer: tokenize ([a-z0-9]+ after
// ASCII lowercasing; non-ASCII bytes are separators, matching the
// Python regex on .lower()'ed text for all ASCII-representable tokens),
// count per (term, doc) in CSR order, export flat arrays.
//
// Known divergence vs Python, documented in search/bm25.py: code points
// whose str.lower() maps *into* ASCII (U+0130, U+212A) tokenize
// differently; they are separators here. Vanishingly rare in arXiv text.
//
// Reference ships rank-bm25 in requirements and never calls it
// (3-chunks/pipeline/requirements.txt:20, config.yaml:65-66); there is
// no reference implementation to mirror — this is the framework's own.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Postings {
  std::vector<int32_t> ids;
  std::vector<float> tfs;
};

struct Bm25Handle {
  std::vector<std::string> terms;  // insertion order
  std::vector<Postings> postings;
  std::vector<float> doc_lens;
  int64_t n_postings = 0;
  int64_t terms_bytes = 0;
};

}  // namespace

extern "C" {

void* arag_bm25_build(const char* buf, const int64_t* offsets, int64_t n_docs) {
  auto* h = new Bm25Handle();
  h->doc_lens.resize(static_cast<size_t>(n_docs));
  std::unordered_map<std::string, int32_t> vocab;
  vocab.reserve(1 << 20);
  std::string tok;
  tok.reserve(64);
  for (int64_t d = 0; d < n_docs; ++d) {
    const char* p = buf + offsets[d];
    const char* end = buf + offsets[d + 1];
    int64_t ntok = 0;
    tok.clear();
    auto flush = [&]() {
      if (tok.empty()) return;
      ++ntok;
      int32_t tid;
      auto it = vocab.find(tok);
      if (it == vocab.end()) {
        tid = static_cast<int32_t>(h->terms.size());
        vocab.emplace(tok, tid);
        h->terms.push_back(tok);
        h->terms_bytes += static_cast<int64_t>(tok.size());
        h->postings.emplace_back();
      } else {
        tid = it->second;
      }
      Postings& ps = h->postings[static_cast<size_t>(tid)];
      // docs arrive in increasing order, so per-term counting is O(1)
      // and posting lists come out sorted by construction
      if (!ps.ids.empty() && ps.ids.back() == static_cast<int32_t>(d)) {
        ps.tfs.back() += 1.0f;
      } else {
        ps.ids.push_back(static_cast<int32_t>(d));
        ps.tfs.push_back(1.0f);
        ++h->n_postings;
      }
      tok.clear();
    };
    for (; p != end; ++p) {
      unsigned char c = static_cast<unsigned char>(*p);
      if (c >= 'A' && c <= 'Z') c = static_cast<unsigned char>(c + 32);
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        tok.push_back(static_cast<char>(c));
      } else {
        flush();
      }
    }
    flush();
    h->doc_lens[static_cast<size_t>(d)] = static_cast<float>(ntok);
  }
  return h;
}

int64_t arag_bm25_num_terms(void* vh) {
  return static_cast<int64_t>(static_cast<Bm25Handle*>(vh)->terms.size());
}

int64_t arag_bm25_num_postings(void* vh) {
  return static_cast<Bm25Handle*>(vh)->n_postings;
}

int64_t arag_bm25_terms_bytes(void* vh) {
  return static_cast<Bm25Handle*>(vh)->terms_bytes;
}

// Fill caller-allocated arrays:
//   term_buf[terms_bytes]            concatenated term strings
//   term_offsets[num_terms + 1]      offsets into term_buf
//   flat_ids[num_postings]           CSR doc ids
//   flat_tfs[num_postings]           CSR term frequencies
//   posting_offsets[num_terms + 1]   CSR row offsets
//   doc_lens[n_docs]                 token count per doc
void arag_bm25_export(void* vh, char* term_buf, int64_t* term_offsets,
                      int32_t* flat_ids, float* flat_tfs,
                      int64_t* posting_offsets, float* doc_lens) {
  auto* h = static_cast<Bm25Handle*>(vh);
  int64_t toff = 0, poff = 0;
  for (size_t t = 0; t < h->terms.size(); ++t) {
    term_offsets[t] = toff;
    const std::string& s = h->terms[t];
    std::memcpy(term_buf + toff, s.data(), s.size());
    toff += static_cast<int64_t>(s.size());
    posting_offsets[t] = poff;
    const Postings& ps = h->postings[t];
    std::memcpy(flat_ids + poff, ps.ids.data(), ps.ids.size() * sizeof(int32_t));
    std::memcpy(flat_tfs + poff, ps.tfs.data(), ps.tfs.size() * sizeof(float));
    poff += static_cast<int64_t>(ps.ids.size());
  }
  term_offsets[h->terms.size()] = toff;
  posting_offsets[h->terms.size()] = poff;
  std::memcpy(doc_lens, h->doc_lens.data(), h->doc_lens.size() * sizeof(float));
}

void arag_bm25_free(void* vh) { delete static_cast<Bm25Handle*>(vh); }

// Batch Okapi BM25 top-k over exported CSR arrays (round-4: the hybrid
// serving path scored one query at a time in Python — at Q=512 windows
// on a 1-core host the per-query numpy loop bounded hybrid throughput).
// One call scores a whole window. Queries arrive pre-tokenized as
// vocab term ids (q_terms, CSR by q_offsets; duplicates = classic
// query-tf weighting, OOV terms already dropped by the caller).
//
// Per query: accumulate posting-list contributions into a dense
// scratch (first touch records the candidate), then partial-select the
// top k by (score desc, doc id asc) — deterministic tie order.
// Outputs: out_scores/out_ids are [n_queries, k] row-major;
// out_counts[q] = number of matched docs written (rest untouched).
void arag_bm25_score_topk(
    const int32_t* flat_ids, const float* flat_tfs,
    const int64_t* posting_offsets, const float* idf, const float* norm,
    int64_t num_docs, double k1, double b,
    const int32_t* q_terms, const int64_t* q_offsets, int64_t n_queries,
    int32_t k, float* out_scores, int64_t* out_ids, int32_t* out_counts) {
  std::vector<float> scratch(static_cast<size_t>(num_docs), 0.0f);
  std::vector<int32_t> touched;
  touched.reserve(1 << 16);
  const float k1f = static_cast<float>(k1);
  const float bf = static_cast<float>(b);
  for (int64_t q = 0; q < n_queries; ++q) {
    touched.clear();
    for (int64_t t = q_offsets[q]; t < q_offsets[q + 1]; ++t) {
      const int32_t tid = q_terms[t];
      const float w = idf[tid] * (k1f + 1.0f);
      for (int64_t j = posting_offsets[tid]; j < posting_offsets[tid + 1];
           ++j) {
        const int32_t d = flat_ids[j];
        const float tf = flat_tfs[j];
        if (scratch[static_cast<size_t>(d)] == 0.0f) touched.push_back(d);
        scratch[static_cast<size_t>(d)] +=
            w * tf / (tf + k1f * (1.0f - bf + bf * norm[d]));
      }
    }
    const int32_t kk =
        static_cast<int32_t>(std::min<size_t>(touched.size(),
                                              static_cast<size_t>(k)));
    auto better = [&](int32_t a, int32_t c) {
      const float sa = scratch[static_cast<size_t>(a)];
      const float sc = scratch[static_cast<size_t>(c)];
      if (sa != sc) return sa > sc;
      return a < c;
    };
    if (kk > 0) {
      std::nth_element(touched.begin(), touched.begin() + (kk - 1),
                       touched.end(), better);
      std::sort(touched.begin(), touched.begin() + kk, better);
      for (int32_t i = 0; i < kk; ++i) {
        out_scores[q * k + i] = scratch[static_cast<size_t>(touched[i])];
        out_ids[q * k + i] = touched[i];
      }
    }
    out_counts[q] = kk;
    for (const int32_t d : touched) scratch[static_cast<size_t>(d)] = 0.0f;
  }
}

}  // extern "C"
