"""BM25 keyword index — the sparse half of hybrid retrieval.

The reference ships ``rank-bm25`` in requirements and a hybrid
``semantic_weight: 0.7`` config (``config.yaml:65-66``,
``requirements.txt:20``) but never implements search. This is the
framework's own implementation: Okapi BM25 (k1=1.5, b=0.75) over a
CSR-style inverted index in numpy arrays — scoring a query touches only
the posting lists of its terms.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from pathlib import Path
from typing import Sequence

import numpy as np

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def bm25_tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


@dataclass
class _Postings:
    doc_ids: np.ndarray  # int32
    tfs: np.ndarray  # float32


class BM25Index:
    def __init__(self, k1: float = 1.5, b: float = 0.75) -> None:
        self.k1 = k1
        self.b = b
        self.vocab: dict[str, int] = {}
        self.postings: list[_Postings] = []
        self.doc_lens: np.ndarray | None = None
        self.avg_len: float = 0.0
        self.num_docs: int = 0

    @classmethod
    def build(cls, texts: Sequence[str], k1: float = 1.5, b: float = 0.75) -> "BM25Index":
        idx = cls(k1, b)
        term_docs: dict[str, dict[int, int]] = {}
        doc_lens = np.zeros(len(texts), np.float32)
        for doc_id, text in enumerate(texts):
            toks = bm25_tokenize(text)
            doc_lens[doc_id] = len(toks)
            for t in toks:
                term_docs.setdefault(t, {})
                term_docs[t][doc_id] = term_docs[t].get(doc_id, 0) + 1
        idx.doc_lens = doc_lens
        idx.avg_len = float(doc_lens.mean()) if len(texts) else 0.0
        idx.num_docs = len(texts)
        for term in sorted(term_docs):
            docs = term_docs[term]
            idx.vocab[term] = len(idx.postings)
            ids = np.fromiter(docs.keys(), np.int32, len(docs))
            tfs = np.fromiter(docs.values(), np.float32, len(docs))
            order = np.argsort(ids)
            idx.postings.append(_Postings(ids[order], tfs[order]))
        return idx

    def _idf(self, term_id: int) -> float:
        df = len(self.postings[term_id].doc_ids)
        return float(np.log((self.num_docs - df + 0.5) / (df + 0.5) + 1.0))

    def scores(self, query: str) -> np.ndarray:
        """Dense [num_docs] score vector (only matched docs nonzero)."""
        out = np.zeros(self.num_docs, np.float32)
        if self.num_docs == 0:
            return out
        norm = self.doc_lens / self.avg_len if self.avg_len else self.doc_lens
        for term in bm25_tokenize(query):
            tid = self.vocab.get(term)
            if tid is None:
                continue
            p = self.postings[tid]
            tf = p.tfs
            denom = tf + self.k1 * (1.0 - self.b + self.b * norm[p.doc_ids])
            out[p.doc_ids] += self._idf(tid) * tf * (self.k1 + 1.0) / denom
        return out

    def topk(self, query: str, k: int) -> tuple[np.ndarray, np.ndarray]:
        s = self.scores(query)
        k = min(k, self.num_docs)
        idx = np.argpartition(-s, k - 1)[:k] if k else np.array([], np.int64)
        order = np.argsort(-s[idx], kind="stable")
        idx = idx[order]
        return s[idx], idx

    # -- persistence (npz + vocab) ----------------------------------------

    def save(self, path: str | Path) -> None:
        # np.savez appends .npz when missing; normalize so save/load
        # accept the same path
        path = Path(path)
        if path.suffix != ".npz":
            path = path.with_suffix(path.suffix + ".npz")
        path.parent.mkdir(parents=True, exist_ok=True)
        flat_ids = np.concatenate([p.doc_ids for p in self.postings]) if self.postings else np.zeros(0, np.int32)
        flat_tfs = np.concatenate([p.tfs for p in self.postings]) if self.postings else np.zeros(0, np.float32)
        offsets = np.cumsum([0] + [len(p.doc_ids) for p in self.postings]).astype(np.int64)
        np.savez_compressed(
            path,
            terms=np.array(list(self.vocab.keys())),
            flat_ids=flat_ids,
            flat_tfs=flat_tfs,
            offsets=offsets,
            doc_lens=self.doc_lens,
            meta=np.array([self.k1, self.b, self.avg_len, self.num_docs], np.float64),
        )

    @classmethod
    def load(cls, path: str | Path) -> "BM25Index":
        path = Path(path)
        if path.suffix != ".npz" and not path.exists():
            path = path.with_suffix(path.suffix + ".npz")
        z = np.load(path, allow_pickle=False)
        k1, b, avg_len, num_docs = z["meta"]
        idx = cls(float(k1), float(b))
        idx.avg_len = float(avg_len)
        idx.num_docs = int(num_docs)
        idx.doc_lens = z["doc_lens"]
        offsets = z["offsets"]
        flat_ids, flat_tfs = z["flat_ids"], z["flat_tfs"]
        for i, term in enumerate(z["terms"]):
            idx.vocab[str(term)] = i
            s, e = offsets[i], offsets[i + 1]
            idx.postings.append(_Postings(flat_ids[s:e], flat_tfs[s:e]))
        return idx
