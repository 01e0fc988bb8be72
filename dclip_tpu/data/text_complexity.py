"""Word-complexity scorer + [MASK] marking.

Reference semantics (training/text_tokenizer.py:53-119):
- token factor from CLIP subword count: 1 -> 0.0, 2 -> 0.3, 3 -> 0.6,
  4+ -> 0.8;
- semantic factor from word-vector neighborhoods: 1 - mean(top-5 neighbor
  cosine similarity); 0.9 if the word is out of vocabulary; only for words
  longer than 2 chars;
- blend 0.6 * token + 0.4 * semantic when vectors are available, else
  token factor alone;
- `mark_complex_words` replaces words scoring above the threshold
  (default 0.35) with "[MASK]".

Zero-egress: the reference downloads GloVe via gensim (:44); here word
vectors load from a local GloVe-format text file (`word vec...` per line)
when provided. Neighborhood similarity is computed with the same math
(top-5 cosine over the full vocabulary, batched numpy) — gensim is not
needed.
"""
from __future__ import annotations

import string
from typing import Dict, Optional

import numpy as np


class WordVectors:
    """Minimal GloVe-text-format word-vector table with top-k neighbors."""

    def __init__(self, vocab: Dict[str, int], matrix: np.ndarray):
        self.vocab = vocab
        norms = np.linalg.norm(matrix, axis=1, keepdims=True)
        self.matrix = matrix / np.maximum(norms, 1e-12)

    @classmethod
    def load_glove_txt(cls, path: str, max_words: Optional[int] = None) -> "WordVectors":
        vocab: Dict[str, int] = {}
        rows = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip().split(" ")
                if len(parts) < 3:
                    continue
                vocab[parts[0]] = len(rows)
                rows.append(np.asarray(parts[1:], np.float32))
                if max_words and len(rows) >= max_words:
                    break
        return cls(vocab, np.stack(rows))

    def __contains__(self, word: str) -> bool:
        return word in self.vocab

    def mean_top_similarity(self, word: str, topn: int = 5) -> float:
        """Mean cosine similarity of the top-n nearest neighbors
        (gensim `most_similar` semantics: the word itself excluded)."""
        idx = self.vocab[word]
        sims = self.matrix @ self.matrix[idx]
        sims[idx] = -np.inf
        k = min(topn, len(sims) - 1)
        top = np.partition(sims, -k)[-k:]
        return float(np.mean(top))


class ComplexityScorer:
    def __init__(
        self,
        tokenizer,
        word_vectors: Optional[WordVectors] = None,
        complexity_threshold: float = 0.35,
    ):
        self.tokenizer = tokenizer
        self.word_vectors = word_vectors
        self.complexity_threshold = complexity_threshold
        self._cache: Dict[str, float] = {}

    def compute_word_complexity(self, word: str) -> float:
        clean = word.strip(string.punctuation).lower()
        if clean in self._cache:
            return self._cache[clean]
        n_tokens = len(self.tokenizer.tokenize(clean)) if clean else 0
        if n_tokens <= 1:
            token_score = 0.0
        elif n_tokens == 2:
            token_score = 0.3
        elif n_tokens == 3:
            token_score = 0.6
        else:
            token_score = 0.8
        if self.word_vectors is not None:
            embedding_score = 0.0
            if len(clean) > 2:
                if clean in self.word_vectors:
                    embedding_score = 1.0 - self.word_vectors.mean_top_similarity(clean)
                else:
                    embedding_score = 0.9
            score = 0.6 * token_score + 0.4 * embedding_score
        else:
            score = token_score
        self._cache[clean] = score
        return score

    def mark_complex_words(self, text: str) -> str:
        return " ".join(
            "[MASK]"
            if self.compute_word_complexity(w) > self.complexity_threshold
            else w
            for w in text.split()
        )
