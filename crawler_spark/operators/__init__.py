"""Spark operators: extraction UDFs, dedup (exact/MinHash/SimHash/spans +
cluster resolution), similarity/ANN, text analysis (quality, tokens,
vectorizer, vocab, TF-IDF), bigram-LM scoring, quality filters, sampling,
curation, HLL sketches, sessionization, as-of join, multimodal plumbing."""
