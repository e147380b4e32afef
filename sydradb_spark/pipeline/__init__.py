"""LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) over the documents/embeddings tables — the
beyond-reference surface from BASELINE.json's north star, designed
shuffle-light for 100 TB (see each module's docstring)."""
