"""Large-scale training-data operations over the documents/embeddings
tables: dedup family, similarity search, text analysis, multimodal."""
