"""Input corpora: interleaved text+media documents, aliases, readers."""
