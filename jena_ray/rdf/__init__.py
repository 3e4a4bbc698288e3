"""RDF syntax layer: tokenizing, parsing, serializing, canonicalizing."""
