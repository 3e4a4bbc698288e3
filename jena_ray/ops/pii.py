"""PII redaction — regex scrubbing of emails / phone numbers / IPv4
addresses from document text, the standard pre-training privacy pass
(e.g. the BigScience ROOTS / BigCode StarCoder pipelines run exactly
this shape of rule-based redaction before tokenization).

Fully vectorized: pyarrow.compute's RE2 kernels
(replace_substring_regex / count_substring_regex) run per batch with no
Python row loop and no state, so the stage is an embarrassingly
parallel map_batches at any corpus size. DuckDB's regexp_replace is
RE2 too, which is what makes the op exactly SQL-mirrorable for the
correctness oracle.

Patterns are deliberately conservative (high-precision; a production
pass would union more recall-oriented variants — the plumbing is
identical)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-compatible (pyarrow AND DuckDB): keep in sync with the SQL oracle
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,2}-\d{3}-\d{3,4}(-\d{3,4})?"

_RULES = [
    ("email", EMAIL_RE, "[EMAIL]"),
    ("ip", IPV4_RE, "[IP]"),
    ("phone", PHONE_RE, "[PHONE]"),
]


def pii_scrub_batch(b: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, text, …) → (doc_id, clean_text, n_email, n_ip, n_phone).
    Rule order matters: emails first (an address contains dots that the
    IP pattern must not see), then IPs, then phones."""
    txt = b[text_col].combine_chunks().cast(pa.large_string())
    counts = {}
    for name, pat, repl in _RULES:
        counts["n_" + name] = pc.count_substring_regex(txt, pat)
        txt = pc.replace_substring_regex(txt, pat, repl)
    cols = {"doc_id": b["doc_id"].combine_chunks(), "clean_text": txt}
    cols.update(counts)
    return pa.table(cols)


def pii_scrub(docs_ds, text_col: str = "text"):
    """Distributed PII scrub over a (doc_id, text) Dataset."""
    return docs_ds.map_batches(
        pii_scrub_batch, batch_format="pyarrow",
        fn_kwargs={"text_col": text_col},
    )
