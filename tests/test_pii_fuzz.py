"""Fuzz parity for the PII regex dialect: random noisy strings with random
PII-shaped (and NEAR-miss) snippets must redact identically in Spark (Java
regex) and DuckDB (RE2). This is the guarantee behind the module's
"RE2∩Java subset" rule — the seeded-corpus test checks the happy path; this
checks the dialect edges (word boundaries against punctuation/digits,
almost-matching shapes, adjacency)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from volga_spark.operators.pii import pii_counts, pii_oracle_exprs, redact_pii
from volga_spark.oracle import compare_frames

_PII = [
    "a.b-c_9@mail.example.org",
    "x@y.io",
    "10.0.0.1",
    "255.255.255.255",
    "123-45-6789",
    "555-010-1234",
    "555.010.1234",
    "4000 1234 5678 9010",
    "4000-1234-5678-9010",
]
# near-misses: must NOT be redacted identically... i.e. BOTH engines must
# agree on leaving (or partially matching) them the same way
_NEAR = [
    "not@an@email",
    "1.2.3",            # too few octets
    "1234-56-7890",     # SSN widths off
    "555-0101-123",     # phone widths off
    "4000123456789010", # cc without separators
    "a@b",              # no TLD
    "10.0.0.1.9",       # extra octet — boundary behavior must agree
    "x123-45-6789y",    # \b against letters
    ".123-45-6789.",    # \b against punctuation
]
_NOISE = list("abz09 .,-@:/#()[]'\"\n\t") + ["word", "the", "10", "..", "--"]


def _random_docs(n=1500, seed=11):
    rng = np.random.default_rng(seed)
    docs = []
    for _ in range(n):
        parts = list(rng.choice(_NOISE, size=rng.integers(3, 12)))
        for _ in range(int(rng.integers(0, 3))):
            parts.insert(int(rng.integers(0, len(parts))), str(rng.choice(_PII)))
        for _ in range(int(rng.integers(0, 3))):
            parts.insert(int(rng.integers(0, len(parts))), str(rng.choice(_NEAR)))
        sep = str(rng.choice(["", " ", "  "]))
        docs.append(sep.join(parts))
    return docs


def test_pii_redaction_fuzz_parity(spark):
    import duckdb

    docs = _random_docs()
    pdf = pd.DataFrame({"doc_id": np.arange(len(docs)), "text": docs})

    sdf = spark.createDataFrame(pdf)
    counts = pii_counts("text")
    got = sdf.select(
        "doc_id",
        *[c.alias(n) for n, c in counts.items()],
        redact_pii("text").alias("redacted"),
    ).toPandas()

    ex = pii_oracle_exprs("text")
    cols = ", ".join(f"{sql} AS {n}" for n, sql in ex.items() if n != "redacted")
    con = duckdb.connect()
    con.register("docs", pdf)
    oracle = con.execute(
        f"SELECT doc_id, {cols}, {ex['redacted']} AS redacted FROM docs"
    ).fetchdf()
    con.close()

    # the fuzz actually generated matches AND left some text untouched
    assert got[[c for c in got.columns if c.startswith("pii_")]].to_numpy().sum() > 100
    assert (got["redacted"] != pdf["text"]).any()
    assert (got["redacted"] == pdf["text"]).any()
    problems = compare_frames(got, oracle)
    assert not problems, "; ".join(problems)
