"""The reference's application library (``src/mrapps/*.go``) as Python
(mapf, reducef) pairs for the MR-compat layer.

Only the DATA-PLANE apps are reproduced; the runtime probes
(jobcount/mtiming/rtiming) assert scheduler behavior the Spark runtime
gives by construction — their analogues live in tests/test_mr_compat.py
as accumulator/partition assertions.
"""

from __future__ import annotations

import re

TOKEN_RE = re.compile(r"[^\W\d_]+", re.UNICODE)
# Python \w includes digits and _, so [^\W\d_] = Unicode letters only —
# the same token class as Go strings.FieldsFunc(!unicode.IsLetter)
# (src/mrapps/wc.go:21-24) and the engine's [^\p{L}]+ split.


def wc_map(name: str, contents: str) -> list[tuple[str, str]]:
    """src/mrapps/wc.go:19-32 — emit (word, "1") per occurrence."""
    return [(w, "1") for w in TOKEN_RE.findall(contents)]


def wc_reduce(key: str, values: list[str]) -> str:
    """src/mrapps/wc.go:37-40 — count = len(values)."""
    return str(len(values))


def indexer_map(name: str, contents: str) -> list[tuple[str, str]]:
    """src/mrapps/indexer.go:20-31 — (word, doc) per DISTINCT word."""
    return [(w, name) for w in sorted(set(TOKEN_RE.findall(contents)))]


def indexer_reduce(key: str, values: list[str]) -> str:
    """src/mrapps/indexer.go:36-39 — '<n> <doc1,doc2,...>' sorted."""
    docs = sorted(values)
    return f"{len(docs)} {','.join(docs)}"


def docmeta_map(name: str, contents: str) -> list[tuple[str, str]]:
    """src/mrapps/nocrash.go:26-36 (crash.go without fault injection).

    Go ``len(string)`` counts UTF-8 BYTES, not code points — encode
    before len so non-ASCII inputs match the reference exactly.
    """
    return [
        ("a", name),
        ("b", str(len(name.encode("utf-8")))),
        ("c", str(len(contents.encode("utf-8")))),
        ("d", "xyzzy"),
    ]


def docmeta_reduce(key: str, values: list[str]) -> str:
    """src/mrapps/nocrash.go:38-47 — sorted values joined by ' '."""
    return " ".join(sorted(values))


def doccount_map(name: str, contents: str) -> list[tuple[str, str]]:
    """src/mrapps/early_exit.go:19-27 — one record per document."""
    return [(name, "1")]


def doccount_reduce(key: str, values: list[str]) -> str:
    """src/mrapps/early_exit.go:29-36 (minus the straggler sleep)."""
    return str(len(values))


APPS = {
    "wc": (wc_map, wc_reduce),
    "indexer": (indexer_map, indexer_reduce),
    "docmeta": (docmeta_map, docmeta_reduce),
    "doccount": (doccount_map, doccount_reduce),
}
