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


# ---- declared-associative forms (round 8, VERDICT r7 item 8) -----------
# The reference reducers COUNT BY len(values) (src/mrapps/wc.go:37-40),
# so they cannot be folded over their own outputs; each app instead
# declares an associative (combine, finalize) pair whose output is
# value-identical to its reducef — pinned by tests/test_mr_associative.py.
# mr_run(combinef=...) then runs the bounded-memory reduceByKey path.

def count_combine(a: str, b: str) -> str:
    """Counting apps (wc, doccount): every mapped value is "1", so the
    running count is an integer string sum."""
    return str(int(a) + int(b))


def join_combine(a: str, b: str) -> str:
    """List apps (indexer, docmeta): accumulate values unordered; the
    finalizer sorts once at the end (comma can't appear in doc names
    or docmeta values — the reference's own output delimiter,
    src/mrapps/indexer.go:38)."""
    return a + "\x1f" + b


def indexer_finalize(key: str, merged: str) -> str:
    docs = sorted(merged.split("\x1f"))
    return f"{len(docs)} {','.join(docs)}"


def docmeta_finalize(key: str, merged: str) -> str:
    return " ".join(sorted(merged.split("\x1f")))


# app -> (combinef, finalizef); finalize None = identity
APPS_ASSOCIATIVE = {
    "wc": (count_combine, None),
    "doccount": (count_combine, None),
    "indexer": (join_combine, indexer_finalize),
    "docmeta": (join_combine, docmeta_finalize),
}
