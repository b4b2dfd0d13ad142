"""Property-based differential test: for arbitrary (Map, Reduce) jobs
over hypothesis-generated corpora, the distributed mr_run output must
equal the pure-Python sequential oracle after canonical sort — the exact
contract of the reference's golden harness (src/main/test-mr.sh:103-104),
explored over random inputs instead of one fixed corpus.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mit_6_5840_mapreduce_spark.mr.api import mr_run
from mit_6_5840_mapreduce_spark.mr.apps import wc_map, wc_reduce
from mit_6_5840_mapreduce_spark.mr.sequential import mr_sequential

# words over a small alphabet (plus non-letter separators) so random
# corpora produce real key collisions across documents
word = st.text(alphabet="abcXYZ汉λ", min_size=1, max_size=6)
doc_text = st.lists(word, max_size=30).map(
    lambda ws: " .,3 ".join(ws))
corpus = st.lists(
    st.tuples(st.uuids().map(lambda u: f"doc-{u}"), doc_text),
    min_size=0, max_size=8)


def canon(lines):
    return sorted(lines)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=corpus)
def test_wc_matches_sequential_oracle_on_random_corpora(spark, corpus):
    want = canon(mr_sequential(wc_map, wc_reduce, corpus))
    got = canon(mr_run(spark, wc_map, wc_reduce, corpus,
                       n_reduce=4).collect())
    assert got == want


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=corpus)
def test_custom_job_matches_sequential_oracle(spark, corpus):
    """A second (Map, Reduce) pair — per-doc char histogram semantics —
    so the property holds beyond the wc shape."""
    def mapf(name, contents):
        return [(ch, "1") for ch in contents if ch.isalpha()]

    def reducef(key, values):
        return str(sum(int(v) for v in values))

    want = canon(mr_sequential(mapf, reducef, corpus))
    got = canon(mr_run(spark, mapf, reducef, corpus,
                       n_reduce=4).collect())
    assert got == want
