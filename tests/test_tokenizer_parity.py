"""Tokenizer parity: Spark's `[^\\p{L}]+` split must agree with a pure
Python reference (str.isalpha == Unicode category L, the same predicate
as Go's unicode.IsLetter used by the reference at src/mrapps/wc.go:21-24)
on adversarial Unicode input — combining marks, CJK, emoji, digits in
other scripts, surrogate-adjacent codepoints.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from mit_6_5840_mapreduce_spark.functions.text import tokenize

# codepoint pools spanning the categories that matter: L* (letters in
# several scripts), Nd/No (digits — NOT letters), Mn (combining marks —
# NOT letters), punctuation/symbols/whitespace/emoji
POOLS = [
    "abcXYZ",                       # Latin
    "äöüßéèñç",                     # Latin-1 letters
    "αβγΩλ",                        # Greek
    "абвГДж",                       # Cyrillic
    "中文字漢語",                    # CJK (Lo)
    "ひらがなカタカナ",              # Japanese kana (Lo)
    "ٱلعربية",                      # Arabic (includes Lm/Lo)
    "0123456789",                   # ASCII digits
    "٠١٢٣۴۵",                       # Arabic-Indic digits (Nd, not L)
    "²³¼½",                         # No (not letters)
    "́̈็",           # combining marks (Mn, not L)
    " \t\n\r",                      # whitespace
    ".,;:!?-_()[]{}'\"`~@#$%^&*",   # punctuation/symbols
    "😀🚀🎉",                        # emoji (So)
    "ʰʷˠ",                          # modifier letters (Lm — ARE letters)
]


def _python_tokens(s: str) -> list[str]:
    toks, cur = [], []
    for ch in s:
        if ch.isalpha():
            cur.append(ch)
        elif cur:
            toks.append("".join(cur))
            cur = []
    if cur:
        toks.append("".join(cur))
    return toks


def test_tokenize_matches_python_reference_on_adversarial_unicode(spark):
    rng = random.Random(0)
    alphabet = "".join(POOLS)
    strings = ["".join(rng.choice(alphabet)
                       for _ in range(rng.randint(0, 40)))
               for _ in range(500)]
    strings += ["", "a", "1", "́", "áb", "汉a汉", "ʰx", "½a½"]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)],
                               "i INT, s STRING")
    got = {r.i: list(r.toks)
           for r in df.select("i", tokenize(F.col("s")).alias("toks"))
                      .collect()}
    for i, s in enumerate(strings):
        assert got[i] == _python_tokens(s), (i, s, got[i],
                                             _python_tokens(s))
