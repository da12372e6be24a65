"""Reference-parity word count (SURVEY §5.2.1): the Spark pipeline must
reproduce the reference's semantics — trim → split(\\s+) → lower →
delete Java-`\\W` chars → drop empties → count → sort (count ASC, word
ASC) — validated against an independent pure-Python reimplementation over
fixtures covering every tokenizer edge case."""

import re
from collections import Counter

import pytest

from mapreduce_4sl08_spark.operators.wordcount import word_count_files

# Java \W == [^a-zA-Z0-9_] (ASCII, no UNICODE_CHARACTER_CLASS) — the
# Python oracle must NOT use Python's Unicode-aware \w.
_JAVA_NON_WORD = re.compile(r"[^a-zA-Z0-9_]")
_WS = re.compile(r"\s+")


def python_oracle(texts: list[str]) -> list[tuple[str, int]]:
    counts = Counter()
    for text in texts:
        for token in _WS.split(text.strip()):
            word = _JAVA_NON_WORD.sub("", token.lower())
            if word:
                counts[word] += 1
    return sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))


FIXTURE = """The quick brown fox THE the
end. "quoted" (paren) -- ...
foo_bar42 foo_bar42 foo_bar42
café naïve straße
\t  spaced \t out  \n
tie_a tie_b tie_a tie_b
"""


def test_parity_edge_cases(spark, tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_text(FIXTURE, encoding="utf-8")
    got = [(r.word, r["count"]) for r in word_count_files(spark, str(p)).collect()]
    want = python_oracle(FIXTURE.split("\n"))
    assert got == want
    d = dict(got)
    assert d["the"] == 3          # case folding
    assert d["foo_bar42"] == 3    # digits + underscore kept by \W
    assert d["caf"] == 1 and d["nave"] == 1  # non-ASCII stripped (Java \W)
    assert "--" not in d and "" not in d     # punct-only tokens dropped
    assert d["strae"] == 1        # ß stripped


def test_parity_multiple_files_and_tie_order(spark, tmp_path):
    (tmp_path / "a.txt").write_text("z y x x y z z w", encoding="utf-8")
    (tmp_path / "b.txt").write_text("w v v", encoding="utf-8")
    paths = [str(tmp_path / "a.txt"), str(tmp_path / "b.txt")]
    got = [(r.word, r["count"]) for r in word_count_files(spark, paths).collect()]
    want = python_oracle(["z y x x y z z w", "w v v"])
    assert got == want
    # ties ordered by word ASC within equal counts
    counts = [c for _, c in got]
    assert counts == sorted(counts)
    for i in range(len(got) - 1):
        if got[i][1] == got[i + 1][1]:
            assert got[i][0] < got[i + 1][0]


def test_parity_zipfian_corpus(spark, tmp_path):
    """Skewed corpus (the reference's motivating case for log-spaced
    range boundaries) — 2000 lines over a Zipfian vocab, deterministic."""
    import random
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(500)]
    weights = [1.0 / (i + 1) for i in range(500)]
    lines = [" ".join(rng.choices(vocab, weights=weights, k=12)) for _ in range(2000)]
    p = tmp_path / "zipf.txt"
    p.write_text("\n".join(lines), encoding="utf-8")
    got = [(r.word, r["count"]) for r in word_count_files(spark, str(p)).collect()]
    want = python_oracle(lines)
    assert got == want
    # property: total counts == total tokens
    assert sum(c for _, c in got) == 2000 * 12


def test_cli_end_to_end(spark, tmp_path):
    """The reference's user interface: text files in, sorted word counts
    out (K2 single-file mode)."""
    import glob
    from mapreduce_4sl08_spark.cli import main

    (tmp_path / "a.txt").write_text("the quick fox\nthe lazy dog the end.\n")
    (tmp_path / "b.txt").write_text("fox and dog and fox\n")
    out = str(tmp_path / "out")
    rc = main([str(tmp_path / "a.txt"), str(tmp_path / "b.txt"),
               "-o", out, "--format", "csv", "--single-file"])
    assert rc == 0
    [csv_file] = glob.glob(f"{out}/part-*.csv")
    lines = open(csv_file).read().strip().splitlines()
    assert lines[0] == "word,count"
    assert lines[1:] == ["end,1", "lazy,1", "quick,1", "and,2",
                         "dog,2", "fox,3", "the,3"]
