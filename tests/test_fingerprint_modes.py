"""Anchor-hash modes (rolling vs md5) implement the same 0-mod-q sampling
semantics: on docs sharing long exact substrings, both modes detect the
same pairs."""

from pyspark.sql import functions as F

from fuzzy_matching_spark.config import DedupConfig
from fuzzy_matching_spark.operators import fingerprint


def _pairs(spark, rows, cfg):
    docs = spark.createDataFrame(rows, schema="doc_id long, content string")
    anchors = fingerprint.anchor_table(docs, cfg)
    cands = fingerprint.substring_candidates(anchors, cfg)
    verified = fingerprint.verify_substring_pairs(cands, docs, cfg)
    return {(r["id_a"], r["id_b"]) for r in verified.collect()}


def test_rolling_and_md5_modes_find_same_long_overlaps(spark):
    shared = (
        "def compute(a, b):\n    total = a + b\n    for i in range(10):\n"
        "        total += i * a\n    return total\n" * 3
    )
    rows = [
        (1, "# header one\n" + shared + "# tail one\n"),
        (2, "# another header\n" + shared + "# other tail\n"),
        (3, "completely unrelated content " * 20),
        (4, shared),
    ]
    want = {(1, 2), (1, 4), (2, 4)}
    for mode in ("rolling", "md5"):
        cfg = DedupConfig(substring_min_len=32, anchor_hash=mode)
        got = _pairs(spark, rows, cfg)
        assert got == want, mode


def test_md5_anchor_selection_rule(spark):
    """Anchors in md5 mode are exactly the windows whose first digest byte
    is 0 mod q (plus the one-per-doc fallback)."""
    import hashlib

    text = "abcdefghijklmnopqrstuvwxyz0123456789" * 3
    cfg = DedupConfig(substring_min_len=16, fingerprint_mod=4, anchor_hash="md5")
    docs = spark.createDataFrame([(1, text)], schema="doc_id long, content string")
    got = {
        (r["pos"], r["anchor"])
        for r in fingerprint.anchor_table(docs, cfg).collect()
    }
    L, q = 16, 4
    digests = [
        hashlib.md5(text[i : i + L].encode()).hexdigest()
        for i in range(len(text) - L + 1)
    ]
    want = {(i, d) for i, d in enumerate(digests) if int(d[:2], 16) % q == 0}
    if not want:
        want = {(0, digests[0])}
    assert got == want
