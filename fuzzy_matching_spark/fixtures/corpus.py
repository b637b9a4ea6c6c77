"""Deterministic source-code corpus fixture with dup injection + truth table.

Synthesizes the north-rule input shape
``(repo, path, commit, lang, content)`` (BASELINE.json input_hint /
FIXTURES.md §1) at small scale for tests and benchmarks.  Every base file
spawns 0-3 variants recorded in a hidden truth table; mutation kinds mirror
the reference distortion model lifted to code level:

* ``exact``      — byte-identical copy under a different (repo, path)
* ``reformat``   — whitespace / blank-line shuffle (MinHash/SimHash dup)
* ``rename``     — identifier char-replacement/swap (near-dup)
* ``comment``    — comment insertion + license-header swap (near-dup and
  the deliberate skew driver: headers are shared boilerplate -> hot LSH
  bands, FIXTURES.md §5)
* ``suffix``     — appended block (long-exact-substring dup)
* negatives      — unrelated files

All draws come from ``random.Random(seed)``; no wall clock, no global RNG.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

__all__ = ["generate_corpus", "CorpusFixture"]

LANGS = ["python", "java", "js", "go", "c"]

LICENSE_HEADERS = [
    "# Licensed under the Apache License, Version 2.0 (the 'License');\n"
    "# you may not use this file except in compliance with the License.\n",
    "# Copyright (c) The Authors. All rights reserved.\n"
    "# Use of this source code is governed by a BSD-style license.\n",
    "# SPDX-License-Identifier: MIT\n",
]

_WORDS = [
    "data", "node", "item", "value", "result", "index", "count", "total",
    "buffer", "stream", "batch", "record", "field", "table", "query", "shard",
]

_VERBS = ["load", "parse", "merge", "split", "filter", "reduce", "map", "scan",
          "emit", "flush", "read", "write", "hash", "sort", "join", "fold"]


def _ident(rng: random.Random) -> str:
    # per-call numeric suffix keeps unrelated files' shingle sets disjoint
    # enough that only injected variants are near-dups (a uniform 32-word
    # vocabulary would make *every* file pair ~0.4 Jaccard and drown LSH)
    return f"{rng.choice(_VERBS)}_{rng.choice(_WORDS)}_{rng.randint(0, 99999)}"


def _gen_function(rng: random.Random, lang: str) -> str:
    name = _ident(rng)
    args = ", ".join(_ident(rng) for _ in range(rng.randint(1, 3)))
    body_lines = []
    for _ in range(rng.randint(5, 14)):
        a, b, c = _ident(rng), _ident(rng), rng.randint(1, 999999)
        op = rng.choice(["+", "-", "*", "%"])
        body_lines.append(f"    {a} = {b} {op} {c}")
    ret = f"    return {_ident(rng)}"
    if lang == "python":
        return f"def {name}({args}):\n" + "\n".join(body_lines) + "\n" + ret + "\n"
    return (
        f"function {name}({args}) {{\n"
        + "\n".join(line + ";" for line in body_lines)
        + "\n" + ret + ";\n}\n"
    )


def _gen_file(rng: random.Random, lang: str) -> str:
    header = rng.choice(LICENSE_HEADERS)
    funcs = [_gen_function(rng, lang) for _ in range(rng.randint(3, 9))]
    return header + "\n" + "\n".join(funcs)


def _commit(rng: random.Random) -> str:
    return "".join(rng.choice("0123456789abcdef") for _ in range(40))


# --- mutations ----------------------------------------------------------------

def _mut_reformat(content: str, rng: random.Random) -> str:
    lines = content.split("\n")
    out = []
    for line in lines:
        if line.strip() and rng.random() < 0.3:
            out.append(line + " " * rng.randint(1, 3))
        else:
            out.append(line)
        if rng.random() < 0.1:
            out.append("")
    return "\n".join(out)


def _mut_rename(content: str, rng: random.Random) -> str:
    # replace a handful of identifier words corpus-wide
    out = content
    for _ in range(rng.randint(1, 3)):
        src = rng.choice(_WORDS)
        dst = src[:-1] + rng.choice("xyzqw")
        out = out.replace(src, dst)
    return out


def _mut_comment(content: str, rng: random.Random) -> str:
    # swap the license header and sprinkle comments
    for h in LICENSE_HEADERS:
        if content.startswith(h):
            content = rng.choice([x for x in LICENSE_HEADERS if x != h]) + content[len(h):]
            break
    lines = content.split("\n")
    for _ in range(rng.randint(1, 4)):
        i = rng.randint(0, len(lines) - 1)
        lines.insert(i, f"# note: {_ident(rng)} handles {_ident(rng)}")
    return "\n".join(lines)


def _mut_suffix(content: str, rng: random.Random, lang: str) -> str:
    return content + "\n" + _gen_function(rng, lang)


@dataclass
class CorpusFixture:
    rows: list[dict]          # repo, path, commit, lang, content
    truth: list[dict]         # src/dst keys + mutation + is_dup


def _gen_base(i: int, seed: int, variant_prob: float):
    """Base file #i plus its variants — seeded per index, so the output is
    identical whether generated locally or across any partitioning."""
    rng = random.Random((seed << 32) ^ (i * 0x9E3779B9))
    rows: list[dict] = []
    truth: list[dict] = []

    lang = rng.choice(LANGS)
    repo = f"org{rng.randint(0, 9)}/repo{rng.randint(0, 19)}"
    path = f"src/pkg{rng.randint(0, 5)}/mod_{i}.{ 'py' if lang == 'python' else lang }"
    commit = _commit(rng)
    content = _gen_file(rng, lang)
    rows.append(
        {"repo": repo, "path": path, "commit": commit, "lang": lang, "content": content}
    )

    n_variants = 0
    if rng.random() < variant_prob:
        n_variants = rng.randint(1, 3)
    for v in range(n_variants):
        mutation = rng.choice(["exact", "reformat", "rename", "comment", "suffix"])
        if mutation == "exact":
            new_content = content
        elif mutation == "reformat":
            new_content = _mut_reformat(content, rng)
        elif mutation == "rename":
            new_content = _mut_rename(content, rng)
        elif mutation == "comment":
            new_content = _mut_comment(content, rng)
        else:
            new_content = _mut_suffix(content, rng, lang)
        v_repo = f"org{rng.randint(0, 9)}/repo{rng.randint(20, 39)}"
        v_path = f"vendor/copy{v}/mod_{i}.{ 'py' if lang == 'python' else lang }"
        v_commit = _commit(rng)
        rows.append(
            {"repo": v_repo, "path": v_path, "commit": v_commit, "lang": lang,
             "content": new_content}
        )
        truth.append(
            {"src_repo": repo, "src_path": path, "src_commit": commit,
             "dst_repo": v_repo, "dst_path": v_path, "dst_commit": v_commit,
             "mutation": mutation, "is_dup": True}
        )
    return rows, truth


def generate_corpus(n_base: int = 200, seed: int = 42, variant_prob: float = 0.6) -> CorpusFixture:
    """Generate ``n_base`` base files plus injected variants + truth table."""
    rows: list[dict] = []
    truth: list[dict] = []
    for i in range(n_base):
        r, t = _gen_base(i, seed, variant_prob)
        rows.extend(r)
        truth.extend(t)
    return CorpusFixture(rows=rows, truth=truth)


def generate_corpus_df(spark, n_base: int, seed: int = 42, variant_prob: float = 0.6,
                       partitions: int = 64):
    """Distributed generator (S6: ``spark.range`` + seeded ``mapInPandas``).

    Produces the exact same rows as :func:`generate_corpus` — per-index
    seeding makes output partitioning-invariant — but scales to bench-sized
    corpora (hundreds of thousands of files) without a single-process loop.
    Truth rows are not emitted here; pytest-scale fixtures use the local
    generator.
    """
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows: list[dict] = []
            for i in pdf["id"]:
                rows.extend(_gen_base(int(i), seed, variant_prob)[0])
            yield pd.DataFrame(
                rows, columns=["repo", "path", "commit", "lang", "content"]
            )

    return (
        spark.range(n_base)
        .repartition(partitions)
        .mapInPandas(gen, schema="repo string, path string, commit string, lang string, content string")
    )
