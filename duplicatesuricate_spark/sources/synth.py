"""Deterministic synthetic source-code corpus with planted ground truth.

FIXTURES.md §1: no external data in the sandbox, so correctness fixtures are
synthesized with a fixed seed.  The generator plants:

  * near-dup clusters  — a base document cloned 1..7 times with small edits
                         (rename one identifier everywhere, insert/delete a
                         line) so exact 5-gram-shingle Jaccard stays high;
  * exact-substring    — documents that embed another document verbatim
                         (exercises the exact-substring pass, stage B9);
  * hot-key skew       — one shared boilerplate header prepended to ~20% of
                         rows (exercises hot-band salting, stage B6);
  * singletons         — unrelated documents that must NOT pair.

Ground truth is known by construction and returned alongside the corpus as
(row_key -> cluster label, kind) so tests can compute dup-pair recall
without trusting the engine under test.
"""

from __future__ import annotations

import hashlib
import random

import pandas as pd

LANGS = ["python", "java", "js", "go", "c"]
_EXT = {"python": "py", "java": "java", "js": "js", "go": "go", "c": "c"}

_VOCAB_STEMS = [
    "get", "set", "load", "parse", "merge", "split", "index", "token",
    "hash", "band", "shard", "batch", "queue", "node", "edge", "graph",
    "score", "match", "block", "probe", "fetch", "write", "read", "scan",
    "emit", "fold", "map", "join", "sort", "rank", "count", "sum",
]
_VOCAB_SUFFIX = ["er", "ed", "_id", "_key", "_val", "_buf", "_ptr", "_arr",
                 "0", "1", "2", "x", "y", "tmp", "ctx", "cfg"]
_PUNCT = ["(", ")", "{", "}", "=", "+", ";", ",", ".", ":"]

BOILERPLATE = (
    "copyright 2020 example authors licensed under the apache license "
    "version 2 0 you may not use this file except in compliance with the "
    "license you may obtain a copy of the license at http www apache org "
    "licenses license 2 0 unless required by applicable law"
)


def _word(rng: random.Random) -> str:
    return rng.choice(_VOCAB_STEMS) + rng.choice(_VOCAB_SUFFIX)


def _line(rng: random.Random, n_tokens: int) -> str:
    toks = []
    for _ in range(n_tokens):
        toks.append(_word(rng) if rng.random() < 0.8 else rng.choice(_PUNCT))
    return " ".join(toks)


def _base_doc(rng: random.Random, n_lines: int) -> list[str]:
    return [_line(rng, rng.randint(4, 12)) for _ in range(n_lines)]


def _near_dup_variant(rng: random.Random, lines: list[str]) -> list[str]:
    """Small seeded edit: rename one identifier everywhere, then maybe
    insert or delete a single line."""
    out = list(lines)
    body = " ".join(out)
    idents = [t for t in body.split() if t not in _PUNCT]
    if idents:
        old = rng.choice(idents)
        new = _word(rng) + "_v2"
        out = [ln.replace(old, new) for ln in out]
    roll = rng.random()
    if roll < 0.4 and len(out) > 3:
        del out[rng.randrange(len(out))]
    elif roll < 0.8:
        out.insert(rng.randrange(len(out) + 1), _line(rng, rng.randint(4, 10)))
    return out


def _commit(rng: random.Random) -> str:
    return hashlib.sha1(str(rng.random()).encode()).hexdigest()


def synth_corpus(
    n_rows: int = 200,
    seed: int = 42,
    near_dup_frac: float = 0.35,
    substring_frac: float = 0.06,
    boilerplate_frac: float = 0.20,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Build the corpus.

    Returns ``(corpus, truth)``:
      corpus: columns (repo, path, commit, lang, content)
      truth : columns (repo, path, commit, cluster, kind) where ``cluster``
              is the planted group label (singletons get their own) and
              ``kind`` in {base, near_dup, exact_substring, singleton}.
    """
    rng = random.Random(seed)
    rows: list[dict] = []
    truth: list[dict] = []

    def add_row(lines: list[str], lang: str, cluster: int, kind: str,
                boiler: bool) -> dict:
        i = len(rows)
        content_lines = ([BOILERPLATE] if boiler else []) + lines
        row = {
            "repo": f"org{i % 7}/repo{i % 23}",
            "path": f"src/m{i // 10}/file{i}.{_EXT[lang]}",
            "commit": _commit(rng),
            "lang": lang,
            "content": "\n".join(content_lines),
        }
        rows.append(row)
        truth.append({
            "repo": row["repo"], "path": row["path"], "commit": row["commit"],
            "cluster": cluster, "kind": kind,
        })
        return row

    next_cluster = 0
    n_near = int(n_rows * near_dup_frac)
    n_sub = int(n_rows * substring_frac)

    # --- near-dup clusters (sizes 2-8) ---
    produced = 0
    while produced < n_near:
        size = rng.randint(2, 8)
        size = min(size, n_near - produced) or 2
        lang = rng.choice(LANGS)
        boiler = rng.random() < boilerplate_frac
        base = _base_doc(rng, rng.randint(12, 40))
        cl = next_cluster
        next_cluster += 1
        add_row(base, lang, cl, "base", boiler)
        for _ in range(max(1, size - 1)):
            add_row(_near_dup_variant(rng, base), lang, cl, "near_dup", boiler)
        produced += size

    # --- exact-substring pairs: container embeds contained verbatim ---
    for _ in range(max(1, n_sub // 2)):
        lang = rng.choice(LANGS)
        inner = _base_doc(rng, rng.randint(10, 20))
        cl = next_cluster
        next_cluster += 1
        add_row(inner, lang, cl, "base", False)
        pre = _base_doc(rng, rng.randint(5, 15))
        post = _base_doc(rng, rng.randint(5, 15))
        add_row(pre + inner + post, lang, cl, "exact_substring", False)

    # --- singletons ---
    while len(rows) < n_rows:
        lang = rng.choice(LANGS)
        boiler = rng.random() < boilerplate_frac
        cl = next_cluster
        next_cluster += 1
        add_row(_base_doc(rng, rng.randint(12, 40)), lang, cl, "singleton", boiler)

    return pd.DataFrame(rows), pd.DataFrame(truth)


def synth_hot_mixed_corpus(
    n_per_cluster: int = 6,
    boiler_lines: int = 45,
    core_lines: int = 8,
    seed: int = 4242,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """TWO distinct near-dup clusters sharing one dominant boilerplate block
    (round-1 verdict item 4: the mixed-cluster hot-bucket recall trade).

    Every doc = shared boilerplate (~boiler_lines * 8 tokens) + a per-
    cluster core (~core_lines * 8 tokens) + small per-doc edits, so:

      * within-cluster exact shingle Jaccard ~0.9+  (golden pairs);
      * cross-cluster Jaccard ~ boiler/(boiler+2*core) ~0.7-0.75 — BELOW
        the 0.85 acceptance (cross pairs must NOT merge);
      * the boilerplate dominates the MinHash: many band buckets hold all
        2*n docs, so with a lowered ``hot_band_cap`` the bucket is hot AND
        mixed — exactly the scenario where star-only hot handling lost
        intra-cluster pairs (hub->other-cluster edges die in verify).

    Returns (corpus, truth) in the same shape as :func:`synth_corpus`.
    """
    rng = random.Random(seed)
    boiler = [_line(rng, 8) for _ in range(boiler_lines)]
    rows: list[dict] = []
    truth: list[dict] = []
    for cl in (0, 1):
        core = [_line(rng, 8) for _ in range(core_lines)]
        base = boiler + core
        for i in range(n_per_cluster):
            lines = list(base) if i == 0 else _near_dup_variant(rng, base)
            row = {
                "repo": f"hotmix/repo{cl}",
                "path": f"src/c{cl}/file{i}.py",
                "commit": _commit(rng),
                "lang": "python",
                "content": "\n".join(lines),
            }
            rows.append(row)
            truth.append({
                "repo": row["repo"], "path": row["path"],
                "commit": row["commit"], "cluster": cl,
                "kind": "base" if i == 0 else "near_dup",
            })
    return pd.DataFrame(rows), pd.DataFrame(truth)


def planted_truth(truth: pd.DataFrame) -> pd.DataFrame:
    """Expand planted clusters to canonical ground-truth pairs on the
    natural key (repo, path, commit).

    Only near-dup clusters count toward the recall target at the pinned
    Jaccard threshold; exact-substring pairs are measured separately
    (they are recalled by stage B9, not by MinHash)."""
    out = []
    for cluster, grp in truth.groupby("cluster"):
        keys = list(grp[["repo", "path", "commit"]].itertuples(index=False))
        kinds = set(grp["kind"])
        kind = "exact_substring" if "exact_substring" in kinds else "near_dup"
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                out.append({
                    "repo_a": keys[i].repo, "path_a": keys[i].path,
                    "commit_a": keys[i].commit,
                    "repo_b": keys[j].repo, "path_b": keys[j].path,
                    "commit_b": keys[j].commit,
                    "cluster": cluster, "kind": kind,
                })
    return pd.DataFrame(out)
