"""Deterministic synthesis of the north-rule input table
(BASELINE.json:15): ``(repo:string, path:string, commit:string,
lang:string, content:string)`` — source-code-like, Zipf-skewed repos,
per-lang keyword-heavy content, lognormal lengths, with the FIXTURES.md B1
mandatory edge rows (empty string, 1-byte, byte-exact duplicates).

No external data; everything derives from a seed (default 42). Tables are
cached as parquet under ``.cache/`` so tests/bench don't regenerate.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".cache")

LANGS = ["py", "java", "cpp", "js", "go", "rs", "md", "json", "yaml", "txt"]
LANG_W = np.array([0.22, 0.14, 0.12, 0.14, 0.08, 0.06, 0.09, 0.06, 0.05, 0.04])

_KW = {
    "py":   ["def ", "return ", "self.", "import numpy as np", "    ", "class ",
             "for i in range(", "):\n", " = ", "if x is None:", "# TODO fix",
             "với unicode ✓ ", "result", "value", "data[i]", "\n"],
    "java": ["public ", "static ", "void ", "private final ", "int ", "String ",
             "return ", ";\n", "    ", "new HashMap<>()", "@Override\n", "}\n"],
    "cpp":  ["#include <vector>\n", "std::", "template <typename T>\n", "auto ",
             "const ", "return ", ";\n", "    ", "->", "nullptr", "// note\n"],
    "js":   ["const ", "function ", "return ", "=> {", "}\n", "  ", "await ",
             "console.log(", ");\n", "null", "undefined", "let "],
    "go":   ["func ", "return ", "if err != nil {\n", "}\n", "\t", "package main\n",
             "fmt.Println(", ")\n", ":=", "error", "string"],
    "rs":   ["fn ", "let mut ", "-> Result<(), Error>", "match ", "    ", "}\n",
             "Some(", ")", "unwrap()", "&str", "impl "],
    "md":   ["# Heading\n", "## Section\n", "- item\n", "**bold** ", "`code` ",
             "see [link](http://example.com)\n", "text and more text ", "\n\n"],
    "json": ['{"key": ', '"value"', ', ', '[1, 2, 3]', '}\n', '"name": ',
             'null', 'true', '": {'],
    "yaml": ["key: value\n", "  nested:\n", "- item\n", "name: ", "count: 3\n",
             "enabled: true\n"],
    "txt":  ["the quick brown fox ", "lorem ipsum dolor ", "and then ",
             "jumped over ", "plain text line\n", "some words here "],
}


def _content_pool(lang: str, rng: np.random.Generator, pool_size: int = 256
                  ) -> list[str]:
    """A pool of distinct code-like lines per lang (identifiers vary)."""
    kw = _KW[lang]
    out = []
    for i in range(pool_size):
        k = int(rng.integers(3, 9))
        picks = rng.integers(0, len(kw), size=k)
        ident = f"v{int(rng.integers(0, 50))}"
        out.append("".join(kw[j] for j in picks) + ident + "\n")
    return out


def repofiles(n: int, seed: int = 42, skew: bool = False) -> pa.Table:
    """The north-rule table. ``skew=True`` gives one repo >=50% of rows and
    ~70% of content bytes (FIXTURES.md B2) for salting/scaling tests."""
    rng = np.random.default_rng(seed + (1 if skew else 0))
    n_repos = max(20, n // 500)
    if skew:
        r = rng.random(n)
        repo_idx = np.where(r < 0.5, 0, np.where(r < 0.7, 1,
                            rng.integers(2, n_repos, size=n)))
    else:
        z = rng.zipf(1.2, size=n)
        repo_idx = (z - 1) % n_repos
    lang_idx = rng.choice(len(LANGS), size=n, p=LANG_W / LANG_W.sum())

    # lognormal lengths, median ~1.5 KB; giant-repo files get the heavy tail
    ln = rng.lognormal(mean=7.3, sigma=1.0, size=n)
    if skew:
        ln[repo_idx == 0] *= 3.0
    target_len = np.clip(ln, 8, 131072).astype(np.int64)

    pools = {lg: _content_pool(lg, np.random.default_rng(seed * 1000 + i))
             for i, lg in enumerate(LANGS)}
    pool_lens = {lg: np.array([len(s) for s in pools[lg]]) for lg in LANGS}

    contents: list[str] = []
    line_choice = rng.integers(0, 256, size=(n, 64))
    for i in range(n):
        lg = LANGS[lang_idx[i]]
        pool = pools[lg]
        tl = target_len[i]
        parts, tot, j = [], 0, 0
        choices = line_choice[i]
        while tot < tl:
            s = pool[choices[j % 64]]
            parts.append(s)
            tot += len(s)
            j += 1
        contents.append("".join(parts))
    # mandatory edge rows (FIXTURES.md B1): empty, 1-byte, exact duplicates
    if n >= 8:
        contents[0] = ""
        contents[1] = "x"
        contents[3] = contents[2]
        contents[4] = contents[2]

    repos = np.array([f"org{i % 37}/repo{i}" for i in range(n_repos)])
    repo = repos[repo_idx]
    exts = np.array(LANGS)
    a = rng.integers(0, 12, n)
    b = rng.integers(0, 40, n)
    c = np.arange(n)
    path = np.array([f"dir{a[i]}/sub{b[i]}/file{c[i]}.{exts[lang_idx[i]]}"
                     for i in range(n)])
    n_commits = 8
    cpick = rng.integers(0, n_commits, n)
    commit = np.array([
        hashlib.sha1(f"{repo[i]}#{cpick[i]}".encode()).hexdigest()
        for i in range(n)])
    lang = exts[lang_idx]
    return pa.table({
        "repo": pa.array(repo.tolist(), pa.string()),
        "path": pa.array(path.tolist(), pa.string()),
        "commit": pa.array(commit.tolist(), pa.string()),
        "lang": pa.array(lang.tolist(), pa.string()),
        "content": pa.array(contents, pa.string()),
    })


SF_ROWS = {"sf0.001": 2000, "sf0.01": 20000, "sf0.1": 100000}


def fixture_path(sf: str, skew: bool = False) -> str:
    """Generate-once parquet cache of the north-rule table at a scale factor."""
    cache = os.path.abspath(CACHE)
    os.makedirs(cache, exist_ok=True)
    name = f"repofiles{'_skew' if skew else ''}_{sf}.parquet"
    path = os.path.join(cache, name)
    if not os.path.exists(path):
        tbl = repofiles(SF_ROWS[sf], seed=42, skew=skew)
        # small row groups: a parquet file is split at row-group boundaries,
        # so this is what makes the Spark scan (and the shuffle write that
        # follows it) parallel instead of one fat task
        pq.write_table(tbl, path, row_group_size=8192)
    return path
