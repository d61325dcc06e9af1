"""Exclude-pattern grammar parity (SURVEY S3/F3).

Three authorities, strongest available for each layer:
- normalization: the reference's own `vexor.utils` functions (pure,
  importable without pathspec);
- matching grammar + walk model: `git check-ignore` itself — pathspec
  (the reference's matcher) is absent in this sandbox, and git is the
  semantics both of them define themselves by;
- the Spark Column predicate: must equal the scalar matcher on every
  (patterns, path) case.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from vexor_spark.functions.ignore import (
    ExcludeSpec,
    build_exclude_spec,
    compile_pattern,
    excluded_col,
    normalize_exclude_patterns,
    normalize_extensions,
)

REFERENCE = Path("/root/reference")

NORMALIZE_CASES = [
    None,
    [],
    ["  "],
    [".js"],
    ["js"],
    [".js", ".JS", "js"],
    ["a,b c", ".py,.md"],
    ["."],
    ["..", ".tar.gz"],
    ["*.log"],
    [".log", "*.log", "node_modules/"],
    ["src/*.ts", ".ts"],
    ["a", None, "b,a  b"],
    [".Js", ".js"],
    ["**/build", ".o, .so .a"],
]


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout absent")
def test_normalization_matches_reference():
    sys.path.insert(0, str(REFERENCE))
    try:
        from vexor.utils import (
            normalize_exclude_patterns as ref_excl,
            normalize_extensions as ref_exts,
        )

        for case in NORMALIZE_CASES:
            assert normalize_exclude_patterns(case) == ref_excl(case), case
            assert normalize_extensions(case) == ref_exts(case), case
    finally:
        sys.path.remove(str(REFERENCE))


# Pattern corpora: each list is one .gitignore; paths below are probed
# against every corpus. Covers anchoring, dir-only, negation,
# last-match-wins, *, ?, classes, ** forms, escapes, comments.
PATTERN_SETS = [
    ["*.log"],
    ["build/"],
    ["build"],
    ["/build"],
    ["node_modules/", "!node_modules/keep.js"],
    ["*.tmp", "!keep.tmp"],
    ["src/*.ts"],
    ["src/**/*.ts"],
    ["**/draft?.md"],
    ["docs/**"],
    ["**/sub/", "!important/**"],
    ["a/**/b"],
    ["[abc].txt", "[!abc].md"],
    ["# comment", "", "real.txt"],
    ["deep/", "!deep/x.txt"],  # re-include under excluded dir must FAIL
    ["*.py[cod]"],
    ["foo*bar"],
    ["lib/*", "!lib/core"],
    ["a?c/"],
    ["**/vendor/**"],
    ["\\#literal", "\\!bang"],
    ["two**stars"],
    ["dir/file with space.txt"],
    ["*.log", "!debug.log", "trace*.log"],
    # single-segment '<dir>/**': the inner slash anchors to the spec
    # root even after the '/**' tail is stripped (git parity — a
    # nested 'x/docs/a.md' must NOT match 'docs/**')
    ["node_modules/**"],
    ["build/**", "docs/**"],
    ["src/**"],
]

PATHS = [
    "a.log",
    "x/a.log",
    "x/y/a.log",
    "debug.log",
    "x/debug.log",
    "trace1.log",
    "build",
    "build/out.o",
    "x/build/out.o",
    "node_modules/pkg/index.js",
    "node_modules/keep.js",
    "keep.tmp",
    "x/keep.tmp",
    "other.tmp",
    "src/a.ts",
    "src/deep/a.ts",
    "tests/a.ts",
    "draft1.md",
    "docs/draft2.md",
    "docs/x/draft3.md",
    "docs/notes.txt",
    "important/sub/file.txt",
    "a/b",
    "a/x/b",
    "a/x/y/b",
    "a.txt",
    "b.txt",
    "d.md",
    "a.md",
    "real.txt",
    "deep/x.txt",
    "deep/y/x.txt",
    "x.pyc",
    "x.pyo",
    "x.py",
    "foobar",
    "fooXbar",
    "foo/bar",
    "lib/core",
    "lib/core/x.c",
    "lib/other/x.c",
    "abc/f",
    "aXc/f",
    "vendor/x",
    "a/vendor/x/y",
    "#literal",
    "!bang",
    "twoXYstars",
    "two/stars",
    "dir/file with space.txt",
    # nested occurrences of dirs named by single-segment '/**' patterns
    "x/docs/a.md",
    "q/build/o",
    "x/node_modules/y.js",
    "x/src/a.ts",
    "x/y/src/deep/b.ts",
]


def _git_ignored(patterns: list[str], paths: list[str], tmp: Path) -> set[str]:
    repo = tmp / "repo"
    repo.mkdir(exist_ok=True)
    subprocess.run(
        ["git", "init", "-q"], cwd=repo, check=True, capture_output=True
    )
    (repo / ".gitignore").write_text("\n".join(patterns) + "\n")
    proc = subprocess.run(
        [
            "git",
            "-c", "core.excludesFile=/dev/null",
            "check-ignore", "--stdin", "-z", "--no-index",
        ],
        cwd=repo,
        input="\0".join(paths).encode(),
        capture_output=True,
    )
    # exit 0 = some ignored, 1 = none ignored; anything else is an error
    assert proc.returncode in (0, 1), proc.stderr.decode()
    out = proc.stdout.decode()
    return {p for p in out.split("\0") if p}


@pytest.mark.parametrize("idx", range(len(PATTERN_SETS)))
def test_grammar_matches_git_check_ignore(idx, tmp_path):
    patterns = PATTERN_SETS[idx]
    want = _git_ignored(patterns, PATHS, tmp_path)
    spec = ExcludeSpec(patterns)
    got = {p for p in PATHS if spec.excluded(p)}
    assert got == want, f"patterns={patterns}\nonly_ours={got - want}\nonly_git={want - got}"


def test_column_predicate_matches_scalar(spark):
    rows = [(i, p) for i, p in enumerate(PATHS)]
    df = spark.createDataFrame(rows, "id int, path string")
    for patterns in PATTERN_SETS:
        # the Column goes through normalize (public entry shape), so
        # feed the scalar the same normalized lines
        spec = ExcludeSpec(normalize_exclude_patterns(patterns))
        got = {
            r["path"]: r["ex"]
            for r in df.select(
                "path", excluded_col(F.col("path"), patterns).alias("ex")
            ).collect()
        }
        for p in PATHS:
            assert got[p] == spec.excluded(p), (patterns, p)


def test_extension_sugar_end_to_end(spark):
    spec = build_exclude_spec([".log,.tmp", "node_modules/"])
    assert spec is not None
    assert spec.lines == ("**/*.log", "**/*.tmp", "node_modules/")
    assert spec.excluded("x/y/z.log")
    assert spec.excluded("a.tmp")
    assert spec.excluded("node_modules/p/i.js")
    assert not spec.excluded("src/main.py")
    assert build_exclude_spec(None) is None
    assert build_exclude_spec(["  "]) is None


def test_compile_pattern_edge_cases():
    assert compile_pattern("") is None
    assert compile_pattern("# comment") is None
    assert compile_pattern("   ") is None
    assert compile_pattern("!") is None
    assert compile_pattern("/") is None
    p = compile_pattern("trailing space ")
    assert p is not None and p.regex.endswith("trailing\\ space$")


def test_search_with_exclude_patterns(spark):
    """Superset-reuse search with a gitignore-style exclude: excluded
    urls vanish from results while surviving docs keep their FULL-corpus
    BM25 scores (same df/avgdl — reference superset semantics)."""
    from vexor_spark.index.build import build_index
    from vexor_spark.sources.corpus import PAGES_SCHEMA

    from datetime import datetime

    rows = []
    for i in range(30):
        d = ["src", "docs", "node_modules/pkg"][i % 3]
        rows.append(
            (
                f"https://example.com/{d}/f{i}.txt",
                datetime(2024, 1, 1),
                f"sharedterm unique{i} filler words here".encode(),
                None,
                "en",
            )
        )
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    idx = build_index(pages, salt_partitions=4, term_buckets=4)
    try:
        base = {
            r["url"]: r["score"]
            for r in idx.search("sharedterm", k=30).collect()
        }
        filtered = idx.search(
            "sharedterm", k=30, exclude_patterns=["node_modules/", ".md"]
        ).collect()
        got = {r["url"]: r["score"] for r in filtered}
        assert got, "filtered search returned nothing"
        assert all("/node_modules/" not in u for u in got)
        # survivors keep superset scores exactly
        for u, s in got.items():
            assert s == base[u], u
        assert set(got) == {u for u in base if "/node_modules/" not in u}
    finally:
        idx.docs.unpersist()
        idx.postings.unpersist()


SCOPE_CASES = [
    ("", ""), ("", "sub"),
    ("# comment", "sub"), (r"\#literal", "sub"),
    ("*.log", ""), ("*.log", "sub"), ("*.log", "a/b"),
    ("/anchored.txt", "sub"), ("/", "sub"), ("/dir/", "sub"),
    ("build/", "sub"), ("deep/path.txt", "sub"),
    ("!keep.txt", "sub"), ("!/keep.txt", "sub"), (r"\!bang", "sub"),
    ("dir/", "a/b"), ("name", "a/b"), ("a/**/b", "x"),
]


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout absent")
def test_scope_line_matches_reference():
    from vexor_spark.functions.ignore import scope_ignore_line

    sys.path.insert(0, str(REFERENCE))
    try:
        from vexor.utils import _scope_gitignore_line

        for line, base in SCOPE_CASES:
            assert scope_ignore_line(line, base) == _scope_gitignore_line(line, base), (
                line, base,
            )
    finally:
        sys.path.remove(str(REFERENCE))


def test_union_specs_matches_git_nested_gitignores(tmp_path):
    """Nested .gitignore files scoped+unioned into one root spec must
    agree with git itself evaluating the same nested files."""
    from vexor_spark.functions.ignore import union_ignore_specs

    repo = tmp_path / "repo"
    (repo / "sub" / "deep").mkdir(parents=True)
    (repo / "other").mkdir()
    subprocess.run(["git", "init", "-q"], cwd=repo, check=True, capture_output=True)
    root_lines = ["*.log", "build/", "!important.log"]
    sub_lines = ["*.tmp", "/anchored.md", "cache/", "!keep.tmp"]
    deep_lines = ["secret*"]
    (repo / ".gitignore").write_text("\n".join(root_lines) + "\n")
    (repo / "sub" / ".gitignore").write_text("\n".join(sub_lines) + "\n")
    (repo / "sub" / "deep" / ".gitignore").write_text("\n".join(deep_lines) + "\n")

    paths = [
        "a.log", "important.log", "sub/x.log", "sub/important.log",
        "build/o.txt", "sub/build/o.txt",
        "x.tmp", "sub/x.tmp", "sub/deep/y.tmp", "sub/keep.tmp",
        "anchored.md", "sub/anchored.md", "sub/deep/anchored.md",
        "cache/f", "sub/cache/f", "sub/deep/cache/f",
        "secret1", "sub/secret1", "sub/deep/secret1", "sub/deep/z/secret2",
        "other/a.txt",
    ]
    proc = subprocess.run(
        ["git", "-c", "core.excludesFile=/dev/null", "check-ignore",
         "--stdin", "-z", "--no-index"],
        cwd=repo, input="\0".join(paths).encode(), capture_output=True,
    )
    assert proc.returncode in (0, 1), proc.stderr.decode()
    want = {p for p in proc.stdout.decode().split("\0") if p}

    spec = union_ignore_specs(
        [(root_lines, ""), (sub_lines, "sub"), (deep_lines, "sub/deep")]
    )
    got = {p for p in paths if spec.excluded(p)}
    assert got == want, f"only_ours={got - want} only_git={want - got}"
