"""Gitignore-style exclude patterns (SURVEY S3/F3): normalization,
pattern→regex compilation, and the git directory-walk exclusion model,
as both a pure scalar matcher and a JVM Column predicate.

Reference surface: `vexor.utils.normalize_exclude_patterns` (bare
`.ext` → `**/*.ext` sugar, vexor/utils.py:51-81 — parity-tested by
importing the reference, tests/test_ignore.py) and
`build_exclude_spec`/`is_excluded_path` (:84-99), which delegate to
pathspec's GitIgnoreSpec. pathspec is not installed in this sandbox,
so the matching-grammar authority here is git itself: the compiler and
walk model are parity-tested against `git check-ignore` over a
generated pattern×path corpus (git is what both gitignore files and
pathspec define themselves by).

Semantics implemented (gitignore(5)):
- last match wins; `!` negates; trailing `/` restricts to directories;
- a pattern containing a `/` (other than trailing) is anchored to the
  root, otherwise it matches at any depth;
- `*` and `?` never cross `/`; `[...]` classes; `\\` escapes;
- `**/` leading = any depth, `/**` trailing = everything inside,
  `/**/` = zero or more directories;
- a file under an excluded directory stays excluded — re-inclusion of
  a child cannot rescue it (the walk model below, which is also why
  git prunes excluded dirs during traversal).

Exclusion of path c1/…/cn is therefore evaluated the way git does:
any proper prefix c1/…/ci ignored AS A DIRECTORY (last-match-wins at
that prefix) excludes everything below it; otherwise the full path's
own last match (as file or dir) decides. Both the scalar matcher and
the Column predicate implement exactly this walk, so they agree with
`git check-ignore` including negation cases.

Scale note: the Column predicate is pure JVM regexp algebra over the
path column (one pass, no UDF); with P patterns and depth D it costs
O(P·D) regexp probes per row. Exclude lists are short (reference CLI
`--exclude`), so this stays a cheap scan-stage filter at 100 TB.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_extensions(values: Iterable[str] | None) -> tuple[str, ...]:
    """Sorted deduplicated `.ext` tokens (vexor/utils.py:24-48):
    comma/whitespace splitting, lowercase, dot-prefix, bare "." dropped.
    """
    if not values:
        return ()
    out: list[str] = []
    seen: set[str] = set()
    for raw in values:
        if raw is None:
            continue
        for piece in raw.replace(",", " ").split():
            tok = piece.strip().lower()
            if not tok:
                continue
            if not tok.startswith("."):
                tok = "." + tok
            if tok == "." or tok in seen:
                continue
            seen.add(tok)
            out.append(tok)
    return tuple(sorted(out))


def _is_bare_extension(token: str) -> bool:
    # vexor/utils.py:74-81: ".ext" with no path/glob metacharacters.
    if not token.startswith(".") or token in {".", ".."}:
        return False
    return not any(ch in token for ch in ("/", "\\", "*", "?", "[", "]"))


def normalize_exclude_patterns(values: Iterable[str] | None) -> tuple[str, ...]:
    """Order-preserving deduplicated exclude patterns with the bare
    `.ext` → `**/*.ext` sugar (vexor/utils.py:51-71)."""
    if not values:
        return ()
    out: list[str] = []
    seen: set[str] = set()
    for raw in values:
        if raw is None:
            continue
        for piece in raw.replace(",", " ").split():
            tok = piece.strip()
            if not tok:
                continue
            if _is_bare_extension(tok):
                tok = f"**/*{tok}"
            if tok in seen:
                continue
            seen.add(tok)
            out.append(tok)
    return tuple(out)


@dataclass(frozen=True)
class CompiledPattern:
    regex: str  # full-match regex for a relative path, '^...$'-anchored
    negated: bool
    dir_only: bool


def _glob_body_to_regex(body: str) -> str:
    """Translate one gitignore glob body (no leading '!', no trailing
    '/') into a regex fragment. Stays inside the common subset of
    Python re / Java / RE2 so the same string drives the scalar
    matcher, Spark rlike, and the DuckDB oracle."""
    # segment the '**' special forms first
    out: list[str] = []
    i = 0
    n = len(body)
    while i < n:
        ch = body[i]
        if ch == "*":
            if body.startswith("**", i):
                prev_slash = i == 0 or body[i - 1] == "/"
                nxt = i + 2
                if prev_slash and nxt < n and body[nxt] == "/":
                    # '**/' (leading or '/**/' middle): zero or more dirs
                    out.append("(?:[^/]+/)*")
                    i = nxt + 1
                    continue
                if prev_slash and nxt == n:
                    # trailing '/**' handled by caller stripping the
                    # slash; a bare '**' tail here means "anything"
                    out.append(".*")
                    i = nxt
                    continue
                # other '**' = two regular stars (gitignore(5))
                out.append("[^/]*")
                i = nxt
                continue
            out.append("[^/]*")
            i += 1
        elif ch == "?":
            out.append("[^/]")
            i += 1
        elif ch == "[":
            j = i + 1
            neg = j < n and body[j] in "!^"
            if neg:
                j += 1
            if j < n and body[j] == "]":
                j += 1  # literal ']' first in class
            while j < n and body[j] != "]":
                j += 2 if body[j] == "\\" else 1
            if j >= n:  # unterminated class: literal '['
                out.append(re.escape("["))
                i += 1
                continue
            cls = body[i + 1 : j]
            if cls.startswith(("!", "^")):
                cls = "^" + cls[1:]
            out.append("[" + cls + "]")
            i = j + 1
        elif ch == "\\" and i + 1 < n:
            out.append(re.escape(body[i + 1]))
            i += 2
        else:
            out.append(re.escape(ch))
            i += 1
    return "".join(out)


def compile_pattern(line: str) -> CompiledPattern | None:
    """One gitignore line → CompiledPattern, or None for blanks and
    comments. The regex full-matches a root-relative path (no leading
    or trailing '/')."""
    if not line:
        return None
    if line.startswith("#"):
        return None
    # trailing spaces are ignored unless backslash-escaped
    stripped = re.sub(r"(?<!\\) +$", "", line)
    if not stripped:
        return None
    negated = stripped.startswith("!")
    if negated:
        stripped = stripped[1:]
    elif stripped.startswith("\\!") or stripped.startswith("\\#"):
        stripped = stripped[1:]
    if not stripped:
        return None
    dir_only = stripped.endswith("/") and not stripped.endswith("\\/")
    if dir_only:
        stripped = stripped[:-1]
    if not stripped:
        return None
    # '/**' tail: dir contents, not the dir itself. Anchoring must be
    # decided BEFORE the suffix is stripped: 'docs/**' contains an
    # inner slash, so per gitignore(5) it anchors to the spec root
    # ('x/docs/a.md' must NOT match), even though the remainder
    # ('docs') has no slash left.
    anchored = "/" in stripped
    contents_only = False
    if stripped.endswith("/**"):
        contents_only = True
        stripped = stripped[:-3]
        if not stripped:
            return None
    if stripped.startswith("/"):
        stripped = stripped.lstrip("/")
        if not stripped:
            return None
    body = _glob_body_to_regex(stripped)
    prefix = "" if anchored else "(?:[^/]+/)*"
    suffix = "/.+" if contents_only else ""
    return CompiledPattern(f"^{prefix}{body}{suffix}$", negated, dir_only)


def compile_patterns(lines: Iterable[str]) -> list[CompiledPattern]:
    return [p for p in (compile_pattern(ln) for ln in lines) if p is not None]


def scope_ignore_line(line: str, base_dir: str) -> str | None:
    """Scope one .gitignore line found in `base_dir` (repo-relative, ''
    for the root) so it can join a single root-level spec — the
    reference's `_scope_gitignore_line` semantics (vexor/utils.py:
    146-171, parity-tested by importing it): comments/blanks drop;
    anchored lines prefix the base dir; floating lines (no inner '/')
    keep matching at any depth below the base via `base/**/`; negation
    survives in front."""
    if line == "":
        return None
    if line.startswith("#") and not line.startswith(r"\#"):
        return None
    if not base_dir:
        return line

    negated = line.startswith("!") and not line.startswith(r"\!")
    prefix = "!" if negated else ""
    body = line[1:] if negated else line

    anchored = body.startswith("/") and not body.startswith(r"\/")
    if anchored:
        body = body[1:]
        scoped = f"{base_dir}/{body}" if body else f"{base_dir}/"
        return f"{prefix}{scoped}"

    directory_only = body.endswith("/") and not body.endswith(r"\/")
    body_check = body[:-1] if directory_only else body
    if "/" in body_check:
        scoped = f"{base_dir}/{body}"
    else:
        scoped = f"{base_dir}/**/{body}"
    return f"{prefix}{scoped}"


def union_ignore_specs(specs_lines: Iterable[tuple[Iterable[str], str]]) -> "ExcludeSpec":
    """One ExcludeSpec from many (lines, base_dir) ignore files — the
    reference's spec `+=` union (vexor/utils.py:192-234): scope each
    file's lines to where the file lives, concatenate in walk order
    (later files override earlier ones under last-match-wins)."""
    combined: list[str] = []
    for lines, base_dir in specs_lines:
        for ln in lines:
            scoped = scope_ignore_line(ln, base_dir)
            if scoped is not None:
                combined.append(scoped)
    return ExcludeSpec(combined)


class ExcludeSpec:
    """Compiled exclude-pattern list with the git walk model.

    `matches(rel_path, is_dir)` is the single-path last-match-wins
    check (the reference's `is_excluded_path` shape); `excluded(path)`
    adds the ancestor-directory walk so it can be asked about leaf
    paths directly, without a filesystem traversal to prune for it.
    """

    def __init__(self, patterns: Iterable[str]):
        self.lines = tuple(patterns)
        self.compiled = compile_patterns(self.lines)
        self._res = [re.compile(p.regex) for p in self.compiled]

    def matches(self, rel_path: str, *, is_dir: bool = False) -> bool:
        rel = rel_path.replace("\\", "/").strip("/")
        if not rel:
            return False
        verdict = False
        for pat, rx in zip(self.compiled, self._res):
            if pat.dir_only and not is_dir:
                continue
            if rx.match(rel):
                verdict = not pat.negated
        return verdict

    def excluded(self, rel_path: str, *, is_dir: bool = False) -> bool:
        rel = rel_path.replace("\\", "/").strip("/")
        if not rel:
            return False
        parts = rel.split("/")
        for i in range(1, len(parts)):
            if self.matches("/".join(parts[:i]), is_dir=True):
                return True
        return self.matches(rel, is_dir=is_dir)


def build_exclude_spec(values: Iterable[str] | None) -> ExcludeSpec | None:
    """normalize_exclude_patterns + compile — the reference's
    `build_exclude_spec` (vexor/utils.py:84-90) without pathspec."""
    normalized = normalize_exclude_patterns(values)
    if not normalized:
        return None
    return ExcludeSpec(normalized)


def url_rel_path_col(url: Column) -> Column:
    """Root-relative path of a web url (scheme://host/a/b?q → a/b) —
    the corpus analog of the reference's filesystem-relative paths, so
    exclude patterns written for paths apply to crawled urls."""
    no_scheme = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")
    no_query = F.regexp_replace(no_scheme, r"[?#].*$", "")
    return F.regexp_replace(no_query, r"^/+|/+$", "")


def _match_level(subject: Column, compiled: list[CompiledPattern], *, is_dir: bool) -> Column:
    """Last-match-wins verdict for one path prefix as a Column: fold
    the when() chain in pattern order so later patterns override."""
    verdict: Column = F.lit(False)
    for pat in compiled:
        if pat.dir_only and not is_dir:
            continue
        verdict = F.when(subject.rlike(pat.regex), F.lit(not pat.negated)).otherwise(
            verdict
        )
    return verdict


def excluded_col(path: Column, patterns: Iterable[str], *, max_depth: int = 16) -> Column:
    """Boolean Column: is `path` (a root-relative file path) excluded
    under the git walk model? Pure JVM regexp algebra — the ancestor
    prefixes are unrolled to `max_depth` components (paths deeper than
    that evaluate their first max_depth−1 ancestors, which is already
    decisive unless exclude rules target >16-deep dirs).

    rlike compiles each pattern regex once per query plan; with the
    '^...$' anchors a probe is a single anchored scan of the path
    string. No UDF, no shuffle — Catalyst keeps this in the scan stage,
    so column pruning and partition pruning above it still apply."""
    compiled = compile_patterns(normalize_exclude_patterns(patterns))
    if not compiled:
        return F.lit(False)
    clean = F.regexp_replace(path, r"^/+|/+$", "")
    parts = F.split(clean, "/")
    verdict: Column = _match_level(clean, compiled, is_dir=False)
    for depth in range(1, max_depth):
        prefix = F.array_join(F.slice(parts, 1, depth), "/")
        verdict = F.when(
            (F.size(parts) > depth) & _match_level(prefix, compiled, is_dir=True),
            F.lit(True),
        ).otherwise(verdict)
    return verdict
