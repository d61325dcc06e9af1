"""`code` and `outline` chunking modes — AST-aware Python chunks and
markdown heading sections.

Scalar reimplementations of the reference semantics, executed inside
the same Arrow-batched chunking UDF as the other modes (operators/
chunking.py): Python string/ast behavior IS the parity contract, so
these stay in Python; everything relational around them is built-in
column algebra.

References:
- Python AST chunks: vexor/services/content_extract_service.py:234-481
  (`extract_code_chunks` / `_extract_python_chunks`): module prelude /
  module-globals gaps, top-level functions, classes (header +
  docstring + non-method statements + "Methods: ..." roster), methods
  with `Class.signature` displays, leading-#-comment extension capped
  at 10 lines / 500 chars (:18-19), syntax errors → [] (caller falls
  back to `full`).
- Outline chunks: content_extract_service.py:483-681
  (`extract_outline_chunks`): ATX + setext headings, ``` / ~~~ fence
  suppression, YAML front-matter skip, preamble section, breadcrumb
  stack, per-section snippet cleanup capped at 800 chars.
- Payload assembly: vexor/modes.py:127-225 (CodeStrategy /
  OutlineStrategy): code chunk text re-windowed by `_chunk_text`
  (modes.py:333-350), labels `{name} :: {display}[#i] :: {window}` /
  `{name} :: {breadcrumb}[ :: {text}]`.
- JS/TS arm (vexor/services/js_parser.py) requires tree-sitter, which
  the reference itself treats as optional (js_parser.py:24-31 returns
  None → []); we gate identically, so absent parsers fall back to
  `full` on both sides.
"""

from __future__ import annotations

import ast
import codecs
import re
from dataclasses import dataclass

from vexor_spark.constants import (
    DEFAULT_CHUNK_OVERLAP,
    DEFAULT_CHUNK_SIZE,
    FULL_CHAR_LIMIT,
    UTF8_BYTE_MULTIPLIER,
)

DOC_COMMENT_MAX_LINES = 10  # content_extract_service.py:18
DOC_COMMENT_MAX_CHARS = 500  # content_extract_service.py:19
OUTLINE_CONTEXT_CHAR_LIMIT = 800  # modes.py:186

CODE_SUFFIXES_PY = {".py"}
CODE_SUFFIXES_JS = {".js", ".jsx", ".mjs", ".cjs", ".ts", ".tsx", ".mts", ".cts"}
OUTLINE_SUFFIXES = {".md", ".markdown", ".mdx"}

# The reference's plain-text allowlist (content_extract_service.py:64-110):
# code/outline FALLBACK runs the full strategy only for these suffixes,
# else drops to the name payload (.mjs/.cjs/.mts/.cts/.markdown/.mdx are
# notably absent there). Generic web pages (our flagship `full` mode)
# are NOT suffix-gated — that pin is unchanged from round 1.
TEXT_EXTENSIONS = {
    ".txt", ".md", ".py", ".js", ".ts", ".json", ".yaml", ".yml", ".html",
    ".htm", ".toml", ".csv", ".log", ".ini", ".cfg", ".rst", ".tex", ".xml",
    ".sh", ".bat", ".go", ".java", ".c", ".cpp", ".h", ".hpp", ".rb", ".php",
    ".swift", ".rs", ".kt", ".dart", ".scala", ".pl", ".r", ".jl", ".hs",
    ".lua", ".vb", ".ps1", ".bash", ".zsh", ".fish", ".vue", ".jsx", ".tsx",
    ".scss",
}


def decode_full_source(data: bytes | None, char_limit: int = FULL_CHAR_LIMIT) -> str | None:
    """_read_text_full + CRLF normalization WITHOUT strip — code and
    outline chunking track 1-based line numbers, so leading blank lines
    must survive (content_extract_service.py:262-267, 505-508)."""
    from vexor_spark.functions.text import charset_fallback_py

    if data is None:
        return None
    capped = data[: char_limit * UTF8_BYTE_MULTIPLIER] if char_limit > 0 else data
    try:
        text = codecs.getincrementaldecoder("utf-8")().decode(capped, final=False)
    except UnicodeDecodeError:
        text = None
    if not text:
        text = charset_fallback_py(data)
        if not text:
            return None
    if char_limit > 0:
        text = text[:char_limit]
    return text.replace("\r\n", "\n")


@dataclass(frozen=True)
class CodeChunk:
    kind: str
    name: str
    display: str
    text: str
    start_line: int
    end_line: int


@dataclass(frozen=True)
class OutlineChunk:
    level: int
    title: str
    breadcrumb: str
    text: str
    start_line: int
    end_line: int


# --- Python AST chunking ----------------------------------------------------


def extract_python_chunks(source: str) -> list[CodeChunk]:
    """AST chunks for an already-decoded, CRLF-normalized source
    (content_extract_service.py:256-481)."""
    try:
        module = ast.parse(source)
    except SyntaxError:
        return []

    lines = source.splitlines(keepends=True)
    max_line = len(lines)

    def clamp(v: int) -> int:
        return min(max(v, 1), max_line) if max_line else 1

    def extend_with_comments(start: int) -> int:
        # contiguous leading '#' comments, excluding shebang / coding
        # lines, capped at 10 lines / 500 chars (:276-302).
        if start <= 1:
            return start
        idx = start - 2
        taken = 0
        chars = 0
        while idx >= 0:
            stripped = lines[idx].rstrip("\n").strip()
            if not stripped or not stripped.startswith("#"):
                break
            low = stripped.lower()
            if stripped.startswith("#!") or low.startswith("# coding") or low.startswith("# -*- coding"):
                break
            taken += 1
            chars += len(lines[idx].rstrip("\n")) + 1
            if taken >= DOC_COMMENT_MAX_LINES or chars >= DOC_COMMENT_MAX_CHARS:
                break
            idx -= 1
        return start - taken

    def node_start(node) -> int:
        start = node.lineno if isinstance(getattr(node, "lineno", None), int) else 1
        for deco in getattr(node, "decorator_list", None) or []:
            if isinstance(getattr(deco, "lineno", None), int):
                start = min(start, deco.lineno)
        return clamp(start)

    def node_end(node) -> int:
        if isinstance(getattr(node, "end_lineno", None), int):
            return clamp(node.end_lineno)
        body = getattr(node, "body", None) or []
        if body:
            last = body[-1]
            if isinstance(getattr(last, "end_lineno", None), int):
                return clamp(last.end_lineno)
            if isinstance(getattr(last, "lineno", None), int):
                return clamp(last.lineno)
        if isinstance(getattr(node, "lineno", None), int):
            return clamp(node.lineno)
        return max_line

    def sliced(start: int, end: int) -> str:
        if not max_line:
            return ""
        start, end = clamp(start), clamp(end)
        if end < start:
            end = start
        return "".join(lines[start - 1 : end]).strip()

    def sig_line(node) -> str:
        ln = getattr(node, "lineno", None)
        if not isinstance(ln, int) or not (1 <= ln <= max_line):
            return ""
        return lines[ln - 1].strip()

    chunks: list[CodeChunk] = []
    symbols = sorted(
        (
            (extend_with_comments(node_start(n)), node_end(n), n)
            for n in module.body
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef))
        ),
        key=lambda t: t[0],
    )

    def add_module(start: int, end: int, prelude: bool) -> None:
        text = sliced(start, end)
        if text:
            chunks.append(
                CodeChunk(
                    "module",
                    "module" if prelude else "module_globals",
                    "module" if prelude else "module globals",
                    text,
                    start,
                    end,
                )
            )

    if not symbols:
        add_module(1, max_line, prelude=True)
        return chunks

    cursor = 1
    seen = False
    for start, end, node in symbols:
        if cursor <= start - 1:
            add_module(cursor, start - 1, prelude=not seen)
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            text = sliced(start, end)
            if text:
                chunks.append(
                    CodeChunk(
                        "function", node.name, sig_line(node) or f"def {node.name}",
                        text, start, end,
                    )
                )
        elif isinstance(node, ast.ClassDef):
            chunks.extend(_class_chunks(node, start, end, sliced, sig_line, node_start, node_end, extend_with_comments))
        cursor = end + 1
        seen = True
    if cursor <= max_line:
        add_module(cursor, max_line, prelude=False)
    return chunks


def _class_chunks(node, start, end, sliced, sig_line, node_start, node_end, extend_with_comments) -> list[CodeChunk]:
    """Class chunk (header + docstring + non-method statements +
    method roster) followed by per-method chunks
    (content_extract_service.py:398-471)."""
    out: list[CodeChunk] = []
    display = sig_line(node) or f"class {node.name}"
    docstring = ast.get_docstring(node) or ""
    methods = [c for c in node.body if isinstance(c, (ast.FunctionDef, ast.AsyncFunctionDef))]

    def is_docstring_expr(stmt) -> bool:
        return (
            isinstance(stmt, ast.Expr)
            and isinstance(stmt.value, ast.Constant)
            and isinstance(stmt.value.value, str)
        )

    parts = [sliced(start, node.lineno)]
    if docstring.strip():
        parts.append(docstring.strip())
    for idx, child in enumerate(node.body):
        if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        if idx == 0 and docstring and is_docstring_expr(child):
            continue
        child_text = sliced(node_start(child), node_end(child))
        if child_text:
            parts.append(child_text)
    if methods:
        parts.append("Methods: " + ", ".join(m.name for m in methods))
    class_text = "\n".join(p for p in parts if p).strip()
    if class_text:
        out.append(CodeChunk("class", node.name, display, class_text, start, end))

    for child in methods:
        c_start = extend_with_comments(node_start(child))
        c_end = node_end(child)
        text = sliced(c_start, c_end)
        if not text:
            continue
        raw = sig_line(child).strip()
        m_display = f"{node.name}.{child.name}"
        if raw:
            if raw.startswith("async def "):
                m_display = f"async {node.name}.{raw[len('async def '):].rstrip(':').strip()}"
            elif raw.startswith("def "):
                m_display = f"{node.name}.{raw[len('def '):].rstrip(':').strip()}"
            else:
                m_display = f"{node.name}.{raw.rstrip(':').strip()}"
        out.append(
            CodeChunk("method", f"{node.name}.{child.name}", m_display, text, c_start, c_end)
        )
    return out


# --- JS/TS tree-sitter chunking ----------------------------------------------

_JS_SUFFIXES = {".js", ".jsx", ".mjs", ".cjs"}
_TS_SUFFIXES = {".ts", ".mts", ".cts"}
_TSX_SUFFIXES = {".tsx"}
_JS_DECL_TYPES = (
    "function_declaration",
    "class_declaration",
    "lexical_declaration",
    "variable_declaration",
)


def _js_parser_for(suffix: str):
    """Configured tree-sitter parser, or None when the grammars are
    absent — the reference treats them as optional the same way
    (js_parser.py:24-44), so missing libs fall back to `full` on both
    sides. The parity suite injects a stub parser here AND into the
    reference's js_parser to prove the walking logic below without the
    real grammars (tests/test_js_chunks.py)."""
    try:
        from tree_sitter import Language, Parser
        import tree_sitter_javascript as ts_js
        import tree_sitter_typescript as ts_ts
    except ImportError:
        return None
    s = suffix.lower()
    if s in _JS_SUFFIXES:
        lang = Language(ts_js.language())
    elif s in _TSX_SUFFIXES:
        lang = Language(ts_ts.language_tsx())
    elif s in _TS_SUFFIXES:
        lang = Language(ts_ts.language_typescript())
    else:
        return None
    return Parser(lang)


def _trim_js_doc(block: list[str]) -> str | None:
    """Doc-comment block trim: ≤10 lines / ≤500 chars
    (js_parser.py:112-123, content_extract_service.py:18-19)."""
    if not block:
        return None
    kept = block[:DOC_COMMENT_MAX_LINES]
    text = "\n".join(ln.rstrip("\n") for ln in kept).strip()
    if not text:
        return None
    if len(text) > DOC_COMMENT_MAX_CHARS:
        text = text[:DOC_COMMENT_MAX_CHARS].rstrip()
    return text or None


def _js_doc_comment(lines: list[str], start_line: int) -> tuple[int, str] | None:
    """Contiguous `//` run, else a closed `/* … */` block, directly
    above start_line (js_parser.py:126-171). Returns (1-based first
    comment line, trimmed text)."""
    if start_line <= 1:
        return None
    above = start_line - 2  # 0-based index of the line above
    if above >= 0 and lines[above].strip():
        idx = above
        while idx >= 0 and lines[idx].strip().startswith("//"):
            idx -= 1
        first = idx + 1
        if first < start_line - 1:
            text = _trim_js_doc(lines[first : start_line - 1])
            if text:
                return first + 1, text
    if above < 0:
        return None
    tail = lines[above].strip()
    if not tail or "*/" not in tail:
        return None
    idx = above
    while idx >= 0 and "/*" not in lines[idx]:
        idx -= 1
    if idx < 0 or not lines[idx].lstrip().startswith("/*"):
        return None
    text = _trim_js_doc(lines[idx : start_line - 1])
    if not text:
        return None
    return idx + 1, text


def extract_js_chunks(source: str, suffix: str) -> list[CodeChunk]:
    """JS/TS AST chunks: top-level functions, arrow-function consts,
    classes with method rosters, per-method chunks, doc-comment
    extension, export unwrapping, and module-gap chunks — the walking
    and assembly semantics of vexor/services/js_parser.py:185-435,
    restructured around a symbol-emitter helper. Requires tree-sitter
    (optional in the reference too); stub-parity-proven chunk-for-chunk
    against the reference's own extract_js_chunks under an injected
    stub parser."""
    if suffix.lower() not in CODE_SUFFIXES_JS:
        return []
    parser = _js_parser_for(suffix)
    if parser is None:
        return []
    data = source.encode("utf-8")
    if not data:
        return []
    try:
        root = parser.parse(data).root_node
    except Exception:
        return []
    if root is None:
        return []

    lines = source.splitlines(keepends=True)
    max_line = len(lines)

    def text_of(node) -> str:
        return data[node.start_byte : node.end_byte].decode("utf-8", errors="replace")

    def line_of(offset: int) -> int:
        return data[:offset].decode("utf-8", errors="replace").count("\n") + 1

    def child_of(node, *types):
        for c in node.children:
            if c.type in types:
                return c
        return None

    def name_of(node, *types) -> str | None:
        c = child_of(node, *types)
        return text_of(c) if c is not None else None

    def first_line(text: str) -> str:
        for ln in text.splitlines():
            if ln.strip():
                return ln.strip()
        return text[:80] if text else ""

    def slice_lines(start: int, end: int) -> str:
        if not max_line or start < 1:
            return ""
        start = max(1, min(start, max_line))
        end = max(start, min(end, max_line))
        return "".join(lines[start - 1 : end]).strip()

    # (sort_key, end, kind, name, display, text)
    symbols: list[tuple[int, int, str, str, str, str]] = []

    def with_doc(start_line: int, raw: str) -> tuple[int, str, str | None]:
        doc = _js_doc_comment(lines, start_line)
        if not doc:
            return start_line, raw, None
        comment_start, comment_text = doc
        return comment_start, f"{comment_text}\n{raw}", comment_text

    def arrow_declarator(decl_node):
        for c in decl_node.children:
            if c.type == "variable_declarator" and child_of(c, "arrow_function"):
                return c
        return None

    def emit_function(name: str | None, display: str, start: int, end: int, raw: str):
        start, text, _ = with_doc(start, raw)
        symbols.append((start, end, "function", name or "anonymous", display, text))

    def emit_class(node, start: int, end: int, raw: str, *, display: str):
        cname = name_of(node, "type_identifier", "identifier") or "AnonymousClass"
        body = child_of(node, "class_body")
        methods = (
            [c for c in body.children if c.type == "method_definition"] if body else []
        )
        method_names = [
            n for n in (name_of(m, "property_identifier") for m in methods) if n
        ]
        start, _, doc_text = with_doc(start, raw)
        parts = ([doc_text] if doc_text else []) + [first_line(raw)]
        if method_names:
            parts.append("Methods: " + ", ".join(method_names))
        symbols.append(
            (start, end, "class", cname, display.format(name=cname), "\n".join(parts))
        )
        for m in methods:
            mname = name_of(m, "property_identifier")
            if not mname:
                continue
            m_start = line_of(m.start_byte)
            m_end = line_of(m.end_byte)
            m_start, m_text, _ = with_doc(m_start, text_of(m))
            qual = f"{cname}.{mname}"
            symbols.append((m_start, m_end, "method", qual, qual, m_text))

    for node in root.children:
        start = line_of(node.start_byte)
        end = line_of(node.end_byte)
        raw = text_of(node)
        ntype = node.type
        if ntype == "export_statement":
            inner = child_of(node, *_JS_DECL_TYPES)
            if inner is None:
                continue
            # exported symbols keep the export node's range and text
            # (js_parser.py:322-379)
            if inner.type == "function_declaration":
                emit_function(
                    name_of(inner, "identifier"), first_line(raw), start, end, raw
                )
            elif inner.type == "class_declaration":
                emit_class(inner, start, end, raw, display="export class {name}")
            else:
                # every arrow declarator of an exported declaration
                # emits (js_parser.py:372-378), unlike the non-export
                # arm which stops at the first (:264-271)
                for c in inner.children:
                    if c.type == "variable_declarator" and child_of(
                        c, "arrow_function"
                    ):
                        emit_function(
                            name_of(c, "identifier"), first_line(raw), start, end, raw
                        )
        elif ntype == "function_declaration":
            emit_function(name_of(node, "identifier"), first_line(raw), start, end, raw)
        elif ntype == "class_declaration":
            emit_class(node, start, end, raw, display="class {name}")
        elif ntype in ("lexical_declaration", "variable_declaration"):
            decl = arrow_declarator(node)
            if decl is not None:
                emit_function(
                    name_of(decl, "identifier"), first_line(raw), start, end, raw
                )

    symbols.sort(key=lambda s: s[0])

    chunks: list[CodeChunk] = []

    def add_module(start: int, end: int, *, prelude: bool) -> None:
        text = slice_lines(start, end)
        if text.strip():
            chunks.append(
                CodeChunk(
                    "module",
                    "module" if prelude else "module_globals",
                    "module" if prelude else "module globals",
                    text,
                    start,
                    end,
                )
            )

    if not symbols:
        add_module(1, max_line, prelude=True)
        return chunks

    cursor = 1
    seen = False
    for start, end, kind, name, display, text in symbols:
        if cursor < start:
            add_module(cursor, start - 1, prelude=not seen)
        chunks.append(CodeChunk(kind, name, display, text, start, end))
        cursor = end + 1
        seen = True
    if cursor <= max_line:
        add_module(cursor, max_line, prelude=False)
    return chunks


def extract_code_chunks(source: str, suffix: str) -> list[CodeChunk]:
    """Dispatch per content_extract_service.py:234-254."""
    if suffix in CODE_SUFFIXES_PY:
        return extract_python_chunks(source)
    if suffix in CODE_SUFFIXES_JS:
        return extract_js_chunks(source, suffix)
    return []


# --- Markdown outline chunking ----------------------------------------------

_FENCE_RE = re.compile(r"^\s*([`~]{3,})")
_ATX_RE = re.compile(r"^\s{0,3}(#{1,6})\s+(.*)$")
_SETEXT_RE = re.compile(r"^\s{0,3}([=-]{3,})\s*$")


def _cleanup_snippet(snippet: str) -> str | None:
    lines = [ln.strip() for ln in snippet.splitlines() if ln.strip()]
    joined = " ".join(lines)
    return joined or None


def extract_outline_chunks(
    source: str, *, context_char_limit: int = OUTLINE_CONTEXT_CHAR_LIMIT
) -> list[OutlineChunk]:
    """Markdown outline for an already-decoded, CRLF-normalized source
    (content_extract_service.py:494-681)."""
    lines = source.splitlines()
    if not lines:
        return []

    front_matter_end: int | None = None
    if lines[0].strip() == "---":
        for idx, line in enumerate(lines[1:], start=1):
            if line.strip() in {"---", "..."}:
                front_matter_end = idx
                break

    @dataclass(frozen=True)
    class Heading:
        line: int
        end_line: int
        level: int
        title: str
        content_start: int

    headings: list[Heading] = []
    starts: set[int] = set()
    in_fence = False
    fence_char = ""
    fence_len = 0
    prev_text: str | None = None
    prev_idx: int | None = None

    for idx, line in enumerate(lines, start=1):
        if front_matter_end is not None and idx <= front_matter_end + 1:
            prev_text = prev_idx = None
            continue
        fence = _FENCE_RE.match(line)
        if fence:
            marker = fence.group(1)
            if not in_fence:
                in_fence, fence_char, fence_len = True, marker[0], len(marker)
            elif marker[0] == fence_char and len(marker) >= fence_len:
                in_fence, fence_char, fence_len = False, "", 0
            prev_text = prev_idx = None
            continue
        if in_fence:
            continue
        atx = _ATX_RE.match(line)
        if atx:
            title = re.sub(r"\s#+\s*$", "", atx.group(2).strip()).strip()
            if title and idx not in starts:
                starts.add(idx)
                headings.append(Heading(idx, idx, len(atx.group(1)), title, idx + 1))
            prev_text = prev_idx = None
            continue
        setext = _SETEXT_RE.match(line)
        if setext and prev_text and prev_idx:
            if prev_text.lstrip().startswith("#"):
                prev_text, prev_idx = line, idx
                continue
            title = prev_text.strip()
            if title and prev_idx not in starts:
                starts.add(prev_idx)
                level = 1 if setext.group(1).startswith("=") else 2
                headings.append(Heading(prev_idx, idx, level, title, idx + 1))
            prev_text = prev_idx = None
            continue
        prev_text, prev_idx = line, idx

    if not headings:
        return []
    headings.sort(key=lambda h: h.line)

    preamble_start = 1 if front_matter_end is None else front_matter_end + 2
    first = headings[0].line
    if preamble_start <= first - 1:
        pre = _cleanup_snippet("\n".join(lines[preamble_start - 1 : first - 1]))
        if pre:
            headings.insert(
                0, Heading(preamble_start, first - 1, 0, "preamble", preamble_start)
            )

    stack: list[tuple[int, str]] = []
    chunks: list[OutlineChunk] = []
    for idx, h in enumerate(headings):
        if h.level == 0:
            breadcrumb = "preamble"
        else:
            while stack and stack[-1][0] >= h.level:
                stack.pop()
            stack.append((h.level, h.title))
            breadcrumb = " > ".join(t for _, t in stack)
        section_end = len(lines)
        for nxt in headings[idx + 1 :]:
            if nxt.line <= h.line:
                continue
            if h.level == 0 or nxt.level <= h.level:
                section_end = nxt.line - 1
                break
        start = max(h.content_start, 1)
        end = max(section_end, start)
        cleaned = _cleanup_snippet("\n".join(lines[start - 1 : end])) or ""
        if context_char_limit > 0 and len(cleaned) > context_char_limit:
            cleaned = cleaned[:context_char_limit].rstrip()
        chunks.append(OutlineChunk(h.level, h.title, breadcrumb, cleaned, h.line, section_end))
    return chunks


# --- payload assembly (modes.py CodeStrategy / OutlineStrategy) -------------


def chunk_text_windows(text: str, chunk_size: int, overlap: int) -> list[str]:
    """modes.py:333-350 `_chunk_text` (windows without line tracking)."""
    normalized = text.replace("\r\n", "\n").strip()
    if not normalized:
        return []
    size = max(int(chunk_size), 1)
    stride = max(size - max(int(overlap), 0), 1)
    out: list[str] = []
    start = 0
    length = len(normalized)
    while start < length:
        window = normalized[start : start + size].strip()
        if window:
            out.append(window)
        if start + size >= length:
            break
        start += stride
    return out


def code_payloads(
    name: str,
    data: bytes | None,
    suffix: str,
    *,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
    char_limit: int = FULL_CHAR_LIMIT,
) -> list[dict] | None:
    """CodeStrategy payloads (modes.py:127-180); None → caller falls
    back to the `full` strategy."""
    from vexor_spark.operators.chunking import _normalize_preview_chunk, _trim_preview

    source = decode_full_source(data, char_limit)
    if not source:
        return None
    code_chunks = extract_code_chunks(source, suffix)
    if not code_chunks:
        return None
    payloads: list[dict] = []
    for chunk in code_chunks:
        windows = chunk_text_windows(chunk.text, chunk_size, overlap)
        total = len(windows)
        for local_idx, window in enumerate(windows, start=1):
            normalized = _normalize_preview_chunk(window)
            if not normalized:
                continue
            suffix_tag = f" [#{local_idx}]" if total > 1 else ""
            payloads.append(
                {
                    "chunk_index": len(payloads),
                    "label": f"{name} :: {chunk.display}{suffix_tag} :: {normalized}",
                    "preview": f"{chunk.display}{suffix_tag} :: {_trim_preview(normalized)}",
                    "start_line": chunk.start_line,
                    "end_line": chunk.end_line,
                }
            )
    return payloads or None


def outline_payloads(
    name: str,
    data: bytes | None,
    *,
    context_char_limit: int = OUTLINE_CONTEXT_CHAR_LIMIT,
    char_limit: int = FULL_CHAR_LIMIT,
) -> list[dict] | None:
    """OutlineStrategy payloads (modes.py:183-225); None → fall back to
    `full`."""
    from vexor_spark.operators.chunking import _trim_preview

    source = decode_full_source(data, char_limit)
    if not source:
        return None
    outline = extract_outline_chunks(source, context_char_limit=context_char_limit)
    if not outline:
        return None
    payloads: list[dict] = []
    for index, chunk in enumerate(outline):
        if chunk.text:
            label = f"{name} :: {chunk.breadcrumb} :: {chunk.text}"
            preview = f"{chunk.breadcrumb} :: {_trim_preview(chunk.text)}"
        else:
            label = f"{name} :: {chunk.breadcrumb}"
            preview = chunk.breadcrumb
        payloads.append(
            {
                "chunk_index": index,
                "label": label,
                "preview": preview,
                "start_line": chunk.start_line,
                "end_line": chunk.end_line,
            }
        )
    return payloads


def url_suffix(url: str) -> str:
    """Lowercased extension of the url's last path segment — the web
    analog of Path.suffix (AutoStrategy routing, modes.py:244-266)."""
    seg = url.rstrip("/").rsplit("/", 1)[-1]
    seg = seg.split("?", 1)[0].split("#", 1)[0]
    dot = seg.rfind(".")
    return seg[dot:].lower() if dot > 0 else ""
