"""`code` / `outline` / `auto` mode parity against the REFERENCE'S OWN
strategies (vexor/modes.py CodeStrategy/OutlineStrategy/AutoStrategy +
content_extract_service extract_code_chunks/extract_outline_chunks),
imported directly like test_reference_parity.py does. Each source is
written to a temp file for the reference (it reads Paths) and passed
as bytes to our chunk_page_py; payloads must agree field-for-field.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference")
if not (REFERENCE / "vexor" / "modes.py").exists():  # pragma: no cover
    pytest.skip("reference checkout not present", allow_module_level=True)
sys.path.insert(0, str(REFERENCE))

import vexor.modes as ref_modes  # noqa: E402

from vexor_spark.operators.chunking import chunk_page_py  # noqa: E402

PY_SOURCES = {
    "basic.py": (
        "#!/usr/bin/env python\n# coding: utf-8\n# helper for greetings\n"
        "# another comment\nimport os\n\nX = 1\n\n"
        "def greet(name):\n    \"say hi\"\n    return f\"hi {name}\"\n\n"
        "class Greeter:\n    \"\"\"Greets people.\"\"\"\n    count = 0\n\n"
        "    def __init__(self, tag):\n        self.tag = tag\n\n"
        "    async def agreet(self, name) -> str:\n        return name\n\nY = 2\n"
    ),
    "decorated.py": (
        "import functools\n\n# comment block right above\n# extends the start line\n"
        "@functools.lru_cache(maxsize=None)\n@staticmethod\n"
        "def cached(x):\n    return x * 2\n"
    ),
    "globals_only.py": "A = 1\nB = {'k': [1, 2, 3]}\nprint(A)\n",
    "syntax_error.py": "def broken(:\n    pass\n",
    "empty.py": "",
    "blank.py": "\n\n   \n",
    "class_no_doc.py": (
        "class Bare:\n    x = 1\n\n    def m(self):\n        return self.x\n\n"
        "    class Inner:\n        y = 2\n"
    ),
    "crlf.py": "def f():\r\n    return 1\r\n\r\nZ = 3\r\n",
    "long_comments.py": ("# c\n" * 15) + "def late():\n    return None\n",
    "windowed.py": (
        "def big():\n" + "".join(f"    v{i} = {i}\n" for i in range(200))
    ),
}

MD_SOURCES = {
    "doc.md": (
        "---\ntitle: x\n---\n\nintro paragraph before any heading\n\n"
        "# Top\n\nbody of top\n\n## Child A\n\ntext a\n\n### Grand\n\ndeep\n\n"
        "## Child B ##\n\ntext b\n\nSetext Title\n=====\n\nunder setext\n\n"
        "Lower Setext\n-----\n\nmore\n"
    ),
    "fenced.md": (
        "# Real\n\n```python\n# not a heading\ndef x():\n    pass\n```\n\n"
        "~~~\n## also not a heading\n~~~\n\n## After Fence\n\ntail\n"
    ),
    "no_headings.md": "just a paragraph\n\nwith no headings at all\n",
    "empty.md": "",
    "long_section.md": "# Big\n\n" + ("word " * 400) + "\n",
    "hash_setext.md": "# Heading\n-----\n\nbody\n",
    "front_matter_only.md": "---\na: b\n...\n",
}


def _ours(name: str, body: str, mode: str) -> list[tuple]:
    payloads = chunk_page_py(f"https://example.org/pkg/{name}", body.encode(), mode=mode)
    return [
        (p["chunk_index"], p["label"], p["preview"], p["start_line"], p["end_line"])
        for p in payloads
    ]


def _theirs(tmp_path: Path, name: str, body: str, mode: str) -> list[tuple]:
    f = tmp_path / name
    f.write_bytes(body.encode())
    payloads = ref_modes.get_strategy(mode).payloads_for_files([f])
    return [
        (p.chunk_index, p.label, p.preview, p.start_line, p.end_line) for p in payloads
    ]


@pytest.mark.parametrize("name", sorted(PY_SOURCES))
def test_code_mode_parity(tmp_path, name):
    body = PY_SOURCES[name]
    assert _ours(name, body, "code") == _theirs(tmp_path, name, body, "code")


@pytest.mark.parametrize("name", sorted(MD_SOURCES))
def test_outline_mode_parity(tmp_path, name):
    body = MD_SOURCES[name]
    assert _ours(name, body, "outline") == _theirs(tmp_path, name, body, "outline")


@pytest.mark.parametrize(
    "name,body",
    [
        ("auto.py", PY_SOURCES["basic.py"]),
        ("auto.md", MD_SOURCES["doc.md"]),
        ("auto.mdx", MD_SOURCES["fenced.md"]),
        ("auto.mjs", "export const x = 1;\n"),  # js arm: tree-sitter absent → full on both sides
        ("auto.txt", "plain text body\nwith two lines\n"),
        ("auto_big.txt", "x" * 10_001),
    ],
)
def test_auto_mode_routing_parity(tmp_path, name, body):
    assert _ours(name, body, "auto") == _theirs(tmp_path, name, body, "auto")


@pytest.mark.parametrize("mode", ["full", "head", "brief", "auto"])
@pytest.mark.parametrize("name", ["f.pdf", "f.docx", "f.pptx"])
def test_binary_format_gated_extractors_parity(tmp_path, name, mode):
    """S5 extractors are import-gated exactly like the reference: with
    pypdf/python-docx/python-pptx absent, every mode lands on the same
    name fallback for binary documents on both sides (instead of
    decoding raw container bytes as text)."""
    body = "%PDF-1.4 \x00\x01\x02 not really parseable \xff".encode("latin-1").decode("latin-1")
    payloads = chunk_page_py(
        f"https://example.org/files/{name}", body.encode("latin-1"), mode=mode
    )
    f = tmp_path / name
    f.write_bytes(body.encode("latin-1"))
    theirs = ref_modes.get_strategy(mode).payloads_for_files([f])
    assert [
        (p["chunk_index"], p["label"], p["preview"], p["start_line"], p["end_line"])
        for p in payloads
    ] == [(p.chunk_index, p.label, p.preview, p.start_line, p.end_line) for p in theirs]


def test_code_mode_engine_dataframe(spark):
    """The mode flows through the Arrow UDF + explode plan unchanged."""
    from vexor_spark.operators.chunking import chunk_pages

    rows = [
        (f"https://example.org/src/{n}", b)
        for n, b in [("a.py", PY_SOURCES["basic.py"].encode()),
                     ("b.md", MD_SOURCES["doc.md"].encode())]
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {
        (r["url"].rsplit("/", 1)[-1], r["chunk_index"]): r["label"]
        for r in chunk_pages(df, mode="auto").collect()
    }
    # scalar vs distributed identity
    for url, body in rows:
        for p in chunk_page_py(url, body, mode="auto"):
            assert got[(url.rsplit("/", 1)[-1], p["chunk_index"])] == p["label"]
    assert len(got) == sum(len(chunk_page_py(u, b, mode="auto")) for u, b in rows)
