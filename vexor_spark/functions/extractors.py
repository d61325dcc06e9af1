"""Binary-format text extractors (SURVEY S5): PDF / DOCX / PPTX.

Byte-stream reimplementations of the reference's extractors
(content_extract_service.py:770-874): page/paragraph/shape texts are
stripped, accumulated until char_limit, newline-joined, snippet-cleaned
and capped. The parser libraries (pypdf, python-docx, python-pptx) are
import-gated exactly like the reference's `try: import … except
Exception: return None` — when a library is absent the extractor
returns None and the chunker takes the same name-fallback the
reference takes, so behavior matches bit-for-bit in an environment
without the libs (this one). Inputs are `bytes` (web payloads), parsed
via BytesIO — the libraries accept streams as well as paths.
"""

from __future__ import annotations

import io


def _finish(buffer: list[str], char_limit: int) -> str | None:
    combined = "\n".join(buffer)
    if not combined:
        return None
    lines = [ln.strip() for ln in combined.splitlines() if ln.strip()]
    cleaned = " ".join(lines)
    if not cleaned:
        return None
    return cleaned[:char_limit]


def pdf_extract_py(data: bytes, char_limit: int) -> str | None:
    """content_extract_service.py:770-797."""
    try:
        from pypdf import PdfReader

        reader = PdfReader(io.BytesIO(data))
    except Exception:
        return None
    buffer: list[str] = []
    total = 0
    for page in reader.pages:
        try:
            text = page.extract_text() or ""
        except Exception:
            text = ""
        text = text.strip()
        if not text:
            continue
        buffer.append(text)
        total += len(text)
        if total >= char_limit:
            break
    return _finish(buffer, char_limit)


def docx_extract_py(data: bytes, char_limit: int) -> str | None:
    """content_extract_service.py:800-823."""
    try:
        from docx import Document

        document = Document(io.BytesIO(data))
    except Exception:
        return None
    buffer: list[str] = []
    total = 0
    for paragraph in document.paragraphs:
        text = paragraph.text.strip()
        if not text:
            continue
        buffer.append(text)
        total += len(text)
        if total >= char_limit:
            break
    return _finish(buffer, char_limit)


def _shape_text(shape) -> str | None:
    """content_extract_service.py:855-871."""
    text_frame = getattr(shape, "text_frame", None)
    if text_frame is None:
        text = (getattr(shape, "text", "") or "").strip()
        return text or None
    paragraphs: list[str] = []
    for paragraph in text_frame.paragraphs:
        if getattr(paragraph, "runs", None):
            text = "".join(run.text for run in paragraph.runs)
        else:
            text = paragraph.text
        text = (text or "").strip()
        if text:
            paragraphs.append(text)
    return " ".join(paragraphs) if paragraphs else None


def pptx_extract_py(data: bytes, char_limit: int) -> str | None:
    """content_extract_service.py:826-852."""
    try:
        from pptx import Presentation

        presentation = Presentation(io.BytesIO(data))
    except Exception:
        return None
    buffer: list[str] = []
    total = 0
    for slide in presentation.slides:
        for shape in slide.shapes:
            text = _shape_text(shape)
            if not text:
                continue
            buffer.append(text)
            total += len(text)
            if total >= char_limit:
                break
        if total >= char_limit:
            break
    return _finish(buffer, char_limit)


BINARY_EXTRACTORS = {
    ".pdf": pdf_extract_py,
    ".docx": docx_extract_py,
    ".pptx": pptx_extract_py,
}
