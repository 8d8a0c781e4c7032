"""Engine dialects: endpoint normalization, request builders, response
parsers (SURVEY.md M5-M14, M9).

The reference implements one (builder, parser) pair per online engine
(OpenAI-chat: src/adapters/QwenAdapter.cpp:222-267; Gemini:
GeminiAdapter.cpp:96-130; Doubao responses: DoubaoAdapter.cpp:125-161;
content string-or-array: GeneralAdapter.cpp:64-103; polymorphic output:
DoubaoAdapter.cpp:72-123). Here they are PURE functions — no network
exists in this environment — used by engine actors as their serializer
/ deserializer and unit-tested directly. Parse errors are returned
in-band as ``(ok, error, text)``, never raised (reference semantics,
src/adapters/QwenAdapter.cpp:127-190: per-field presence validation
with typed error strings).
"""

from __future__ import annotations

import base64


# --- M9: URL / endpoint normalization ------------------------------------

_DIALECT_SUFFIX = {
    "openai_chat": "/v1/chat/completions",
    "doubao_responses": "/api/v1/responses",
}


def normalize_endpoint(host: str, dialect: str = "openai_chat") -> str:
    """Host → full endpoint: append the dialect's path unless the host
    already ends with it; collapse a trailing slash first
    (src/adapters/QwenAdapter.cpp:22-42 and clones)."""
    host = host.rstrip("/")
    suffix = _DIALECT_SUFFIX.get(dialect, "")
    if suffix and not host.endswith(suffix):
        host += suffix
    return host


def gemini_endpoint(host: str, model: str) -> str:
    """Gemini: ``…/models/{m}:generateContent``
    (src/adapters/GeminiAdapter.cpp:96-130)."""
    return f"{host.rstrip('/')}/v1beta/models/{model}:generateContent"


# --- M3: size-adaptive payload re-encode ---------------------------------

# The reference re-encodes PNG below this pixel area, JPEG q=85 above
# (src/adapters/QwenAdapter.cpp:108-117) — byte-size-aware handling of
# big payloads.
REENCODE_AREA_THRESHOLD = 1920 * 1080


def choose_encoding(width: int, height: int) -> str:
    return "png" if width * height <= REENCODE_AREA_THRESHOLD else "jpeg"


def payload_to_data_uri(payload: bytes, width: int, height: int) -> str:
    """base64 data-URI with the size-adaptive mime type (the wire form
    the builders embed, src/adapters/QwenAdapter.cpp:99-125)."""
    mime = f"image/{choose_encoding(width, height)}"
    return f"data:{mime};base64," + base64.b64encode(payload).decode("ascii")


# --- M5-M8: request builders ---------------------------------------------


def build_request_openai_chat(
    model: str,
    prompt: str,
    data_uri: str | None = None,
    temperature: float = 0.1,
    image_first: bool = True,
) -> dict:
    """OpenAI-chat dialect (QwenAdapter.cpp:222-267). ``image_first``
    captures the per-dialect content ordering difference
    (GeneralAdapter.cpp:113-135 puts the image last)."""
    content: list[dict] = []
    text_part = {"type": "text", "text": prompt}
    if data_uri is not None:
        img_part = {"type": "image_url", "image_url": {"url": data_uri}}
        content = [img_part, text_part] if image_first else [text_part, img_part]
    else:
        content = [text_part]
    return {
        "model": model,
        "messages": [{"role": "user", "content": content}],
        "temperature": temperature,
    }


def build_request_gemini(
    prompt: str, payload: bytes | None = None, mime: str = "image/png",
    temperature: float = 0.1,
) -> dict:
    """Gemini dialect: contents/parts + inline_data
    (GeminiAdapter.cpp:96-130)."""
    parts: list[dict] = []
    if payload is not None:
        parts.append(
            {"inline_data": {"mime_type": mime,
                             "data": base64.b64encode(payload).decode("ascii")}}
        )
    parts.append({"text": prompt})
    return {
        "contents": [{"parts": parts}],
        "generationConfig": {"temperature": temperature},
    }


def build_request_doubao(
    model: str, prompt: str, data_uri: str | None = None, temperature: float = 0.1
) -> dict:
    """Doubao responses dialect: input[{role, content:[input_image,
    input_text]}] (DoubaoAdapter.cpp:125-161)."""
    content: list[dict] = []
    if data_uri is not None:
        content.append({"type": "input_image", "image_url": data_uri})
    content.append({"type": "input_text", "text": prompt})
    return {
        "model": model,
        "input": [{"role": "user", "content": content}],
        "parameters": {"temperature": temperature},
    }


def build_request_layout(payload: bytes, file_type: int = 1) -> dict:
    """Layout-parsing dialect (PaddleAdapter.cpp:170-183): bare-base64
    ``file`` (no data-URI prefix) + ``fileType`` (1 = image). The
    auth travels as a ``token …`` Authorization header, not in the
    body (PaddleAdapter.cpp:160-168) — see ``layout_auth_header``."""
    return {
        "file": base64.b64encode(payload).decode("ascii"),
        "fileType": file_type,
    }


def layout_auth_header(api_key: str) -> dict:
    """``Authorization: token {key}`` (PaddleAdapter.cpp:160-163)."""
    return {"Authorization": f"token {api_key}"}


# --- M10-M14: response parsers (in-band errors) --------------------------


def _text_of(p: dict, key: str = "text") -> str:
    """In-band coercion of a message part's text field: a present-but-
    null or non-string value (one malformed response row) must never
    raise out of a parser and fail the whole batch — the module
    contract is errors IN BAND."""
    v = p.get(key)
    if isinstance(v, str):
        return v
    return "" if v is None else str(v)


def parse_response_openai_chat(doc: dict) -> tuple[bool, str, str]:
    """choices[0].message.content with per-field validation
    (QwenAdapter.cpp:127-190). Content may be a plain string or a list
    of {type:"text"} parts joined by newline (the M11 string-or-array
    union, GeneralAdapter.cpp:64-103)."""
    if not isinstance(doc, dict):
        return False, "parse: response is not an object", ""
    if "error" in doc:
        err = doc["error"]
        msg = err.get("message", str(err)) if isinstance(err, dict) else str(err)
        return False, f"http_error: {msg}", ""
    choices = doc.get("choices")
    if not isinstance(choices, list) or not choices:
        return False, "parse: missing choices", ""
    message = choices[0].get("message") if isinstance(choices[0], dict) else None
    if not isinstance(message, dict):
        return False, "parse: missing message", ""
    content = message.get("content")
    if isinstance(content, str):
        return True, "", content
    if isinstance(content, list):
        texts = [
            _text_of(p)
            for p in content
            if isinstance(p, dict) and p.get("type") == "text"
        ]
        return True, "", "\n".join(texts)
    return False, "parse: missing content", ""


def parse_response_gemini(doc: dict) -> tuple[bool, str, str]:
    """candidates[0].content.parts[*].text joined by newline
    (GeminiAdapter.cpp:59-94)."""
    if not isinstance(doc, dict):
        return False, "parse: response is not an object", ""
    cands = doc.get("candidates")
    if not isinstance(cands, list) or not cands:
        return False, "parse: missing candidates", ""
    content = cands[0].get("content") if isinstance(cands[0], dict) else None
    parts = content.get("parts") if isinstance(content, dict) else None
    if not isinstance(parts, list):
        return False, "parse: missing parts", ""
    texts = [_text_of(p) for p in parts if isinstance(p, dict) and "text" in p]
    if not texts:
        return False, "parse: no text parts", ""
    return True, "", "\n".join(texts)


def parse_response_doubao(doc: dict) -> tuple[bool, str, str]:
    """Polymorphic union (DoubaoAdapter.cpp:72-123): try output.text,
    then output.choices[0].message.content[] filtered to
    output_text|text, then top-level output_text — schema-on-read."""
    if not isinstance(doc, dict):
        return False, "parse: response is not an object", ""
    output = doc.get("output")
    if isinstance(output, dict):
        if isinstance(output.get("text"), str):
            return True, "", output["text"]
        choices = output.get("choices")
        if isinstance(choices, list) and choices:
            message = choices[0].get("message") if isinstance(choices[0], dict) else None
            content = message.get("content") if isinstance(message, dict) else None
            if isinstance(content, list):
                texts = [
                    _text_of(p)
                    for p in content
                    if isinstance(p, dict) and p.get("type") in ("output_text", "text")
                ]
                if texts:
                    return True, "", "\n".join(texts)
    if isinstance(doc.get("output_text"), str):
        return True, "", doc["output_text"]
    return False, "parse: no recognized output shape", ""


def parse_response_layout(doc: dict) -> tuple[bool, str, str]:
    """Layout-parsing dialect (PaddleAdapter.cpp:302-386): errorCode
    gate → result.layoutParsingResults[0].markdown.text → trim."""
    if not isinstance(doc, dict):
        return False, "parse: response is not an object", ""
    if doc.get("errorCode", 0) != 0:
        return False, f"http_error: {doc.get('errorMsg', 'unknown')}", ""
    result = doc.get("result")
    lpr = result.get("layoutParsingResults") if isinstance(result, dict) else None
    if not isinstance(lpr, list) or not lpr:
        return False, "parse: missing layoutParsingResults", ""
    md = lpr[0].get("markdown") if isinstance(lpr[0], dict) else None
    text = md.get("text") if isinstance(md, dict) else None
    if not isinstance(text, str):
        return False, "parse: missing markdown.text", ""
    return True, "", text.strip()
