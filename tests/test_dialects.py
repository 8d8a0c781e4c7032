"""Dialect builders/parsers + endpoint normalization + size-adaptive
re-encode (SURVEY.md M3, M5-M14, M9)."""

import base64

from xs_vlm_ocr_ray.engines.dialects import (
    REENCODE_AREA_THRESHOLD,
    build_request_doubao,
    build_request_gemini,
    build_request_openai_chat,
    choose_encoding,
    gemini_endpoint,
    normalize_endpoint,
    parse_response_doubao,
    parse_response_gemini,
    parse_response_layout,
    parse_response_openai_chat,
    payload_to_data_uri,
)


def test_normalize_endpoint():
    assert normalize_endpoint("https://api.x.com") == "https://api.x.com/v1/chat/completions"
    assert normalize_endpoint("https://api.x.com/") == "https://api.x.com/v1/chat/completions"
    # already suffixed → unchanged
    assert (
        normalize_endpoint("https://api.x.com/v1/chat/completions")
        == "https://api.x.com/v1/chat/completions"
    )
    assert normalize_endpoint("https://a.b", "doubao_responses").endswith("/api/v1/responses")
    assert gemini_endpoint("https://g.x/", "m1") == "https://g.x/v1beta/models/m1:generateContent"


def test_size_adaptive_encoding():
    assert choose_encoding(1920, 1080) == "png"  # at threshold → png
    assert choose_encoding(1921, 1080) == "jpeg"
    uri = payload_to_data_uri(b"abc", 10, 10)
    assert uri.startswith("data:image/png;base64,")
    assert base64.b64decode(uri.split(",", 1)[1]) == b"abc"
    assert payload_to_data_uri(b"x", 4000, 4000).startswith("data:image/jpeg")


def test_build_openai_chat_ordering():
    r = build_request_openai_chat("m", "p", "data:image/png;base64,AA==")
    content = r["messages"][0]["content"]
    assert content[0]["type"] == "image_url" and content[1]["type"] == "text"
    r2 = build_request_openai_chat("m", "p", "data:x", image_first=False)
    assert r2["messages"][0]["content"][0]["type"] == "text"
    # text-only path: single text part
    r3 = build_request_openai_chat("m", "p")
    assert r3["messages"][0]["content"] == [{"type": "text", "text": "p"}]


def test_build_gemini_and_doubao():
    g = build_request_gemini("p", b"img")
    assert g["contents"][0]["parts"][0]["inline_data"]["mime_type"] == "image/png"
    assert g["generationConfig"]["temperature"] == 0.1
    d = build_request_doubao("m", "p", "data:x")
    types = [c["type"] for c in d["input"][0]["content"]]
    assert types == ["input_image", "input_text"]


def test_parse_openai_chat_variants():
    ok, err, text = parse_response_openai_chat(
        {"choices": [{"message": {"content": "hello"}}]}
    )
    assert (ok, err, text) == (True, "", "hello")
    # string-or-array union (M11)
    ok, _, text = parse_response_openai_chat(
        {"choices": [{"message": {"content": [
            {"type": "text", "text": "a"}, {"type": "image"}, {"type": "text", "text": "b"}
        ]}}]}
    )
    assert ok and text == "a\nb"
    # typed in-band errors
    assert parse_response_openai_chat({"error": {"message": "quota"}})[1] == "http_error: quota"
    assert parse_response_openai_chat({})[1] == "parse: missing choices"
    assert parse_response_openai_chat({"choices": [{}]})[1] == "parse: missing message"


def test_parse_gemini():
    ok, _, text = parse_response_gemini(
        {"candidates": [{"content": {"parts": [{"text": "x"}, {"text": "y"}]}}]}
    )
    assert ok and text == "x\ny"
    assert not parse_response_gemini({"candidates": []})[0]


def test_parse_doubao_polymorphic():
    assert parse_response_doubao({"output": {"text": "t"}})[2] == "t"
    assert parse_response_doubao(
        {"output": {"choices": [{"message": {"content": [
            {"type": "output_text", "text": "a"}, {"type": "text", "text": "b"}
        ]}}]}}
    )[2] == "a\nb"
    assert parse_response_doubao({"output_text": "z"})[2] == "z"
    assert not parse_response_doubao({"nope": 1})[0]


def test_parse_layout():
    ok, _, text = parse_response_layout(
        {"errorCode": 0, "result": {"layoutParsingResults": [{"markdown": {"text": "  md  "}}]}}
    )
    assert ok and text == "md"
    assert parse_response_layout({"errorCode": 7, "errorMsg": "bad"})[1] == "http_error: bad"


def test_build_request_layout():
    # PaddleAdapter.cpp:170-183: bare base64 (no data-URI prefix) +
    # fileType 1; auth as a token header, never in the body
    import base64

    from xs_vlm_ocr_ray.engines.dialects import build_request_layout, layout_auth_header

    body = build_request_layout(b"\x89PNG...", file_type=1)
    assert body == {"file": base64.b64encode(b"\x89PNG...").decode("ascii"), "fileType": 1}
    assert not body["file"].startswith("data:")
    assert layout_auth_header("k123") == {"Authorization": "token k123"}


def test_parsers_coerce_non_string_text_parts():
    """Errors are IN BAND: a present-but-null or numeric text part in a
    malformed response must not raise out of a parser (it would fail
    the whole map_batches task for one bad row)."""
    from xs_vlm_ocr_ray.engines.dialects import (
        parse_response_doubao,
        parse_response_gemini,
        parse_response_openai_chat,
    )

    ok, err, text = parse_response_gemini(
        {"candidates": [{"content": {"parts": [{"text": 42}, {"text": None}]}}]}
    )
    assert ok and text == "42\n"
    ok, err, text = parse_response_openai_chat(
        {"choices": [{"message": {"content": [{"type": "text", "text": None}]}}]}
    )
    assert ok and text == ""
    ok, err, text = parse_response_doubao(
        {"output": {"choices": [{"message": {"content": [
            {"type": "output_text", "text": 7}]}}]}}
    )
    assert ok and text == "7"
