"""Chat compaction (M2) + message flattening (M3) semantics."""

import pytest

from deepseek_ocr_rs_ray.functions.messages import (
    MessageError, collect_prompt_sections, convert_messages, flatten_content)


def test_flatten_text_content():
    assert flatten_content("  hi there  ") == ("hi there", [])


def test_flatten_parts_reversed_order():
    # the reference iterates parts in REVERSE (generation.rs:252)
    text, images = flatten_content([
        {"type": "text", "text": "first"},
        {"type": "image", "image": "IMG_A"},
        {"type": "text", "text": "second"},
    ])
    # reversed: "second", then <image> (appended with NO newline —
    # generation.rs:256 only text parts prepend one), then "\nfirst"
    assert text == "second<image>\nfirst"
    assert images == ["IMG_A"]


def test_flatten_image_placeholder_concat():
    text, images = flatten_content([
        {"type": "image", "image": 1},
        {"type": "image", "image": 2},
    ])
    assert text == "<image><image>"
    assert images == [2, 1]   # reversed iteration order


def test_compaction_keeps_system_and_latest_user_only():
    msgs = [
        {"role": "system", "content": "sys rules"},
        {"role": "user", "content": "old question"},
        {"role": "assistant", "content": "old answer"},
        {"role": "user", "content": "new question"},
    ]
    sections, images = collect_prompt_sections(msgs)
    assert sections == ["sys rules", "new question"]
    prompt, _ = convert_messages(msgs)
    assert prompt == "sys rules\n\nnew question"
    assert "old" not in prompt


def test_system_after_latest_user_dropped():
    msgs = [
        {"role": "user", "content": "q"},
        {"role": "system", "content": "late system"},
    ]
    sections, _ = collect_prompt_sections(msgs)
    assert sections == ["q"]


def test_errors():
    with pytest.raises(MessageError):
        collect_prompt_sections([{"role": "assistant", "content": "x"}])
    with pytest.raises(MessageError):
        collect_prompt_sections([{"role": "user", "content": "   "}])
    with pytest.raises(MessageError):
        flatten_content([{"type": "wat"}])


def test_image_only_user_ok():
    sections, images = collect_prompt_sections(
        [{"role": "user", "content": [{"type": "image", "image": b"raw"}]}])
    assert sections == ["<image>"] and images == [b"raw"]
