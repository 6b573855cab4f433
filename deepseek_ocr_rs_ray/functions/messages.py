"""Chat-history compaction + message flattening (M2 / M3).

Ported semantics (not code) from crates/server/src/generation.rs:169-313:

- ``collect_prompt_sections`` (200-244): OCR models aren't chat-trained —
  keep only system messages *before* the latest user turn, plus that latest
  user turn; everything else is dropped. At least one user message is
  required; empty content is an error.
- ``flatten_content`` (246-268): multi-part content is flattened in
  **reversed part order** (a quirk the reference preserves), image parts
  become ``<image>`` placeholders, text parts join with newlines, result
  trimmed.
- ``convert_messages`` (169-197): sections joined with blank lines and
  trimmed (same for all model kinds; images decoded separately).

Images here are opaque payload handles (whatever the caller attaches);
this module only manages placeholder/ordering semantics.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple, Union

Part = dict  # {"type": "text"|"image", "text": str} | {"type": "image", "image": Any}
Content = Union[str, Sequence[Part]]


class MessageError(ValueError):
    pass


def flatten_content(content: Content) -> Tuple[str, List[Any]]:
    """generation.rs:246-268 — parts processed in REVERSED order."""
    if isinstance(content, str):
        return content.strip(), []
    buffer: List[str] = []
    images: List[Any] = []
    out = ""
    for part in reversed(list(content)):
        kind = part.get("type")
        if kind == "image":
            out += "<image>"
            images.append(part.get("image"))
        elif kind == "text":
            if out:
                out += "\n"
            out += part.get("text", "")
        else:
            raise MessageError(f"unknown message part type: {kind!r}")
    return out.strip(), images


def collect_prompt_sections(messages: Sequence[dict]
                            ) -> Tuple[List[str], List[Any]]:
    """generation.rs:200-244 — system msgs before the latest user turn +
    the latest user turn; all other history dropped."""
    latest_user_idx = None
    for i in range(len(messages) - 1, -1, -1):
        if messages[i].get("role", "").lower() == "user":
            latest_user_idx = i
            break
    if latest_user_idx is None:
        raise MessageError("request must include at least one user message")

    sections: List[str] = []
    images: List[Any] = []
    for message in messages[:latest_user_idx]:
        if message.get("role", "").lower() != "system":
            continue
        text, msg_images = flatten_content(message.get("content", ""))
        if text:
            sections.append(text)
        images.extend(msg_images)

    user_text, user_images = flatten_content(
        messages[latest_user_idx].get("content", ""))
    if user_text:
        sections.append(user_text)
    images.extend(user_images)

    if not sections and not images:
        raise MessageError("user content must include text or images")
    return sections, images


def convert_messages(messages: Sequence[dict]) -> Tuple[str, List[Any]]:
    """generation.rs:169-197 — compacted prompt + ordered image handles."""
    sections, images = collect_prompt_sections(messages)
    return "\n\n".join(sections).strip(), images
