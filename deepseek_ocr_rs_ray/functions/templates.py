"""Conversation templates + registry (M1 / A7).

Ported semantics (not code) from crates/core/src/conversation/mod.rs:

- four separator styles (DeepSeek, DeepSeekV2, Plain, Alignment) with the
  reference's exact rendering rules (mod.rs:53-142): empty/whitespace-only
  messages render as ``role:`` with no separator (DeepSeek style), alternate
  separators index by message position, the V2 style wraps user turns in the
  sft sentinel, the Alignment style replaces even-index turns with
  ``<image>\\n``;
- runtime-registrable template registry (mod.rs:163-188) — a plain module
  dict (sorted iteration to mirror the BTreeMap);
- ``render_prompt`` (crates/core/src/inference.rs:212-225): system message +
  one user turn + an empty assistant turn.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Dict, List, Optional, Tuple

DEEPSEEK = "DeepSeek"
DEEPSEEK_V2 = "DeepSeekV2"
PLAIN = "Plain"
ALIGNMENT = "Alignment"

EOS_SENTINEL = "<｜end▁of▁sentence｜>"


@dataclass
class ConversationTemplate:
    name: str = ""
    system_template: str = "{system_message}"
    system_message: str = ""
    roles: Tuple[str, str] = ("USER", "ASSISTANT")
    messages: List[Tuple[str, Optional[str]]] = field(default_factory=list)
    offset: int = 0
    sep_style: str = DEEPSEEK
    sep: str = "\n"
    sep2: Optional[str] = None
    stop_str: List[str] = field(default_factory=list)
    stop_token_ids: List[int] = field(default_factory=list)

    def set_system_message(self, msg: str) -> None:
        self.system_message = msg

    def append_message(self, role: str, message: Optional[str]) -> None:
        self.messages.append((role, message))

    def update_last_message(self, message: str) -> None:
        if self.messages:
            role, _ = self.messages[-1]
            self.messages[-1] = (role, message)

    def reset_messages(self) -> None:
        self.messages = []

    # -- rendering (mod.rs:53-142) ------------------------------------------

    def _seps(self) -> Tuple[str, str]:
        return self.sep, (self.sep2 if self.sep2 is not None else "")

    def get_prompt(self) -> str:
        return {
            DEEPSEEK: self._render_deepseek,
            DEEPSEEK_V2: self._render_deepseek_v2,
            PLAIN: self._render_plain,
            ALIGNMENT: self._render_alignment,
        }[self.sep_style]()

    @staticmethod
    def _content(message: Optional[str]) -> Optional[str]:
        if message is None:
            return None
        trimmed = message.strip()
        return trimmed if trimmed else None

    def _render_deepseek(self) -> str:
        seps = self._seps()
        system_prompt = self.system_template.replace("{system_message}",
                                                     self.system_message)
        out = []
        if system_prompt:
            out.append(system_prompt)
            out.append(seps[0])
        for idx, (role, message) in enumerate(self.messages):
            content = self._content(message)
            if content is not None:
                out.append(f"{role}: {content}{seps[idx % 2]}")
            else:
                out.append(f"{role}:")
        return "".join(out)

    def _render_deepseek_v2(self) -> str:
        seps = self._seps()
        system_prompt = self.system_template.replace("{system_message}",
                                                     self.system_message)
        out = []
        if system_prompt:
            out.append(system_prompt)
            out.append(seps[0])
        for role, message in self.messages:
            content = self._content(message)
            if content is None:
                continue
            if role == "User":
                out.append("<｜sft▁begin｜>\n")
                out.append(content)
                out.append(seps[0])
            else:
                out.append(content)
                out.append(seps[1])
        return "".join(out)

    def _render_plain(self) -> str:
        seps = self._seps()
        out = []
        for idx, (_role, message) in enumerate(self.messages):
            content = self._content(message)
            if content is not None:
                out.append(content)
                out.append(seps[idx % 2])
        return "".join(out)

    def _render_alignment(self) -> str:
        seps = self._seps()
        out = []
        for idx, (_role, message) in enumerate(self.messages):
            content = self._content(message)
            if content is None:
                continue
            if idx % 2 == 0:
                out.append("<image>\n")
                out.append(seps[idx % 2])
            else:
                out.append(content)
                out.append(seps[idx % 2])
        return "".join(out)


def _builtin_templates() -> Dict[str, ConversationTemplate]:
    return {
        "deepseek": ConversationTemplate(
            name="deepseek", roles=("<|User|>", "<|Assistant|>"),
            sep_style=DEEPSEEK, sep="\n\n", sep2=EOS_SENTINEL,
            stop_str=["User:", EOS_SENTINEL], stop_token_ids=[100001]),
        "deepseekv2": ConversationTemplate(
            name="deepseekv2", roles=("<｜User｜>", "<｜Assistant｜>"),
            sep_style=DEEPSEEK, sep="", sep2=EOS_SENTINEL,
            stop_str=["User:", EOS_SENTINEL], stop_token_ids=[100001]),
        "plain": ConversationTemplate(
            name="plain", system_template="", roles=("", ""),
            sep_style=PLAIN, sep="", sep2="",
            stop_str=["</s>"], stop_token_ids=[100001]),
        "alignment": ConversationTemplate(
            name="alignment", system_template="", roles=("", ""),
            sep_style=ALIGNMENT, sep="", sep2="",
            stop_str=["</s>"], stop_token_ids=[100001]),
    }


_REGISTRY: Dict[str, ConversationTemplate] = _builtin_templates()


def register_conv_template(template: ConversationTemplate,
                           override_existing: bool = False) -> None:
    """mod.rs:173-182 — duplicate registration without override is an error."""
    if not override_existing and template.name in _REGISTRY:
        raise ValueError(f"{template.name} has been registered")
    _REGISTRY[template.name] = template


def get_conv_template(name: str) -> Optional[ConversationTemplate]:
    t = _REGISTRY.get(name)
    if t is None:
        return None
    return replace(t, messages=list(t.messages), stop_str=list(t.stop_str),
                   stop_token_ids=list(t.stop_token_ids))


def render_prompt(template: str, system_prompt: str, raw_prompt: str) -> str:
    """crates/core/src/inference.rs:212-225."""
    t = get_conv_template(template)
    if t is None:
        raise KeyError(f"unknown conversation template {template}")
    t.set_system_message(system_prompt)
    t.reset_messages()
    t.append_message("User", raw_prompt)
    t.append_message("Assistant", None)
    return t.get_prompt()
