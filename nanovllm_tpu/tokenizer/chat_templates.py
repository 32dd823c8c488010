"""Chat prompt templates.

Capability parity with the reference's hard-coded per-model chat formats
(/root/reference/cmd/ask/main.go:273-285: llama3 header tokens, Falcon
User:/Assistant:, Granite role markers, completion mode for GPT-2) plus
mistral [INST]. When the checkpoint's tokenizer_config.json carries its own
Jinja chat template, `load_checkpoint_template` + `render_chat_template`
use that instead (sandboxed jinja2 render, the same mechanism `transformers`
uses) — the built-in table is the fallback for checkpoints without one.
"""

from __future__ import annotations

import json
import os

GRANITE_SYSTEM = (
    "You are a helpful assistant. Please ensure responses are professional, "
    "accurate, and safe."
)


def format_prompt(question: str, chat_format: str, system: str | None = None) -> str:
    if chat_format == "llama3":
        return (
            "<|begin_of_text|><|start_header_id|>user<|end_header_id|>\n\n"
            f"{question}<|eot_id|><|start_header_id|>assistant<|end_header_id|>\n\n"
        )
    if chat_format == "falcon":
        return f"User: {question}\nAssistant:"
    if chat_format == "granite":
        sys_msg = system or GRANITE_SYSTEM
        return (
            f"<|start_of_role|>system<|end_of_role|>{sys_msg}<|end_of_text|>\n"
            f"<|start_of_role|>user<|end_of_role|>{question}<|end_of_text|>\n"
            "<|start_of_role|>assistant<|end_of_role|>"
        )
    if chat_format == "mistral":
        return f"[INST] {question} [/INST]"
    # completion mode (GPT-2)
    return question


def load_checkpoint_template(model_dir: str) -> str | None:
    """The checkpoint's own Jinja chat template from tokenizer_config.json
    (string form, or the list-of-named-templates form — 'default' wins)."""
    path = os.path.join(model_dir, "tokenizer_config.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        cfg = json.load(f)
    tpl = cfg.get("chat_template")
    if isinstance(tpl, list):  # [{"name": ..., "template": ...}, ...]
        by_name = {t.get("name"): t.get("template") for t in tpl if isinstance(t, dict)}
        tpl = by_name.get("default") or next(iter(by_name.values()), None)
    return tpl if isinstance(tpl, str) and tpl.strip() else None


def render_chat_template(
    template: str,
    question: str,
    system: str | None = None,
    bos_token: str = "",
    eos_token: str = "",
    add_generation_prompt: bool = True,
) -> str:
    """Render a HF-style Jinja chat template for a single user turn.
    Sandboxed environment with the helpers HF templates expect
    (raise_exception, strftime_now, tojson)."""
    import jinja2
    from jinja2.sandbox import ImmutableSandboxedEnvironment

    env = ImmutableSandboxedEnvironment(trim_blocks=True, lstrip_blocks=True)

    def raise_exception(msg):
        raise jinja2.exceptions.TemplateError(msg)

    import datetime

    env.globals["raise_exception"] = raise_exception
    env.globals["strftime_now"] = lambda fmt: datetime.datetime.now().strftime(fmt)
    env.filters["tojson"] = lambda x, **kw: json.dumps(x, **kw)
    messages = []
    if system:
        messages.append({"role": "system", "content": system})
    messages.append({"role": "user", "content": question})
    return env.from_string(template).render(
        messages=messages,
        bos_token=bos_token,
        eos_token=eos_token,
        add_generation_prompt=add_generation_prompt,
    )


def format_prompt_for_checkpoint(
    model_dir: str, question: str, chat_format: str, system: str | None = None
) -> str:
    """Prefer the checkpoint's own chat template; fall back to the built-in
    per-format table (mirrors the reference's hard-coded registry)."""
    tpl = load_checkpoint_template(model_dir)
    if tpl is not None:
        try:
            return render_chat_template(tpl, question, system=system)
        except Exception:
            pass  # malformed template: use the built-in format
    return format_prompt(question, chat_format, system=system)


def chat_format_for_model_type(model_type: str) -> str:
    return {
        "llama": "llama3",
        "mistral": "mistral",
        "falcon": "falcon",
        "granitemoe": "granite",
        "granitemoeshared": "granite",
        "granitemoehybrid": "granite",
        "gpt2": "completion",
    }.get(model_type, "completion")


# Stop strings checked on the decoded tail during streaming generation —
# the reference's Falcon "\nUser" stop heuristic (cmd/ask/main.go:333-355)
# generalized to a per-format table.
STOP_STRINGS = {
    "falcon": ("\nUser",),
    "completion": (),
    "llama3": (),
    "granite": (),
    "mistral": (),
}
