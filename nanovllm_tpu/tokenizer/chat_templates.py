"""Chat prompt templates.

Capability parity with the reference's hard-coded per-model chat formats
(/root/reference/cmd/ask/main.go:273-285: llama3 header tokens, Falcon
User:/Assistant:, Granite role markers, completion mode for GPT-2) plus
mistral [INST]; falls back to the checkpoint's own Jinja chat template via
`transformers` when a tokenizer_config.json provides one.
"""

from __future__ import annotations

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
