"""Tokenizers: native byte-level BPE (GPT-2 vocab.json+merges.txt and HF
tokenizer.json), special-token handling, and chat templates.

Replaces the reference's four tokenizer implementations
(/root/reference/purego/bpe_tokenizer.go, universal_tokenizer.go,
gpt2_tokenizer.go, tokenizer.go) and its Python-subprocess escape hatch
(cmd/ask/main.go:362-387 shells out per request!). Encoding here is a
correct greedy lowest-rank BPE merge — the reference's "universal" encoder is
approximate (no merge rules, universal_tokenizer.go:287-366).
"""

from nanovllm_tpu.tokenizer.bpe import BPETokenizer, load_tokenizer

__all__ = ["BPETokenizer", "load_tokenizer"]
