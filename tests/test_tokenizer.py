"""Native byte-level BPE vs the Rust `tokenizers` library on an identical
vocab/merge set (the reference's universal tokenizer was approximate —
universal_tokenizer.go:287-366; ours must be exact)."""

import json

import pytest

from nanovllm_tpu.tokenizer.bpe import BPETokenizer, bytes_to_unicode, load_native_tokenizer
from nanovllm_tpu.tokenizer.chat_templates import chat_format_for_model_type, format_prompt


def build_tiny_bpe():
    """Byte alphabet + a few merges, mirroring GPT-2's construction."""
    b2u = bytes_to_unicode()
    vocab = {ch: i for i, ch in enumerate(b2u[b] for b in range(256))}
    merges = []

    def add_merge(a, b):
        merges.append((a, b))
        vocab[a + b] = len(vocab)

    # "he", "ll", "hell", "o" merges + space-prefixed word
    add_merge("h", "e")
    add_merge("l", "l")
    add_merge("he", "ll")
    add_merge("hell", "o")
    add_merge("Ġ", "w")
    add_merge("Ġw", "o")
    add_merge("o", "r")
    add_merge("Ġwo", "r")
    vocab["<|endoftext|>"] = len(vocab)
    return vocab, merges


def test_bpe_matches_tokenizers_library():
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders

    vocab, merges = build_tiny_bpe()
    ours = BPETokenizer(vocab, merges, {"<|endoftext|>": vocab["<|endoftext|>"]}, eos_id=vocab["<|endoftext|>"])

    ref = Tokenizer(models.BPE(vocab=vocab, merges=merges))
    ref.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=True)
    ref.decoder = decoders.ByteLevel()

    for text in ["hello world", "hello", " world!", "hhee lllo", "héllo wörld", "a\nb  c"]:
        ref_ids = ref.encode(text).ids
        our_ids = ours.encode(text)
        assert our_ids == ref_ids, f"{text!r}: {our_ids} != {ref_ids}"
        assert ours.decode(our_ids) == text


def test_bpe_special_tokens_and_roundtrip():
    vocab, merges = build_tiny_bpe()
    eos = vocab["<|endoftext|>"]
    tok = BPETokenizer(vocab, merges, {"<|endoftext|>": eos}, eos_id=eos)
    ids = tok.encode("hello<|endoftext|>world")
    assert eos in ids
    assert tok.decode(ids) == "hello<|endoftext|>world"
    assert tok.eos_token_id == eos


def test_load_native_from_files(tmp_path):
    vocab, merges = build_tiny_bpe()
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges)
    )
    (tmp_path / "config.json").write_text(json.dumps({"eos_token_id": vocab["<|endoftext|>"]}))
    tok = load_native_tokenizer(str(tmp_path))
    assert tok.decode(tok.encode("hello world")) == "hello world"
    assert tok.eos_token_id == vocab["<|endoftext|>"]


def test_chat_templates():
    assert "<|start_header_id|>user<|end_header_id|>" in format_prompt("hi", "llama3")
    assert format_prompt("hi", "falcon") == "User: hi\nAssistant:"
    assert "<|start_of_role|>assistant<|end_of_role|>" in format_prompt("hi", "granite")
    assert format_prompt("hi", "completion") == "hi"
    assert chat_format_for_model_type("llama") == "llama3"
    assert chat_format_for_model_type("granitemoehybrid") == "granite"
