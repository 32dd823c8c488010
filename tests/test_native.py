"""Native host library (C++ via ctypes): parity with the pure-Python paths.
Builds the library on the fly if g++ is available."""

import shutil
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def native_mod():
    so = ROOT / "native" / "libnvhost.so"
    if not so.exists():
        if shutil.which("g++") is None:
            pytest.skip("no g++ and library not prebuilt")
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
             str(ROOT / "native" / "host_ops.cc"), "-o", str(so)],
            check=True,
        )
    from nanovllm_tpu import native

    if not native.available():
        pytest.skip("native library failed to load")
    return native


def test_hash_deterministic_and_chained(native_mod):
    a = native_mod.hash64(list(range(16)), (-1) & 0xFFFFFFFFFFFFFFFF)
    b = native_mod.hash64(list(range(16)), (-1) & 0xFFFFFFFFFFFFFFFF)
    c = native_mod.hash64(list(range(16)), a)
    assert a == b and a != c
    assert native_mod.hash64([1, 2, 3], 0) != native_mod.hash64([3, 2, 1], 0)


def test_block_manager_uses_native_when_available(native_mod, monkeypatch):
    import nanovllm_tpu.engine.block_manager as bm

    monkeypatch.setattr(bm, "_USE_NATIVE_HASH", True)
    h1 = bm.compute_hash(list(range(16)))
    h2 = bm.compute_hash(list(range(16)))
    assert h1 == h2
    assert -(1 << 63) <= h1 < (1 << 63)  # fits the signed convention


def test_native_bpe_matches_python(native_mod):
    from nanovllm_tpu.tokenizer.bpe import BPETokenizer
    from tests.test_tokenizer import build_tiny_bpe

    vocab, merges = build_tiny_bpe()
    tok = BPETokenizer(vocab, merges, {"<|endoftext|>": vocab["<|endoftext|>"]})
    assert tok._native_bpe is not None  # library present => native path wired

    # Compare native vs pure-Python merge on every test string.
    texts = ["hello world", "hhee lllo", " word", "hello hello world"]
    for t in texts:
        native_ids = tok.encode(t)
        tok_py = BPETokenizer(vocab, merges, {})
        tok_py._native_bpe = None
        assert native_ids == tok_py.encode(t), t
        assert tok.decode(native_ids) == t
