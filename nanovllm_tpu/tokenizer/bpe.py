"""Native byte-level BPE tokenizer.

Correct GPT-2-style byte-level BPE — byte↔unicode table, pretokenizer regex,
greedy lowest-rank merge loop, byte-level decode — replacing
/root/reference/purego/bpe_tokenizer.go (GPT-2 only) and the approximate
universal_tokenizer.go. Loads either the classic `vocab.json` + `merges.txt`
pair or an HF `tokenizer.json`; special tokens come from
`tokenizer_config.json` / `config.json`.

`load_tokenizer` prefers the `tokenizers` fast (Rust) library when the
checkpoint ships a tokenizer.json — the escape hatch SURVEY.md §7 calls for —
and falls back to this pure-Python implementation.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

import regex

# GPT-2 pretokenizer (bpe_tokenizer.go:64 uses a simplified form; this is the
# original). Llama-3 style checkpoints carry their own pattern in
# tokenizer.json, which we read when present.
GPT2_PATTERN = r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
LLAMA3_PATTERN = r"""(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"""


@lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte→printable-unicode mapping
    (bpe_tokenizer.go:71-95)."""
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


class BPETokenizer:
    def __init__(
        self,
        vocab: dict[str, int],
        merges: list[tuple[str, str]],
        special_tokens: dict[str, int] | None = None,
        pattern: str = GPT2_PATTERN,
        eos_id: int = -1,
        bos_id: int | None = None,
    ):
        self.vocab = vocab
        self.inv_vocab = {v: k for k, v in vocab.items()}
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.special_tokens = dict(special_tokens or {})
        for t, i in self.special_tokens.items():
            self.inv_vocab.setdefault(i, t)
        self.pattern = regex.compile(pattern)
        self._eos_id = eos_id
        self.bos_id = bos_id
        b2u = bytes_to_unicode()
        self.byte_encoder = b2u
        self.byte_decoder = {v: k for k, v in b2u.items()}
        if self.special_tokens:
            toks = sorted(self.special_tokens, key=len, reverse=True)
            self._special_re = regex.compile("|".join(regex.escape(t) for t in toks))
        else:
            self._special_re = None
        # Native merge loop (C++ via ctypes) when the library is built:
        # merges expressed over token ids.
        self._native_bpe = None
        try:
            from nanovllm_tpu import native as _native

            if _native.available():
                merges_ids = []
                for (a, b) in merges:
                    ia, ib, im = vocab.get(a), vocab.get(b), vocab.get(a + b)
                    if ia is None or ib is None or im is None:
                        merges_ids = None
                        break
                    merges_ids.append((ia, ib, im))
                if merges_ids is not None:
                    self._native_bpe = _native.NativeBpe(merges_ids)
        except Exception:
            self._native_bpe = None

    # -- encoding ----------------------------------------------------------

    def _bpe(self, token: str) -> list[str]:
        """Greedy lowest-rank merge loop (bpe_tokenizer.go:154-229)."""
        word = list(token)
        if len(word) == 1:
            return word
        while True:
            best = None
            best_rank = None
            for i in range(len(word) - 1):
                r = self.ranks.get((word[i], word[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best = i
            if best is None:
                return word
            merged = word[best] + word[best + 1]
            word = word[:best] + [merged] + word[best + 2 :]
            if len(word) == 1:
                return word

    def _encode_ordinary(self, text: str) -> list[int]:
        out: list[int] = []
        for m in self.pattern.findall(text):
            mapped = "".join(self.byte_encoder[b] for b in m.encode("utf-8"))
            if self._native_bpe is not None:
                ids = [self.vocab.get(ch, -1) for ch in mapped]
                if -1 not in ids:
                    out.extend(self._native_bpe.apply(ids))
                    continue
            for piece in self._bpe(mapped):
                tid = self.vocab.get(piece)
                if tid is None:
                    # Byte fallback: emit each byte's single-char token.
                    for ch in piece:
                        tid_c = self.vocab.get(ch)
                        if tid_c is not None:
                            out.append(tid_c)
                else:
                    out.append(tid)
        return out

    def encode(self, text: str, add_special_tokens: bool = False) -> list[int]:
        out: list[int] = []
        if add_special_tokens and self.bos_id is not None:
            out.append(self.bos_id)
        if self._special_re is None:
            out.extend(self._encode_ordinary(text))
            return out
        pos = 0
        for m in self._special_re.finditer(text):
            out.extend(self._encode_ordinary(text[pos : m.start()]))
            out.append(self.special_tokens[m.group()])
            pos = m.end()
        out.extend(self._encode_ordinary(text[pos:]))
        return out

    # -- decoding ----------------------------------------------------------

    def decode(self, token_ids) -> str:
        parts: list[str] = []
        buf = bytearray()
        for tid in token_ids:
            tid = int(tid)
            tok = self.inv_vocab.get(tid)
            if tok is None:
                continue
            if tid in self.special_tokens.values() and tok not in self.vocab:
                parts.append(buf.decode("utf-8", errors="replace"))
                buf = bytearray()
                parts.append(tok)
                continue
            for ch in tok:
                b = self.byte_decoder.get(ch)
                if b is not None:
                    buf.append(b)
                else:  # token text outside the byte alphabet (special)
                    parts.append(buf.decode("utf-8", errors="replace"))
                    buf = bytearray()
                    parts.append(ch)
        parts.append(buf.decode("utf-8", errors="replace"))
        return "".join(parts)

    @property
    def eos_token_id(self) -> int:
        return self._eos_id

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)


def _load_special_tokens(model_dir: str) -> tuple[dict[str, int], int, int | None]:
    """Returns (special token map, eos_id, bos_id) from tokenizer_config /
    config.json (universal_tokenizer.go:34-49)."""
    specials: dict[str, int] = {}
    eos_id, bos_id = -1, None
    tcfg_path = os.path.join(model_dir, "tokenizer_config.json")
    ccfg_path = os.path.join(model_dir, "config.json")
    tok_json = os.path.join(model_dir, "tokenizer.json")
    if os.path.exists(tok_json):
        with open(tok_json) as f:
            tj = json.load(f)
        for added in tj.get("added_tokens", []):
            specials[added["content"]] = added["id"]
    if os.path.exists(ccfg_path):
        with open(ccfg_path) as f:
            ccfg = json.load(f)
        raw_eos = ccfg.get("eos_token_id")
        if isinstance(raw_eos, list):
            raw_eos = raw_eos[0]
        if raw_eos is not None:
            eos_id = int(raw_eos)
        if ccfg.get("bos_token_id") is not None:
            bos_id = int(ccfg["bos_token_id"])
    if os.path.exists(tcfg_path):
        with open(tcfg_path) as f:
            tcfg = json.load(f)
        for key in ("eos_token", "bos_token", "unk_token", "pad_token"):
            t = tcfg.get(key)
            if isinstance(t, dict):
                t = t.get("content")
            # ids resolved below once the vocab is known
    return specials, eos_id, bos_id


def load_native_tokenizer(model_dir: str):
    specials, eos_id, bos_id = _load_special_tokens(model_dir)
    tok_json = os.path.join(model_dir, "tokenizer.json")
    vocab_path = os.path.join(model_dir, "vocab.json")
    merges_path = os.path.join(model_dir, "merges.txt")
    pattern = GPT2_PATTERN
    if os.path.exists(tok_json):
        with open(tok_json) as f:
            tj = json.load(f)
        model = tj.get("model", {})
        mtype = model.get("type", "BPE")
        if mtype == "Unigram":
            from nanovllm_tpu.tokenizer.unigram import load_unigram_from_tokenizer_json

            return load_unigram_from_tokenizer_json(model_dir, specials, eos_id, bos_id)
        if mtype not in ("BPE",):
            raise ValueError(
                f"tokenizer.json model type {mtype!r} is not supported natively "
                "(BPE and Unigram are); install the `tokenizers` library to use "
                "this checkpoint via load_tokenizer()'s fast path"
            )
        vocab = model.get("vocab", {})
        merges_raw = model.get("merges", [])
        merges = [tuple(m.split(" ", 1)) if isinstance(m, str) else tuple(m) for m in merges_raw]
        pre = tj.get("pre_tokenizer") or {}
        pats = []

        def collect(node):
            if not isinstance(node, dict):
                return
            if node.get("type") == "Split" and isinstance(node.get("pattern"), dict):
                p = node["pattern"].get("Regex")
                if p:
                    pats.append(p)
            for sub in node.get("pretokenizers", []) or []:
                collect(sub)

        collect(pre)
        if pats:
            pattern = pats[0]
    elif os.path.exists(vocab_path) and os.path.exists(merges_path):
        with open(vocab_path) as f:
            vocab = json.load(f)
        merges = []
        with open(merges_path) as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#version"):
                    continue
                a, _, b = line.partition(" ")
                merges.append((a, b))
    else:
        raise FileNotFoundError(f"no tokenizer files in {model_dir}")
    return BPETokenizer(vocab, merges, specials, pattern, eos_id, bos_id)


class HFTokenizerWrapper:
    """`tokenizers`-library fast path."""

    def __init__(self, model_dir: str):
        from tokenizers import Tokenizer

        self.tok = Tokenizer.from_file(os.path.join(model_dir, "tokenizer.json"))
        _, self._eos, self._bos = _load_special_tokens(model_dir)

    def encode(self, text: str) -> list[int]:
        return self.tok.encode(text, add_special_tokens=False).ids

    def decode(self, token_ids) -> str:
        return self.tok.decode([int(t) for t in token_ids], skip_special_tokens=False)

    @property
    def eos_token_id(self) -> int:
        return self._eos


def load_tokenizer(model_dir: str, prefer_native: bool = False):
    """tokenizer.json via the fast library when available, else native BPE."""
    if not prefer_native and os.path.exists(os.path.join(model_dir, "tokenizer.json")):
        try:
            return HFTokenizerWrapper(model_dir)
        except Exception:
            pass
    return load_native_tokenizer(model_dir)
