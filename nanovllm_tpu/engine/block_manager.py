"""Block-granular KV allocation with hash-chained prefix caching.

Capability parity with /root/reference/nanovllm/block_manager.go: per-block
chained hashes over full blocks (:72-88), allocation that reuses cache hits
guarded by a full token comparison (:154-188), refcounted deallocation in
reverse order (:206-219). The reference's per-token `CanAppend`/`MayAppend`
boundary logic (:222-263) maps to burst-granular `can_ensure`/
`ensure_capacity` here (the scheduler reserves capacity for a whole decode
burst up front) with `seal_full_blocks` as the hash-seal half.

The decisive difference (SURVEY.md §2.5-1): these block ids index the REAL
on-device paged KV pool (ops/kv_cache.py), and `Sequence.num_cached_tokens`
is consumed by the runner to actually SKIP prefill compute for cached
prefixes — in the reference the block table is dropped on the floor and
prefill always recomputes everything.

Hashing uses blake2b-64 over (prefix_hash, token_ids) — any deterministic
64-bit hash serves; the reference used xxhash (block_manager.go:72-88).
"""

from __future__ import annotations

import hashlib
import struct
from collections import deque
from typing import Optional

from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu import native as _native

_USE_NATIVE_HASH = _native.available()


def compute_hash(token_ids: list[int], prefix_hash: int = -1) -> int:
    """Chained 64-bit block hash. Uses the native library when built (all
    hosts of a multi-host deployment must agree on the implementation —
    hashes key the shared prefix cache)."""
    if _USE_NATIVE_HASH:
        h = _native.hash64(token_ids, prefix_hash & 0xFFFFFFFFFFFFFFFF)
        return h - (1 << 64) if h >= (1 << 63) else h
    h = hashlib.blake2b(digest_size=8)
    h.update(struct.pack("<q", prefix_hash))
    h.update(struct.pack(f"<{len(token_ids)}i", *token_ids))
    return struct.unpack("<q", h.digest())[0]


class Block:
    __slots__ = ("block_id", "ref_count", "hash", "token_ids")

    def __init__(self, block_id: int):
        self.block_id = block_id
        self.ref_count = 0
        self.hash: int = -1
        self.token_ids: list[int] = []

    def update(self, hash_val: int, token_ids: list[int]) -> None:
        self.hash = hash_val
        self.token_ids = token_ids

    def reset(self) -> None:
        self.ref_count = 1
        self.hash = -1
        self.token_ids = []


class BlockManager:
    def __init__(self, num_blocks: int, block_size: int, enable_prefix_caching: bool = True):
        self.num_blocks = num_blocks
        self.block_size = block_size
        self.enable_prefix_caching = enable_prefix_caching
        self.blocks = [Block(i) for i in range(num_blocks)]
        self.hash_to_block_id: dict[int, int] = {}
        # Physical block 0 is RESERVED (never allocated): it serves as the
        # sliding-window placeholder id and as the Pallas flush kernel's
        # dustbin window for inactive decode lanes (ops/pallas/kv_flush.py
        # routes windows of lanes with zeroed block tables at block 0, and
        # writes back its own old contents — safe only if no live sequence
        # can own it).
        self.free_block_ids: deque[int] = deque(range(1, num_blocks))
        self.used_block_ids: set[int] = set()
        # Blocks whose hashes are registered but whose KV has NOT been
        # written yet (prompt blocks between allocate() and the prefill step
        # that covers them — a multi-step window under chunked prefill). A
        # cache hit on a pending block must be treated as a miss: the hit
        # would skip compute and read garbage KV.
        self.pending_blocks: set[int] = set()

    @property
    def num_free_blocks(self) -> int:
        return len(self.free_block_ids)

    def _allocate_block(self, block_id: int) -> Block:
        block = self.blocks[block_id]
        assert block.ref_count == 0
        # Evict the stale hash mapping before the block's content is replaced,
        # so hash_to_block_id stays bounded by num_blocks over a long-lived
        # server (the content-comparison guard in allocate() already protects
        # correctness; this protects memory).
        if block.hash != -1 and self.hash_to_block_id.get(block.hash) == block_id:
            del self.hash_to_block_id[block.hash]
        block.reset()
        self.free_block_ids.remove(block_id)
        self.used_block_ids.add(block_id)
        self.pending_blocks.discard(block_id)
        return block

    def _deallocate_block(self, block_id: int) -> None:
        assert self.blocks[block_id].ref_count == 0
        self.used_block_ids.remove(block_id)
        self.free_block_ids.append(block_id)
        self.pending_blocks.discard(block_id)

    def can_allocate(self, seq: Sequence) -> bool:
        return self.num_free_blocks >= seq.num_blocks

    def allocate(self, seq: Sequence) -> None:
        """Build seq.block_table, reusing prefix-cache hits. Sets
        seq.num_cached_tokens to the number of leading tokens whose KV is
        already resident (capped at len-1 by the caller's runner so the last
        token is always recomputed for logits)."""
        assert not seq.block_table
        h = -1
        cache_miss = False
        seq.num_cached_tokens = 0
        for i in range(seq.num_blocks):
            token_ids = seq.block(i)
            full = len(token_ids) == self.block_size
            h = compute_hash(token_ids, h) if (full and self.enable_prefix_caching) else -1
            block_id = self.hash_to_block_id.get(h, -1) if h != -1 else -1
            if (
                block_id == -1
                or self.blocks[block_id].token_ids != token_ids
                or block_id in self.pending_blocks
            ):
                cache_miss = True
            if cache_miss:
                block_id = self.free_block_ids[0]
                block = self._allocate_block(block_id)
                # This prompt block's KV doesn't exist until a prefill step
                # covers it: guard hits, and DEFER the hash_to_block_id
                # registration to mark_computed (a pending registration
                # could outlive the sequence via deallocate and hand a
                # later prompt garbage KV).
                self.pending_blocks.add(block_id)
                if h != -1:
                    block.update(h, token_ids)
            else:
                seq.num_cached_tokens += self.block_size
                if block_id in self.used_block_ids:
                    block = self.blocks[block_id]
                    block.ref_count += 1
                else:
                    block = self._allocate_block(block_id)
                if h != -1:
                    block.update(h, token_ids)
                    self.hash_to_block_id[h] = block_id
            seq.block_table.append(block_id)

    def mark_computed(self, seq: Sequence) -> None:
        """Prefill has covered this sequence's whole prompt: its blocks' KV
        is now real — publish their hashes for prefix-cache hits."""
        if not self.pending_blocks:
            return
        for block_id in seq.block_table:
            if block_id in self.pending_blocks:
                self.pending_blocks.discard(block_id)
                block = self.blocks[block_id]
                if block.hash != -1:
                    self.hash_to_block_id[block.hash] = block_id

    def deallocate(self, seq: Sequence) -> None:
        # Entries below num_released_blocks were already released by the
        # sliding-window recycler and hold a placeholder id.
        live = seq.block_table[seq.num_released_blocks :]
        for block_id in reversed(live):
            block = self.blocks[block_id]
            block.ref_count -= 1
            if block.ref_count == 0:
                self._deallocate_block(block_id)
        # NB num_cached_tokens is deliberately NOT reset here: RequestOutput
        # reads it after the finishing deallocate, and re-admission after a
        # preemption overwrites it in allocate() anyway.
        seq.num_released_blocks = 0
        seq.block_table = []

    # ---- sliding-window recycling ----------------------------------------

    def release_behind_window(self, seq: Sequence, window: int) -> int:
        """Free blocks whose every position is behind the attention window
        (position < len(seq) - window): with a sliding-window mask those
        positions are never read again, and writes only ever target the
        current position, so the physical block can be recycled while the
        table entry keeps the layout (it is replaced with a placeholder id
        that is masked out of every read). Bounds windowed-decode KV memory
        at O(window/block_size) blocks per sequence (VERDICT r1 missing #4).
        Returns the number of blocks released."""
        if window <= 0:
            return 0
        dead_until = (len(seq) - window) // self.block_size  # blocks [0, dead_until)
        released = 0
        for i in range(seq.num_released_blocks, min(dead_until, len(seq.block_table))):
            block_id = seq.block_table[i]
            block = self.blocks[block_id]
            block.ref_count -= 1
            if block.ref_count == 0:
                self._deallocate_block(block_id)
            seq.block_table[i] = 0  # placeholder: never read (masked), never written
            seq.num_released_blocks = i + 1
            released += 1
        return released

    # ---- burst capacity (multi-step decode) ------------------------------

    def blocks_needed(self, seq: Sequence, n_tokens: int) -> int:
        """Extra blocks required so the KV of a burst writing positions up to
        len(seq)+n_tokens-2 (and the appended tokens themselves up to
        len+n-1... use the conservative token count) fits."""
        total = len(seq) + n_tokens
        need = (total + self.block_size - 1) // self.block_size
        return max(0, need - len(seq.block_table))

    def can_ensure(self, seq: Sequence, n_tokens: int) -> bool:
        return self.num_free_blocks >= self.blocks_needed(seq, n_tokens)

    def ensure_capacity(self, seq: Sequence, n_tokens: int) -> None:
        for _ in range(self.blocks_needed(seq, n_tokens)):
            block_id = self.free_block_ids[0]
            self._allocate_block(block_id)
            seq.block_table.append(block_id)

    def seal_full_blocks(self, seq: Sequence) -> None:
        """Seal chained hashes for any full blocks not yet hashed (called
        after tokens are appended in postprocess). Equivalent to the hash-seal
        half of the reference's MayAppend (block_manager.go:243-263)."""
        if not self.enable_prefix_caching:
            return
        if seq.num_released_blocks:
            # Sliding-window recycling broke the hash chain from block 0;
            # windowed sequences don't participate in prefix caching.
            return
        full = len(seq) // self.block_size
        prev = -1
        for i in range(full):
            block = self.blocks[seq.block_table[i]]
            if block.hash == -1:
                token_ids = seq.block(i)
                h = compute_hash(token_ids, prev)
                block.update(h, token_ids)
                self.hash_to_block_id[h] = block.block_id
            prev = block.hash

