"""Deterministic RNG stack replicating the reference's randomness sources.

The reference library (`lambdaclass/simpleworks`) derives *all* randomness from
``ark_std::test_rng()`` (see reference ``src/marlin/mod.rs:33-35``,
``src/hash/mod.rs:24``, ``src/merkle_tree/simple_merkle_tree.rs:38``), which is
rand 0.8's ``StdRng`` — a ChaCha12 stream cipher RNG — seeded with a fixed
32-byte seed.  The Marlin Fiat-Shamir transcript additionally uses a ChaCha20
RNG (reference ``src/marlin/mod.rs:13``: ``SimpleHashFiatShamirRng<Blake2s,
ChaChaRng>``).

This module implements both ChaCha variants with the exact word-stream
semantics of ``rand_core``'s ``BlockRng`` so that the sampled streams are
reproducible and, where our reconstruction of arkworks' sampling logic is
accurate, bit-exact with the reference.

Implementation notes
--------------------
* ``rand_chacha``'s buffer holds 4 consecutive ChaCha blocks (64 u32 words);
  output order equals sequential block generation.
* ``next_u64`` = ``lo | hi << 32`` from two consecutive u32 words, with the
  documented straddle behaviour when only one word remains in the buffer.
* ``fill_bytes`` consumes whole u32 words (little-endian), discarding unused
  trailing bytes of the final word.
"""

from __future__ import annotations

MASK32 = 0xFFFFFFFF

# Fixed seed of ark_std::test_rng() (ark-std 0.3, src/rand_helper.rs).
ARK_TEST_RNG_SEED = bytes(
    [1, 0, 0, 0, 23, 0, 0, 0, 200, 1, 0, 0, 210, 30, 0, 0,
     0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
)

_CHACHA_CONSTANTS = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)


def _quarter_round(state: list[int], a: int, b: int, c: int, d: int) -> None:
    x = state
    x[a] = (x[a] + x[b]) & MASK32
    x[d] ^= x[a]
    x[d] = ((x[d] << 16) | (x[d] >> 16)) & MASK32
    x[c] = (x[c] + x[d]) & MASK32
    x[b] ^= x[c]
    x[b] = ((x[b] << 12) | (x[b] >> 20)) & MASK32
    x[a] = (x[a] + x[b]) & MASK32
    x[d] ^= x[a]
    x[d] = ((x[d] << 8) | (x[d] >> 24)) & MASK32
    x[c] = (x[c] + x[d]) & MASK32
    x[b] ^= x[c]
    x[b] = ((x[b] << 7) | (x[b] >> 25)) & MASK32


def _chacha_block(key_words: tuple[int, ...], counter: int, rounds: int) -> list[int]:
    """One ChaCha block with a 64-bit block counter (words 12/13) and zero nonce."""
    initial = [
        *_CHACHA_CONSTANTS,
        *key_words,
        counter & MASK32,
        (counter >> 32) & MASK32,
        0,
        0,
    ]
    x = list(initial)
    for _ in range(rounds // 2):
        _quarter_round(x, 0, 4, 8, 12)
        _quarter_round(x, 1, 5, 9, 13)
        _quarter_round(x, 2, 6, 10, 14)
        _quarter_round(x, 3, 7, 11, 15)
        _quarter_round(x, 0, 5, 10, 15)
        _quarter_round(x, 1, 6, 11, 12)
        _quarter_round(x, 2, 7, 8, 13)
        _quarter_round(x, 3, 4, 9, 14)
    return [(xi + ii) & MASK32 for xi, ii in zip(x, initial)]


class ChaChaRng:
    """ChaCha-based RNG with rand_core ``BlockRng`` word-stream semantics."""

    BUFFER_BLOCKS = 4  # rand_chacha refills 4 blocks (64 words) at a time

    def __init__(self, seed: bytes, rounds: int):
        if len(seed) != 32:
            raise ValueError("ChaCha seed must be 32 bytes")
        self.rounds = rounds
        self.key_words = tuple(
            int.from_bytes(seed[4 * i: 4 * i + 4], "little") for i in range(8)
        )
        self.block_counter = 0
        self.buffer: list[int] = []
        self.index = 64  # force refill on first use

    def _refill(self) -> None:
        words: list[int] = []
        for _ in range(self.BUFFER_BLOCKS):
            words.extend(_chacha_block(self.key_words, self.block_counter, self.rounds))
            self.block_counter += 1
        self.buffer = words
        self.index = 0

    def next_u32(self) -> int:
        if self.index >= len(self.buffer):
            self._refill()
        value = self.buffer[self.index]
        self.index += 1
        return value

    def next_u64(self) -> int:
        buf_len = len(self.buffer) if self.buffer else 64
        if self.index < buf_len - 1 and self.buffer:
            lo = self.buffer[self.index]
            hi = self.buffer[self.index + 1]
            self.index += 2
            return (hi << 32) | lo
        if self.index >= buf_len or not self.buffer:
            self._refill()
            lo = self.buffer[0]
            hi = self.buffer[1]
            self.index = 2
            return (hi << 32) | lo
        # One word left: use it as the low half, refill for the high half
        # (rand_core BlockRng::next_u64 straddle case).
        lo = self.buffer[buf_len - 1]
        self._refill()
        hi = self.buffer[0]
        self.index = 1
        return (hi << 32) | lo

    def fill_bytes(self, n: int) -> bytes:
        """Fill ``n`` bytes, consuming whole little-endian u32 words
        (rand_core ``fill_via_u32_chunks`` semantics)."""
        out = bytearray()
        while len(out) < n:
            if self.index >= len(self.buffer):
                self._refill()
            word = self.buffer[self.index]
            self.index += 1
            out.extend(word.to_bytes(4, "little"))
        return bytes(out[:n])

    # rand 0.8 `Standard` distribution samples used by arkworks ----------

    def gen_bool(self) -> bool:
        """rand 0.8 `Standard` for bool: sign bit of next_u32."""
        return (self.next_u32() & 0x80000000) != 0

    def gen_u8(self) -> int:
        return self.next_u32() & 0xFF

    def gen_range_u64(self, low: int, high: int) -> int:
        """Uniform integer in [low, high) via rand 0.8's widening-multiply
        rejection method (``UniformInt::<u64>::sample_single``):
        zone = (range << range.leading_zeros()) - 1; accept when the low
        64 bits of v*range fall in the zone."""
        range_ = high - low
        if range_ <= 0:
            raise ValueError("empty range")
        leading_zeros = 64 - range_.bit_length()
        zone = ((range_ << leading_zeros) - 1) & (2**64 - 1)
        while True:
            v = self.next_u64()
            m = v * range_
            hi, lo = m >> 64, m & (2**64 - 1)
            if lo <= zone:
                return low + hi


def chacha12_rng(seed: bytes) -> ChaChaRng:
    """rand 0.8 ``StdRng`` (= ``ChaCha12Rng``) from a 32-byte seed."""
    return ChaChaRng(seed, rounds=12)


def chacha20_rng(seed: bytes) -> ChaChaRng:
    """``rand_chacha::ChaChaRng`` (= ``ChaCha20Rng``) from a 32-byte seed."""
    return ChaChaRng(seed, rounds=20)


def test_rng() -> ChaChaRng:
    """Replica of ``ark_std::test_rng()`` — the fixed-seed StdRng used for
    every sampling operation in the reference (SRS, CRH params, keygen)."""
    return chacha12_rng(ARK_TEST_RNG_SEED)
