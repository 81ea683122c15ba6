"""ChaCha RNG tests: pinned against the published ChaCha test vectors and
the rand_chacha word-stream semantics (reference determinism source:
``ark_std::test_rng()``, see reference src/marlin/mod.rs:33-35)."""

from simpleworks_tpu.utils.rng import (
    ChaChaRng,
    chacha12_rng,
    chacha20_rng,
    test_rng,
    _chacha_block,
)


def test_chacha20_ietf_block_vector():
    # RFC 7539 §2.3.2 test vector adapted to the rand_chacha layout
    # (64-bit counter, zero nonce): with an all-zero key and counter 0 the
    # first ChaCha20 block matches the well-known all-zero-key keystream.
    key = (0,) * 8
    block = _chacha_block(key, 0, 20)
    stream = b"".join(w.to_bytes(4, "little") for w in block)
    # First 32 bytes of the ChaCha20 keystream for zero key/nonce/counter
    # (standard vector, e.g. draft-agl-tls-chacha20poly1305 test vector #1).
    expected = bytes.fromhex(
        "76b8e0ada0f13d90405d6ae55386bd28"
        "bdd219b8a08ded1aa836efcc8b770dc7"
    )
    assert stream[:32] == expected


def test_chacha20_block_counter_increments():
    rng = chacha20_rng(bytes(32))
    words = [rng.next_u32() for _ in range(17)]
    # word 16 must come from the counter=1 block
    block1 = _chacha_block((0,) * 8, 1, 20)
    assert words[16] == block1[0]


def test_next_u64_composition():
    rng_a = chacha12_rng(bytes(32))
    rng_b = chacha12_rng(bytes(32))
    lo = rng_b.next_u32()
    hi = rng_b.next_u32()
    assert rng_a.next_u64() == (hi << 32) | lo


def test_fill_bytes_word_granularity():
    rng_a = chacha12_rng(bytes(32))
    rng_b = chacha12_rng(bytes(32))
    got = rng_a.fill_bytes(5)
    w0 = rng_b.next_u32()
    w1 = rng_b.next_u32()
    expected = (w0.to_bytes(4, "little") + w1.to_bytes(4, "little"))[:5]
    assert got == expected
    # rng_a consumed 2 whole words
    assert rng_a.next_u32() == rng_b.next_u32()


def test_test_rng_deterministic():
    rng_a, rng_b = test_rng(), test_rng()
    a = [rng_a.next_u64() for _ in range(4)]
    b = [rng_b.next_u64() for _ in range(4)]
    assert a == b
    assert a[0] != a[1]


def test_gen_bool_sign_bit():
    rng_a = test_rng()
    rng_b = test_rng()
    bits = [rng_a.gen_bool() for _ in range(64)]
    words = [rng_b.next_u32() for _ in range(64)]
    assert bits == [(w & 0x80000000) != 0 for w in words]


def test_buffer_boundary_u64():
    # Consume 63 words then a u64: exercises the straddle path.
    rng = chacha12_rng(bytes(32))
    for _ in range(63):
        rng.next_u32()
    v = rng.next_u64()
    # Low half must be word 63 of the first buffer, high half word 0 of next.
    rng2 = chacha12_rng(bytes(32))
    words = [rng2.next_u32() for _ in range(65)]
    assert v == ((words[64] << 32) | words[63])
