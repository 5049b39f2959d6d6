"""Codec tests: device codecs must match the reference oracle bit-for-bit."""

import numpy as np
import jax.numpy as jnp

from doppler_tpu import oracle
from doppler_tpu.ops import codec

RNG = np.random.default_rng(0xD0)


def random_i16_bytes(n_pairs):
    return RNG.integers(-32768, 32768, size=2 * n_pairs, dtype=np.int16).tobytes()


def random_f32_bytes(n_pairs):
    x = RNG.normal(scale=0.5, size=2 * n_pairs).astype("<f4")
    return x.tobytes()


def test_i16_decode_matches_oracle():
    buf = random_i16_bytes(4096)
    ref = oracle.decode_i16_bytes(buf)
    words = codec.bytes_to_i16_words(buf)
    i, q = codec.i16_words_to_iq(jnp.asarray(words))
    np.testing.assert_array_equal(np.asarray(i), ref.real)
    np.testing.assert_array_equal(np.asarray(q), ref.imag)


def test_i16_decode_extremes():
    vals = np.array([-32768, -1, 0, 1, 32767, 12345, -12345], dtype=np.int16)
    buf = np.repeat(vals, 2).astype("<i2").tobytes()  # use same value for I and Q
    ref = oracle.decode_i16_bytes(buf)
    i, q = codec.i16_words_to_iq(jnp.asarray(codec.bytes_to_i16_words(buf)))
    np.testing.assert_array_equal(np.asarray(i), ref.real)
    np.testing.assert_array_equal(np.asarray(q), ref.imag)


def test_f32_roundtrip():
    buf = random_f32_bytes(1024)
    ref = oracle.decode_f32_bytes(buf)
    pairs = codec.bytes_to_f32_pairs(buf)
    i, q = codec.f32_pairs_to_iq(jnp.asarray(pairs))
    np.testing.assert_array_equal(np.asarray(i), ref.real)
    np.testing.assert_array_equal(np.asarray(q), ref.imag)
    back = codec.f32_pairs_to_bytes(np.asarray(codec.iq_to_f32_pairs(i, q)))
    assert back == buf


def test_i16_encode_matches_oracle():
    # Includes out-of-range and exact-boundary values to pin the saturating
    # truncate-toward-zero semantics of Rust's `as i16` (main.rs:77-78).
    x = np.concatenate(
        [
            RNG.normal(scale=0.6, size=5000),
            np.array([1.0, -1.0, 1.5, -1.5, 0.99997, -0.99999,
                      32767 / 32767.0, -32768 / 32767.0,
                      0.5 / 32767.0, -0.5 / 32767.0, 0.0]),
        ]
    ).astype(np.float32)
    z = (x + 1j * x[::-1]).astype(np.complex64)
    ref_bytes = oracle.encode_i16_bytes(z)
    words = codec.iq_to_i16_words(jnp.asarray(z.real), jnp.asarray(z.imag))
    got = codec.i16_words_to_bytes(np.asarray(words))
    assert got == ref_bytes


def test_i16_encode_nan_is_zero():
    z = np.array([np.nan + 1j * 0.5, 0.5 + 1j * np.nan], dtype=np.complex64)
    ref_bytes = oracle.encode_i16_bytes(z)
    words = codec.iq_to_i16_words(jnp.asarray(z.real), jnp.asarray(z.imag))
    assert codec.i16_words_to_bytes(np.asarray(words)) == ref_bytes


def test_i16_bytes_roundtrip_through_words():
    buf = random_i16_bytes(777)
    words = codec.bytes_to_i16_words(buf)
    assert codec.i16_words_to_bytes(words) == buf[: len(words) * 4]
