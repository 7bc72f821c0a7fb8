"""High-level API test: the reference README example, on toy params
(ref: README.md — clear_a * clear_b on FheUint32, operator overloads)."""

import pytest

import tfhe_tpu
from tfhe_tpu import ConfigBuilder, FheBool, FheUint8, generate_keys, set_server_key
from tfhe_tpu.params import PARAM_MESSAGE_2_CARRY_2_COMPACT_TEST


@pytest.fixture(scope="module")
def ctx():
    config = ConfigBuilder.default().use_custom_parameters(
        PARAM_MESSAGE_2_CARRY_2_COMPACT_TEST
    ).build()
    cks, sks = generate_keys(config, seed=3)
    set_server_key(sks)
    return cks


def test_readme_example_shape(ctx):
    """The reference README flow: encrypt two values, *, +, decrypt."""
    clear_a, clear_b = 27, 128
    a = FheUint8.encrypt(clear_a, ctx)
    b = FheUint8.encrypt(clear_b, ctx)
    assert (a * b).decrypt(ctx) == (clear_a * clear_b) % 256
    assert (a + b).decrypt(ctx) == (clear_a + clear_b) % 256
    assert (a - b).decrypt(ctx) == (clear_a - clear_b) % 256


def test_operators(ctx):
    a = FheUint8.encrypt(0b1100, ctx)
    b = FheUint8.encrypt(0b1010, ctx)
    assert (a & b).decrypt(ctx) == 0b1000
    assert (a | b).decrypt(ctx) == 0b1110
    assert (a ^ b).decrypt(ctx) == 0b0110
    assert (~a).decrypt(ctx) == 0b11110011
    assert (a << 2).decrypt(ctx) == 0b110000
    assert (a >> 1).decrypt(ctx) == 0b110
    assert (-a).decrypt(ctx) == (256 - 12)
    assert (a + 5).decrypt(ctx) == 17
    assert (a * 3).decrypt(ctx) == 36


def test_comparisons_and_select(ctx):
    a = FheUint8.encrypt(12, ctx)
    b = FheUint8.encrypt(30, ctx)
    assert (a < b).decrypt(ctx) is True
    assert (a == b).decrypt(ctx) is False
    assert a.eq(12).decrypt(ctx) is True
    assert (a >= b).decrypt(ctx) is False
    assert a.max(b).decrypt(ctx) == 30
    assert a.min(5).decrypt(ctx) == 5
    cond = a < b
    assert cond.if_then_else(a, b).decrypt(ctx) == 12


def test_fhebool_ops(ctx):
    t = FheBool.encrypt(True, ctx)
    f = FheBool.encrypt(False, ctx)
    assert (t & f).decrypt(ctx) is False
    assert (t | f).decrypt(ctx) is True
    assert (t ^ t).decrypt(ctx) is False
    assert (~f).decrypt(ctx) is True


def test_trivial_encrypt(ctx):
    t = FheUint8.encrypt_trivial(99)
    assert t.decrypt(ctx) == 99
    a = FheUint8.encrypt(1, ctx)
    assert (t + a).decrypt(ctx) == 100


@pytest.mark.slow
def test_fheint_ops(ctx):
    from tfhe_tpu import FheInt8

    a = FheInt8.encrypt(-42, ctx)
    b = FheInt8.encrypt(17, ctx)
    assert (a + b).decrypt(ctx) == -25
    assert (a - b).decrypt(ctx) == -59
    assert (a * b).decrypt(ctx) == (-42 * 17 + 128) % 256 - 128
    assert (-a).decrypt(ctx) == 42
    assert a.abs().decrypt(ctx) == 42
    assert (a >> 2).decrypt(ctx) == -11  # arithmetic shift
    assert (a < b).decrypt(ctx) is True
    assert (a > 0).decrypt(ctx) is False
    assert a.max(b).decrypt(ctx) == 17
    q, r = a.div_rem(b)
    assert q.decrypt(ctx) == -2 and r.decrypt(ctx) == -8
    assert (a // 5).decrypt(ctx) == -8  # truncation toward zero


def test_wide_types_round_trip(ctx):
    """FheUint64/128/256 encrypt/decrypt + a cheap op each
    (ref: high_level_api macro expansion covers all widths)."""
    from tfhe_tpu import api

    cks = ctx
    v64 = (1 << 63) | 12345
    a = api.FheUint64.encrypt(v64, cks)
    assert a.decrypt(cks) == v64
    assert (a + 1).decrypt(cks) == (v64 + 1) % (1 << 64)

    v128 = (1 << 120) + 99
    b = api.FheUint128.encrypt(v128, cks)
    assert b.decrypt(cks) == v128

    v256 = (1 << 250) + 7
    c = api.FheUint256.encrypt(v256, cks)
    assert c.decrypt(cks) == v256

    s = api.FheInt64.encrypt(-(1 << 40), cks)
    assert s.decrypt(cks) == -(1 << 40)
